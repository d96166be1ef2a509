"""GPS L1 C/A IQ→PVT position-fix acceptance (end-to-end receiver).

Two modes, selected by ``mode=``:

``decoded_ephemeris`` (default, VERDICT r4 #2 — the signal-only
receiver with NO crutches): a 6-SV scenario overlays real
ephemeris-bearing LNAV (filler SF4 + SF1-3 per SV, parity-chained,
TOW-stamped); the receiver acquires from the IQ, tracks every PRN
with the production DLL/PLL, recovers 20 ms bits from the prompts,
frame-syncs the LNAV stream, decodes clock + Keplerian ephemeris from
subframes 1-3, forms FULL transmit times from decoded TOW + bit
count + code phase (``nav_message.transmit_time_at_block`` — no
supplied integer milliseconds), computes satellite positions from
the DECODED ephemeris, and solves. Nothing about the geometry enters
the receiver side except through the RF and the nav bits.

``code_phase`` (legacy r3 gate): acquisition-only, code-phase
pseudoranges with truth integer-ms and truth satellite positions.

Prints ONE JSON line with the position error in meters.

Run on the TPU:  timeout 900 python tools/gps_pvt_fix.py
Reference role: cmd_gnss_simulate → acquisition → tracking →
LnavMessage nav decode (crates/r4w-cli/src/main.rs:3383,
crates/r4w-core/src/waveform/gnss/nav_message.rs:51,231,
tracking.rs:177-446) — the reference stops at per-subframe clock
decode; the ephemeris decode + PVT solve goes beyond.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

FS = 8_184_000.0  # legacy mode: 8 samples/chip
FS_DEC = 4_092_000.0  # decoded mode: 4 samples/chip (tracking interpolates)
CHIP_RATE = 1_023_000.0
WEEK = 200


def _geometry(n_sats=6, seed=0):
    """Receiver truth + satellites on a 26560 km shell at random az/el
    (same construction as tests/test_gnss_fullstack.py)."""
    from r4w_tpu.gnss.coordinates import lla_to_ecef

    truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
    rng = np.random.default_rng(seed)
    up = truth / np.linalg.norm(truth)
    east = np.cross([0, 0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    sats = []
    for a, e in zip(rng.uniform(0, 2 * np.pi, n_sats),
                    rng.uniform(np.radians(25), np.radians(80), n_sats)):
        los = (np.cos(e) * (np.sin(a) * east + np.cos(a) * north)
               + np.sin(e) * up)
        b = 2 * truth @ los
        c = truth @ truth - 26_560e3 ** 2
        t = (-b + np.sqrt(b * b - 4 * c)) / 2
        sats.append(truth + t * los)
    return truth, np.asarray(sats)


SPEED_OF_LIGHT = 299_792_458.0


def range_at_tx(pos0, truth, rdot: float, t_el_tx: float) -> float:
    """Satellite-to-receiver distance at TRANSMIT elapsed time t_el_tx
    for a moving-range scenario. The scenario synthesizes delay at
    RECEIVE time (delay(t_rx) = range(t_rx)/c, range(t) = r0 + rdot·t),
    so the distance the solver must see at transmit time satisfies
    R = r0 + rdot·(t_el_tx + R/c)."""
    r0 = float(np.linalg.norm(np.asarray(pos0) - np.asarray(truth)))
    return (r0 + rdot * t_el_tx) / (1.0 - rdot / SPEED_OF_LIGHT)


def eval_pos(pos0, truth, rdot: float, t_el_eval: float) -> np.ndarray:
    """Satellite position at the ephemeris anchor epoch on the truth
    moving-range trajectory along the fixed LOS (the static scenario
    path synthesizes range, not a 3-D track)."""
    pos0 = np.asarray(pos0)
    truth = np.asarray(truth)
    los = pos0 - truth
    r0 = np.linalg.norm(los)
    return truth + range_at_tx(pos0, truth, rdot, t_el_eval) * (los / r0)


def build_sv_nav_bits(eph, tow_count_sf4: int, week: int = WEEK
                      ) -> np.ndarray:
    """1200-bit LNAV stream: almanac-filler SF4 then SF1+SF2+SF3,
    parity-chained across all four subframes. Bit 0 transmits at
    subframe_start_sow(tow_count_sf4); the filler gives the tracking
    loops a full 6 s to pull in before the ephemeris frames start."""
    from r4w_tpu.gnss import nav_message as nm

    sf4 = nm.build_subframe(4, tow_count_sf4)
    eph_bits = nm.build_ephemeris_frames(
        eph, week=week, tow_count_sf1=tow_count_sf4 + 1,
        d29=int(sf4[-2]), d30=int(sf4[-1]))
    return np.concatenate([sf4, eph_bits])


def decode_sv_channel(prompt_i: np.ndarray, code_phase: np.ndarray,
                      phase0: float, m_star: int, prn: int):
    """Host-side receiver back end for one tracked channel: bit-edge
    recovery → frame sync → SF1-3 field decode → ephemeris assembly →
    transmit time at block m_star. Returns (record, eph, t_tx) with
    eph/t_tx None when the stream did not yield a full ephemeris."""
    from r4w_tpu.gnss import nav_message as nm

    edge = nm.find_bit_edge(prompt_i)
    bits = nm.bits_from_prompts(prompt_i, edge)
    frames = nm.frame_sync(bits)
    by_sid: dict[int, dict] = {}
    for f in frames:
        if f.subframe_id in (1, 2, 3) and f.subframe_id not in by_sid:
            by_sid[f.subframe_id] = nm.decode_subframe_fields(f.bits)
    rec = {"prn": prn, "frames": len(frames),
           "subframes": sorted(by_sid), "edge": edge}
    if not frames or len(by_sid) < 3:
        return rec, None, None
    iode_ok = (by_sid[2]["iode"] == by_sid[3]["iode"]
               == by_sid[1]["iodc"] % 256)
    rec["iode_ok"] = bool(iode_ok)
    rec["week"] = int(by_sid[1]["week"])
    eph = nm.ephemeris_from_subframes(by_sid[1], by_sid[2], by_sid[3],
                                      prn)
    cp = np.concatenate([[phase0], np.asarray(code_phase, np.float64)])
    t_tx = nm.transmit_time_at_block(m_star, frames[0], edge,
                                     lambda m: cp[m])
    # satellite clock correction (af0=af1=af2=0 in this scenario, but
    # the receiver applies it unconditionally — standard hygiene)
    t_tx -= eph.clock_bias(t_tx)
    return rec, eph, t_tx


def l1ca_receiver(rx, prns, fs: float = FS_DEC) -> dict:
    """GPS L1 C/A receiver front end on a device-resident capture:
    PCPS acquisition (short slice, code phase + Doppler seed) → the
    production Costas DLL/PLL over the full capture, one vmapped
    channel per PRN with code-epoch-aligned windows. Shared by the
    GPS-only gate and tools/dual_pvt.py."""
    import jax
    import jax.numpy as jnp

    from r4w_tpu.gnss import acquisition, prn as prn_mod, tracking

    sps = int(round(fs / CHIP_RATE))
    codes = np.stack([prn_mod.gps_ca_code(p) for p in prns]
                     ).astype(np.float32)
    codes_os = np.repeat(codes, sps, axis=1)
    acq_cfg = acquisition.PcpsConfig(doppler_max_hz=500.0,
                                     doppler_step_hz=250.0,
                                     coherent_periods=8, threshold=2.0)
    t1 = time.time()
    n_acq = int(fs * 0.012)
    res = acquisition.acquire(rx[:n_acq], jnp.asarray(codes_os), prns,
                              fs, acq_cfg)
    acquire_s = time.time() - t1
    det = np.asarray(res.detected)
    tau = np.asarray(res.code_phase, np.float64)  # samples to chip 0
    dop = np.asarray(res.doppler_hz, np.float64)

    # --- track all PRNs with the production DLL/PLL ------------------
    # Each channel's integration windows are aligned to ITS OWN code
    # epochs: start at floor(tau) samples and carry only the
    # sub-sample remainder as initial code phase (the e1c_tracking
    # lesson). Sample-grid-aligned windows put the nav-bit flip
    # mid-block for channels with code phase near half a period; the
    # near-zero straddle prompt then kicks the Costas/FLL every 20 ms
    # and the loop occasionally slips 180° — measured 5-40% bit
    # inversions on exactly the SVs whose delay fraction was near
    # 0.5 ms (tools/pvt_diag2.py, r5).
    t2 = time.time()
    tcfg = tracking.TrackingConfig(sample_rate=fs, costas=True,
                                   fll_gain=0.2)
    cps = CHIP_RATE / fs  # chips per sample
    istart = np.floor(tau).astype(np.int64)
    frac = tau - istart
    phase0 = (1023.0 - frac * cps) % 1023.0
    bs = tcfg.block_size
    n_keep = ((rx.shape[0] - int(istart.max())) // bs) * bs
    st0 = tracking.init_state(tcfg,
                              jnp.asarray(phase0, jnp.float32),
                              jnp.asarray(dop, jnp.float32))
    run = jax.jit(jax.vmap(
        lambda s, code, i0, x: tracking.track(
            tcfg, s, jax.lax.dynamic_slice(x, (i0,), (n_keep,)), code),
        in_axes=(0, 0, 0, None)))
    _fin, outs = run(st0, jnp.asarray(codes),
                     jnp.asarray(istart.astype(np.int32)), rx)
    prompt_i = np.asarray(jax.device_get(outs.prompt_i), np.float64)
    code_ph = np.asarray(jax.device_get(outs.code_phase), np.float64)
    cn0_est = float(np.median(np.asarray(
        jax.device_get(outs.cn0_dbhz))[:, -2000:]))
    track_s = time.time() - t2
    carr_freq = np.asarray(jax.device_get(outs.carrier_freq),
                           np.float64)
    return {"det": det, "istart": istart, "bs": bs,
            "phase0": phase0, "prompt_i": prompt_i,
            "code_ph": code_ph, "carr_freq": carr_freq,
            "cn0_est": cn0_est,
            "acquire_s": acquire_s, "track_s": track_s}


def main_decoded(duration_s: float = 24.3, cn0_dbhz: float = 48.0
                 ) -> dict:
    import jax

    from r4w_tpu.gnss import nav_message as nm
    from r4w_tpu.gnss import pvt
    from r4w_tpu.gnss.ephemeris import circular_ephemeris_for_position
    from r4w_tpu.gnss.scenario import (GnssScenario, ReceiverConfig,
                                       SatelliteConfig, ScenarioConfig)

    truth, sat_pos = _geometry()
    prns = list(range(1, len(sat_pos) + 1))
    ranges = np.linalg.norm(sat_pos - truth, axis=1)
    c = pvt.SPEED_OF_LIGHT

    # Distinct per-SV range rates: six SVs at zero relative Doppler is
    # the C/A multi-access worst case — static -24 dB cross-
    # correlations bias each DLL by tens of meters (the dual_pvt
    # measurement: Doppler spread cut the per-SV pseudorange spread
    # from 48 to 19 m p-p). Rates stay inside the ±500 Hz acquisition
    # search (5.255 Hz per m/s at L1).
    rdots = [-90.0, -55.0, -20.0, 15.0, 50.0, 85.0][:len(prns)]

    # nav bit 0 transmits at t0_sow; ephemeris frames start 6 s later
    tow_sf4 = 57600
    t0_sow = nm.subframe_start_sow(tow_sf4)
    t_eval = t0_sow + duration_s - 0.3  # ≈ transmit epoch at m_star
    t_el_eval = t_eval - t0_sow
    ephs = [circular_ephemeris_for_position(
        eval_pos(sat_pos[i], truth, rdots[i], t_el_eval), truth,
        t_eval, prn=p, range_rate_mps=rdots[i])
        for i, p in enumerate(prns)]

    t0 = time.time()
    sats = tuple(
        SatelliteConfig(
            signal="GpsL1Ca", prn=p, cn0_dbhz=cn0_dbhz, doppler_hz=0.0,
            range_m=float(ranges[i]), range_rate_mps=rdots[i],
            nav_data=True,
            nav_bits=tuple(int(v) for v in
                           1 - 2 * build_sv_nav_bits(ephs[i], tow_sf4)))
        for i, p in enumerate(prns))
    cfg = ScenarioConfig(sample_rate=FS_DEC, duration_s=duration_s,
                         satellites=sats,
                         receiver=ReceiverConfig(lat_deg=45.0,
                                                 lon_deg=7.0),
                         seed=99)
    rx = GnssScenario(cfg).generate_device(duration_s)
    rx.block_until_ready()
    gen_s = time.time() - t0

    rcv = l1ca_receiver(rx, prns)
    det = rcv["det"]
    acquire_s, track_s = rcv["acquire_s"], rcv["track_s"]
    istart, bs = rcv["istart"], rcv["bs"]
    phase0, prompt_i = rcv["phase0"], rcv["prompt_i"]
    code_ph, cn0_est = rcv["code_ph"], rcv["cn0_est"]

    # --- nav decode + transmit times + solve (host) ------------------
    # Block m of channel i starts at receiver sample istart_i + m·bs,
    # so each channel's pseudorange is measured at ITS OWN receiver
    # epoch t_rx_i — the solver's clock-bias state absorbs the common
    # offset and the per-channel spread (< 1 ms, static geometry)
    # cancels exactly in c·(t_rx_i − t_tx_i).
    n_blocks = prompt_i.shape[1]
    m_star = n_blocks - 10
    lam = c / 1_575_420_000.0  # L1 carrier wavelength
    n2s = max(1, int(round(2.0 * FS_DEC / bs)))  # blocks in 2 s
    recs, sat_ps, rhos, used = [], [], [], []
    sat_vs, rrs = [], []
    for i, p in enumerate(prns):
        rec, eph_dec, t_tx = decode_sv_channel(
            prompt_i[i], code_ph[i, :-1], float(phase0[i]), m_star, p)
        recs.append(rec)
        if eph_dec is not None:
            t_rx = t0_sow + (istart[i] + m_star * bs) / FS_DEC
            sat_ps.append(np.asarray(eph_dec.position(t_tx)))
            rhos.append(c * (t_rx - t_tx))
            # velocity observables: tracked carrier Doppler (median of
            # the last ~2 s of blocks) -> geometric range rate;
            # satellite velocity from decoded ephemeris (central diff)
            dop = float(np.median(
                rcv["carr_freq"][i, max(0, m_star - n2s):m_star]))
            rrs.append(-dop * lam)
            sat_vs.append(np.asarray(eph_dec.position(t_tx + 0.5))
                          - np.asarray(eph_dec.position(t_tx - 0.5)))
            rec["rr_err_mps"] = round(rrs[-1] - rdots[i], 2)
            used.append(i)
    decoded = len(used)
    velocity = None
    if decoded >= 4:
        rho = np.asarray(rhos)
        sol = pvt.solve_position(np.stack(sat_ps), rho)
        err = float(np.linalg.norm(np.asarray(sol.position_ecef)
                                   - truth))
        clock_bias = float(sol.clock_bias_m)
        max_resid = float(np.abs(np.asarray(sol.residuals_m)).max())
        # velocity/clock-drift solve: the receiver is static, so the
        # solved speed IS the end-to-end Doppler-chain error budget
        vsol = pvt.solve_velocity(sol, np.stack(sat_ps),
                                  np.stack(sat_vs), np.asarray(rrs))
        speed = float(np.linalg.norm(np.asarray(vsol.velocity_ecef)))
        velocity = {
            "speed_mps": round(speed, 3),
            "clock_drift_mps": round(float(vsol.clock_drift_mps), 3),
            "pass": bool(speed < 1.0),
        }
    else:
        err, clock_bias, max_resid = float("inf"), 0.0, float("inf")
    return {
        "metric": "gps_pvt_error",
        "value": round(err, 1),
        "unit": "m",
        "mode": "decoded_ephemeris",
        "pass": bool(det.all() and decoded == len(prns)
                     and err < 50.0),
        "acquired": int(det.sum()),
        "decoded": decoded,
        "of": len(prns),
        "clock_bias_m": round(clock_bias, 1),
        "max_residual_m": round(max_resid, 1),
        "velocity": velocity,
        "cn0_est_dbhz": round(cn0_est, 1),
        "per_sv": recs,
        "device": str(jax.devices()[0]),
        "gen_s": round(gen_s, 1),
        "acquire_s": round(acquire_s, 1),
        "track_s": round(track_s, 1),
    }


def main_code_phase(duration_s: float = 0.01, cn0_dbhz: float = 48.0
                    ) -> dict:
    """Legacy acquisition-only gate (r3): truth satellite positions and
    truth integer milliseconds; measures code-phase ranging quality."""
    import jax
    import jax.numpy as jnp

    from r4w_tpu.core import hostio
    from r4w_tpu.gnss import acquisition, prn as prn_mod, pvt
    from r4w_tpu.gnss.scenario import (GnssScenario, ReceiverConfig,
                                       SatelliteConfig, ScenarioConfig)

    truth, sat_pos = _geometry()
    ranges = np.linalg.norm(sat_pos - truth, axis=1)
    prns = list(range(1, len(ranges) + 1))
    c = pvt.SPEED_OF_LIGHT

    t0 = time.time()
    cfg = ScenarioConfig(
        sample_rate=FS, duration_s=duration_s,
        satellites=tuple(
            SatelliteConfig(signal="GpsL1Ca", prn=p, cn0_dbhz=cn0_dbhz,
                            doppler_hz=0.0, range_m=float(r))
            for p, r in zip(prns, ranges)),
        receiver=ReceiverConfig(lat_deg=45.0, lon_deg=7.0),
        seed=99)
    iq = GnssScenario(cfg).generate(duration_s)
    rx = hostio.to_device(np.asarray(iq))
    gen_s = time.time() - t0

    sps = int(round(FS / CHIP_RATE))
    codes = np.stack([np.repeat(prn_mod.gps_ca_code(p), sps)
                      for p in prns]).astype(np.float32)
    acq_cfg = acquisition.PcpsConfig(doppler_max_hz=500.0,
                                     doppler_step_hz=250.0,
                                     coherent_periods=8, threshold=2.0)
    t1 = time.time()
    res = acquisition.acquire(rx, jnp.asarray(codes), prns, FS, acq_cfg)
    acquire_s = time.time() - t1

    det = np.asarray(res.detected)
    phase_samples = np.asarray(res.code_phase, np.float64)
    delay_chips = (phase_samples / sps) % 1023.0
    int_ms = np.floor(ranges / c * 1e3)
    rho = pvt.pseudoranges_from_code_phase(delay_chips, CHIP_RATE,
                                           int_ms)
    sol = pvt.solve_position(sat_pos, np.asarray(rho))
    err = float(np.linalg.norm(np.asarray(sol.position_ecef) - truth))
    return {
        "metric": "gps_pvt_error",
        "value": round(err, 1),
        "unit": "m",
        "mode": "code_phase",
        "pass": bool(det.all() and err < 50.0),
        "acquired": int(det.sum()),
        "of": len(prns),
        "clock_bias_m": round(float(sol.clock_bias_m), 1),
        "max_residual_m": round(float(np.abs(
            np.asarray(sol.residuals_m)).max()), 1),
        "device": str(jax.devices()[0]),
        "gen_s": round(gen_s, 1),
        "acquire_s": round(acquire_s, 1),
    }


def main(duration_s: float | None = None, cn0_dbhz: float = 48.0,
         mode: str = "decoded_ephemeris") -> dict:
    if mode == "decoded_ephemeris":
        return main_decoded(duration_s or 24.3, cn0_dbhz)
    return main_code_phase(duration_s or 0.01, cn0_dbhz)


if __name__ == "__main__":
    mode = ("code_phase" if "--quick" in sys.argv
            else "decoded_ephemeris")
    print(json.dumps(main(mode=mode)))
