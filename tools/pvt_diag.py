"""Diagnostic companion to tools/gps_pvt_fix.py (decoded mode): runs
the scenario→acquire→track pipeline and reports per-channel lock
metrics + bit-error rates against the KNOWN overlaid nav bits, to
localize why a channel fails nav decode. Not part of the bench suite.

NOTE (r5): this intentionally keeps the ORIGINAL sample-grid-aligned
tracking windows — together with pvt_diag2.py it documents the
failure mode those windows cause (near-zero straddle prompts every
20 ms kick the Costas/FLL into occasional 180° slips on channels
whose code phase sits near half a period). The production gate now
uses per-channel code-epoch-aligned windows and decodes 6/6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from tools.gps_pvt_fix import (CHIP_RATE, FS_DEC, WEEK, _geometry,
                               build_sv_nav_bits)


def main(duration_s: float = 24.3, cn0_dbhz: float = 48.0) -> dict:
    import jax
    import jax.numpy as jnp

    from r4w_tpu.gnss import acquisition, nav_message as nm
    from r4w_tpu.gnss import prn as prn_mod, pvt, tracking
    from r4w_tpu.gnss.ephemeris import circular_ephemeris_for_position
    from r4w_tpu.gnss.scenario import (GnssScenario, ReceiverConfig,
                                       SatelliteConfig, ScenarioConfig)

    truth, sat_pos = _geometry()
    prns = list(range(1, len(sat_pos) + 1))
    ranges = np.linalg.norm(sat_pos - truth, axis=1)
    c = pvt.SPEED_OF_LIGHT

    tow_sf4 = 57600
    t0_sow = nm.subframe_start_sow(tow_sf4)
    ephs = [circular_ephemeris_for_position(
        sat_pos[i], truth, t0_sow + duration_s - 0.3, prn=p)
        for i, p in enumerate(prns)]
    navs = [build_sv_nav_bits(ephs[i], tow_sf4)
            for i in range(len(prns))]

    t0 = time.time()
    sats = tuple(
        SatelliteConfig(
            signal="GpsL1Ca", prn=p, cn0_dbhz=cn0_dbhz, doppler_hz=0.0,
            range_m=float(ranges[i]), nav_data=True,
            nav_bits=tuple(int(v) for v in 1 - 2 * navs[i]))
        for i, p in enumerate(prns))
    cfg = ScenarioConfig(sample_rate=FS_DEC, duration_s=duration_s,
                         satellites=sats,
                         receiver=ReceiverConfig(lat_deg=45.0,
                                                 lon_deg=7.0),
                         seed=99)
    rx = GnssScenario(cfg).generate_device(duration_s)
    rx.block_until_ready()
    gen_s = time.time() - t0

    sps = int(round(FS_DEC / CHIP_RATE))
    codes = np.stack([prn_mod.gps_ca_code(p) for p in prns]
                     ).astype(np.float32)
    codes_os = np.repeat(codes, sps, axis=1)
    acq_cfg = acquisition.PcpsConfig(doppler_max_hz=500.0,
                                     doppler_step_hz=250.0,
                                     coherent_periods=8, threshold=2.0)
    t1 = time.time()
    res = acquisition.acquire(rx[: int(FS_DEC * 0.012)],
                              jnp.asarray(codes_os), prns, FS_DEC,
                              acq_cfg)
    acquire_s = time.time() - t1
    tau = np.asarray(res.code_phase, np.float64)
    dop = np.asarray(res.doppler_hz, np.float64)

    t2 = time.time()
    tcfg = tracking.TrackingConfig(sample_rate=FS_DEC, costas=True,
                                   fll_gain=0.2)
    cps = CHIP_RATE / FS_DEC
    phase0 = (1023.0 - tau * cps) % 1023.0
    st0 = tracking.init_state(tcfg,
                              jnp.asarray(phase0, jnp.float32),
                              jnp.asarray(dop, jnp.float32))
    run = jax.jit(jax.vmap(
        lambda s, code, x: tracking.track(tcfg, s, x, code),
        in_axes=(0, 0, None)))
    _fin, outs = run(st0, jnp.asarray(codes), rx)
    prompt_i = np.asarray(jax.device_get(outs.prompt_i), np.float64)
    prompt_q = np.asarray(jax.device_get(outs.prompt_q), np.float64)
    code_ph = np.asarray(jax.device_get(outs.code_phase), np.float64)
    carrier = np.asarray(jax.device_get(outs.carrier_freq), np.float64)
    track_s = time.time() - t2

    out = {"gen_s": round(gen_s, 1), "acquire_s": round(acquire_s, 1),
           "track_s": round(track_s, 1), "per_sv": []}
    n_blocks = prompt_i.shape[1]
    for i, p in enumerate(prns):
        delay_ms = ranges[i] / c * 1e3
        edge = nm.find_bit_edge(prompt_i[i])
        bits = nm.bits_from_prompts(prompt_i[i], edge)
        # ground-truth bit stream as seen by the receiver: bit k of
        # the stream (starting at block `edge`) covers transmit time
        # around ((edge + 20k + 10) ms - delay)
        m_centers = edge + 20 * np.arange(len(bits)) + 10
        t_tx = m_centers * 1e-3 - delay_ms * 1e-3
        bidx = np.floor(t_tx / 0.020).astype(int)
        want = navs[i][np.mod(bidx, len(navs[i]))]
        agree = float(np.mean(bits == want))
        frames = nm.frame_sync(bits)
        # lock metrics over thirds of the run
        thirds = np.array_split(np.arange(n_blocks), 3)
        pw = [float(np.mean(np.hypot(prompt_i[i][t], prompt_q[i][t])))
              for t in thirds]
        iq_ratio = [float(np.mean(np.abs(prompt_i[i][t]))
                          / (np.mean(np.abs(prompt_q[i][t])) + 1e-9))
                    for t in thirds]
        out["per_sv"].append({
            "prn": p, "edge": edge, "delay_frac_ms": delay_ms % 1.0,
            "bit_agree": round(max(agree, 1 - agree), 4),
            "inverted": bool(agree < 0.5),
            "frames": [(f.subframe_id, f.bit_index) for f in frames],
            "prompt_mag_thirds": [round(v, 1) for v in pw],
            "iq_ratio_thirds": [round(v, 2) for v in iq_ratio],
            "carrier_hz_last": round(float(carrier[i, -1]), 2),
            "code_ph_drift": round(float(
                code_ph[i, -1] - code_ph[i, 0]), 3),
        })
    return out


if __name__ == "__main__":
    print(json.dumps(main(), indent=1))
