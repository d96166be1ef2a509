"""Second-stage diagnostic: for the channels that failed nav decode,
scan ALL candidate bit edges and report per-edge agreement with the
known overlaid bits, plus the edge-flip histogram — separates 'edge
detector picked the wrong offset' from 'the bits themselves are
corrupt'. Not part of the bench suite."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from tools.gps_pvt_fix import (CHIP_RATE, FS_DEC, _geometry,
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

    sps = int(round(FS_DEC / CHIP_RATE))
    codes = np.stack([prn_mod.gps_ca_code(p) for p in prns]
                     ).astype(np.float32)
    res = acquisition.acquire(
        rx[: int(FS_DEC * 0.012)],
        jnp.asarray(np.repeat(codes, sps, axis=1)), prns, FS_DEC,
        acquisition.PcpsConfig(doppler_max_hz=500.0,
                               doppler_step_hz=250.0,
                               coherent_periods=8, threshold=2.0))
    tau = np.asarray(res.code_phase, np.float64)
    dop = np.asarray(res.doppler_hz, np.float64)

    tcfg = tracking.TrackingConfig(sample_rate=FS_DEC, costas=True,
                                   fll_gain=0.2)
    cps = CHIP_RATE / FS_DEC
    phase0 = (1023.0 - tau * cps) % 1023.0
    st0 = tracking.init_state(tcfg, jnp.asarray(phase0, jnp.float32),
                              jnp.asarray(dop, jnp.float32))
    run = jax.jit(jax.vmap(
        lambda s, code, x: tracking.track(tcfg, s, x, code),
        in_axes=(0, 0, None)))
    _fin, outs = run(st0, jnp.asarray(codes), rx)
    prompt_i = np.asarray(jax.device_get(outs.prompt_i), np.float64)

    out = {"per_sv": []}
    for i, p in enumerate(prns):
        delay_ms = ranges[i] / c * 1e3
        s = np.sign(prompt_i[i])
        flips = np.nonzero(s[1:] * s[:-1] < 0)[0] + 1
        hist = np.bincount(flips % 20, minlength=20)
        per_edge = []
        for edge in range(20):
            bits = nm.bits_from_prompts(prompt_i[i], edge)
            mc = edge + 20 * np.arange(len(bits)) + 10
            bidx = np.floor((mc * 1e-3 - delay_ms * 1e-3)
                            / 0.020).astype(int)
            want = navs[i][np.mod(bidx, len(navs[i]))]
            agree = float(np.mean(bits == want))
            per_edge.append(round(max(agree, 1 - agree), 3))
        best = int(np.argmax(per_edge))
        detected = nm.find_bit_edge(prompt_i[i])
        # agreement of the first vs second half at the best edge
        bits = nm.bits_from_prompts(prompt_i[i], best)
        mc = best + 20 * np.arange(len(bits)) + 10
        bidx = np.floor((mc * 1e-3 - delay_ms * 1e-3) / 0.020
                        ).astype(int)
        want = navs[i][np.mod(bidx, len(navs[i]))]
        eq = (bits == want)
        h1, h2 = float(eq[:len(eq) // 2].mean()), float(
            eq[len(eq) // 2:].mean())
        out["per_sv"].append({
            "prn": p, "delay_mod20_blocks": round(delay_ms % 20.0, 3),
            "detected_edge": int(detected), "best_edge": best,
            "best_agree": per_edge[best],
            "agree_halves_at_best": [round(h1, 3), round(h2, 3)],
            "hist_top": sorted(
                [(int(k), int(v)) for k, v in enumerate(hist)],
                key=lambda kv: -kv[1])[:4],
            "per_edge": per_edge,
        })
    return out


if __name__ == "__main__":
    print(json.dumps(main(), indent=1))
