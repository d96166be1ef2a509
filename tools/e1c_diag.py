"""One-off diagnostic for the E1C tracking gate: per-PRN residual
analysis of the closed-loop pass (code offset via E/L balance, Doppler
via wiped-prompt FFT, amplitude trend) plus scenario truth Doppler.

Not part of the bench suite; run:  python tools/e1c_diag.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

YAML = os.environ.get(
    "R4W_E1C_YAML", "/root/reference/e1c_8prn_60s_cn34_orbital.yaml")


def main(periods: int = 50):
    import jax
    import jax.numpy as jnp

    from r4w_tpu.gnss import scenario as sc
    from r4w_tpu.gnss import tracking
    from tools.e1c_common import e1c_capture

    cfg, rx, all_prns, n_present, all_waves, acq_all, _ = \
        e1c_capture(YAML, periods)
    fs = cfg.sample_rate
    prns = all_prns[:n_present]
    waves = all_waves[:n_present]
    acq = type(acq_all)(*[np.asarray(f)[:n_present] for f in acq_all])

    # scenario truth Doppler at t=0 and t=0.2 s
    gen = sc.GnssScenario(cfg)
    dop0, _, elev0, amp0 = gen._sat_state(0.0)
    dop2, _, _, _ = gen._sat_state(0.2)

    # ---- replicate the gate's fine sync + pass 1 -----------------------
    from tools.e1c_tracking import track_channels
    per, _ = track_channels(rx, fs, prns, waves, acq, periods,
                            cn0_cfg_dbhz=float(cfg.satellites[0].cn0_dbhz))

    code_len = 4092 * sc.SUBCHIP
    scps = (sc.CHIP_RATE * sc.SUBCHIP) / fs
    tau = np.asarray(acq.code_phase, np.float64)
    for i, p in enumerate(prns):
        r = per[i]
        r["dop_acq"] = float(np.asarray(acq.doppler_hz)[i])
        r["dop_truth_t0"] = round(float(dop0[i]), 2)
        r["dop_truth_t02"] = round(float(dop2[i]), 2)
        r["elev"] = round(float(elev0[i]), 1)
        r["amp_rel_db"] = round(
            20 * np.log10(float(amp0[i]) / float(np.max(amp0))), 2)
        r["tau_samples"] = round(float(tau[i]), 2)
        print(json.dumps(r))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
