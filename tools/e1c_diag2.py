"""One-off: code-offset power profile + closed-loop trajectories for
the E1C gate channels (PRN 13 investigation).  python tools/e1c_diag2.py
"""

from __future__ import annotations

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

    code_len = 4092 * sc.SUBCHIP
    common = dict(
        code_length=code_len, sample_rate=fs,
        chipping_rate=sc.CHIP_RATE * sc.SUBCHIP, el_spacing=2.0,
        block_period=4092 / sc.CHIP_RATE, carrier_hz=sc.GALILEO_E1_HZ,
        costas=True)
    cfg_open = tracking.TrackingConfig(
        dll_bandwidth=0.0, pll_bandwidth=0.0, fll_gain=0.0, **common)
    scps = cfg_open.chipping_rate / fs
    tau = np.asarray(acq.code_phase, np.float64)
    dop = np.asarray(acq.doppler_hz, np.float64)
    istart = np.floor(tau).astype(np.int32)
    frac = tau - istart
    phase0 = (code_len - frac * scps) % code_len
    codes = np.stack([np.asarray(w, np.float32) for w in waves])
    bs = cfg_open.block_size
    n_keep = (periods - 1) * bs

    def jnp_i32(a):
        return jnp.asarray(a, jnp.int32)

    def open_run(ph0v, dopv):
        s0 = tracking.init_state(cfg_open, ph0v.astype(np.float32),
                                 dopv.astype(np.float32))

        def run(s, c, i0, x):
            seg = jax.lax.dynamic_slice(x, (i0,), (n_keep,))
            return tracking.track(cfg_open, s, seg, c)
        f = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, None)))
        _, o = f(s0, codes, jnp_i32(istart), rx)
        p = (np.asarray(jax.device_get(o.prompt_i))
             + 1j * np.asarray(jax.device_get(o.prompt_q)))
        return p

    # profile: mean |P|^2 vs code offset, per PRN
    offs = np.arange(-8.0, 8.5, 1.0)
    prof = []
    for o in offs:
        p = open_run((phase0 + o) % code_len, dop)
        prof.append(np.mean(np.abs(p) ** 2, axis=1))
    prof = np.stack(prof)  # (n_offs, P)
    prof = prof / prof.max(axis=0, keepdims=True)
    for i, prn in enumerate(prns):
        row = " ".join(f"{v:.2f}" for v in prof[:, i])
        print(f"PRN {prn:2d} profile(-8..+8): {row} "
              f"argmax_off={offs[np.argmax(prof[:, i])]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
