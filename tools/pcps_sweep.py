"""One-off: PCPS grid-shape throughput sweep on the TPU — find the
(PRN, Doppler, layout) shape that maximizes Gcorr/s for the pcps_gcorr
bench (PERFORMANCE.md names 'larger coherent batches' as headroom).

Run:  timeout 900 python tools/pcps_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def bench_shape(n_prn, n_dopp, iters, flat=False):
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from r4w_tpu.gnss import prn

    fs = 1.023e6
    n = 1023
    codes = np.stack([np.asarray(prn.gps_ca_code(1 + (p % 32)))
                      for p in range(n_prn)]).astype(np.float32)
    codesj = jnp.asarray(codes)
    nfft = 4096
    rng = np.random.default_rng(0)
    re = rng.standard_normal((2 * n,), dtype=np.float32)
    im = rng.standard_normal((2 * n,), dtype=np.float32)
    dops = jnp.arange(n_dopp, dtype=jnp.float32) * 250.0 - 5000.0
    t = jnp.arange(2 * n, dtype=jnp.float32) / fs

    @jax.jit
    def run(re, im):
        x0 = lax.complex(re, im)
        ang = -2.0 * np.pi * dops[:, None] * t[None, :]
        carriers = lax.complex(jnp.cos(ang), jnp.sin(ang))
        code_fft = jnp.conj(jnp.fft.fft(codesj.astype(jnp.complex64),
                                        nfft, axis=-1))

        def body(i, x):
            mixed = x[None, :] * carriers
            mf = jnp.fft.fft(mixed, nfft, axis=-1)  # (D, NF)
            if flat:
                prod = (mf[None, :, :] * code_fft[:, None, :]).reshape(
                    n_prn * n_dopp, nfft)
                surf = jnp.fft.ifft(prod, axis=-1)[..., :n]
            else:
                surf = jnp.fft.ifft(mf[None] * code_fft[:, None, :],
                                    axis=-1)[..., :n]
            pw = surf.real**2 + surf.imag**2
            peak = jnp.max(pw)
            return x * (1.0 + 1e-12 * peak)

        x = lax.fori_loop(0, iters, body, x0)
        return jnp.sum(x.real**2 + x.imag**2)

    rej = jax.device_put(jnp.asarray(re))
    imj = jax.device_put(jnp.asarray(im))
    float(run(rej, imj))  # compile + warm
    t0 = time.time()
    float(run(rej, imj))
    dt = time.time() - t0
    cells = n_prn * n_dopp * 1023 * iters
    return cells / dt / 1e9


def main():
    import jax
    print("device:", jax.devices()[0])
    for n_prn, n_dopp, iters, flat in [
        (8, 41, 256, False),   # current bench shape
        (8, 41, 256, True),
        (16, 41, 128, False),
        (32, 41, 64, False),
        (50, 41, 64, False),
        (8, 81, 128, False),
        (8, 164, 64, False),
        (32, 81, 32, False),
        (4, 41, 512, False),
    ]:
        g = bench_shape(n_prn, n_dopp, iters, flat)
        print(f"prn={n_prn:3d} dopp={n_dopp:3d} iters={iters:3d} "
              f"flat={int(flat)}: {g:.2f} Gcorr/s", flush=True)


if __name__ == "__main__":
    main()
