#!/usr/bin/env python
"""Batched PCPS correlator throughput (the BASELINE.json 'GNSS Mcorr/s'
metric): full PRN x Doppler x code-phase grids per second on one chip.
One correlation = one (code-phase lag, Doppler bin, PRN) cell.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def main():
    from r4w_tpu.gnss import prn

    fs = 1.023e6
    n = 1023
    prns = list(range(1, 9))             # 8 PRNs: VMEM-resident grid
    n_dopp = 41                          # +-5 kHz / 250 Hz
    iters = 256
    codes = np.stack([np.asarray(prn.gps_ca_code(p))
                      for p in prns]).astype(np.float32)
    # two-period trick: correlating TWO periods of input against one
    # zero-padded code yields every lag with a full L-term sum (exact),
    # enabling power-of-two FFTs (1.8x the mixed-radix 1023-point path)
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
        carriers = lax.complex(jnp.cos(ang), jnp.sin(ang))  # (D, N)
        code_fft = jnp.conj(jnp.fft.fft(codesj.astype(jnp.complex64),
                                        nfft, axis=-1))  # (K, NF)

        def body(i, x):
            mixed = x[None, :] * carriers               # (D, N)
            mf = jnp.fft.fft(mixed, nfft, axis=-1)      # (D, NF)
            surf = jnp.fft.ifft(mf[None] * code_fft[:, None, :],
                                axis=-1)[..., :n]       # (K, D, N)
            pw = surf.real**2 + surf.imag**2
            # feed a data-dependent scalar back to serialize the loop
            peak = jnp.max(pw)
            return x * (1.0 + 0.0 * peak)

        x = lax.fori_loop(0, iters, body, x0)
        return jnp.sum(x.real**2 + x.imag**2)

    s = jax.device_get(run(re, im))
    t0 = time.perf_counter()
    s = jax.device_get(run(re, im))
    dt = time.perf_counter() - t0
    cells = len(prns) * n_dopp * n * iters
    print(json.dumps({
        "metric": "gnss_pcps_throughput",
        "value": round(cells / dt / 1e6, 1),
        "unit": "Mcorr/s",
        "grid": f"{len(prns)} PRN x {n_dopp} Doppler x {n} lags",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
