"""Headline benchmark: batched FFT-1024 throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published FFT-1024 371 Msamples/s (README.md:92,
docs/MEASURABLE_OBJECTIVES.md:27, single x86 core + rustfft). North star
(BASELINE.json): >=5 Gsamples/s/chip.

Also measures LoRa SF7 full-demod throughput as a secondary metric
(reported in the JSON under "extra").
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FFT1024_MSPS = 371.0


def _time_fn(fn, x, warmup=2, iters=10):
    """Timing with a serialized data dependency: each iteration consumes the
    previous output, so overlap/async dispatch can't flatter the number."""
    for _ in range(warmup):
        x = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def bench_fft1024():
    n = 1024
    batch = 16384  # 16M samples per call (128 MB complex64)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, n), dtype=np.float32)
        + 1j * np.random.default_rng(1).standard_normal((batch, n), dtype=np.float32),
        dtype=jnp.complex64,
    )
    fft = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))
    dt = _time_fn(fft, x)
    return batch * n / dt  # samples/s


def bench_lora_sf7_demod():
    from r4w_tpu.waveforms import lora

    p = lora.LoRaParams(sf=7)
    n_sym = 4096
    lanes = 32
    rng = np.random.default_rng(2)
    symbols = jnp.asarray(rng.integers(0, 128, (lanes, n_sym)))
    from r4w_tpu.waveforms.lora import chirp as chirp_mod

    samples = chirp_mod.symbol_chirps(p, symbols).reshape(lanes, -1)

    # feed demod symbols back into chirp synthesis so iterations chain
    step = jax.jit(
        lambda s: chirp_mod.symbol_chirps(
            p, lora.demodulate_symbols(p, s)[0]
        ).reshape(lanes, -1)
    )
    dt = _time_fn(step, samples)
    return lanes * n_sym * p.samples_per_symbol / dt  # IQ samples/s


def main():
    fft_sps = bench_fft1024()
    lora_sps = bench_lora_sf7_demod()
    msps = fft_sps / 1e6
    print(
        json.dumps(
            {
                "metric": "fft1024_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / BASELINE_FFT1024_MSPS, 2),
                "extra": {
                    "lora_sf7_demod_Msps": round(lora_sps / 1e6, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
