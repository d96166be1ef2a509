"""Headline benchmark: batched FFT-1024 throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published FFT-1024 371 Msamples/s (README.md:92,
docs/MEASURABLE_OBJECTIVES.md:27, single x86 core + rustfft). North star
(BASELINE.json): >=5 Gsamples/s/chip.

axon-backend constraints (see .claude/skills/verify/SKILL.md): complex64
must not cross jit/host boundaries and block_until_ready is not a true
sync — so each benchmark is ONE jit containing a fori_loop with a serial
data dependency, synced by device_get of a float32 scalar.
"""

from __future__ import annotations

import json
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

BASELINE_FFT1024_MSPS = 371.0
ITERS = 32


def _timed_scalar(fn, *args):
    """Run fn twice (compile+warm, then timed); fn must return f32 scalar."""
    s = jax.device_get(fn(*args))
    assert np.isfinite(s), "benchmark produced non-finite output"
    t0 = time.perf_counter()
    s = jax.device_get(fn(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return dt


def bench_fft1024():
    # batch sized to keep the chained loop resident in VMEM: the tunnel
    # device is HBM-bandwidth-throttled (~6 GB/s), so a 134 MB working
    # set runs at ~0.1 Gsps while a 2 MB one sustains ~11 Gsps. batch
    # 256 x 16384 chained iterations measured best (sweep 2026-08-16).
    n = 1024
    batch = 256
    iters = 16384
    rng = np.random.default_rng(0)
    re = rng.standard_normal((batch, n), dtype=np.float32)
    im = rng.standard_normal((batch, n), dtype=np.float32)
    scale = np.float32(1.0 / np.sqrt(n))  # unitary: chained FFTs stay bounded

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            return jnp.fft.fft(v, axis=-1) * scale

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return batch * n * iters / dt  # samples/s


def bench_lora_sf7_demod():
    """Chained chirp-synthesize → dechirp-FFT-argmax demod loop."""
    from r4w_tpu.waveforms import lora
    from r4w_tpu.waveforms.lora import chirp as chirp_mod

    p = lora.LoRaParams(sf=7)
    # small working set (VMEM-resident) + long chained loop; synthesis
    # uses the one-hot-matmul chirp identity (symbol_chirps method=auto)
    # instead of the modular gather — ~100x on this device
    lanes, n_sym, iters = 8, 512, 512
    rng = np.random.default_rng(2)
    syms0 = rng.integers(0, 128, (lanes, n_sym)).astype(np.int32)

    @jax.jit
    def run(syms):
        def body(i, s):
            iq = chirp_mod.symbol_chirps(p, s).reshape(lanes, -1)
            out, _, _ = lora.demodulate_symbols(p, iq)
            return out

        s = lax.fori_loop(0, iters, body, syms)
        return jnp.sum(s).astype(jnp.float32)

    dt = _timed_scalar(run, syms0)
    return lanes * n_sym * p.samples_per_symbol * iters / dt  # IQ samples/s


def _tpu_canary(timeout_s: int = 150) -> bool:
    """Probe the device in a subprocess — the axon tunnel can wedge and
    hang any compute indefinitely; never let that hang the bench."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jax.jit(lambda x: jnp.sum(x*x))"
        "(jnp.ones((256,256), jnp.float32))))"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    device_note = ""
    if not _tpu_canary():
        # fall back to CPU so the driver still records a number
        jax.config.update("jax_platforms", "cpu")
        device_note = " (TPU tunnel unresponsive — CPU fallback)"
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
                    "device": str(jax.devices()[0]) + device_note,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
