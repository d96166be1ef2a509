"""Benchmark suite on one chip (mirrors the reference's criterion
benches, crates/r4w-core/benches/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
the headline metric stays FFT-1024 throughput vs the reference's
published 371 Msamples/s (README.md:92, MEASURABLE_OBJECTIVES.md:27).
"extra.suite" carries the full regression suite with per-bench
`vs_gnuradio` ratios against the hardcoded GNU Radio baselines the
reference compares itself to (benches/gnuradio_comparison.rs:41-66:
FFT1024 50 M, FFT4096 12 M, FIR32 80 M, FIR128 25 M, rotator 100 M,
cmul 200 M, BPSK mod 20 M) plus PCPS/Viterbi/channel throughputs that
have no GR baseline.

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


def bench_fft4096():
    """FFT-4096 (gnuradio_comparison baseline 12 Msps, README 330 Msps)."""
    n, batch, iters = 4096, 64, 4096
    rng = np.random.default_rng(1)
    re = rng.standard_normal((batch, n), dtype=np.float32)
    im = rng.standard_normal((batch, n), dtype=np.float32)
    scale = np.float32(1.0 / np.sqrt(n))

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            return jnp.fft.fft(v, axis=-1) * scale

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return batch * n * iters / dt


def bench_fir(n_taps: int):
    """Production FIR path (ops.filters lowers dense 1-D TPU streams to
    the shift-add MAC form — measured 3x the Pallas roll-MAC and ~25x
    lax.conv; gnuradio_comparison FIR32 80 M / FIR128 25 M). 256
    chained iterations amortize the tunnel dispatch like the other
    kernel benches."""
    from r4w_tpu.ops import filters as F

    # 2^16 keeps the chained stream VMEM-resident — the tunnel device
    # is HBM-throttled (~6 GB/s), same sizing rationale as bench_fft1024
    n, iters = 1 << 16, 2048
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n, dtype=np.float32)
    taps = jnp.asarray(rng.standard_normal(n_taps, np.float32) / n_taps)

    @jax.jit
    def run(x):
        def body(i, v):
            return F.fir_apply(taps, v) * 0.999

        v = lax.fori_loop(0, iters, body, x)
        return jnp.sum(v * v)

    dt = _timed_scalar(run, x)
    return n * iters / dt


def bench_rotator():
    """Complex oscillator mix (gnuradio_comparison rotator 100 M).
    XLA iota+cis+mul measured faster than the Pallas NCO (975 vs 748
    Msps, r2) — this is the production form."""
    from r4w_tpu.core.hostio import cis

    # VMEM-resident working set (see bench_fft1024 sizing note)
    n, iters = 1 << 16, 4096
    rng = np.random.default_rng(3)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            ph = 0.001 * (jnp.arange(n, dtype=jnp.float32) + i)
            return v * cis(ph)

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return n * iters / dt


def bench_cmul():
    """Elementwise complex multiply (gnuradio_comparison cmul 200 M)."""
    # VMEM-resident working set (see bench_fft1024 sizing note)
    n, iters = 1 << 16, 8192
    rng = np.random.default_rng(4)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)
    cr = rng.standard_normal(n, dtype=np.float32) * 0.01
    ci = rng.standard_normal(n, dtype=np.float32) * 0.01

    @jax.jit
    def run(re, im, cr, ci):
        v = lax.complex(re, im)
        c = lax.complex(cr, ci)
        norm = jnp.asarray(1.0, jnp.float32)

        def body(i, carry):
            v, norm = carry
            v = v * c * (1.0 + 1e-6 * norm)  # serial dependency
            return v, norm

        v, _ = lax.fori_loop(0, iters, body, (v, norm))
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im, cr, ci)
    return n * iters / dt


def bench_bpsk_mod():
    """BPSK modulation bits->IQ (gnuradio_comparison BPSK mod 20 M)."""
    from r4w_tpu.waveforms.linear_mod import (
        linear_modulate, psk_constellation, psk_value_to_index)

    from r4w_tpu.core.hostio import to_device

    n_bits, iters = 1 << 16, 128
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, n_bits).astype(np.int32)
    con = to_device(psk_constellation(2))  # complex-safe transfer
    v2i = jnp.asarray(psk_value_to_index(2))

    # NB: complex arrays must be jit ARGUMENTS, not closure constants —
    # constant-embedding materializes them via a host complex copy,
    # which the axon runtime lacks.
    @jax.jit
    def run(bits, con):
        def body(i, b):
            iq = linear_modulate(b, con, v2i, 1, sps=1)
            return jnp.abs(
                (iq.real < 0).astype(jnp.int32) - (1 - b)
            )  # decisions feed next iter (serial dep)

        b = lax.fori_loop(0, iters, body, bits)
        return jnp.sum(b).astype(jnp.float32)

    dt = _timed_scalar(run, bits, con)
    return n_bits * iters / dt


def bench_viterbi():
    """K=7 rate-1/2 soft Viterbi decode throughput (info bits/s)."""
    from r4w_tpu.fec.convolutional import conv_encode, viterbi_decode

    n_info, lanes = 2048, 256
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, (lanes, n_info)).astype(np.int32)
    coded = conv_encode(jnp.asarray(bits))
    soft = 1.0 - 2.0 * coded.astype(np.float32)

    @jax.jit
    def run(soft):
        dec = viterbi_decode(soft, soft=True)
        return jnp.sum(dec).astype(jnp.float32)

    dt = _timed_scalar(run, soft)
    return lanes * n_info / dt


def bench_pcps():
    """GPS C/A PCPS acquisition correlator throughput (corr/s =
    PRNs x Doppler bins x code phases / time)."""
    from r4w_tpu.gnss import acquisition, prn
    from r4w_tpu.core.hostio import to_device

    fs = 2_046_000.0
    n_prn = 8
    codes = np.stack([
        np.repeat(prn.gps_ca_code(p + 1), 2).astype(np.float32)
        for p in range(n_prn)
    ])  # (P, 2046) at 2 samples/chip
    cfg = acquisition.PcpsConfig(doppler_max_hz=5000.0,
                                 doppler_step_hz=250.0,
                                 coherent_periods=2)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(4092) + 1j * rng.standard_normal(4092)
         ).astype(np.complex64)
    xd = to_device(x)
    codes_d = jnp.asarray(codes)

    iters = 16

    @jax.jit
    def run(xd):
        def body(i, carry):
            x, acc = carry
            grid = acquisition.pcps_grid(x, codes_d, fs, cfg)
            s = jnp.sum(grid)
            # serial dependency: perturb the input by the result
            return x * (1.0 + 1e-12 * s), acc + s

        _, acc = lax.fori_loop(0, iters, body,
                               (xd, jnp.asarray(0.0, jnp.float32)))
        return acc.astype(jnp.float32)

    dt = _timed_scalar(run, xd)
    n_dopp = int(2 * cfg.doppler_max_hz / cfg.doppler_step_hz) + 1
    # a "correlation" = one (PRN, Doppler, code-phase) lag point
    return iters * n_prn * n_dopp * 2046 / dt


def bench_channel():
    """AWGN channel apply throughput (channel.rs:667)."""
    from r4w_tpu.channel import awgn

    n, iters = 1 << 18, 64
    rng = np.random.default_rng(8)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)

    @jax.jit
    def run(re, im, key):
        v = lax.complex(re, im)

        def body(i, carry):
            v, key = carry
            key, sub = jax.random.split(key)
            v = awgn(sub, v, 20.0)
            return v, key

        v, _ = lax.fori_loop(0, iters, body, (v, jax.random.key(0)))
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im, jax.random.key(0))
    return n * iters / dt


# GNU Radio baselines from gnuradio_comparison.rs:41-66 (Msamples/s)
GR_BASELINES = {
    "fft1024": 50.0, "fft4096": 12.0, "fir32": 80.0, "fir128": 25.0,
    "rotator": 100.0, "cmul": 200.0, "bpsk_mod": 20.0,
}


def run_suite() -> dict:
    """Full regression suite; values in Msamples/s (or M units/s)."""
    suite = {}

    def add(name, fn):
        try:
            sps = fn()
            entry = {"Msps": round(sps / 1e6, 1)}
            if name in GR_BASELINES:
                entry["vs_gnuradio"] = round(sps / 1e6 / GR_BASELINES[name], 1)
            suite[name] = entry
        except Exception as e:  # record, don't kill the bench line
            suite[name] = {"error": f"{type(e).__name__}: {e}"[:120]}
            time.sleep(20)  # axon wedges cross-call after a failure

    add("fft4096", bench_fft4096)
    add("fir32", lambda: bench_fir(32))
    add("fir128", lambda: bench_fir(128))
    add("rotator", bench_rotator)
    add("cmul", bench_cmul)
    add("bpsk_mod", bench_bpsk_mod)
    add("viterbi_info_bits", bench_viterbi)
    add("pcps_corr", bench_pcps)
    add("channel_awgn", bench_channel)
    return suite


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
    suite = run_suite()
    msps = fft_sps / 1e6
    suite["fft1024"] = {"Msps": round(msps, 1),
                        "vs_gnuradio": round(msps / GR_BASELINES["fft1024"],
                                             1)}
    print(
        json.dumps(
            {
                "metric": "fft1024_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / BASELINE_FFT1024_MSPS, 2),
                "extra": {
                    "lora_sf7_demod_Msps": round(lora_sps / 1e6, 1),
                    "suite": suite,
                    "device": str(jax.devices()[0]) + device_note,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
