"""Synchronization ops: carrier/timing recovery, CFO, frame detection.

Re-designs of the reference's flat sync blocks (costas_loop.rs, pll.rs,
gardner_ted.rs, mueller_muller_ted.rs, cfo_estimator.rs,
cfo_corrector.rs, correlate_sync.rs, frame_sync.rs,
ofdm_sync_schmidl_cox.rs). Feedback loops are inherently sequential →
`lax.scan` with carried loop state (SURVEY.md §7 hard part (b));
feed-forward estimators (CFO, Schmidl-Cox, correlation sync) are fully
batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


# --------------------------------------------------------------------------
# Feed-forward CFO estimation / correction
# --------------------------------------------------------------------------


def cfo_estimate(x, sample_rate, order: int = 1, method: str = "fft"):
    """Blind CFO estimate from x^order (cfo_estimator.rs re-design).

    order=2 for BPSK, 4 for QPSK removes the modulation. method="fft"
    locates the spectral line of x^order with quadratic peak
    interpolation — robust to pulse shaping (the reference's plain
    phase-difference method, kept as method="phase", is biased by the
    amplitude nulls of shaped transitions).
    """
    x = jnp.asarray(x, IQ_DTYPE)
    v = x**order if order > 1 else x
    if method == "phase":
        d = v[..., 1:] * jnp.conj(v[..., :-1])
        step = jnp.angle(jnp.sum(d, axis=-1)) / order
        return step * sample_rate / (2.0 * jnp.pi)
    from r4w_tpu.core.fftops import find_peak_interpolated
    from r4w_tpu.core.types import next_pow2

    n = next_pow2(v.shape[-1])
    spec = jnp.fft.fft(v, n=n, axis=-1)
    frac_idx, _ = find_peak_interpolated(spec)
    # map bin to signed frequency
    freq = frac_idx / n
    freq = jnp.where(freq > 0.5, freq - 1.0, freq)
    return freq * sample_rate / order


def cfo_correct(x, cfo_hz, sample_rate, phase0=0.0):
    """Rotate out a known CFO (cfo_corrector.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    ph = phase0 - 2.0 * jnp.pi * cfo_hz / sample_rate * jnp.arange(
        n, dtype=REAL_DTYPE
    )
    return x * jnp.exp(1j * ph.astype(REAL_DTYPE))


# --------------------------------------------------------------------------
# Costas loop / PLL (lax.scan recurrences)
# --------------------------------------------------------------------------


class LoopOut(NamedTuple):
    y: jax.Array          # corrected samples
    freq: jax.Array       # per-sample loop frequency (rad/sample)
    phase: jax.Array      # final phase
    freq_final: jax.Array


def costas_loop(x, loop_bw: float = 0.01, order: int = 2,
                phase0=0.0, freq0=0.0) -> LoopOut:
    """Costas carrier recovery for BPSK(2)/QPSK(4) (costas_loop.rs).

    Standard 2nd-order loop with damping 0.707; error from the
    decision-directed cross product.
    """
    x = jnp.asarray(x, IQ_DTYPE)
    zeta = 0.7071
    denom = 1.0 + 2.0 * zeta * loop_bw + loop_bw * loop_bw
    alpha = 4.0 * zeta * loop_bw / denom
    beta = 4.0 * loop_bw * loop_bw / denom

    def err(v):
        if order == 2:
            return jnp.sign(v.real) * v.imag
        return (jnp.sign(v.real) * v.imag - jnp.sign(v.imag) * v.real)

    def step(carry, xn):
        phase, freq = carry
        v = xn * jnp.exp(-1j * phase.astype(REAL_DTYPE))
        e = err(v)
        freq = freq + beta * e
        phase = phase + freq + alpha * e
        return (phase, freq), (v, freq)

    (phase, freq), (y, freqs) = lax.scan(
        step,
        (jnp.asarray(phase0, REAL_DTYPE), jnp.asarray(freq0, REAL_DTYPE)),
        jnp.moveaxis(x, -1, 0),
    )
    return LoopOut(jnp.moveaxis(y, 0, -1), jnp.moveaxis(freqs, 0, -1),
                   phase, freq)


def pll_track_tone(x, loop_bw: float = 0.02, phase0=0.0, freq0=0.0) -> LoopOut:
    """PLL locking to a complex tone (pll.rs): error = angle of rotated
    sample."""
    x = jnp.asarray(x, IQ_DTYPE)
    zeta = 0.7071
    denom = 1.0 + 2.0 * zeta * loop_bw + loop_bw * loop_bw
    alpha = 4.0 * zeta * loop_bw / denom
    beta = 4.0 * loop_bw * loop_bw / denom

    def step(carry, xn):
        phase, freq = carry
        v = xn * jnp.exp(-1j * phase.astype(REAL_DTYPE))
        e = jnp.angle(v)
        freq = freq + beta * e
        phase = phase + freq + alpha * e
        return (phase, freq), (v, freq)

    (phase, freq), (y, freqs) = lax.scan(
        step,
        (jnp.asarray(phase0, REAL_DTYPE), jnp.asarray(freq0, REAL_DTYPE)),
        jnp.moveaxis(x, -1, 0),
    )
    return LoopOut(jnp.moveaxis(y, 0, -1), jnp.moveaxis(freqs, 0, -1),
                   phase, freq)


# --------------------------------------------------------------------------
# Timing error detectors (per-symbol decision-aided recurrences)
# --------------------------------------------------------------------------


def gardner_ted(x, sps: int):
    """Gardner timing error per symbol (gardner_ted.rs), non-data-aided.

    e[k] = Re{ (x[k] - x[k-1]) * conj(x[k-1/2]) } on 2x-or-more
    oversampled input; returned as a per-symbol error sequence for a
    downstream loop (feed-forward evaluation, batched).
    """
    x = jnp.asarray(x, IQ_DTYPE)
    s = x.shape[-1] // sps
    strobes = x[..., : s * sps : sps]
    mid = x[..., sps // 2 : s * sps : sps]
    mid = mid[..., : strobes.shape[-1] - 1]
    d = strobes[..., 1:] - strobes[..., :-1]
    return (d * jnp.conj(mid)).real


def mueller_muller_ted(x, sps: int):
    """Mueller & Müller TED (mueller_muller_ted.rs), decision-directed
    with sign decisions."""
    x = jnp.asarray(x, IQ_DTYPE)
    s = x.shape[-1] // sps
    y = x[..., : s * sps : sps]
    a = jnp.sign(y.real) + 1j * jnp.sign(y.imag)
    e = (a[..., :-1] * jnp.conj(y[..., 1:])).real - (
        a[..., 1:] * jnp.conj(y[..., :-1])
    ).real
    return e


def early_late_gate(x, sps: int):
    """Early-late gate error (early_late_gate.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    s = x.shape[-1] // sps - 1
    on = jnp.abs(x[..., sps // 2 : sps // 2 + s * sps : sps])
    early = jnp.abs(x[..., sps // 2 - 1 : sps // 2 - 1 + s * sps : sps])
    late = jnp.abs(x[..., sps // 2 + 1 : sps // 2 + 1 + s * sps : sps])
    return (late - early) * on


def best_timing_offset(x, sps: int):
    """Feed-forward max-energy timing search: pick the strobe offset with
    the largest mean symbol power (clock_recovery.rs replacement —
    batch-first instead of a feedback loop)."""
    x = jnp.asarray(x, IQ_DTYPE)
    s = x.shape[-1] // sps
    trimmed = x[..., : s * sps].reshape(*x.shape[:-1], s, sps)
    power = jnp.mean(trimmed.real**2 + trimmed.imag**2, axis=-2)  # (sps,)
    return jnp.argmax(power, axis=-1)


# --------------------------------------------------------------------------
# Frame / preamble detection
# --------------------------------------------------------------------------


def correlate_sync(x, preamble, threshold: float = 0.7):
    """Normalized cross-correlation peak search (correlate_sync.rs,
    frame_sync.rs). Returns (best_offset, peak_metric, metric_series).

    metric[n] = |<x[n:n+L], p>| / (||x[n:n+L]|| · ||p||)
    """
    x = jnp.asarray(x, IQ_DTYPE)
    p = jnp.asarray(preamble, IQ_DTYPE)
    l = p.shape[-1]
    n_off = x.shape[-1] - l + 1
    idx = jnp.arange(n_off)[:, None] + jnp.arange(l)[None, :]
    windows = x[..., idx]  # (..., n_off, L)
    num = jnp.abs(jnp.einsum("...ol,l->...o", windows, jnp.conj(p)))
    den = jnp.sqrt(
        jnp.sum(windows.real**2 + windows.imag**2, axis=-1)
        * jnp.sum(p.real**2 + p.imag**2)
    )
    metric = num / jnp.maximum(den, 1e-12)
    best = jnp.argmax(metric, axis=-1)
    peak = jnp.max(metric, axis=-1)
    return best, peak, metric


def schmidl_cox(x, half_len: int):
    """Schmidl-Cox OFDM timing metric (ofdm_sync_schmidl_cox.rs).

    For a preamble with two identical halves of length L:
      P[d] = Σ_{m<L} conj(x[d+m])·x[d+m+L],  R[d] = Σ |x[d+m+L]|²,
      M[d] = |P|²/R². Returns (d_max, M, P) batched.
    """
    x = jnp.asarray(x, IQ_DTYPE)
    l = half_len
    n = x.shape[-1] - 2 * l + 1
    if n <= 0:
        z = jnp.zeros(x.shape[:-1] + (0,), REAL_DTYPE)
        return jnp.zeros(x.shape[:-1], jnp.int32), z, z
    prod = jnp.conj(x[..., : x.shape[-1] - l]) * x[..., l:]
    power = x[..., l:].real ** 2 + x[..., l:].imag ** 2
    # sliding sums of length l via cumsum
    def sliding(v):
        c = jnp.cumsum(v, axis=-1)
        zero = jnp.zeros_like(c[..., :1])
        c = jnp.concatenate([zero, c], axis=-1)
        return c[..., l:] - c[..., :-l]

    p = sliding(prod)[..., :n]
    r = sliding(power)[..., :n]
    # relative power floor: quiet regions (R≈0) would otherwise produce
    # spurious M spikes from 0/0
    floor = 0.05 * jnp.max(r, axis=-1, keepdims=True)
    m = (jnp.abs(p) ** 2) / jnp.maximum(r, floor) ** 2
    return jnp.argmax(m, axis=-1), m, p
