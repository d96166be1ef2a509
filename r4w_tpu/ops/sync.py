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

from r4w_tpu.core.hostio import cis, zeros_iq, zeros_like_safe
import numpy as np

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
    return x * cis(ph.astype(REAL_DTYPE))


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
        v = xn * cis(-phase.astype(REAL_DTYPE))
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
        v = xn * cis(-phase.astype(REAL_DTYPE))
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
    a = jax.lax.complex(jnp.sign(y.real), jnp.sign(y.imag))
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
        zero = zeros_like_safe(c[..., :1])
        c = jnp.concatenate([zero, c], axis=-1)
        return c[..., l:] - c[..., :-l]

    p = sliding(prod)[..., :n]
    r = sliding(power)[..., :n]
    # relative power floor: quiet regions (R≈0) would otherwise produce
    # spurious M spikes from 0/0
    floor = 0.05 * jnp.max(r, axis=-1, keepdims=True)
    m = (jnp.abs(p) ** 2) / jnp.maximum(r, floor) ** 2
    return jnp.argmax(m, axis=-1), m, p


# --------------------------------------------------------------- dpll


def dpll_advance(errors, alpha: float, beta: float,
                 max_freq: float = np.pi):
    """Second-order PI phase loop driven by an external error sequence
    (dpll.rs advance): returns (phase (N,), freq (N,)).

    Typical alpha=4*BW, beta=4*BW^2 for critical damping.
    """
    e = jnp.asarray(errors, REAL_DTYPE)

    def step(carry, en):
        phase, freq = carry
        freq = jnp.clip(freq + beta * en, -max_freq, max_freq)
        phase = jnp.mod(phase + freq + alpha * en + np.pi,
                        2 * np.pi) - np.pi
        return (phase, freq), (phase, freq)

    _, (ph, fr) = jax.lax.scan(
        step, (jnp.asarray(0.0, REAL_DTYPE), jnp.asarray(0.0, REAL_DTYPE)),
        e)
    return ph, fr


# ---------------------------------------------------------- FLL band-edge


def _band_edge_taps(sps: float, rolloff: float, num_taps: int):
    """Lowpass prototype of width ~rolloff/sps modulated to the two
    band edges at ±(1+rolloff)/(2·sps) cycles/sample (fll_band_edge.rs
    filter design role)."""
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    bw = rolloff / (2.0 * sps)  # one-sided prototype bandwidth
    proto = np.sinc(2 * bw * n) * np.hamming(num_taps)
    proto /= np.sum(proto)
    fc = (1.0 + rolloff) / (2.0 * sps)
    # the loop computes sum(buffer * taps) with newest sample last, which
    # time-reverses the impulse response — negate the modulation so the
    # "upper" taps really select the +fc band edge
    upper = proto * np.exp(-2j * np.pi * fc * n)
    lower = proto * np.exp(2j * np.pi * fc * n)
    return upper.astype(np.complex64), lower.astype(np.complex64)


def fll_band_edge(x, sps: float, rolloff: float = 0.35,
                  num_taps: int = 45, loop_bw: float = 0.01):
    """Band-edge frequency-locked loop (fll_band_edge.rs): balances
    energy in filters straddling the two spectral band edges; returns
    (corrected, freq_track_rad_per_sample)."""
    x = jnp.asarray(x, IQ_DTYPE)
    up, lo = _band_edge_taps(sps, rolloff, num_taps)
    up = jnp.asarray(up)
    lo = jnp.asarray(lo)
    k = num_taps
    kp = loop_bw
    ki = 0.25 * loop_bw * loop_bw

    def step(carry, xn):
        phase, freq, buf = carry
        xr = xn * cis(-phase)
        buf = jnp.concatenate([buf[1:], xr[None]])
        e_up = jnp.abs(jnp.sum(buf * up)) ** 2
        e_lo = jnp.abs(jnp.sum(buf * lo)) ** 2
        err = jnp.clip((e_lo - e_up) / (e_lo + e_up + 1e-12), -1.0, 1.0)
        freq = jnp.clip(freq - ki * err, -np.pi / 2, np.pi / 2)
        phase = phase + freq - kp * err
        return (phase, freq, buf), (xr, freq)

    buf0 = zeros_iq(k)
    init = (jnp.asarray(0.0, REAL_DTYPE), jnp.asarray(0.0, REAL_DTYPE),
            buf0)
    _, (y, track) = jax.lax.scan(step, init, x)
    return y, track


# ---------------------------------------------------- access code / PN


def access_code_correlate(bits, code):
    """Slide a binary access code over a bit stream; returns the number
    of matching bits at every alignment (access_code_detector.rs).
    bits (..., N) in {0,1}, code (K,) -> (..., N-K+1) match counts."""
    from r4w_tpu.ops.filters import fir_apply

    b = 2.0 * jnp.asarray(bits, REAL_DTYPE) - 1.0
    c = 2.0 * jnp.asarray(code, REAL_DTYPE) - 1.0
    k = c.shape[0]
    # correlation via streaming FIR with reversed taps; fir output y[n]
    # = sum_j taps[j] b[n-j]; taps = c reversed -> y[n] = corr ending at n
    y = fir_apply(c[::-1], b)[..., k - 1:]
    return (y + k) / 2.0  # match count in 0..K


def access_code_detect(bits, code, max_errors: int = 0):
    """Positions where the access code matches within max_errors bit
    flips. Returns a boolean mask over alignments."""
    k = jnp.asarray(code).shape[0]
    return access_code_correlate(bits, code) >= (k - max_errors)


def pn_sync_correlate(received, reference):
    """Circular correlation acquisition of a ±1 PN sequence
    (pn_sync.rs PnSynchronizer::correlate): returns (offset, peak,
    correlation magnitudes). Works on real or complex chips."""
    rx = jnp.asarray(received)
    ref = jnp.asarray(reference, rx.dtype if jnp.iscomplexobj(rx)
                      else REAL_DTYPE)
    n = ref.shape[-1]
    m = rx.shape[-1] // n
    if m >= 1:
        # average code periods coherently for processing gain
        rx_f = jnp.mean(rx[..., : m * n].reshape(*rx.shape[:-1], m, n),
                        axis=-2)
    else:
        rx_f = rx[..., :n]
    corr = jnp.fft.ifft(
        jnp.fft.fft(rx_f.astype(IQ_DTYPE), axis=-1)
        * jnp.conj(jnp.fft.fft(ref.astype(IQ_DTYPE), n)), axis=-1)
    mag = jnp.abs(corr)
    off = jnp.argmax(mag, axis=-1)
    return off, jnp.max(mag, axis=-1) / n, mag / n


def despread_pn(received, reference, offset):
    """Despread with an aligned PN replica (pn_sync.rs despread)."""
    rx = jnp.asarray(received)
    ref = jnp.asarray(reference)
    n = ref.shape[-1]
    ref_rolled = jnp.roll(ref, offset)
    m = rx.shape[-1] // n
    chips = rx[..., : m * n].reshape(*rx.shape[:-1], m, n)
    return jnp.mean(chips * ref_rolled, axis=-1)


# -------------------------------------------------------------- bursts


def burst_detect(x, window: int = 64, threshold_db: float = 10.0):
    """Energy-rise burst detector (burst_synchronizer.rs role): moving
    power vs global noise floor; returns (mask (N,), power_db (N,))."""
    x = jnp.asarray(x, IQ_DTYPE)
    p = x.real**2 + x.imag**2
    kern = jnp.ones(window, REAL_DTYPE) / window
    from r4w_tpu.ops.filters import fir_apply

    avg = fir_apply(kern, p)
    floor = jnp.median(avg) + 1e-20
    power_db = 10.0 * jnp.log10(jnp.maximum(avg, 1e-30) / floor)
    return power_db > threshold_db, power_db


def burst_synchronize(x, preamble, threshold: float = 0.5):
    """Locate a burst by preamble cross-correlation: returns
    (best_start, metric in 0..1, normalized correlation). Fine timing
    companion to burst_detect."""
    x = jnp.asarray(x, IQ_DTYPE)
    p = jnp.asarray(preamble, IQ_DTYPE)
    k = p.shape[-1]
    n = x.shape[-1]
    nfft = int(2 ** np.ceil(np.log2(n + k)))
    corr = jnp.fft.ifft(
        jnp.fft.fft(x, nfft) * jnp.conj(jnp.fft.fft(p, nfft)))[:n - k + 1]
    # normalize by local energy so the metric is |rho| in [0,1]
    e_local = jnp.convolve(x.real**2 + x.imag**2, jnp.ones(k), "full")[
        k - 1: n]
    e_p = jnp.sum(p.real**2 + p.imag**2)
    rho = jnp.abs(corr) / jnp.sqrt(jnp.maximum(e_local * e_p, 1e-30))
    best = jnp.argmax(rho)
    return best, rho[best], rho
