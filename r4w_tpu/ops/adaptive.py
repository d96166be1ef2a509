"""Adaptive & estimation filters (wiener_filter.rs, savitzky_golay.rs,
lattice_filter.rs, comb_filter.rs, adaptive_notch.rs, volterra_filter.rs,
lms_filter.rs, adaptive_filter_rls.rs, filters/adaptive.rs,
fft_filter.rs re-designs).

Batch-first: block algorithms (Wiener, Savitzky-Golay, comb-FIR,
overlap-save, Volterra memory polynomial) are fully vectorized; sample
recurrences (LMS/RLS adaptation, lattice, adaptive notch) ride one
`lax.scan` and vmap across channels for throughput. The IIR comb uses a
polyphase split: delay-K feedback is K independent single-pole
recursions, so the scan is K-wide instead of scalar.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import zeros_like_safe
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


# ------------------------------------------------------------- Wiener


def wiener_filter(x, noise_power: float, nfft: int = 256):
    """Block frequency-domain Wiener denoiser (wiener_filter.rs role).

    Estimates per-bin signal power from the noisy periodogram and applies
    the gain max(Sxx - N0, 0) / Sxx segment by segment (overlapless).
    """
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    nseg = n // nfft
    segs = x[..., : nseg * nfft].reshape(*x.shape[:-1], nseg, nfft)
    spec = jnp.fft.fft(segs, axis=-1)
    pxx = jnp.abs(spec) ** 2 / nfft
    gain = jnp.maximum(pxx - noise_power, 0.0) / jnp.maximum(pxx, 1e-30)
    y = jnp.fft.ifft(spec * gain, axis=-1)
    y = y.reshape(*x.shape[:-1], nseg * nfft)
    return jnp.concatenate([y, x[..., nseg * nfft:]], axis=-1).astype(IQ_DTYPE)


# ------------------------------------------------------- Savitzky-Golay


def savitzky_golay_taps(window: int, polyorder: int,
                        deriv: int = 0) -> np.ndarray:
    """Least-squares polynomial smoothing taps (savitzky_golay.rs design).

    Host-side design (numpy float64), apply with filters.fir_apply.
    """
    if window % 2 == 0 or window < 1:
        raise ValueError("window must be odd and positive")
    if polyorder >= window:
        raise ValueError("polyorder must be < window")
    half = window // 2
    a = np.vander(np.arange(-half, half + 1, dtype=np.float64),
                  polyorder + 1, increasing=True)
    # pseudo-inverse row `deriv` evaluated at the window center
    taps = np.linalg.pinv(a)[deriv] * math.factorial(deriv)
    return taps[::-1].copy()  # convolution orientation


def savgol_smooth(x, window: int = 11, polyorder: int = 3):
    """Same-length Savitzky-Golay smoothing (edge samples passthrough)."""
    from r4w_tpu.ops.filters import fir_apply

    taps = jnp.asarray(savitzky_golay_taps(window, polyorder), REAL_DTYPE)
    x = jnp.asarray(x)
    half = window // 2
    if jnp.iscomplexobj(x):
        y = jax.lax.complex(fir_apply(taps, x.real),
                            fir_apply(taps, x.imag))
    else:
        y = fir_apply(taps, x)
    # streaming FIR alignment: centered output for x[n] sits at y[n+half]
    return jnp.concatenate(
        [x[..., :half], y[..., 2 * half:], x[..., -half:]], axis=-1)


# ------------------------------------------------------------- lattice


def lattice_filter(reflection, x):
    """All-zero (FIR) lattice with reflection coefficients k (M,)
    (lattice_filter.rs forward path). Returns the order-M forward
    prediction error sequence."""
    k = jnp.asarray(reflection, REAL_DTYPE)
    x = jnp.asarray(x, REAL_DTYPE)

    def step(b_prev, xn):
        # b_prev: backward errors of stages 0..M-1 from the previous sample
        def stage(f_in, km_bm):
            km, bm = km_bm
            f_out = f_in + km * bm
            b_out = bm + km * f_in
            return f_out, b_out

        f_final, b_outs = jax.lax.scan(stage, xn, (k, b_prev))
        # new backward-error pipeline: stage m at time n uses b_{m-1}(n-1)
        b_next = jnp.concatenate([xn[None], b_outs[:-1]])
        return b_next, f_final

    b0 = jnp.zeros(k.shape[0], REAL_DTYPE)
    _, y = jax.lax.scan(step, b0, x)
    return y


def lattice_from_lpc(a) -> np.ndarray:
    """LPC polynomial (1, a1..aM) -> reflection coefficients via the
    reverse Levinson recursion (lattice_filter.rs design helper)."""
    a = np.asarray(a, np.float64)
    if a[0] != 1.0:
        a = a / a[0]
    coeffs = a[1:].copy()
    m = len(coeffs)
    k = np.zeros(m)
    for i in range(m - 1, -1, -1):
        k[i] = coeffs[i]
        if i > 0:
            denom = 1.0 - k[i] ** 2
            coeffs = (coeffs[:i] - k[i] * coeffs[i - 1::-1]) / denom
    return k


# ---------------------------------------------------------------- comb


def comb_feedforward(x, delay: int, alpha: float = -1.0):
    """FIR comb y[n] = x[n] + alpha x[n-K]: notches at odd (alpha=-1) or
    nulls between (alpha=+1) multiples of fs/K (comb_filter.rs)."""
    x = jnp.asarray(x)
    pad = jnp.zeros((*x.shape[:-1], delay), x.dtype)
    xd = jnp.concatenate([pad, x[..., :-delay]], axis=-1)
    return x + alpha * xd


def comb_feedback(x, delay: int, alpha: float = 0.8):
    """IIR comb y[n] = x[n] + alpha y[n-K], polyphase-split so the scan
    carries K lanes at once (resonator at multiples of fs/K)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    k = delay
    npad = (-n) % k
    xp = jnp.concatenate(
        [x, jnp.zeros((*x.shape[:-1], npad), x.dtype)], axis=-1)
    lanes = xp.reshape(*x.shape[:-1], -1, k)  # (..., M, K)

    def step(y_prev, xm):
        y = xm + alpha * y_prev
        return y, y

    lanes_t = jnp.moveaxis(lanes, -2, 0)  # (M, ..., K)
    _, ys = jax.lax.scan(step, zeros_like_safe(lanes_t[0]), lanes_t)
    y = jnp.moveaxis(ys, 0, -2).reshape(*xp.shape)
    return y[..., :n]


# ------------------------------------------------------- adaptive notch


def adaptive_notch(x, num_taps: int = 32, mu: float = 0.02,
                   delay: int = 1):
    """Remove narrowband interferers of unknown frequency via an adaptive
    line enhancer (adaptive_notch.rs role): LMS-predict x[n] from
    x[n-delay...]; the prediction captures the tones, the error is the
    notched broadband residual. Returns (residual, narrowband_estimate)."""
    x = jnp.asarray(x, IQ_DTYPE)
    xd = jnp.concatenate(
        [jnp.zeros((*x.shape[:-1], delay), x.dtype), x[..., :-delay]],
        axis=-1)
    y, e, _ = lms_filter(xd, x, num_taps, mu)
    return e, y


# --------------------------------------------------------------- LMS/RLS


def lms_filter(x, desired, num_taps: int, mu: float = 0.01):
    """Adaptive FIR system identification (lms_filter.rs): adapt w so
    w*x tracks `desired`. Returns (y, err, final_weights)."""
    x = jnp.asarray(x)
    d = jnp.asarray(desired)
    cplx = jnp.iscomplexobj(x) or jnp.iscomplexobj(d)
    dt = IQ_DTYPE if cplx else REAL_DTYPE
    x = x.astype(dt)
    d = d.astype(dt)

    def step(carry, xd):
        w, buf = carry
        xn, dn = xd
        buf = jnp.concatenate([xn[None], buf[:-1]])
        y = jnp.vdot(w, buf)  # w^H u
        e = dn - y
        # NLMS step: grad of |e|^2 wrt w* is -u e*
        w = w + mu * jnp.conj(e) * buf / (
            1e-9 + jnp.vdot(buf, buf).real)
        return (w, buf), (y, e)

    w0 = jnp.zeros(num_taps, dt)
    buf0 = jnp.zeros(num_taps, dt)
    (w, _), (y, e) = jax.lax.scan(step, (w0, buf0), (x, d))
    return y, e, w


def rls_filter(x, desired, num_taps: int, lam: float = 0.99,
               delta: float = 100.0):
    """Recursive least squares adaptation (adaptive_filter_rls.rs)."""
    x = jnp.asarray(x)
    d = jnp.asarray(desired)
    cplx = jnp.iscomplexobj(x) or jnp.iscomplexobj(d)
    dt = IQ_DTYPE if cplx else REAL_DTYPE
    x = x.astype(dt)
    d = d.astype(dt)

    def step(carry, xd):
        w, p, buf = carry
        xn, dn = xd
        buf = jnp.concatenate([xn[None], buf[:-1]])
        pi = p @ buf
        k = pi / (lam + jnp.vdot(buf, pi).real)
        y = jnp.vdot(w, buf)  # w^H u, pre-update
        e = dn - y
        w = w + k * jnp.conj(e)
        p = (p - jnp.outer(k, jnp.conj(buf)) @ p) / lam
        return (w, p, buf), (y, e)

    w0 = jnp.zeros(num_taps, dt)
    p0 = delta * jnp.eye(num_taps, dtype=dt)
    buf0 = jnp.zeros(num_taps, dt)
    (w, _, _), (y, e) = jax.lax.scan(step, (w0, p0, buf0), (x, d))
    return y, e, w


# ------------------------------------------------- Volterra / DPD


def memory_polynomial_apply(coeffs, x, orders=(1, 3, 5)):
    """Diagonal-Volterra memory polynomial PA/DPD model
    (volterra_filter.rs MemoryPolynomial::process):
    y[n] = sum_k sum_m c[k,m] x[n-m] |x[n-m]|^(order_k - 1).
    coeffs (K, M) complex; fully vectorized via frame gather + einsum.
    """
    c = jnp.asarray(coeffs, IQ_DTYPE)
    x = jnp.asarray(x, IQ_DTYPE)
    korders = jnp.asarray(orders, REAL_DTYPE)
    m = c.shape[1]
    xp = jnp.concatenate([jnp.zeros((*x.shape[:-1], m - 1), x.dtype), x],
                         axis=-1)
    idx = jnp.arange(x.shape[-1])[:, None] + (m - 1 - jnp.arange(m))[None, :]
    frames = xp[..., idx]  # (..., N, M) delayed copies
    env = jnp.abs(frames)
    basis = frames[..., None, :] * (
        env[..., None, :] ** (korders[:, None] - 1.0))  # (..., N, K, M)
    return jnp.einsum("...nkm,km->...n", basis, c)


def identify_memory_polynomial(x, y, memory: int = 3, orders=(1, 3, 5)):
    """Least-squares PA model extraction (volterra_filter.rs:508)."""
    x = jnp.asarray(x, IQ_DTYPE).reshape(-1)
    y = jnp.asarray(y, IQ_DTYPE).reshape(-1)
    korders = np.asarray(orders, np.float64)
    m = memory
    xp = jnp.concatenate([jnp.zeros(m - 1, x.dtype), x])
    idx = jnp.arange(x.shape[0])[:, None] + (m - 1 - jnp.arange(m))[None, :]
    frames = xp[idx]
    env = jnp.abs(frames)
    cols = [frames * env ** (k - 1.0) for k in korders]
    a = jnp.concatenate(cols, axis=1)  # (N, K*M)
    sol, *_ = jnp.linalg.lstsq(a, y)
    return sol.reshape(len(orders), m)


def nmse_db(reference, test) -> jax.Array:
    """Normalized mean-square error in dB (volterra_filter.rs:634)."""
    r = jnp.asarray(reference).reshape(-1)
    t = jnp.asarray(test).reshape(-1)
    num = jnp.sum(jnp.abs(t - r) ** 2)
    den = jnp.maximum(jnp.sum(jnp.abs(r) ** 2), 1e-30)
    return 10.0 * jnp.log10(jnp.maximum(num / den, 1e-30))


def am_am_curve(x, y, num_bins: int = 32):
    """Mean output amplitude vs input amplitude (volterra_filter.rs:694)."""
    xin = jnp.abs(jnp.asarray(x).reshape(-1))
    yout = jnp.abs(jnp.asarray(y).reshape(-1))
    edges = jnp.linspace(0.0, jnp.max(xin) + 1e-9, num_bins + 1)
    which = jnp.clip(jnp.searchsorted(edges, xin) - 1, 0, num_bins - 1)
    sums = jnp.zeros(num_bins).at[which].add(yout)
    cnts = jnp.zeros(num_bins).at[which].add(1.0)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, sums / jnp.maximum(cnts, 1.0)


# ------------------------------------------------------ overlap-save


def fft_filter(taps, x, nfft: int | None = None):
    """Overlap-save fast convolution (fft_filter.rs; 'same' length as
    streaming FIR with zero initial state). Efficient for long taps."""
    taps = jnp.asarray(taps)
    x = jnp.asarray(x)
    cplx = jnp.iscomplexobj(x) or jnp.iscomplexobj(taps)
    k = taps.shape[0]
    n = x.shape[-1]
    if nfft is None:
        nfft = max(64, 1 << int(np.ceil(np.log2(4 * k))))
    hop = nfft - (k - 1)
    nblocks = -(-n // hop)
    pad_front = k - 1
    pad_back = nblocks * hop - n
    xp = jnp.concatenate(
        [jnp.zeros((*x.shape[:-1], pad_front), x.dtype), x,
         jnp.zeros((*x.shape[:-1], pad_back), x.dtype)], axis=-1)
    idx = jnp.arange(nblocks)[:, None] * hop + jnp.arange(nfft)[None, :]
    blocks = xp[..., idx]  # (..., B, nfft)
    hf = jnp.fft.fft(taps.astype(IQ_DTYPE), nfft)
    yb = jnp.fft.ifft(jnp.fft.fft(blocks.astype(IQ_DTYPE), axis=-1) * hf,
                      axis=-1)[..., k - 1:]
    y = yb.reshape(*x.shape[:-1], nblocks * hop)[..., :n]
    return y if cplx else y.real.astype(REAL_DTYPE)
