"""Equalizers: LMS, RLS, CMA, DFE, MMSE/ZF block equalizers.

Re-designs of cma_equalizer.rs, lms_filter.rs, adaptive_filter_rls.rs,
decision_feedback_equalizer.rs, mmse_equalizer.rs,
frequency_domain_equalizer.rs: adaptive loops are `lax.scan`
recurrences over symbols (vectorized across taps and batch); block
equalizers are closed-form linear algebra.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp

from r4w_tpu.core.hostio import zeros_iq
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


class EqOut(NamedTuple):
    y: jax.Array      # equalized symbols
    error: jax.Array  # per-step error magnitude
    taps: jax.Array   # final taps


def _windows(x: jax.Array, n_taps: int) -> jax.Array:
    """(N, taps) sliding windows, newest-first, zero history."""
    x = jnp.asarray(x, IQ_DTYPE)
    pad = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (n_taps - 1,), x.dtype), x], axis=-1
    )
    idx = jnp.arange(x.shape[-1])[:, None] + (
        n_taps - 1 - jnp.arange(n_taps)
    )[None, :]
    return pad[..., idx]


def lms_equalize(x, desired, n_taps: int = 11, mu: float = 0.01,
                 taps0=None) -> EqOut:
    """Data-aided LMS: w += μ·e*·u (lms_filter.rs)."""
    u = _windows(x, n_taps)
    d = jnp.asarray(desired, IQ_DTYPE)
    w0 = (jnp.asarray(taps0, IQ_DTYPE) if taps0 is not None
          else zeros_iq(n_taps).at[0].set(1.0))

    def step(w, ud):
        un, dn = ud
        y = jnp.sum(w * un)
        e = dn - y
        w = w + mu * e * jnp.conj(un)
        return w, (y, jnp.abs(e))

    w, (y, err) = lax.scan(step, w0, (u, d))
    return EqOut(y, err, w)


def rls_equalize(x, desired, n_taps: int = 11, lam: float = 0.99,
                 delta: float = 0.01) -> EqOut:
    """Recursive least squares (adaptive_filter_rls.rs)."""
    u = _windows(x, n_taps)
    d = jnp.asarray(desired, IQ_DTYPE)
    w0 = zeros_iq(n_taps)
    p0 = jnp.eye(n_taps, dtype=IQ_DTYPE) / delta

    def step(carry, ud):
        w, p = carry
        un, dn = ud
        pu = p @ jnp.conj(un)
        k = pu / (lam + jnp.real(un @ pu) + 0j)
        y = jnp.sum(w * un)
        e = dn - y
        w = w + k * e
        p = (p - jnp.outer(k, un @ p)) / lam
        return (w, p), (y, jnp.abs(e))

    (w, _), (y, err) = lax.scan(step, (w0, p0), (u, d))
    return EqOut(y, err, w)


def cma_equalize(x, n_taps: int = 11, mu: float = 0.001,
                 modulus: float = 1.0, taps0=None) -> EqOut:
    """Constant-modulus blind equalizer (cma_equalizer.rs):
    e = y·(R2 − |y|²), w += μ·e*·u."""
    u = _windows(x, n_taps)
    w0 = (jnp.asarray(taps0, IQ_DTYPE) if taps0 is not None
          else zeros_iq(n_taps).at[n_taps // 2].set(1.0))
    r2 = modulus**2

    def step(w, un):
        y = jnp.sum(w * un)
        e = y * (r2 - (y.real**2 + y.imag**2))
        w = w + mu * e * jnp.conj(un)
        return w, (y, jnp.abs(e))

    w, (y, err) = lax.scan(step, w0, u)
    return EqOut(y, err, w)


def dfe_equalize(x, n_ff: int = 7, n_fb: int = 3, mu: float = 0.01,
                 constellation=None) -> EqOut:
    """Decision-feedback equalizer (decision_feedback_equalizer.rs):
    feed-forward on received samples, feedback on past decisions."""
    const = (jnp.asarray(constellation, IQ_DTYPE) if constellation is not None
             else jnp.asarray([1.0 + 0j, -1.0 + 0j]))
    u = _windows(x, n_ff)
    wf0 = zeros_iq(n_ff).at[0].set(1.0)
    wb0 = zeros_iq(n_fb)
    dec0 = zeros_iq(n_fb)

    def slicer(y):
        d = y - const
        return const[jnp.argmin(d.real**2 + d.imag**2)]

    def step(carry, un):
        wf, wb, past = carry
        y = jnp.sum(wf * un) - jnp.sum(wb * past)
        dec = slicer(y)
        e = dec - y
        wf = wf + mu * e * jnp.conj(un)
        wb = wb - mu * e * jnp.conj(past)
        past = jnp.concatenate([dec[None], past[:-1]])
        return (wf, wb, past), (y, jnp.abs(e))

    (wf, wb, _), (y, err) = lax.scan(step, (wf0, wb0, dec0), u)
    return EqOut(y, err, jnp.concatenate([wf, wb]))


def mmse_block_equalize(rx, channel_taps, snr_db: float = 20.0,
                        n_taps: int = 15, delay: int | None = None):
    """Closed-form MMSE linear equalizer for a known channel
    (mmse_equalizer.rs): w = (H^H H + I/γ)^-1 H^H e_d."""
    h = np.asarray(channel_taps, np.complex128)
    lh = len(h)
    n = n_taps
    delay = delay if delay is not None else (n + lh) // 2
    # convolution matrix H: (n + lh - 1, n)
    hm = np.zeros((n + lh - 1, n), np.complex128)
    for i in range(n):
        hm[i : i + lh, i] = h
    gamma = 10.0 ** (snr_db / 10.0)
    r = hm.conj().T @ hm + np.eye(n) / gamma
    e_d = np.zeros(n + lh - 1, np.complex128)
    e_d[delay] = 1.0
    w = np.linalg.solve(r, hm.conj().T @ e_d)
    w_j = jnp.asarray(w.astype(np.complex64))
    # causal FIR: y[n] = Σ_j w[j]·rx[n-j]; output lags syms by `delay`
    windows = _windows(jnp.asarray(rx, IQ_DTYPE), n)  # newest-first
    y = jnp.einsum("...nk,k->...n", windows, w_j)
    return y, w_j


def fde_equalize(rx_blocks, channel_freq, snr_db: float = 20.0):
    """Frequency-domain MMSE equalizer (frequency_domain_equalizer.rs):
    per-bin W = H*/(|H|² + 1/γ), applied to FFT blocks."""
    h = jnp.asarray(channel_freq, IQ_DTYPE)
    gamma = 10.0 ** (snr_db / 10.0)
    w = jnp.conj(h) / (h.real**2 + h.imag**2 + 1.0 / gamma)
    spec = jnp.fft.fft(jnp.asarray(rx_blocks, IQ_DTYPE), axis=-1)
    return jnp.fft.ifft(spec * w, axis=-1)
