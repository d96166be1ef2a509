"""Equalizers: LMS, RLS, CMA, DFE, MMSE/ZF block equalizers.

Re-designs of equalizer.rs (the generic block),
cma_equalizer.rs, lms_filter.rs, adaptive_filter_rls.rs,
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


# --------------------------------------------------------------------------
# Time-domain adaptive equalizer with train / decision-directed modes
# (time_domain_equalizer.rs re-design)
# --------------------------------------------------------------------------


def nearest_point(y, constellation):
    """Slice (...,) symbols to the nearest constellation point
    (time_domain_equalizer.rs:126 nearest_qam_point)."""
    c = jnp.asarray(constellation, IQ_DTYPE)
    d = y[..., None] - c
    idx = jnp.argmin(d.real**2 + d.imag**2, axis=-1)
    return c[idx]


def time_domain_equalizer(x, n_taps: int = 11, algorithm: str = "lms",
                          mu: float = 0.01, lam: float = 0.99,
                          reference=None, constellation=None,
                          train_len: int | None = None) -> EqOut:
    """Adaptive FIR equalizer over time samples with an optional training
    phase followed by decision-directed adaptation
    (time_domain_equalizer.rs:149 TimeDomainEqualizer: Training /
    DecisionDirected modes, LMS/NLMS/RLS algorithms).

    x: (N,) received symbols. reference: known symbols for training
    (length defines the training span unless train_len is given).
    constellation: slicer points for the decision-directed phase; when
    None, adaptation stops after training (weights frozen).
    """
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    wins = _windows(x, n_taps)  # (N, K) newest-first
    center = jnp.zeros(n_taps, IQ_DTYPE).at[n_taps // 2].set(1.0)

    if reference is not None:
        ref = jnp.asarray(reference, IQ_DTYPE)
        t_len = int(train_len if train_len is not None else ref.shape[-1])
        if algorithm == "rls":
            trained = rls_equalize(x[:t_len], ref[:t_len], n_taps, lam)
        else:
            trained = lms_equalize(x[:t_len], ref[:t_len], n_taps, mu)
        w0 = trained.taps
        train_y, train_err = trained.y, trained.error
    else:
        t_len = 0
        w0 = center
        train_y = zeros_iq((0,))
        train_err = jnp.zeros((0,), REAL_DTYPE)

    rest = wins[t_len:]
    if constellation is None:
        y2 = jnp.einsum("nk,k->n", rest, w0)
        err2 = jnp.zeros(y2.shape, REAL_DTYPE)
        w_fin = w0
    else:
        c = jnp.asarray(constellation, IQ_DTYPE)

        def dd_step(w, u):
            y = jnp.sum(w * u)
            d = nearest_point(y, c)
            e = d - y
            if algorithm == "nlms":
                norm = jnp.sum(u.real**2 + u.imag**2) + 1e-12
                w = w + mu / norm * e * jnp.conj(u)
            else:
                w = w + mu * e * jnp.conj(u)
            return w, (y, jnp.abs(e))

        w_fin, (y2, err2) = lax.scan(dd_step, w0, rest)

    return EqOut(
        y=jnp.concatenate([train_y, y2]),
        error=jnp.concatenate([train_err, err2]),
        taps=w_fin,
    )


# --------------------------------------------------------------------------
# Turbo equalizer: frequency-domain soft-IC MMSE + max-log BCJR
# (turbo_equalizer.rs re-design)
# --------------------------------------------------------------------------


def turbo_equalizer_tx(bits, interleaver=None):
    """Encode info bits for the turbo-equalized link: rate-1/2 RSC
    (systematic + parity multiplexed), interleaved, BPSK-mapped.

    Returns (x (2N,) complex BPSK, coded (2N,) bits, pi (2N,)).
    """
    from r4w_tpu.fec.turbo import default_interleaver, rsc_encode

    bits = np.asarray(bits, np.int32)
    par, _ = rsc_encode(bits)
    coded = np.empty(2 * len(bits), np.int32)
    coded[0::2] = bits
    coded[1::2] = par
    pi = (np.asarray(interleaver, np.int64) if interleaver is not None
          else default_interleaver(len(coded), seed=11))
    x = (1.0 - 2.0 * coded[pi]).astype(np.complex64)
    return jnp.asarray(x), coded, pi


def turbo_equalize(rx, channel_taps, interleaver, noise_var,
                   n_iters: int = 4):
    """Iterative (turbo) equalization of a BPSK RSC-coded burst over a
    known ISI channel (turbo_equalizer.rs:103 TurboEqualizer with
    EqualizerType::MmseLinear + convolutional decoder).

    Per iteration: frequency-domain soft-interference-cancellation MMSE
    (priors → symbol means/variances → extrinsic symbol LLRs), then a
    max-log BCJR over the RSC trellis whose systematic extrinsic feeds
    the next equalization pass. Parity positions re-enter with zero
    prior — the standard simplification.

    rx: (M,) received burst (M = 2·n_info, circular-prefix-free block:
    the FD model is circular, so pass a burst with a cyclic prefix
    stripped, or accept edge leakage for M >> len(h)).
    Returns (hard_info_bits, iteration_ber_proxy list).
    """
    from r4w_tpu.fec.turbo import _bcjr_maxlog

    rx = jnp.asarray(rx, IQ_DTYPE)
    m = rx.shape[-1]
    pi = jnp.asarray(np.asarray(interleaver, np.int64))
    inv = jnp.zeros_like(pi).at[pi].set(jnp.arange(m))
    h_f = jnp.fft.fft(jnp.asarray(channel_taps, IQ_DTYPE), n=m)
    h2 = h_f.real**2 + h_f.imag**2
    rx_f = jnp.fft.fft(rx)
    sigma2 = jnp.asarray(noise_var, REAL_DTYPE)

    la = jnp.zeros((m,), REAL_DTYPE)  # prior LLRs on interleaved coded bits
    ext_sys = None
    llr_sys = llr_par = None
    for _ in range(n_iters):
        # prior symbol statistics (BPSK: mean = tanh(La/2), var = 1-mean²)
        xbar = jnp.tanh(jnp.clip(la, -30.0, 30.0) / 2.0).astype(IQ_DTYPE)
        vbar = jnp.mean(1.0 - (xbar.real**2))
        # FD soft-IC MMSE: x̂ = x̄ + F⁻¹[ H*/(|H|²v̄+σ²) · (RX − H·X̄) ]
        denom = h2 * vbar + sigma2
        resid_f = rx_f - h_f * jnp.fft.fft(xbar)
        xhat = xbar + jnp.fft.ifft(jnp.conj(h_f) / denom * resid_f)
        mu_eq = jnp.mean(h2 / denom)
        # extrinsic symbol LLR (bit 0 ↔ +1): Le = 2·Re{x̂}/(1−μ·v̄)
        le = 2.0 * xhat.real / jnp.maximum(1.0 - mu_eq * vbar, 1e-6)
        le_coded = le[inv]  # deinterleave to coded order
        llr_sys = le_coded[0::2]
        llr_par = le_coded[1::2]
        ext_sys = _bcjr_maxlog(llr_sys, llr_par, jnp.zeros_like(llr_sys))
        la_coded = jnp.zeros((m,), REAL_DTYPE).at[0::2].set(ext_sys)
        la = la_coded[pi]
    post = llr_sys + ext_sys
    return (post < 0).astype(jnp.int32), post


def mlse_equalize(y, channel_taps, constellation):
    """Maximum-likelihood sequence estimation over the ISI trellis
    (sequential_detection_mlse.rs role): Viterbi with M^(L-1) states
    where L = len(channel_taps), branch metric
    |y[n] − Σ_k h[k]·s[n−k]|².

    y: (..., N) received symbols (symbol-spaced); channel_taps: (L,)
    complex (h[0] = cursor); constellation: (M,) points. Returns
    decided constellation indices (..., N). Optimal for channels where
    linear/DFE equalizers are noise-enhancing or error-propagating;
    state count M^(L-1) must stay small (QPSK, L≤5 → ≤256 states).

    One lax.scan add-compare-select over time + a reverse traceback —
    the same batched trellis pattern as fec.convolutional.
    """
    import numpy as _np

    y = jnp.asarray(y, IQ_DTYPE)
    h = _np.asarray(channel_taps, _np.complex64)
    con = _np.asarray(constellation, _np.complex64)
    m = len(con)
    l = len(h)
    n_states = m ** (l - 1) if l > 1 else 1
    if n_states * m > 65536:
        raise ValueError(f"MLSE trellis too large: {n_states}x{m}")

    # state encodes the last (L-1) symbols, newest in the low digit.
    # transition (state, new_symbol a) -> emitted = h0·a + Σ h_k·s_k
    emit = _np.zeros((n_states, m), _np.complex64)
    next_state = _np.zeros((n_states, m), _np.int32)
    for s in range(n_states):
        digits = []
        tmp = s
        for _ in range(l - 1):
            digits.append(tmp % m)  # digits[k] = symbol at delay k+1
            tmp //= m
        for a in range(m):
            acc = h[0] * con[a]
            for k, d in enumerate(digits):
                acc += h[k + 1] * con[d]
            emit[s, a] = acc
            next_state[s, a] = (s * m + a) % n_states if l > 1 else 0

    emit_j = jnp.asarray(emit)
    next_j = jnp.asarray(next_state)

    # predecessor table: states whose next is s', and the input symbol
    prev_state = _np.zeros((n_states, m), _np.int32)
    prev_sym = _np.zeros((n_states, m), _np.int32)
    fill: list[list] = [[] for _ in range(n_states)]
    for s in range(n_states):
        for a in range(m):
            fill[next_state[s, a]].append((s, a))
    for sp in range(n_states):
        for j, (s, a) in enumerate(fill[sp]):
            prev_state[sp, j] = s
            prev_sym[sp, j] = a
    prev_state_j = jnp.asarray(prev_state)
    prev_sym_j = jnp.asarray(prev_sym)

    init = jnp.zeros(y.shape[:-1] + (n_states,), REAL_DTYPE)

    def step(metrics, y_t):
        bm = jnp.abs(y_t[..., None, None] - emit_j) ** 2  # (..., S, M)
        cand = (metrics[..., prev_state_j]
                + bm[..., prev_state_j, prev_sym_j])
        best = jnp.argmin(cand, axis=-1)
        new = jnp.min(cand, axis=-1)
        new = new - jnp.min(new, axis=-1, keepdims=True)
        return new, best.astype(jnp.int8)

    y_m = jnp.moveaxis(y, -1, 0)
    final, decisions = jax.lax.scan(step, init, y_m)

    start = jnp.argmin(final, axis=-1).astype(jnp.int32)

    def back(state, dec_t):
        j = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
        j = j.astype(jnp.int32)
        sym = prev_sym_j[state, j]
        prev = prev_state_j[state, j]
        return prev, sym

    _, syms_rev = jax.lax.scan(back, start, decisions, reverse=True)
    return jnp.moveaxis(syms_rev, 0, -1).astype(jnp.int32)
