"""Convolutional coding: encoder, Viterbi decoder, puncturing.

Re-design of convolutional_encoder.rs / viterbi_decoder.rs (673 LoC) /
puncture.rs: the encoder is a windowed parity (one gather + popcount),
and the Viterbi decoder is a `lax.scan` over time whose inner
add-compare-select is fully vectorized across the 2^(K-1) states (and
any leading batch axes — decode thousands of frames per call).

Polynomials are given in octal-ish integer form over the constraint
length K, e.g. the ubiquitous K=7 (171, 133) pair: taps 0o171, 0o133.
Convention: state = previous K-1 input bits, newest bit is the MSB fed
into the register; generator bit i of output = parity(poly & [newest..
oldest]).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import REAL_DTYPE


def _popcount_parity(x: np.ndarray) -> np.ndarray:
    return np.vectorize(lambda v: bin(v).count("1") & 1)(x)


@functools.lru_cache(maxsize=None)
def _trellis(constraint: int, polys: tuple[int, ...]):
    """Precompute trellis tables.

    Returns (outputs[S, 2, R] bit outputs, next_state[S, 2]) where S =
    2^(K-1) states and input bit b in {0, 1}.
    """
    k = constraint
    s = 1 << (k - 1)
    r = len(polys)
    outputs = np.zeros((s, 2, r), np.int8)
    next_state = np.zeros((s, 2), np.int32)
    for st in range(s):
        for b in (0, 1):
            reg = (b << (k - 1)) | st  # newest bit on top of state bits
            for gi, p in enumerate(polys):
                outputs[st, b, gi] = bin(reg & p).count("1") & 1
            next_state[st, b] = reg >> 1
    return outputs, next_state


def conv_encode(bits, constraint: int = 7,
                polys: tuple[int, ...] = (0o171, 0o133),
                terminate: bool = True) -> jax.Array:
    """Encode bits -> coded bits, rate 1/len(polys).

    With terminate=True, K-1 zero flush bits are appended so the decoder
    ends in state 0 (standard practice; convolutional_encoder.rs).
    """
    bits = jnp.asarray(bits, jnp.int32)
    if terminate:
        pad = [(0, 0)] * (bits.ndim - 1) + [(0, constraint - 1)]
        bits = jnp.pad(bits, pad)
    k = constraint
    n = bits.shape[-1]
    # register window: [newest ... oldest], length K
    padded = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(k - 1, 0)])
    idx = jnp.arange(n)[:, None] + (k - 1 - jnp.arange(k))[None, :]
    windows = padded[..., idx]  # (..., N, K) newest-first
    poly_bits = np.array(
        [[(p >> (k - 1 - i)) & 1 for i in range(k)] for p in polys], np.int32
    )  # (R, K) matching newest-first order
    par = jnp.einsum("...nk,rk->...nr", windows, jnp.asarray(poly_bits)) % 2
    return par.reshape(*par.shape[:-2], -1)


def viterbi_decode(received, constraint: int = 7,
                   polys: tuple[int, ...] = (0o171, 0o133),
                   terminated: bool = True,
                   soft: bool = False) -> jax.Array:
    """Viterbi decode (viterbi_decoder.rs re-design).

    received: hard bits (..., N*R) int, or soft LLR-ish values in [-1,1]
    per coded bit with soft=True (positive ~ bit 0... we use the
    convention value = 1-2·bit so +1 means bit 0).
    Returns decoded bits (..., N_info) (flush bits removed when
    terminated=True).
    """
    outputs_np, next_np = _trellis(constraint, tuple(polys))
    s, _, r = outputs_np.shape
    outputs = jnp.asarray(outputs_np.astype(np.float32))  # (S, 2, R)
    next_state = jnp.asarray(next_np)  # (S, 2)

    rx = jnp.asarray(received, REAL_DTYPE)
    n_steps = rx.shape[-1] // r
    rx = rx[..., : n_steps * r].reshape(*rx.shape[:-1], n_steps, r)
    if not soft:
        rx = 1.0 - 2.0 * rx  # bits -> ±1
    expected = 1.0 - 2.0 * outputs  # (S, 2, R) in ±1
    # branch metric: correlation (higher better)
    bm_all = jnp.einsum("...tr,sbr->...tsb", rx, expected)  # (..., T, S, 2)

    big_neg = jnp.asarray(-1e9, REAL_DTYPE)
    init = jnp.full(rx.shape[:-2] + (s,), -1e9, REAL_DTYPE)
    init = init.at[..., 0].set(0.0)

    # scatter branches: for target state s', predecessors are
    # (state, bit) with next_state[state, bit] == s'. Build gather maps.
    prev_state = np.zeros((s, 2), np.int32)
    prev_bit = np.zeros((s, 2), np.int32)
    fill = [[] for _ in range(s)]
    for st in range(s):
        for b in (0, 1):
            fill[next_np[st, b]].append((st, b))
    for sp in range(s):
        assert len(fill[sp]) == 2
        for j, (st, b) in enumerate(fill[sp]):
            prev_state[sp, j] = st
            prev_bit[sp, j] = b
    prev_state_j = jnp.asarray(prev_state)
    prev_bit_j = jnp.asarray(prev_bit)

    def step(metrics, bm_t):
        # bm_t: (..., S, 2) branch metrics indexed by (prev_state, bit);
        # gather onto (target_state, predecessor_j) layout
        cand = metrics[..., prev_state_j] + bm_t[..., prev_state_j, prev_bit_j]
        best = jnp.argmax(cand, axis=-1)  # which predecessor (j index)
        new_metrics = jnp.max(cand, axis=-1)
        return new_metrics, best.astype(jnp.int8)

    bm_moved = jnp.moveaxis(bm_all, -3, 0)  # (T, ..., S, 2)
    final_metrics, decisions = lax.scan(step, init, bm_moved)

    # traceback
    start_state = (
        jnp.zeros(final_metrics.shape[:-1], jnp.int32)
        if terminated
        else jnp.argmax(final_metrics, axis=-1).astype(jnp.int32)
    )

    def back(state, dec_t):
        j = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
        j = j.astype(jnp.int32)
        bit = prev_bit_j[state, j]
        prev = prev_state_j[state, j]
        return prev, bit

    _, bits_rev = lax.scan(back, start_state, decisions, reverse=True)
    bits = jnp.moveaxis(bits_rev, 0, -1)
    if terminated:
        bits = bits[..., : n_steps - (constraint - 1)]
    return bits.astype(jnp.int32)


def puncture(coded, pattern) -> jax.Array:
    """Remove bits where pattern==0, cycling the pattern (puncture.rs)."""
    coded = jnp.asarray(coded)
    pat = np.asarray(pattern).astype(bool)
    n = coded.shape[-1]
    mask = np.resize(pat, n)
    return coded[..., jnp.asarray(np.nonzero(mask)[0])]


def depuncture(punctured, pattern, total_len: int, fill=0.0) -> jax.Array:
    """Reinsert neutral values at punctured positions (depuncture.rs)."""
    punctured = jnp.asarray(punctured, REAL_DTYPE)
    pat = np.asarray(pattern).astype(bool)
    mask = np.resize(pat, total_len)
    out = jnp.full(punctured.shape[:-1] + (total_len,), fill, REAL_DTYPE)
    return out.at[..., jnp.asarray(np.nonzero(mask)[0])].set(punctured)


def map_decode(received, constraint: int = 7,
               polys: tuple[int, ...] = (0o171, 0o133),
               terminated: bool = True):
    """Max-log-MAP (BCJR) soft-output decode (map_decoder.rs,
    viterbi_sova.rs role): returns per-info-bit LLRs with the library
    convention LLR > 0 ⇒ bit 0, plus hard decisions.

    received: soft values in ±1 per coded bit (+1 ~ bit 0), the same
    convention as viterbi_decode(soft=True). Two lax.scans (forward α,
    backward β) over the trellis — fully batched over leading axes.
    """
    outputs_np, next_np = _trellis(constraint, tuple(polys))
    s, _, r = outputs_np.shape
    expected = jnp.asarray(1.0 - 2.0 * outputs_np.astype(np.float32))
    next_state = jnp.asarray(next_np)  # (S, 2)

    rx = jnp.asarray(received, REAL_DTYPE)
    n_steps = rx.shape[-1] // r
    rx = rx[..., : n_steps * r].reshape(*rx.shape[:-1], n_steps, r)
    bm = jnp.einsum("...tr,sbr->...tsb", rx, expected)  # (..., T, S, 2)

    init_a = jnp.full(rx.shape[:-2] + (s,), -1e9, REAL_DTYPE)
    init_a = init_a.at[..., 0].set(0.0)

    def fwd(alpha, bm_t):
        # alpha'(s') = max over (s, b) with next(s,b)=s'
        cand = alpha[..., :, None] + bm_t  # (..., S, 2)
        new = jnp.full_like(alpha, -1e9)
        flat_next = next_state.reshape(-1)
        new = new.at[..., flat_next].max(
            cand.reshape(*cand.shape[:-2], -1))
        new = new - jnp.max(new, axis=-1, keepdims=True)
        return new, alpha

    bm_m = jnp.moveaxis(bm, -3, 0)
    _, alphas = jax.lax.scan(fwd, init_a, bm_m)  # alphas[t] before step t

    if terminated:
        init_b = jnp.full(rx.shape[:-2] + (s,), -1e9, REAL_DTYPE)
        init_b = init_b.at[..., 0].set(0.0)
    else:
        init_b = jnp.zeros(rx.shape[:-2] + (s,), REAL_DTYPE)

    def bwd(beta, bm_t):
        # beta'(s) = max_b bm(s,b) + beta(next(s,b))
        cand = bm_t + beta[..., next_state]  # (..., S, 2)
        new = jnp.max(cand, axis=-1)
        new = new - jnp.max(new, axis=-1, keepdims=True)
        return new, beta

    _, betas = jax.lax.scan(bwd, init_b, bm_m, reverse=True)

    def llr_t(alpha, beta_next, bm_t):
        metric = (alpha[..., :, None] + bm_t
                  + beta_next[..., next_state])  # (..., S, 2)
        m0 = jnp.max(metric[..., 0], axis=-1)
        m1 = jnp.max(metric[..., 1], axis=-1)
        return m0 - m1  # >0 => bit 0

    llr = jax.vmap(llr_t)(alphas, betas, bm_m)  # (T, ...,)
    llr = jnp.moveaxis(llr, 0, -1)
    if terminated:
        llr = llr[..., : n_steps - (constraint - 1)]
    return llr, (llr < 0).astype(jnp.int32)
