"""Trellis-coded modulation (trellis_coding.rs / trellis_metrics.rs
re-design): pragmatic 8PSK TCM (Viterbi/Ungerboeck).

Scheme (2 info bits / symbol, same spectral efficiency as QPSK):
the low bit runs through a rate-1/2 K=3 convolutional code
(polys 7,5) whose two coded bits pick one of four phases
{0°, 45°, 90°, 135°}; the high bit is UNCODED and selects the
antipodal rotation (+180°), so parallel transitions sit at the
maximum distance (Ungerboeck set-partitioning rule U1):

    symbol index = 4·b_uncoded + m(c1, c0),   point = e^{jπ·idx/4}

Decoding: per symbol, each coded pair's branch metric is the best of
its two parallel points (resolving the uncoded bit); a 4-state Viterbi
(lax.scan add-compare-select + traceback) finds the coded sequence and
the parallel decisions fall out of the surviving path. ~3 dB
asymptotic coding gain over uncoded QPSK at the same 2 bit/sym
(verified statistically in tests)."""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import to_device
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

_K = 3
_POLYS = (0o7, 0o5)  # c1 = b+s1+s0, c0 = b+s0 (newest-first taps)
_N_STATES = 1 << (_K - 1)
# coded pair -> phase-subset index. Chosen by exhaustive search over
# the 24 assignments for maximum free distance: this one reaches
# d²free = 4.0 (= the parallel-transition bound) vs uncoded QPSK's
# 2.0 — the full 3 dB asymptotic set-partitioning gain. The natural
# assignment (0,1,2,3) only reaches ~1.17 and would LOSE to QPSK.
_SUBSET_MAP = np.asarray([3, 2, 0, 1], np.int32)


@functools.lru_cache(maxsize=None)
def _trellis():
    """next_state[s, b], coded_pair[s, b] for the K=3 (7,5) code."""
    nxt = np.zeros((_N_STATES, 2), np.int32)
    out = np.zeros((_N_STATES, 2), np.int32)
    for s in range(_N_STATES):
        for b in (0, 1):
            reg = (b << (_K - 1)) | s  # [newest b | s1 s0]
            c1 = bin(reg & _POLYS[0]).count("1") & 1
            c0 = bin(reg & _POLYS[1]).count("1") & 1
            out[s, b] = (c1 << 1) | c0
            nxt[s, b] = (reg >> 1) & (_N_STATES - 1)
    return nxt, out


@functools.lru_cache(maxsize=None)
def _points_host() -> np.ndarray:
    return np.exp(1j * np.pi * np.arange(8) / 4.0).astype(np.complex64)


def tcm_encode(bits) -> tuple[jax.Array, jax.Array]:
    """(..., 2N) bits -> (symbols indices (..., N+2), IQ points).

    Bit pairs are (uncoded_high, coded_low) per symbol; two flush
    pairs terminate the trellis.
    """
    b = jnp.asarray(bits, jnp.int32).reshape(-1, 2)
    # flush: two zero coded bits drive the state to 0
    zeros2 = jnp.zeros(2, jnp.int32)
    coded_in = jnp.concatenate([b[:, 1], zeros2])
    uncoded = jnp.concatenate([b[:, 0], zeros2])
    nxt_t, out_t = _trellis()
    nxt = jnp.asarray(nxt_t)
    out = jnp.asarray(out_t)
    sub = jnp.asarray(_SUBSET_MAP)

    def step(s, inp):
        cb, ub = inp
        sym = 4 * ub + sub[out[s, cb]]
        return nxt[s, cb], sym

    _, idx = lax.scan(step, jnp.asarray(0, jnp.int32),
                      (coded_in, uncoded))
    points = to_device(_points_host())[idx]
    return idx, points.astype(IQ_DTYPE)


def tcm_decode(rx_symbols) -> jax.Array:
    """Received 8PSK-ish symbols (..., N+2) -> decoded bits (..., 2N).

    4-state Viterbi with parallel-transition resolution; metrics are
    squared distances to the better of each pair's two antipodal
    points.
    """
    rx = jnp.asarray(rx_symbols, IQ_DTYPE)
    pts = to_device(_points_host())
    # distance to all 8 points: (..., T, 8)
    d2 = jnp.abs(rx[..., None] - pts) ** 2
    # per coded pair c: best parallel point (uncoded bit resolution),
    # through the subset map (pair c lives at phases m[c] and m[c]+4)
    smap = jnp.asarray(_SUBSET_MAP)
    d_lo = d2[..., smap]          # uncoded bit 0
    d_hi = d2[..., smap + 4]      # uncoded bit 1
    d_pair = jnp.minimum(d_lo, d_hi)  # (..., T, 4) indexed by coded pair
    par_bit = (d_hi < d_lo).astype(jnp.int32)

    nxt_np, out_np = _trellis()
    nxt = jnp.asarray(nxt_np)
    out = jnp.asarray(out_np)

    # predecessors: for each state s', list (prev_state, bit)
    prev_state = np.zeros((_N_STATES, 2), np.int32)
    prev_bit = np.zeros((_N_STATES, 2), np.int32)
    fill: list[list] = [[] for _ in range(_N_STATES)]
    for s in range(_N_STATES):
        for bit in (0, 1):
            fill[nxt_np[s, bit]].append((s, bit))
    for sp in range(_N_STATES):
        for j, (s, bit) in enumerate(fill[sp]):
            prev_state[sp, j] = s
            prev_bit[sp, j] = bit
    prev_state_j = jnp.asarray(prev_state)
    prev_bit_j = jnp.asarray(prev_bit)

    init = jnp.full(rx.shape[:-1] + (_N_STATES,), 1e9, REAL_DTYPE)
    init = init.at[..., 0].set(0.0)

    def step(metrics, d_t):
        # branch metric for (state, bit): d_pair at the coded output
        bm = d_t[..., out]  # (..., S, 2)
        cand = (metrics[..., prev_state_j]
                + bm[..., prev_state_j, prev_bit_j])  # gather layout
        best = jnp.argmin(cand, axis=-1)
        return jnp.min(cand, axis=-1), best.astype(jnp.int8)

    d_m = jnp.moveaxis(d_pair, -2, 0)  # (T, ..., 4)
    final, decisions = lax.scan(step, init, d_m)

    start = jnp.zeros(final.shape[:-1], jnp.int32)  # terminated at 0

    def back(state, dec_t):
        j = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0]
        j = j.astype(jnp.int32)
        bit = prev_bit_j[state, j]
        prev = prev_state_j[state, j]
        return prev, (prev, bit)

    _, (states_rev, coded_rev) = lax.scan(back, start, decisions,
                                          reverse=True)
    coded_bits = jnp.moveaxis(coded_rev, 0, -1)  # (..., T)
    path_states = jnp.moveaxis(states_rev, 0, -1)

    # recover the symbol index on the surviving path -> uncoded bit
    pair = out[path_states, coded_bits]  # coded output per symbol
    unc = jnp.take_along_axis(
        jnp.moveaxis(par_bit, -1, -1), pair[..., None], axis=-1)[..., 0]

    n_info = coded_bits.shape[-1] - 2  # drop the flush pairs
    bits = jnp.stack([unc[..., :n_info], coded_bits[..., :n_info]],
                     axis=-1)
    return bits.reshape(*bits.shape[:-2], -1)


def tcm_coding_gain_demo(ebn0_db: float, n_bits: int = 40_000,
                         seed: int = 0) -> tuple[float, float]:
    """(tcm_ber, uncoded_qpsk_ber) at the same Es/N0 and 2 bit/sym —
    the acceptance measurement for the ~3 dB asymptotic gain."""
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n_bits).astype(np.int32)
    _, tx = tcm_encode(bits)
    es_n0 = 10.0 ** (ebn0_db / 10.0) * 2.0  # 2 bits/symbol
    sigma = np.sqrt(1.0 / (2.0 * es_n0))
    noise = (rng.standard_normal(tx.shape[-1])
             + 1j * rng.standard_normal(tx.shape[-1])) * sigma
    dec = np.asarray(tcm_decode(tx + noise.astype(np.complex64)))
    tcm_ber = float(np.mean(dec[:n_bits] != bits))

    # uncoded QPSK baseline, Gray mapping
    qb = bits.reshape(-1, 2)
    qsym = ((1 - 2.0 * qb[:, 0]) + 1j * (1 - 2.0 * qb[:, 1])) / np.sqrt(2)
    qn = (rng.standard_normal(len(qsym))
          + 1j * rng.standard_normal(len(qsym))) * sigma
    rxq = qsym + qn
    qdec = np.stack([(rxq.real < 0), (rxq.imag < 0)], axis=1).astype(int)
    q_ber = float(np.mean(qdec.reshape(-1) != bits))
    return tcm_ber, q_ber
