"""LDPC codes: regular Gallager construction + normalized min-sum decode.

Re-design of ldpc_codec.rs (501 LoC) / belief_propagation_decoder.rs:
the decoder is fully vectorized — messages live on a dense
(checks × edges-per-check) gather layout, each iteration is a handful
of batched gathers/reductions under `lax.fori_loop`, so thousands of
codewords decode in parallel on the VPU. The DVB-S2X frame structure
(11 code rates, Normal/Short frames, IRA staircase parity —
dvb_s2x_ldpc_codec.rs) lives in `r4w_tpu.fec.dvb_s2x`.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def make_regular_ldpc(n: int = 96, dv: int = 3, dc: int = 6, seed: int = 1):
    """Regular (dv, dc) Gallager parity matrix H (m×n) + systematic G.

    Returns (H, G, k): G is (k, n) with columns permuted so encoding is
    c = u·G (mod 2) and H·cᵀ = 0.
    """
    assert (n * dv) % dc == 0
    m = n * dv // dc
    rng = np.random.default_rng(seed)
    while True:
        # permutation-based construction
        edges = np.repeat(np.arange(n), dv)
        rng.shuffle(edges)
        h = np.zeros((m, n), np.int8)
        ok = True
        for i, v in enumerate(edges):
            c = i % m
            if h[c, v]:
                ok = False
                break
            h[c, v] = 1
        if not ok:
            continue
        if np.any(h.sum(1) != dc) or np.any(h.sum(0) != dv):
            continue
        # gaussian elimination to find G
        hh = h.copy() % 2
        perm = np.arange(n)
        r = 0
        for col in range(n):
            if r >= m:
                break
            pivot = np.nonzero(hh[r:, col])[0]
            if len(pivot) == 0:
                continue
            p = pivot[0] + r
            hh[[r, p]] = hh[[p, r]]
            for row in range(m):
                if row != r and hh[row, col]:
                    hh[row] ^= hh[r]
            perm[[r, col]] = perm[[col, r]]  # not used; placeholder
            r += 1
        rank = r
        k = n - rank
        # recompute in systematic form: find column permutation putting
        # identity in front
        hh = h.copy() % 2
        cols = []
        r = 0
        used = np.zeros(n, bool)
        for col in range(n):
            if r >= m:
                break
            piv = np.nonzero(hh[r:, col])[0]
            if len(piv) == 0:
                continue
            p = piv[0] + r
            hh[[r, p]] = hh[[p, r]]
            for row in range(m):
                if row != r and hh[row, col]:
                    hh[row] ^= hh[r]
            cols.append(col)
            used[col] = True
            r += 1
        if r < m:
            continue  # rank-deficient; retry
        free_cols = np.nonzero(~used)[0]
        k = n - m
        # H in systematic-ish form: hh[:, cols] = I, hh[:, free] = P
        p_mat = hh[:, free_cols]  # (m, k)
        g = np.zeros((k, n), np.int8)
        g[np.arange(k), free_cols] = 1
        g[:, np.asarray(cols)] = p_mat.T
        assert not ((h @ g.T) % 2).any()
        return h.astype(np.int8), g.astype(np.int8), k, free_cols.astype(np.int32)


def ldpc_encode(bits, h_g=None):
    """(..., k) -> (..., n) using c = u·G."""
    if h_g is None:
        h_g = make_regular_ldpc()
    _, g, k, _ = h_g
    u = jnp.asarray(bits, jnp.int32)
    return jnp.einsum("...k,kn->...n", u, jnp.asarray(g, jnp.int32)) % 2


def ldpc_decode(llr, h_g=None, iters: int = 25, alpha: float = 0.8):
    """Normalized min-sum decode.

    llr: (..., n) channel LLRs (positive = bit 0). Returns hard bits
    (..., n) and a parity-satisfied flag (...,).
    """
    if h_g is None:
        h_g = make_regular_ldpc()
    h, g, k, _ = h_g
    m, n = h.shape
    rows, cols = np.nonzero(h)
    dc = int(h.sum(1).max())
    # dense (m, dc) edge layout; all rows same degree for regular codes
    edge_col = np.full((m, dc), 0, np.int32)
    for r in range(m):
        cs = np.nonzero(h[r])[0]
        edge_col[r, : len(cs)] = cs
    edge_col_j = jnp.asarray(edge_col)

    llr = jnp.asarray(llr, jnp.float32)
    batch = llr.shape[:-1]
    msg = jnp.zeros(batch + (m, dc), jnp.float32)  # check->var messages

    def iteration(i, carry):
        msg, = carry
        # variable beliefs: channel + sum of incoming check messages
        total = llr.at[..., edge_col_j].add(0.0)  # gather template
        # sum messages per variable: scatter-add
        sums = jnp.zeros_like(llr).at[..., edge_col_j.reshape(-1)].add(
            msg.reshape(*batch, -1)
        )
        belief = llr + sums
        # var->check: belief minus this edge's incoming message
        v2c = belief[..., edge_col_j] - msg  # (..., m, dc)
        # check update: normalized min-sum
        sign = jnp.sign(v2c)
        sign = jnp.where(sign == 0, 1.0, sign)
        prod_sign = jnp.prod(sign, axis=-1, keepdims=True) * sign
        mag = jnp.abs(v2c)
        m1 = jnp.min(mag, axis=-1, keepdims=True)
        # second minimum
        big = jnp.where(mag == jnp.min(mag, -1, keepdims=True), jnp.inf, mag)
        m2 = jnp.min(big, axis=-1, keepdims=True)
        is_min = mag == m1
        # tied minima: "min over the other edges" is m1 everywhere
        # (m2 would be inf, poisoning the beliefs on e.g. clean inputs)
        n_min = jnp.sum(is_min, axis=-1, keepdims=True)
        m2 = jnp.where(n_min > 1, m1, m2)
        new_msg = alpha * prod_sign * jnp.where(is_min & (n_min == 1),
                                                m2, m1)
        return (new_msg,)

    (msg,) = lax.fori_loop(0, iters, iteration, (msg,))
    sums = jnp.zeros_like(llr).at[..., edge_col_j.reshape(-1)].add(
        msg.reshape(*batch, -1)
    )
    belief = llr + sums
    hard = (belief < 0).astype(jnp.int32)
    parity = jnp.einsum("...n,mn->...m", hard, jnp.asarray(h, jnp.int32)) % 2
    ok = jnp.all(parity == 0, axis=-1)
    return hard, ok


def ldpc_extract_data(hard_bits, h_g=None):
    """Recover the k information bits: u[i] = c[data_cols[i]]."""
    if h_g is None:
        h_g = make_regular_ldpc()
    _, _, _, data_cols = h_g
    return jnp.asarray(hard_bits)[..., jnp.asarray(data_cols)]
