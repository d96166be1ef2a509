"""Turbo code: parallel-concatenated RSC(1, 5/7) + max-log-MAP decoder.

Re-design of turbo_code.rs (610 LoC) / map_decoder.rs: the BCJR
forward/backward recursions are `lax.scan`s vectorized over the 4 RSC
states (and batch axes); the iterative exchange of extrinsic LLRs runs a
fixed number of turbo iterations under Python loop (static count).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

# RSC generator (1, g2/g1) with g1 = 7 (feedback), g2 = 5, K=3, 4 states
_K = 3
_S = 4


@functools.lru_cache(maxsize=None)
def _rsc_tables():
    """next_state[s, u], parity[s, u] for RSC with feedback 7, forward 5."""
    nxt = np.zeros((_S, 2), np.int32)
    par = np.zeros((_S, 2), np.int32)
    for s in range(_S):
        s1, s0 = (s >> 1) & 1, s & 1
        for u in (0, 1):
            # feedback bit: a = u ^ s1 ^ s0   (g1 = 1+D+D^2)
            a = u ^ s1 ^ s0
            # parity: p = a ^ s0  -> g2 = 1+D^2
            p = a ^ s0
            nxt[s, u] = ((a << 1) | s1)
            par[s, u] = p
    return nxt, par


def rsc_encode(bits: np.ndarray):
    """Systematic RSC encode; returns (parity_bits, final_state)."""
    nxt, par = _rsc_tables()
    s = 0
    out = np.zeros(len(bits), np.int32)
    for i, u in enumerate(np.asarray(bits, np.int32)):
        out[i] = par[s, u]
        s = nxt[s, u]
    return out, s


def default_interleaver(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.permutation(n).astype(np.int32)


def turbo_encode(bits, interleaver: np.ndarray | None = None):
    """bits (N,) -> (systematic, parity1, parity2) each (N,) — rate 1/3
    (no termination tail for simplicity, matching turbo_code.rs default)."""
    bits = np.asarray(bits, np.int32)
    n = len(bits)
    pi = interleaver if interleaver is not None else default_interleaver(n)
    p1, _ = rsc_encode(bits)
    p2, _ = rsc_encode(bits[pi])
    return bits, p1, p2, pi


def _bcjr_maxlog(llr_sys, llr_par, llr_apriori):
    """Max-log-MAP for one RSC constituent.

    llr_* : (..., N) channel LLRs (positive = bit 0) and a-priori LLRs.
    Returns extrinsic LLR (..., N).
    """
    nxt, par = _rsc_tables()
    nxt_j = jnp.asarray(nxt)
    neg = -1e9

    # branch metric γ(s, u) at time t:
    #   0.5·(1-2u)·(llr_sys+llr_apriori) + 0.5·(1-2p(s,u))·llr_par
    sgn_u = jnp.asarray(1.0 - 2.0 * np.arange(2))  # (2,)
    sgn_p = jnp.asarray(1.0 - 2.0 * par.astype(np.float32))  # (S, 2)

    lsys = llr_sys + llr_apriori

    def gamma(t_sys, t_par):
        # (..., S, 2)
        return 0.5 * (sgn_u[None, :] * t_sys[..., None, None]
                      + sgn_p * t_par[..., None, None])

    # forward
    def fwd(alpha, ts):
        t_sys, t_par = ts
        g = gamma(t_sys, t_par)  # (..., S, 2)
        cand = alpha[..., :, None] + g  # (..., S, 2)
        new = jnp.full_like(alpha, neg)
        for s in range(_S):
            for u in (0, 1):
                sp = int(nxt[s, u])
                new = new.at[..., sp].max(cand[..., s, u])
        new = new - jnp.max(new, axis=-1, keepdims=True)
        return new, alpha

    batch = llr_sys.shape[:-1]
    a0 = jnp.full(batch + (_S,), neg, jnp.float32).at[..., 0].set(0.0)
    seq = (jnp.moveaxis(lsys, -1, 0), jnp.moveaxis(llr_par, -1, 0))
    _, alphas = lax.scan(fwd, a0, seq)  # alphas[t] = alpha before step t

    # backward
    def bwd(beta, ts):
        t_sys, t_par = ts
        g = gamma(t_sys, t_par)
        new = jnp.full_like(beta, neg)
        for s in range(_S):
            for u in (0, 1):
                sp = int(nxt[s, u])
                new = new.at[..., s].max(g[..., s, u] + beta[..., sp])
        new = new - jnp.max(new, axis=-1, keepdims=True)
        return new, new

    b_end = jnp.zeros(batch + (_S,), jnp.float32)  # unterminated: uniform
    _, betas_rev = lax.scan(bwd, b_end, seq, reverse=True)
    # betas_rev[t] = beta after processing step t in reverse = β_t? align:
    # we need β_{t+1}(s'); lax.scan reverse gives for each t the carry
    # AFTER processing t.. easier: recompute betas list aligned
    betas = jnp.concatenate(
        [betas_rev[1:], jnp.broadcast_to(b_end, (1,) + b_end.shape)], axis=0
    )

    # LLR per bit: max over (s,u=0) minus max over (s,u=1) of
    # α_t(s) + γ_t(s,u) + β_{t+1}(s')
    def llr_step(carry, ts_ab):
        (t_sys, t_par, alpha, beta) = ts_ab
        g = gamma(t_sys, t_par)
        metric = alpha[..., :, None] + g  # (..., S, 2)
        total = jnp.full(metric.shape, neg)
        for s in range(_S):
            for u in (0, 1):
                sp = int(nxt[s, u])
                total = total.at[..., s, u].set(
                    metric[..., s, u] + beta[..., sp]
                )
        l0 = jnp.max(total[..., :, 0], axis=-1)
        l1 = jnp.max(total[..., :, 1], axis=-1)
        return carry, l0 - l1

    _, llr_post = lax.scan(
        llr_step, None,
        (jnp.moveaxis(lsys, -1, 0), jnp.moveaxis(llr_par, -1, 0), alphas,
         betas),
    )
    llr_post = jnp.moveaxis(llr_post, 0, -1)
    return llr_post - lsys  # extrinsic


def turbo_decode(llr_sys, llr_p1, llr_p2, interleaver, iters: int = 6):
    """Iterative turbo decode. LLRs positive = bit 0.

    Returns (hard_bits, posterior_llr).
    """
    pi = jnp.asarray(interleaver)
    inv = jnp.zeros_like(pi).at[pi].set(jnp.arange(pi.shape[0]))
    llr_sys = jnp.asarray(llr_sys, jnp.float32)
    llr_p1 = jnp.asarray(llr_p1, jnp.float32)
    llr_p2 = jnp.asarray(llr_p2, jnp.float32)
    apriori = jnp.zeros_like(llr_sys)
    for _ in range(iters):
        ext1 = _bcjr_maxlog(llr_sys, llr_p1, apriori)
        ap2 = ext1[..., pi]
        ext2 = _bcjr_maxlog(llr_sys[..., pi], llr_p2, ap2)
        apriori = ext2[..., inv]
    post = llr_sys + apriori + ext1
    return (post < 0).astype(jnp.int32), post
