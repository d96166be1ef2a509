"""Fountain codes (fountain_code.rs, raptor_code.rs re-designs) and
rate matching (rate_matcher.rs).

LT encoding is one GF(2) matrix multiply (XOR einsum) so any number of
output symbols is generated in a single batched op; decoding uses
Gaussian elimination over GF(2) on the host (data-dependent pivoting is
not an XLA-friendly pattern, and code blocks are small).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def robust_soliton(k: int, c: float = 0.1, delta: float = 0.5
                   ) -> np.ndarray:
    """Robust soliton degree distribution (fountain_code.rs design)."""
    rho = np.zeros(k + 1)
    rho[1] = 1.0 / k
    d = np.arange(2, k + 1)
    rho[2:] = 1.0 / (d * (d - 1))
    r = c * np.log(k / delta) * np.sqrt(k)
    tau = np.zeros(k + 1)
    kr = int(round(k / r)) if r > 0 else k
    kr = max(1, min(kr, k))
    for i in range(1, kr):
        tau[i] = r / (i * k)
    tau[kr] = r * np.log(r / delta) / k if r > delta else 0.0
    p = rho + tau
    return p / p.sum()


def lt_generator(k: int, n: int, seed: int = 0,
                 dist: np.ndarray | None = None) -> np.ndarray:
    """Pseudorandom LT generator matrix (n, k) over GF(2); row i is the
    neighbor set of encoded symbol i (deterministic from seed, so the
    receiver rebuilds it from the same seed — the 'ESI' role)."""
    rng = np.random.default_rng(seed)
    p = dist if dist is not None else robust_soliton(k)
    degrees = rng.choice(np.arange(len(p)), size=n, p=p)
    g = np.zeros((n, k), np.uint8)
    for i, deg in enumerate(degrees):
        deg = max(1, min(int(deg), k))
        g[i, rng.choice(k, size=deg, replace=False)] = 1
    return g


def lt_encode(data_symbols, n: int, seed: int = 0):
    """Encode k source symbols into n LT symbols: one XOR matmul.
    data_symbols (k, ...) bit/byte arrays -> (n, ...)."""
    x = jnp.asarray(data_symbols)
    g = jnp.asarray(lt_generator(x.shape[0], n, seed))
    # GF(2) matmul: parity of the selected subset
    return jnp.einsum("nk,k...->n...", g.astype(jnp.int32),
                      x.astype(jnp.int32)) % 2


def lt_decode(received, generator, k: int):
    """Gaussian elimination LT decode. received (m, ...) symbols with
    their generator rows (m, k) from lt_generator (the receiver rebuilds
    them from the shared seed). Returns (data (k, ...), ok)."""
    y = np.asarray(received).astype(np.uint8).copy()
    g = np.asarray(generator, np.uint8).copy()
    m = g.shape[0]
    extra = y.shape[1:]
    y = y.reshape(m, -1)
    col = 0
    piv_rows = []
    for col in range(k):
        piv = None
        for r in range(len(piv_rows), m):
            if g[r, col]:
                piv = r
                break
        if piv is None:
            return np.zeros((k, *extra), np.uint8), False
        r0 = len(piv_rows)
        g[[r0, piv]] = g[[piv, r0]]
        y[[r0, piv]] = y[[piv, r0]]
        for r in range(m):
            if r != r0 and g[r, col]:
                g[r] ^= g[r0]
                y[r] ^= y[r0]
        piv_rows.append(r0)
    data = y[:k].reshape(k, *extra)
    return data, True


def raptor_encode(data_symbols, n: int, seed: int = 0,
                  precode_overhead: int = 4):
    """Systematic raptor-style encode (raptor_code.rs role): a simple
    parity precode adds `precode_overhead` XOR parities, then LT-encodes
    the intermediate block. Returns (encoded (n, ...), k_intermediate)."""
    x = np.asarray(data_symbols).astype(np.uint8)
    k = x.shape[0]
    rng = np.random.default_rng(seed + 7)
    parities = []
    for _ in range(precode_overhead):
        sel = rng.choice(k, size=max(2, k // 2), replace=False)
        parities.append(np.bitwise_xor.reduce(x[sel], axis=0) % 2)
    inter = np.concatenate([x, np.stack(parities)], axis=0)
    return lt_encode(inter, n, seed), inter.shape[0]


# ----------------------------------------------------------- rate match


def rate_match(bits, target_len: int):
    """Circular-buffer rate matching (rate_matcher.rs): puncture (drop
    evenly) or repeat (wrap around) to exactly target_len bits."""
    b = jnp.asarray(bits)
    n = b.shape[-1]
    idx = (jnp.arange(target_len) * n // max(target_len, 1)) % n \
        if target_len < n else jnp.arange(target_len) % n
    return b[..., idx], np.asarray(idx) if target_len < n else None


def rate_dematch(bits, original_len: int, combine: str = "llr"):
    """Invert rate_match: scatter-add repeats back (LLR/soft combine) or
    fill punctured positions with zeros (erasures)."""
    b = jnp.asarray(bits, jnp.float32)
    t = b.shape[-1]
    n = original_len
    if t >= n:
        idx = jnp.arange(t) % n
        out = jnp.zeros((*b.shape[:-1], n), b.dtype)
        return out.at[..., idx].add(b)
    idx = (jnp.arange(t) * n // t) % n
    out = jnp.zeros((*b.shape[:-1], n), b.dtype)
    return out.at[..., idx].set(b)
