"""Interleavers: block, convolutional, patterned (interleaved.rs,
convolutional_interleaver.rs, patterned_interleaver.rs re-designs) —
pure index permutations."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def block_interleave(x, rows: int, cols: int) -> jax.Array:
    """Write row-wise, read column-wise over blocks of rows*cols."""
    x = jnp.asarray(x)
    n = rows * cols
    blocks = x.shape[-1] // n
    y = x[..., : blocks * n].reshape(*x.shape[:-1], blocks, rows, cols)
    return jnp.swapaxes(y, -1, -2).reshape(*x.shape[:-1], blocks * n)


def block_deinterleave(x, rows: int, cols: int) -> jax.Array:
    return block_interleave(x, cols, rows)


def conv_interleave_indices(n: int, branches: int, depth: int) -> np.ndarray:
    """Index map for a convolutional (Forney) interleaver flattened to a
    block of n elements: element i is delayed by (i % B)·depth slots."""
    delays = (np.arange(n) % branches) * depth
    dest = np.arange(n) + delays * branches
    order = np.argsort(dest, kind="stable")
    return order.astype(np.int32)


def patterned_interleave(x, pattern) -> jax.Array:
    """Permute by an explicit repeating pattern (patterned_interleaver.rs)."""
    x = jnp.asarray(x)
    pat = np.asarray(pattern, np.int64)
    p = len(pat)
    blocks = x.shape[-1] // p
    y = x[..., : blocks * p].reshape(*x.shape[:-1], blocks, p)
    return y[..., jnp.asarray(pat)].reshape(*x.shape[:-1], blocks * p)


def patterned_deinterleave(x, pattern) -> jax.Array:
    pat = np.asarray(pattern, np.int64)
    inv = np.argsort(pat)
    return patterned_interleave(x, inv)
