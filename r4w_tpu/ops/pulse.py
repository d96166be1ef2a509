"""Pulse-shaping filters: raised-cosine, root-raised-cosine, Gaussian.

Re-design of crates/r4w-core/src/filters/pulse_shaping.rs (RC :80,
RRC :231, Gaussian :387): tap design on host (numpy f64), application as
batched upsample+FIR.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops.filters import fir_apply


@functools.lru_cache(maxsize=None)
def raised_cosine_taps(sps: int, num_symbols: int = 8,
                       rolloff: float = 0.35) -> np.ndarray:
    """RC impulse response, unit peak, length num_symbols*sps+1."""
    n = num_symbols * sps
    t = (np.arange(n + 1) - n / 2.0) / sps  # in symbol periods
    beta = rolloff
    h = np.sinc(t) * np.cos(np.pi * beta * t)
    denom = 1.0 - (2.0 * beta * t) ** 2
    # limit at t = ±1/(2β)
    sing = np.isclose(denom, 0.0)
    h = np.where(sing, np.pi / 4.0 * np.sinc(1.0 / (2.0 * beta)), h / np.where(sing, 1.0, denom))
    return (h / np.max(np.abs(h))).astype(np.float32)


@functools.lru_cache(maxsize=None)
def root_raised_cosine_taps(sps: int, num_symbols: int = 8,
                            rolloff: float = 0.35) -> np.ndarray:
    """RRC impulse response (pulse_shaping.rs:231), unit energy."""
    n = num_symbols * sps
    t = (np.arange(n + 1) - n / 2.0) / sps
    beta = rolloff
    h = np.empty_like(t)
    for i, ti in enumerate(t):
        if np.isclose(ti, 0.0):
            h[i] = 1.0 - beta + 4.0 * beta / np.pi
        elif beta > 0 and np.isclose(abs(ti), 1.0 / (4.0 * beta)):
            h[i] = (beta / np.sqrt(2.0)) * (
                (1.0 + 2.0 / np.pi) * np.sin(np.pi / (4.0 * beta))
                + (1.0 - 2.0 / np.pi) * np.cos(np.pi / (4.0 * beta))
            )
        else:
            num = (np.sin(np.pi * ti * (1.0 - beta))
                   + 4.0 * beta * ti * np.cos(np.pi * ti * (1.0 + beta)))
            den = np.pi * ti * (1.0 - (4.0 * beta * ti) ** 2)
            h[i] = num / den
    h = h / np.sqrt(np.sum(h**2))
    return h.astype(np.float32)


@functools.lru_cache(maxsize=None)
def gaussian_taps(sps: int, bt: float = 0.3,
                  num_symbols: int = 4) -> np.ndarray:
    """Gaussian pulse for GMSK/GFSK (pulse_shaping.rs:387), unit area."""
    n = num_symbols * sps
    t = (np.arange(n + 1) - n / 2.0) / sps
    sigma = np.sqrt(np.log(2.0)) / (2.0 * np.pi * bt)
    h = np.exp(-(t**2) / (2.0 * sigma**2))
    return (h / h.sum()).astype(np.float32)


def shape_symbols(symbols: jax.Array, taps: np.ndarray, sps: int) -> jax.Array:
    """Upsample symbol impulses by sps and convolve with the pulse.

    Full causal convolution: output length = S*sps + len(taps) - 1, with
    symbol i peaking at index i*sps + (len(taps)-1)//2 (the filter group
    delay).
    """
    symbols = jnp.asarray(symbols)
    up = jnp.zeros(symbols.shape[:-1] + (symbols.shape[-1] * sps,),
                   symbols.dtype)
    up = up.at[..., ::sps].set(symbols)
    k = len(taps)
    pad = [(0, 0)] * (up.ndim - 1) + [(0, k - 1)]  # flush the filter tail
    return fir_apply(jnp.asarray(taps), jnp.pad(up, pad))


def matched_filter(samples: jax.Array, taps: np.ndarray) -> jax.Array:
    """Zero-phase matched filter: output aligned with input (same length)."""
    samples = jnp.asarray(samples)
    k = len(taps)
    half = (k - 1) // 2
    pad = [(0, 0)] * (samples.ndim - 1) + [(0, k - 1)]
    y = fir_apply(jnp.asarray(taps), jnp.pad(samples, pad))
    return y[..., half : half + samples.shape[-1]]
