"""Diversity / MIMO / link-adaptation blocks.

Re-designs of mimo.rs, alamouti_codec.rs, antenna_diversity_combiner.rs,
successive_interference_canceller.rs, waterfilling.rs,
adaptive_modcod.rs, ultra_wideband_ranging.rs: batched linear algebra —
Alamouti combining is one einsum over symbol pairs, SIC is decode→
reconstruct→subtract, waterfilling is a bisection on the water level.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# ----------------------------------------------------------- Alamouti


def alamouti_encode(symbols: jax.Array) -> jax.Array:
    """2×1 STBC (alamouti_codec.rs): pairs (s0, s1) →
    antenna streams [[s0, −s1*], [s1, s0*]] over two symbol times.
    Input (..., 2K); output (..., 2, 2K)."""
    s = jnp.asarray(symbols, IQ_DTYPE)
    pairs = s.reshape(*s.shape[:-1], -1, 2)
    s0, s1 = pairs[..., 0], pairs[..., 1]
    ant0 = jnp.stack([s0, -jnp.conj(s1)], axis=-1).reshape(
        *s.shape[:-1], -1)
    ant1 = jnp.stack([s1, jnp.conj(s0)], axis=-1).reshape(
        *s.shape[:-1], -1)
    return jnp.stack([ant0, ant1], axis=-2)


def alamouti_decode(rx: jax.Array, h: jax.Array) -> jax.Array:
    """Combine a 2×1 Alamouti block: rx (..., 2K) at ONE receive
    antenna, h (..., 2) channel [h0, h1] (static per block). Returns
    symbol estimates (..., 2K) with full 2-branch diversity gain."""
    r = jnp.asarray(rx, IQ_DTYPE).reshape(*rx.shape[:-1], -1, 2)
    r0, r1 = r[..., 0], r[..., 1]
    h0 = jnp.asarray(h, IQ_DTYPE)[..., 0:1]
    h1 = jnp.asarray(h, IQ_DTYPE)[..., 1:2]
    norm = jnp.abs(h0) ** 2 + jnp.abs(h1) ** 2
    s0 = (jnp.conj(h0) * r0 + h1 * jnp.conj(r1)) / norm
    s1 = (jnp.conj(h1) * r0 - h0 * jnp.conj(r1)) / norm
    return jnp.stack([s0, s1], axis=-1).reshape(*rx.shape[:-1], -1)


# ---------------------------------------------------------- combining


def mrc_combine(rx: jax.Array, h: jax.Array) -> jax.Array:
    """Maximum-ratio combining over receive branches
    (antenna_diversity_combiner.rs): rx (..., B, N), h (..., B)."""
    hc = jnp.conj(jnp.asarray(h, IQ_DTYPE))[..., None]
    num = jnp.sum(hc * jnp.asarray(rx, IQ_DTYPE), axis=-2)
    den = jnp.sum(jnp.abs(h) ** 2, axis=-1)[..., None]
    return num / jnp.maximum(den, 1e-12)


def egc_combine(rx: jax.Array, h: jax.Array) -> jax.Array:
    """Equal-gain combining: co-phase then average."""
    ph = jnp.asarray(h, IQ_DTYPE)
    ph = ph / jnp.maximum(jnp.abs(ph), 1e-12)
    return jnp.mean(jnp.conj(ph)[..., None] * jnp.asarray(rx, IQ_DTYPE),
                    axis=-2)


def selection_combine(rx: jax.Array, h: jax.Array) -> jax.Array:
    """Pick the strongest branch."""
    idx = jnp.argmax(jnp.abs(jnp.asarray(h)), axis=-1)
    sel = jnp.take_along_axis(jnp.asarray(rx, IQ_DTYPE),
                              idx[..., None, None], axis=-2)[..., 0, :]
    hsel = jnp.take_along_axis(jnp.asarray(h, IQ_DTYPE), idx[..., None],
                               axis=-1)
    return sel * jnp.conj(hsel) / jnp.maximum(jnp.abs(hsel) ** 2, 1e-12)


# ---------------------------------------------------------------- SIC


def sic_decode(rx: jax.Array, constellation: jax.Array,
               gains: jax.Array) -> jax.Array:
    """Two-user power-domain successive interference cancellation
    (successive_interference_canceller.rs): decode the strong user,
    reconstruct, subtract, decode the weak user. rx (..., N) =
    g0·s0 + g1·s1 + n with g0 > g1. Returns indices (..., 2, N)."""
    rx = jnp.asarray(rx, IQ_DTYPE)
    con = jnp.asarray(constellation, IQ_DTYPE)
    g = jnp.asarray(gains, REAL_DTYPE)
    # strong user: treat the weak one as noise
    idx0 = jnp.argmin(jnp.abs(rx[..., None] - g[0] * con), axis=-1)
    s0 = con[idx0]
    resid = rx - g[0] * s0
    idx1 = jnp.argmin(jnp.abs(resid[..., None] - g[1] * con), axis=-1)
    return jnp.stack([idx0, idx1], axis=-2)


# ------------------------------------------------------- waterfilling


def waterfilling(channel_gains, total_power: float,
                 noise_power: float = 1.0) -> jax.Array:
    """Classic waterfilling power allocation (waterfilling.rs):
    p_i = max(0, μ − N/|h_i|²) with Σp_i = P. Exact via sorting —
    pure jnp (jit/vmap-safe): all candidate water levels come from one
    cumsum over the sorted inverse gains, and μ* > inv for exactly the
    active channels, so max(μ* − inv, 0) needs no scatter."""
    g = jnp.asarray(channel_gains, REAL_DTYPE)
    inv = noise_power / jnp.maximum(jnp.abs(g) ** 2, 1e-18)
    inv_sorted = jnp.sort(inv)
    n = inv.shape[0]
    k = jnp.arange(1, n + 1, dtype=REAL_DTYPE)
    csum = jnp.cumsum(inv_sorted)
    mu_k = (total_power + csum) / k
    valid = mu_k > inv_sorted               # level covers channel k
    kstar = jnp.max(jnp.where(valid, jnp.arange(1, n + 1), 0))
    # total_power <= 0 leaves no valid level (kstar = 0): allocate
    # nothing rather than dividing by zero
    ks = jnp.maximum(kstar, 1)
    mu = (total_power + csum[ks - 1]) / ks.astype(REAL_DTYPE)
    return jnp.where(kstar > 0, jnp.maximum(mu - inv, 0.0), 0.0)


# ----------------------------------------------------- link adaptation


@dataclasses.dataclass(frozen=True)
class ModCod:
    name: str
    bits_per_symbol: float
    min_snr_db: float


DEFAULT_MODCOD_TABLE = (
    ModCod("BPSK-1/2", 0.5, 0.0),
    ModCod("QPSK-1/2", 1.0, 3.0),
    ModCod("QPSK-3/4", 1.5, 6.0),
    ModCod("16QAM-1/2", 2.0, 9.0),
    ModCod("16QAM-3/4", 3.0, 12.5),
    ModCod("64QAM-2/3", 4.0, 16.5),
    ModCod("64QAM-5/6", 5.0, 19.5),
)


class AdaptiveModcod:
    """SNR-driven MCS selection with hysteresis (adaptive_modcod.rs):
    step up only when SNR exceeds the next threshold + margin, step
    down immediately when below the current threshold."""

    def __init__(self, table=DEFAULT_MODCOD_TABLE,
                 up_margin_db: float = 1.0):
        self.table = tuple(table)
        self.up_margin_db = up_margin_db
        self.index = 0

    @property
    def current(self) -> ModCod:
        return self.table[self.index]

    def update(self, snr_db: float) -> ModCod:
        while (self.index + 1 < len(self.table)
               and snr_db >= self.table[self.index + 1].min_snr_db
               + self.up_margin_db):
            self.index += 1
        while self.index > 0 and snr_db < self.table[self.index].min_snr_db:
            self.index -= 1
        return self.current


# -------------------------------------------------------- UWB ranging


def twr_range(t_round_s: float, t_reply_s: float) -> float:
    """Two-way ranging (ultra_wideband_ranging.rs):
    d = c·(t_round − t_reply)/2."""
    return 299_792_458.0 * (t_round_s - t_reply_s) / 2.0


def leading_edge_toa(cir, sample_rate: float,
                     threshold_ratio: float = 0.2) -> jax.Array:
    """Leading-edge time of arrival on a channel impulse response: the
    first sample whose AMPLITUDE exceeds threshold_ratio × peak
    (NLOS-robust versus argmax, which locks to a late strong
    reflection)."""
    p = jnp.abs(jnp.asarray(cir))
    peak = jnp.max(p, axis=-1, keepdims=True)
    over = p >= threshold_ratio * peak
    idx = jnp.argmax(over, axis=-1)  # first True
    return idx.astype(REAL_DTYPE) / sample_rate
