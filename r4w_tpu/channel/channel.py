"""Channel models as pure, composable JAX functions.

Re-design of crates/r4w-sim/src/channel.rs (and the core-side
channel_model.rs block wrapper): the reference's stateful
`Channel::apply` (channel.rs:618-646) with an internal RNG becomes a set
of pure functions taking explicit `jax.random.PRNGKey`s. That makes every
model jit/vmap-composable — thousands of Monte-Carlo fading/noise lanes
per chip via `vmap(keys)` instead of serial per-sample `rng.sample()`.

All functions take/return (..., N) complex64 blocks and operate on the
last axis.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


def _complex_normal(key, shape, std):
    """Circular complex Gaussian with per-component std `std`."""
    re_key, im_key = jax.random.split(key)
    re = jax.random.normal(re_key, shape, REAL_DTYPE) * std
    im = jax.random.normal(im_key, shape, REAL_DTYPE) * std
    return jax.lax.complex(re, im).astype(IQ_DTYPE)


def awgn(key, samples, snr_db, path_loss_db=0.0, measured_power=None):
    """AWGN at a target SNR (channel.rs:667-699).

    Noise power is derived from the measured mean signal power (matching
    the reference), or `measured_power` if given. Path loss attenuates the
    signal before noise is added.
    """
    samples = jnp.asarray(samples, IQ_DTYPE)
    if measured_power is None:
        sig_power = jnp.mean(samples.real**2 + samples.imag**2, axis=-1,
                             keepdims=True)
    else:
        sig_power = jnp.asarray(measured_power, REAL_DTYPE)
    snr_lin = 10.0 ** (jnp.asarray(snr_db, REAL_DTYPE) / 10.0)
    noise_power = sig_power / snr_lin
    noise_std = jnp.sqrt(noise_power / 2.0)
    attenuation = 10.0 ** (-jnp.asarray(path_loss_db, REAL_DTYPE) / 20.0)
    noise = _complex_normal(key, samples.shape, 1.0)
    return samples * attenuation + noise * noise_std


def cfo(samples, cfo_hz, sample_rate, initial_phase=0.0):
    """Carrier frequency offset rotation (channel.rs:701-721)."""
    samples = jnp.asarray(samples, IQ_DTYPE)
    n = samples.shape[-1]
    # Naive f32 `f*t` loses ~f*n*2^-24 cycles of carrier phase on long
    # blocks. Split t = t_hi*4096 + t_lo: f*4096 is an exact f32 exponent
    # shift, and its mod-1 fraction is exactly the low mantissa bits, so
    # both partial products stay small before the final mod — phase error
    # stays ~1e-4 cycles regardless of block length.
    idx = jnp.arange(n)
    t_hi = (idx // 4096).astype(jnp.float32)
    t_lo = (idx % 4096).astype(jnp.float32)
    f = (jnp.asarray(cfo_hz, jnp.float32)
         / jnp.asarray(sample_rate, jnp.float32))
    c_hi = jnp.mod(f * 4096.0, 1.0)
    cycles = jnp.mod(jnp.mod(c_hi * t_hi, 1.0) + jnp.mod(f * t_lo, 1.0), 1.0)
    phase = initial_phase + 2.0 * jnp.pi * cycles
    return samples * cis(phase.astype(jnp.float32)).astype(IQ_DTYPE)


def multipath_2ray(samples, delay_samples: int, amplitude: float):
    """Two-ray static multipath: y[n] = x[n] + a·x[n-d] (channel.rs:724-748)."""
    samples = jnp.asarray(samples, IQ_DTYPE)
    if delay_samples == 0 or amplitude == 0.0:
        return samples
    pad = [(0, 0)] * (samples.ndim - 1) + [(delay_samples, 0)]
    delayed = jnp.pad(samples, pad)[..., : samples.shape[-1]]
    return samples + amplitude * delayed


def rayleigh(key, samples):
    """Per-sample iid Rayleigh fading h ~ CN(0,1) (channel.rs:750-764)."""
    samples = jnp.asarray(samples, IQ_DTYPE)
    h = _complex_normal(key, samples.shape, 1.0 / jnp.sqrt(2.0))
    return samples * h


def rician(key, samples, k_factor):
    """Rician fading: LOS + scattered, K-factor ratio (channel.rs:766-790)."""
    samples = jnp.asarray(samples, IQ_DTYPE)
    k = jnp.asarray(k_factor, REAL_DTYPE)
    los_amp = jnp.sqrt(k / (k + 1.0))
    scatter_amp = jnp.sqrt(1.0 / (k + 1.0))
    scattered = _complex_normal(key, samples.shape, scatter_amp / jnp.sqrt(2.0))
    return samples * (los_amp + scattered)


def block_fading(key, samples, coherence_samples: int):
    """Block Rayleigh fading: one CN(0,1) coefficient per coherence block."""
    samples = jnp.asarray(samples, IQ_DTYPE)
    n = samples.shape[-1]
    n_blocks = -(-n // coherence_samples)
    h = _complex_normal(key, samples.shape[:-1] + (n_blocks,), 1.0 / jnp.sqrt(2.0))
    h_full = jnp.repeat(h, coherence_samples, axis=-1)[..., :n]
    return samples * h_full


ChannelModelName = Literal[
    "ideal", "awgn", "awgn_cfo", "multipath", "rayleigh", "rician",
    "tdl_awgn", "jakes", "freq_selective",
]


@dataclasses.dataclass(frozen=True)
class ChannelConfig:
    """Mirror of channel.rs ChannelConfig (subset grows with the models)."""

    model: str = "awgn"
    snr_db: float = 20.0
    sample_rate: float = 125_000.0
    cfo_hz: float = 0.0
    path_loss_db: float = 0.0
    multipath_delay: int = 0
    multipath_amplitude: float = 0.0
    rician_k: float = 5.0
    doppler_hz: float = 50.0
    tdl_profile: str = "EPA"


def apply_channel(key, samples, config: ChannelConfig):
    """Dispatch like Channel::apply (channel.rs:618-646), but pure."""
    model = config.model.lower()
    if model == "ideal":
        return jnp.asarray(samples, IQ_DTYPE)
    if model == "awgn":
        return awgn(key, samples, config.snr_db, config.path_loss_db)
    if model in ("awgn_cfo", "awgnwithcfo"):
        k1, k2 = jax.random.split(key)
        del k1
        rotated = cfo(samples, config.cfo_hz, config.sample_rate)
        return awgn(k2, rotated, config.snr_db, config.path_loss_db)
    if model == "multipath":
        faded = multipath_2ray(samples, config.multipath_delay,
                               config.multipath_amplitude)
        return awgn(key, faded, config.snr_db, config.path_loss_db)
    if model == "rayleigh":
        return rayleigh(key, samples)
    if model == "rician":
        return rician(key, samples, config.rician_k)
    if model in ("tdl_awgn", "tdlawgn", "freq_selective", "frequencyselective"):
        from r4w_tpu.channel.tdl import tdl_channel

        k1, k2 = jax.random.split(key)
        faded = tdl_channel(k1, samples, config.tdl_profile, config.sample_rate,
                            config.doppler_hz)
        return awgn(k2, faded, config.snr_db, config.path_loss_db)
    if model in ("jakes", "jakesfading"):
        from r4w_tpu.channel.doppler import jakes_fading

        k1, k2 = jax.random.split(key)
        faded = samples * jakes_fading(
            k1, jnp.shape(samples)[-1], config.doppler_hz, config.sample_rate
        )
        return awgn(k2, faded, config.snr_db, config.path_loss_db)
    raise ValueError(f"unknown channel model: {config.model}")


def theoretical_ber_awgn(snr_db, spreading_factor: int):
    """Approximate LoRa BER over AWGN (channel.rs:788-800)."""
    snr_lin = 10.0 ** (jnp.asarray(snr_db, REAL_DTYPE) / 10.0)
    sf = spreading_factor
    # Processing gain: 2^SF chips/symbol
    gamma = snr_lin * (2.0**sf) / sf
    q = 0.5 * jax.scipy.special.erfc(jnp.sqrt(gamma / 2.0) / jnp.sqrt(2.0))
    return jnp.clip(q, 0.0, 0.5)


def measure_snr(clean, noisy):
    """Empirical SNR in dB between a clean signal and its noisy copy."""
    clean = jnp.asarray(clean, IQ_DTYPE)
    noise = jnp.asarray(noisy, IQ_DTYPE) - clean
    ps = jnp.mean(jnp.abs(clean) ** 2, axis=-1)
    pn = jnp.mean(jnp.abs(noise) ** 2, axis=-1)
    return 10.0 * jnp.log10(ps / jnp.maximum(pn, 1e-30))
