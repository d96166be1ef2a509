"""Tapped-delay-line multipath with 3GPP profiles (channel.rs:95-304 re-design).

EPA/EVA/ETU tap tables, per-tap Rayleigh fading with Jakes Doppler, and
delay/accumulate — fully vectorized over (taps × samples).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import zeros_like_safe
import numpy as np

from r4w_tpu.channel.doppler import jakes_fading
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# 3GPP TS 36.101 tap profiles: (delay_ns, power_db) (channel.rs:95-136)
TDL_PROFILES = {
    "EPA": (
        [0, 30, 70, 90, 110, 190, 410],
        [0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8],
    ),
    "EVA": (
        [0, 30, 150, 310, 370, 710, 1090, 1730, 2510],
        [0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9],
    ),
    "ETU": (
        [0, 50, 120, 200, 230, 500, 1600, 2300, 5000],
        [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0],
    ),
}


def profile_taps(profile: str, sample_rate: float):
    """(delays_in_samples int[], normalized linear amplitudes f32[])."""
    delays_ns, powers_db = TDL_PROFILES[profile.upper()]
    delays = np.round(np.asarray(delays_ns) * 1e-9 * sample_rate).astype(int)
    p_lin = 10.0 ** (np.asarray(powers_db) / 10.0)
    p_lin = p_lin / p_lin.sum()  # unit total power
    return delays, np.sqrt(p_lin).astype(np.float32)


def rms_delay_spread(profile: str) -> float:
    """RMS delay spread in seconds (channel.rs:183-230)."""
    delays_ns, powers_db = TDL_PROFILES[profile.upper()]
    d = np.asarray(delays_ns) * 1e-9
    p = 10.0 ** (np.asarray(powers_db) / 10.0)
    p = p / p.sum()
    mean = (p * d).sum()
    return float(np.sqrt((p * (d - mean) ** 2).sum()))


def coherence_bandwidth(profile: str) -> float:
    """Approximate 50%-correlation coherence BW = 1/(5·τ_rms)."""
    return 1.0 / (5.0 * rms_delay_spread(profile))


def tdl_channel(key, samples, profile: str, sample_rate, doppler_hz,
                n_oscillators: int = 16):
    """Apply a fading TDL: y[n] = Σ_taps a_k · h_k[n] · x[n - d_k].

    Each tap gets an independent Jakes fading process; delays are static
    integer sample offsets from the 3GPP profile.
    """
    samples = jnp.asarray(samples, IQ_DTYPE)
    n = samples.shape[-1]
    delays, amps = profile_taps(profile, float(sample_rate))
    keys = jax.random.split(key, len(delays))
    out = zeros_like_safe(samples)
    for d, a, k in zip(delays, amps, keys):
        h = jakes_fading(k, n, doppler_hz, sample_rate, n_oscillators)
        if d > 0:
            pad = [(0, 0)] * (samples.ndim - 1) + [(int(d), 0)]
            x_d = jnp.pad(samples, pad)[..., :n]
        else:
            x_d = samples
        out = out + jnp.asarray(a, REAL_DTYPE) * h * x_d
    return out
