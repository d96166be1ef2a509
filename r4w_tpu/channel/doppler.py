"""Doppler fading generators (crates/r4w-sim/src/doppler.rs re-design).

Jakes sum-of-sinusoids, flat, and Gaussian Doppler processes as pure
functions of a PRNG key — the per-sample oscillator state of the
reference becomes a closed-form time series evaluated over the whole
block at once (ideal for the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

LIGHT_SPEED = 299_792_458.0


def velocity_to_doppler(velocity_mps, carrier_hz):
    """Max Doppler shift for a given speed (doppler.rs:71-80)."""
    return velocity_mps * carrier_hz / LIGHT_SPEED


def jakes_fading(key, n_samples: int, doppler_hz, sample_rate,
                 n_oscillators: int = 16):
    """Jakes sum-of-sinusoids complex fading gain h[n] (doppler.rs:87-240).

    Returns (n_samples,) complex64 with E[|h|^2] ~= 1. The M oscillator
    arrival angles are uniform around the circle with random phases; the
    whole series is one (M × N) outer-product evaluation.
    """
    k_alpha, k_phi_i, k_phi_q = jax.random.split(key, 3)
    m = n_oscillators
    # arrival angles with a random rotation (classic Jakes has deterministic
    # angles; randomizing decorrelates Monte-Carlo lanes)
    alpha = (jnp.arange(m) + jax.random.uniform(k_alpha, (m,))) * (
        2.0 * jnp.pi / m
    )
    phi_i = jax.random.uniform(k_phi_i, (m,), REAL_DTYPE, 0.0, 2.0 * jnp.pi)
    phi_q = jax.random.uniform(k_phi_q, (m,), REAL_DTYPE, 0.0, 2.0 * jnp.pi)
    t = jnp.arange(n_samples, dtype=REAL_DTYPE) / sample_rate
    w = 2.0 * jnp.pi * doppler_hz * jnp.cos(alpha)  # (M,)
    arg = w[:, None] * t[None, :]  # (M, N)
    i = jnp.sum(jnp.cos(arg + phi_i[:, None]), axis=0)
    q = jnp.sum(jnp.cos(arg + phi_q[:, None]), axis=0)
    h = jax.lax.complex(i, q) / jnp.sqrt(m)
    return h.astype(IQ_DTYPE)


def flat_doppler_shift(n_samples: int, doppler_hz, sample_rate):
    """Pure frequency shift e^{j2π f_d t} (doppler.rs:244-320 Flat)."""
    t = jnp.arange(n_samples, dtype=REAL_DTYPE) / sample_rate
    return cis((2.0 * jnp.pi * doppler_hz * t).astype(REAL_DTYPE)).astype(
        IQ_DTYPE
    )


def gaussian_doppler_fading(key, n_samples: int, doppler_std_hz, sample_rate,
                            n_oscillators: int = 16):
    """Gaussian Doppler-spectrum fading (doppler.rs:329-410): sum of
    sinusoids with normally-distributed frequencies."""
    k_f, k_phi_i, k_phi_q = jax.random.split(key, 3)
    m = n_oscillators
    freqs = jax.random.normal(k_f, (m,), REAL_DTYPE) * doppler_std_hz
    phi_i = jax.random.uniform(k_phi_i, (m,), REAL_DTYPE, 0.0, 2.0 * jnp.pi)
    phi_q = jax.random.uniform(k_phi_q, (m,), REAL_DTYPE, 0.0, 2.0 * jnp.pi)
    t = jnp.arange(n_samples, dtype=REAL_DTYPE) / sample_rate
    arg = 2.0 * jnp.pi * freqs[:, None] * t[None, :]
    i = jnp.sum(jnp.cos(arg + phi_i[:, None]), axis=0)
    q = jnp.sum(jnp.cos(arg + phi_q[:, None]), axis=0)
    return (jax.lax.complex(i, q) / jnp.sqrt(m)).astype(IQ_DTYPE)
