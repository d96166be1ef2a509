"""Hardware impairment models (hw_impairments.rs, noise.rs,
power_amplifier_model.rs,
iq_imbalance.rs, iq_imbalance_corrector.rs, iq_imbalance_estimator.rs,
digital_predistortion.rs re-designs).

Pure functions over IQ blocks with explicit PRNG keys for stochastic
impairments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


def phase_noise(key, x, linewidth_hz, sample_rate):
    """Wiener phase noise: random-walk phase with variance
    2π·linewidth/fs per sample (hw_impairments.rs PhaseNoiseGenerator:33)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    std = jnp.sqrt(2.0 * jnp.pi * linewidth_hz / sample_rate)
    steps = jax.random.normal(key, x.shape[:-1] + (n,), REAL_DTYPE) * std
    phi = jnp.cumsum(steps, axis=-1)
    return x * cis(phi.astype(REAL_DTYPE))


def iq_imbalance(x, gain_db=0.5, phase_deg=2.0):
    """Static gain/phase IQ imbalance (hw_impairments.rs
    IqImbalanceGenerator:114): I' = g·I, Q' = Q·cosφ + I·sinφ."""
    x = jnp.asarray(x, IQ_DTYPE)
    g = 10.0 ** (jnp.asarray(gain_db, REAL_DTYPE) / 20.0)
    phi = jnp.deg2rad(jnp.asarray(phase_deg, REAL_DTYPE))
    i = g * x.real
    q = x.imag * jnp.cos(phi) + x.real * jnp.sin(phi)
    return jax.lax.complex(i, q).astype(IQ_DTYPE)


def iq_imbalance_estimate(x):
    """Blind gain/phase imbalance estimate (iq_imbalance_estimator.rs):
    gain = sqrt(E[I²]/E[Q²]), phase from E[I·Q]."""
    x = jnp.asarray(x, IQ_DTYPE)
    pi = jnp.mean(x.real**2, axis=-1)
    pq = jnp.mean(x.imag**2, axis=-1)
    cross = jnp.mean(x.real * x.imag, axis=-1)
    gain = jnp.sqrt(pi / jnp.maximum(pq, 1e-12))
    phase = jnp.arcsin(jnp.clip(cross / jnp.sqrt(
        jnp.maximum(pi * pq, 1e-24)), -1.0, 1.0))
    return gain, phase


def iq_imbalance_correct(x, gain, phase):
    """Invert `iq_imbalance` given estimates (iq_imbalance_corrector.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    i = x.real / gain
    q = (x.imag - i * jnp.sin(phase)) / jnp.cos(phase)
    return jax.lax.complex(i, q).astype(IQ_DTYPE)


def dc_offset(x, offset_i=0.0, offset_q=0.0):
    """Additive DC (hw_impairments.rs DcOffset:166)."""
    off = jax.lax.complex(jnp.asarray(offset_i, REAL_DTYPE),
                          jnp.asarray(offset_q, REAL_DTYPE))
    return jnp.asarray(x, IQ_DTYPE) + off


def saleh_pa(x, alpha_a=2.1587, beta_a=1.1517, alpha_p=4.0033, beta_p=9.1040):
    """Saleh TWT/SSPA nonlinearity (power_amplifier_model.rs):
    AM/AM = αa·r/(1+βa·r²), AM/PM = αp·r²/(1+βp·r²)."""
    x = jnp.asarray(x, IQ_DTYPE)
    r = jnp.abs(x)
    r2 = r * r
    gain = alpha_a / (1.0 + beta_a * r2)
    pm = alpha_p * r2 / (1.0 + beta_p * r2)
    return (x * gain * cis(pm.astype(REAL_DTYPE))).astype(IQ_DTYPE)


def rapp_pa(x, saturation=1.0, smoothness=2.0):
    """Rapp SSPA model: amplitude-only soft clipping."""
    x = jnp.asarray(x, IQ_DTYPE)
    r = jnp.abs(x)
    g = 1.0 / (1.0 + (r / saturation) ** (2 * smoothness)) ** (
        1.0 / (2 * smoothness)
    )
    return (x * g).astype(IQ_DTYPE)


def quantize_dac(x, bits: int = 12, full_scale: float = 1.0):
    """Uniform DAC quantization (dac_model.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    levels = 2 ** (bits - 1)
    step = full_scale / levels
    q = lambda v: jnp.clip(jnp.round(v / step), -levels, levels - 1) * step
    return jax.lax.complex(q(x.real), q(x.imag)).astype(IQ_DTYPE)
