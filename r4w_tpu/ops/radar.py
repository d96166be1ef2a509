"""Radar / EW / direction-finding ops.

Re-designs of cfar.rs, cfar_2d.rs, pulse_compressor.rs,
range_doppler_map.rs, mti_filter.rs, music_doa.rs, mvdr_beamformer.rs,
beamformer.rs, ambiguity_function.rs — batched array math throughout
(the CFAR window sums are one conv; range-Doppler is two batched FFTs;
MUSIC/MVDR are small eigen problems).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


def pulse_compress(rx, pulse) -> jax.Array:
    """Matched-filter pulse compression (pulse_compressor.rs): correlate
    rx against the known transmit pulse via FFT."""
    rx = jnp.asarray(rx, IQ_DTYPE)
    p = jnp.asarray(pulse, IQ_DTYPE)
    n = rx.shape[-1] + p.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    r_f = jnp.fft.fft(rx, n=nfft, axis=-1)
    p_f = jnp.fft.fft(p, n=nfft)
    out = jnp.fft.ifft(r_f * jnp.conj(p_f), axis=-1)
    return out[..., : rx.shape[-1]]


def cfar_1d(power, guard: int = 2, train: int = 8, pfa: float = 1e-4):
    """Cell-averaging CFAR (cfar.rs): detection mask + threshold.

    Training-cell mean via a conv; α from the standard CA-CFAR formula
    α = N·(Pfa^(-1/N) − 1).
    """
    p = jnp.asarray(power, REAL_DTYPE)
    n_train = 2 * train
    win = guard + train
    kernel = np.zeros(2 * win + 1, np.float32)
    kernel[:train] = 1.0
    kernel[-train:] = 1.0
    from r4w_tpu.ops.filters import fir_apply

    pad = [(0, 0)] * (p.ndim - 1) + [(win, win)]
    ext = jnp.pad(p, pad, mode="edge")
    sums = fir_apply(jnp.asarray(kernel), ext)[..., 2 * win :]
    noise = sums / n_train
    alpha = n_train * (pfa ** (-1.0 / n_train) - 1.0)
    threshold = alpha * noise
    return p > threshold, threshold


def cfar_2d(power, guard: int = 1, train: int = 4, pfa: float = 1e-4):
    """2-D CA-CFAR over a range-Doppler map (cfar_2d.rs)."""
    p = jnp.asarray(power, REAL_DTYPE)
    win = guard + train
    size = 2 * win + 1
    full = np.ones((size, size), np.float32)
    inner = np.zeros_like(full)
    g = 2 * guard + 1
    inner[train : train + g, train : train + g] = 1.0
    ring = full - inner
    n_train = float(ring.sum())
    import jax.lax as lax

    ext = jnp.pad(p, ((win, win), (win, win)), mode="edge")
    sums = lax.conv_general_dilated(
        ext[None, None, :, :], jnp.asarray(ring)[None, None, :, :],
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    noise = sums / n_train
    alpha = n_train * (pfa ** (-1.0 / n_train) - 1.0)
    return p > alpha * noise, alpha * noise


def range_doppler_map(pulses, pulse_ref=None) -> jax.Array:
    """(n_pulses, n_range) slow-time × fast-time → |RD map|²
    (range_doppler_map.rs): optional pulse compression then FFT across
    pulses."""
    x = jnp.asarray(pulses, IQ_DTYPE)
    if pulse_ref is not None:
        x = pulse_compress(x, pulse_ref)
    rd = jnp.fft.fftshift(jnp.fft.fft(x, axis=-2), axes=-2)
    return rd.real**2 + rd.imag**2


def mti_filter(pulses, order: int = 2) -> jax.Array:
    """Moving-target-indication canceller (mti_filter.rs): binomial
    difference across pulses removes stationary clutter."""
    x = jnp.asarray(pulses, IQ_DTYPE)
    for _ in range(order):
        x = x[..., 1:, :] - x[..., :-1, :]
    return x


def steering_vector(n_elements: int, spacing_wavelengths: float,
                    angles_deg) -> jax.Array:
    """ULA steering vectors: (n_angles, n_elements)."""
    ang = jnp.deg2rad(jnp.asarray(angles_deg, REAL_DTYPE))
    k = 2.0 * jnp.pi * spacing_wavelengths
    n = jnp.arange(n_elements, dtype=REAL_DTYPE)
    phase = k * jnp.sin(ang)[..., None] * n
    return cis(phase.astype(REAL_DTYPE)).astype(IQ_DTYPE)


def music_spectrum(snapshots, n_sources: int, spacing_wavelengths: float = 0.5,
                   scan_deg=None):
    """MUSIC DoA pseudo-spectrum (music_doa.rs): noise-subspace
    projection over a scan grid. snapshots: (n_elements, n_snapshots)."""
    x = jnp.asarray(snapshots, IQ_DTYPE)
    m = x.shape[0]
    r = x @ jnp.conj(x.T) / x.shape[1]
    vals, vecs = jnp.linalg.eigh(r)
    en = vecs[:, : m - n_sources]  # noise subspace (ascending eigenvalues)
    scan = jnp.asarray(scan_deg if scan_deg is not None
                       else np.linspace(-90, 90, 181), REAL_DTYPE)
    a = steering_vector(m, spacing_wavelengths, scan)  # (A, M)
    proj = jnp.einsum("am,mk->ak", jnp.conj(a), en)
    denom = jnp.sum(proj.real**2 + proj.imag**2, axis=-1)
    return scan, 1.0 / jnp.maximum(denom, 1e-12)


def mvdr_weights(snapshots, look_deg: float,
                 spacing_wavelengths: float = 0.5,
                 diagonal_loading: float = 1e-3):
    """MVDR/Capon beamformer weights (mvdr_beamformer.rs):
    w = R⁻¹a / (aᴴR⁻¹a)."""
    x = jnp.asarray(snapshots, IQ_DTYPE)
    m = x.shape[0]
    r = x @ jnp.conj(x.T) / x.shape[1] + diagonal_loading * jnp.eye(m)
    a = steering_vector(m, spacing_wavelengths,
                        jnp.asarray([look_deg]))[0]
    ri_a = jnp.linalg.solve(r, a)
    return ri_a / (jnp.conj(a) @ ri_a)


def beamform(snapshots, weights) -> jax.Array:
    """Apply beamformer weights: y[t] = wᴴ x[:, t] (beamformer.rs)."""
    return jnp.einsum(
        "m,mt->t", jnp.conj(jnp.asarray(weights, IQ_DTYPE)),
        jnp.asarray(snapshots, IQ_DTYPE),
    )


def ambiguity_function(pulse, max_doppler_bins: int = 64,
                       oversample: int = 1) -> jax.Array:
    """|χ(τ, ν)|² ambiguity surface (ambiguity_function.rs): one batched
    FFT over Doppler-shifted copies."""
    p = jnp.asarray(pulse, IQ_DTYPE)
    n = p.shape[-1]
    dops = jnp.arange(-max_doppler_bins // 2, max_doppler_bins // 2)
    t = jnp.arange(n, dtype=REAL_DTYPE) / n
    shifted = p[None, :] * cis(
        2 * jnp.pi * (dops[:, None] * t[None, :]).astype(REAL_DTYPE)
    )  # (D, N)
    nfft = 1 << (2 * n - 2).bit_length() if n > 1 else 1
    pf = jnp.fft.fft(p, n=nfft)
    sf = jnp.fft.fft(shifted, n=nfft, axis=-1)
    xc = jnp.fft.ifft(sf * jnp.conj(pf)[None, :], axis=-1)
    out = jnp.fft.fftshift(xc, axes=-1)
    return out.real**2 + out.imag**2
