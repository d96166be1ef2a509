"""Resampling & polyphase channelization ops.

Re-design of filters/polyphase.rs (PolyphaseDecimator:52,
PolyphaseInterpolator:281, Resampler:471, HalfbandFilter:657),
arbitrary_resampler.rs, pfb_channelizer.rs: everything is expressed as
reshapes + batched convs/FFTs so XLA can tile it; no per-sample loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE
from r4w_tpu.ops.filters import design_lowpass, fir_apply


def polyphase_decompose(taps: np.ndarray, phases: int) -> np.ndarray:
    """(K,) prototype -> (phases, ceil(K/phases)) polyphase bank."""
    k = len(taps)
    pad = (-k) % phases
    t = np.pad(np.asarray(taps), (0, pad))
    return t.reshape(-1, phases).T.copy()  # (phases, taps_per_phase)


def polyphase_decimate(x, taps, factor: int):
    """Efficient decimating FIR: filter+downsample in one pass
    (polyphase.rs:52). Output rate = input/factor."""
    y = fir_apply(jnp.asarray(taps), x)
    return y[..., ::factor]


def polyphase_interpolate(x, taps, factor: int):
    """Efficient interpolating FIR (polyphase.rs:281). Gain-compensated."""
    x = jnp.asarray(x)
    up = jnp.zeros(x.shape[:-1] + (x.shape[-1] * factor,), x.dtype)
    up = up.at[..., ::factor].set(x * factor)
    return fir_apply(jnp.asarray(taps), up)


def rational_resample(x, up: int, down: int, num_taps: int = 128):
    """Rational L/M resampler (polyphase.rs:471 Resampler)."""
    fs = 1.0
    cutoff = 0.5 / max(up, down) * fs
    taps = design_lowpass(num_taps, cutoff, fs)
    y = polyphase_interpolate(x, taps, up)
    return y[..., ::down]


@functools.lru_cache(maxsize=None)
def halfband_taps(num_taps: int = 31) -> np.ndarray:
    """Halfband lowpass: every other tap zero (polyphase.rs:657)."""
    assert num_taps % 2 == 1
    t = design_lowpass(num_taps, 0.25, 1.0, window="hamming")
    mid = num_taps // 2
    idx = np.arange(num_taps)
    t = np.where((idx != mid) & ((idx - mid) % 2 == 0), 0.0, t)
    return (t / t.sum()).astype(np.float32)


def halfband_decimate(x, num_taps: int = 31):
    return polyphase_decimate(x, halfband_taps(num_taps), 2)


def arbitrary_resample(x, ratio: float, num_taps: int = 8, n_filters: int = 32):
    """Arbitrary-ratio resampler via a bank of fractional-delay subfilters
    (arbitrary_resampler.rs / pfb_arb_resampler.rs).

    output[k] = interp(x, k / ratio) with windowed-sinc interpolation,
    vectorized as a gather + small matmul against an (n_filters, num_taps)
    fractional-delay bank.
    """
    from r4w_tpu.ops.filters import fractional_delay_taps

    x = jnp.asarray(x)
    n_in = x.shape[-1]
    n_out = int(np.floor(n_in * ratio))
    # sample positions in input space
    pos = jnp.arange(n_out, dtype=jnp.float64) / ratio
    base = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - base).astype(REAL_DTYPE)
    # quantize fraction to a filter index
    fidx = jnp.clip(jnp.round(frac * n_filters).astype(jnp.int32), 0,
                    n_filters - 1)
    bank = np.stack([
        fractional_delay_taps(d / n_filters, num_taps)
        for d in range(n_filters)
    ])  # (F, K)
    k = num_taps
    half = (k - 1) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, k - half)]
    ext = jnp.pad(x, pad)
    gather_idx = base[:, None] + jnp.arange(k)[None, :]  # (n_out, K)
    windows = ext[..., gather_idx]  # (..., n_out, K)
    taps = jnp.asarray(bank)[fidx]  # (n_out, K)
    # taps are designed for delay d applied to window starting at base-half;
    # windowed-sinc with fractional delay reproduces x(base + frac)
    return jnp.sum(windows * taps, axis=-1)


def pfb_channelizer(x, n_channels: int, taps_per_phase: int = 8):
    """Polyphase filterbank channelizer (pfb_channelizer.rs).

    Splits x into n_channels equally-spaced baseband channels, each at
    fs/n_channels: polyphase filter + FFT across phases. Returns
    (..., n_frames, n_channels) complex.
    """
    x = jnp.asarray(x, IQ_DTYPE)
    proto = design_lowpass(n_channels * taps_per_phase,
                           0.5 / n_channels, 1.0)
    bank = jnp.asarray(polyphase_decompose(proto, n_channels))  # (C, T)
    n = x.shape[-1]
    n_frames = n // n_channels - taps_per_phase + 1
    if n_frames <= 0:
        return jnp.zeros(x.shape[:-1] + (0, n_channels), IQ_DTYPE)
    # commutator: sample m*C + c feeds phase c (reversed order)
    frames = x[..., : (n // n_channels) * n_channels].reshape(
        *x.shape[:-1], -1, n_channels
    )  # (..., M, C)
    # sliding dot along M with per-phase taps
    idx = jnp.arange(n_frames)[:, None] + jnp.arange(taps_per_phase)[None, :]
    windows = frames[..., idx, :]  # (..., n_frames, T, C)
    filtered = jnp.einsum("...ftc,ct->...fc", windows,
                          bank * n_channels)  # scale for unity passband
    # fft across phases maps a tone at +k/C to channel k
    return jnp.fft.fft(filtered, axis=-1)


def pfb_synthesizer(channels, taps_per_phase: int = 8):
    """Inverse of pfb_channelizer (pfb_synthesizer.rs): combine
    (..., n_frames, C) channel samples into one stream at C× rate."""
    channels = jnp.asarray(channels, IQ_DTYPE)
    c = channels.shape[-1]
    spectra = jnp.fft.ifft(channels, axis=-1)  # (..., F, C)
    proto = design_lowpass(c * taps_per_phase, 0.5 / c, 1.0)
    bank = jnp.asarray(polyphase_decompose(proto, c))  # (C, T)
    # each output frame m, phase p: sum_t bank[p,t]*spectra[m-t, p]
    f = spectra.shape[-2]
    pad = [(0, 0)] * (spectra.ndim - 2) + [(taps_per_phase - 1, 0), (0, 0)]
    ext = jnp.pad(spectra, pad)
    idx = jnp.arange(f)[:, None] + jnp.arange(taps_per_phase)[None, :]
    windows = ext[..., idx, :]  # (..., F, T, C)
    out = jnp.einsum("...ftc,ct->...fc", windows, bank[:, ::-1] * c)
    return out.reshape(*out.shape[:-2], -1)
