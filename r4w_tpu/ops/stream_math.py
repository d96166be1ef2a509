"""Stream math & conversion blocks — the GNU-Radio-style plumbing tail.

Re-designs of the reference's flat conversion/arithmetic blocks
(complex_to_mag_phase.rs, complex_to_arg.rs, complex_normalize.rs,
conjugate.rs, abs_blk.rs, add_blk.rs, multiply.rs, rail.rs,
sigma_delta.rs, arithmetic.rs, argmax.rs,
bin_statistics.rs, threshold.rs, signal_clipper.rs, binary_slicer.rs,
char_to_float.rs, type_conversions.rs, bit_packing.rs,
unpacked_to_packed.rs, complex_to_interleaved.rs, stream_arithmetic.rs,
uniform_scalar_quantizer.rs, sigma_delta_modulator.rs,
companding_codec.rs, adpcm_codec.rs, vco.rs,
digital_down_converter.rs). Each is a small pure batched function —
exactly what these blocks are in the reference, minus the per-sample
loops.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import cis
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# ------------------------------------------------------- conversions


def complex_to_mag_phase(x):
    x = jnp.asarray(x, IQ_DTYPE)
    return jnp.abs(x).astype(REAL_DTYPE), jnp.angle(x).astype(REAL_DTYPE)


def mag_phase_to_complex(mag, phase):
    return (jnp.asarray(mag, REAL_DTYPE)
            * cis(jnp.asarray(phase, REAL_DTYPE))).astype(IQ_DTYPE)


def complex_to_arg(x):
    return jnp.angle(jnp.asarray(x, IQ_DTYPE)).astype(REAL_DTYPE)


def complex_normalize(x, epsilon: float = 1e-12):
    x = jnp.asarray(x, IQ_DTYPE)
    return x / jnp.maximum(jnp.abs(x), epsilon)


def complex_to_interleaved(x) -> jax.Array:
    """(..., N) complex -> (..., 2N) interleaved re/im f32."""
    x = jnp.asarray(x, IQ_DTYPE)
    out = jnp.stack([x.real, x.imag], axis=-1)
    return out.reshape(*x.shape[:-1], -1).astype(REAL_DTYPE)


def interleaved_to_complex(x) -> jax.Array:
    x = jnp.asarray(x, REAL_DTYPE)
    pairs = x.reshape(*x.shape[:-1], -1, 2)
    return jax.lax.complex(pairs[..., 0], pairs[..., 1]).astype(IQ_DTYPE)


def char_to_float(x, scale: float = 128.0):
    return jnp.asarray(x, jnp.int32).astype(REAL_DTYPE) / scale


def float_to_char(x, scale: float = 128.0):
    return jnp.clip(jnp.round(jnp.asarray(x, REAL_DTYPE) * scale),
                    -128, 127).astype(jnp.int32)


# -------------------------------------------------------- arithmetic


def stream_add(*xs):
    out = jnp.asarray(xs[0])
    for x in xs[1:]:
        out = out + jnp.asarray(x)
    return out


def stream_multiply(*xs):
    out = jnp.asarray(xs[0])
    for x in xs[1:]:
        out = out * jnp.asarray(x)
    return out


def stream_abs(x):
    return jnp.abs(jnp.asarray(x)).astype(REAL_DTYPE)


def stream_conjugate(x):
    return jnp.conj(jnp.asarray(x, IQ_DTYPE))


def argmax_block(x, axis: int = -1):
    """(index, value) of the max (argmax.rs)."""
    x = jnp.asarray(x)
    idx = jnp.argmax(x, axis=axis)
    return idx, jnp.max(x, axis=axis)


def bin_statistics(x, n_bins: int):
    """Per-bin min/max/mean over equal chunks (bin_statistics.rs)."""
    x = jnp.asarray(x, REAL_DTYPE)
    m = x.shape[-1] // n_bins
    b = x[..., : m * n_bins].reshape(*x.shape[:-1], n_bins, m)
    return jnp.min(b, -1), jnp.max(b, -1), jnp.mean(b, -1)


def threshold_block(x, lo: float, hi: float | None = None):
    """Hysteresis comparator (threshold.rs): output 1 above hi, 0 below
    lo, holds in between (scan). hi defaults to lo."""
    x = jnp.asarray(x, REAL_DTYPE)
    hi = lo if hi is None else hi

    def step(state, xt):
        new = jnp.where(xt >= hi, 1.0, jnp.where(xt <= lo, 0.0, state))
        return new, new

    _, y = lax.scan(step, jnp.zeros(x.shape[:-1], REAL_DTYPE),
                    jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def signal_clipper(x, limit: float):
    """Hard amplitude clip; complex keeps phase (signal_clipper.rs)."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        mag = jnp.abs(x)
        scale = jnp.minimum(1.0, limit / jnp.maximum(mag, 1e-12))
        return x * scale
    return jnp.clip(x, -limit, limit)


def binary_slicer(x):
    """sign -> bits (binary_slicer.rs): x >= 0 -> 1 else 0."""
    return (jnp.real(jnp.asarray(x)) >= 0).astype(jnp.int32)


# ------------------------------------------------------ bit packing


def pack_bits(bits, bits_per_word: int = 8, msb_first: bool = True):
    """(..., N) bits -> (..., N/k) words (bit_packing.rs,
    unpacked_to_packed.rs)."""
    b = jnp.asarray(bits, jnp.int32)
    n = b.shape[-1] // bits_per_word
    grp = b[..., : n * bits_per_word].reshape(*b.shape[:-1], n,
                                              bits_per_word)
    if msb_first:
        w = 2 ** jnp.arange(bits_per_word - 1, -1, -1)
    else:
        w = 2 ** jnp.arange(bits_per_word)
    return jnp.sum(grp * w, axis=-1)


def unpack_bits(words, bits_per_word: int = 8, msb_first: bool = True):
    w = jnp.asarray(words, jnp.int32)
    if msb_first:
        sh = jnp.arange(bits_per_word - 1, -1, -1)
    else:
        sh = jnp.arange(bits_per_word)
    return ((w[..., None] >> sh) & 1).reshape(*w.shape[:-1], -1)


# ------------------------------------------------------ quantization


def uniform_quantize(x, n_bits: int, full_scale: float = 1.0):
    """Mid-rise uniform quantizer -> (levels int, reconstructed)
    (uniform_scalar_quantizer.rs)."""
    x = jnp.asarray(x, REAL_DTYPE)
    n_levels = 1 << n_bits
    step = 2.0 * full_scale / n_levels
    idx = jnp.clip(jnp.floor((x + full_scale) / step), 0, n_levels - 1)
    recon = (idx + 0.5) * step - full_scale
    return idx.astype(jnp.int32), recon.astype(REAL_DTYPE)


def sigma_delta_modulate(x):
    """First-order ΣΔ: 1-bit stream whose running mean tracks x
    (sigma_delta_modulator.rs). Scan over samples."""
    x = jnp.asarray(x, REAL_DTYPE)

    def step(integ, xt):
        y = jnp.where(integ >= 0, 1.0, -1.0)
        return integ + xt - y, (y > 0).astype(jnp.int32)

    _, bits = lax.scan(step, jnp.zeros(x.shape[:-1], REAL_DTYPE),
                       jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(bits, 0, -1)


def mu_law_encode(x, mu: float = 255.0):
    """µ-law compression to [-1, 1] (companding_codec.rs)."""
    x = jnp.asarray(x, REAL_DTYPE)
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)


def mu_law_decode(y, mu: float = 255.0):
    y = jnp.asarray(y, REAL_DTYPE)
    return jnp.sign(y) * ((1.0 + mu) ** jnp.abs(y) - 1.0) / mu


_IMA_STEP = np.asarray([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], np.int32)
_IMA_INDEX = np.asarray([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _adpcm_delta(step, nib):
    """Reconstruction delta for a nibble at a given step (shared by
    encode/decode; all int32 jnp ops)."""
    return ((step >> 3) + (nib & 1) * (step >> 2)
            + ((nib >> 1) & 1) * (step >> 1)
            + ((nib >> 2) & 1) * step)


def adpcm_encode(pcm16) -> tuple[jax.Array, tuple]:
    """IMA ADPCM 4-bit encode (adpcm_codec.rs) as a lax.scan over the
    (predictor, index) state. Returns (nibbles, final state)."""
    x = jnp.asarray(pcm16, jnp.int32)
    steps = jnp.asarray(_IMA_STEP)
    idx_adj = jnp.asarray(_IMA_INDEX)

    def enc(carry, s):
        pred, idx = carry
        step = steps[idx]
        diff = s - pred
        sign = (diff < 0).astype(jnp.int32) * 8
        diff = jnp.abs(diff)
        b4 = (diff >= step).astype(jnp.int32)
        diff = diff - b4 * step
        b2 = (diff >= (step >> 1)).astype(jnp.int32)
        diff = diff - b2 * (step >> 1)
        b1 = (diff >= (step >> 2)).astype(jnp.int32)
        nib = sign | (b4 << 2) | (b2 << 1) | b1
        delta = _adpcm_delta(step, nib)
        pred = pred + jnp.where(nib & 8, -delta, delta)
        pred = jnp.clip(pred, -32768, 32767)
        idx = jnp.clip(idx + idx_adj[nib & 7], 0, 88)
        return (pred, idx), nib

    (pred, idx), out = jax.lax.scan(
        enc, (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)), x)
    return out, (pred, idx)


def adpcm_decode(nibbles, state: tuple = (0, 0)) -> jax.Array:
    steps = jnp.asarray(_IMA_STEP)
    idx_adj = jnp.asarray(_IMA_INDEX)

    def dec(carry, nib):
        pred, idx = carry
        step = steps[idx]
        delta = _adpcm_delta(step, nib)
        pred = pred + jnp.where(nib & 8, -delta, delta)
        pred = jnp.clip(pred, -32768, 32767)
        idx = jnp.clip(idx + idx_adj[nib & 7], 0, 88)
        return (pred, idx), pred

    init = (jnp.asarray(state[0], jnp.int32),
            jnp.asarray(state[1], jnp.int32))
    _, out = jax.lax.scan(dec, init, jnp.asarray(nibbles, jnp.int32))
    return out


# ------------------------------------------------------------- NCOs


def vco(control, sensitivity_hz_per_unit: float, sample_rate: float,
        phase0: float = 0.0):
    """Voltage-controlled oscillator: phase integral of the control
    signal (vco.rs) — a cumsum, not a per-sample loop."""
    c = jnp.asarray(control, REAL_DTYPE)
    dphi = 2.0 * jnp.pi * sensitivity_hz_per_unit * c / sample_rate
    phase = phase0 + jnp.cumsum(dphi, axis=-1)
    return cis(phase.astype(REAL_DTYPE))


def digital_down_convert(x, center_hz: float, sample_rate: float,
                         decimation: int, taps=None):
    """DDC: mix to baseband + lowpass + decimate
    (digital_down_converter.rs) on the production FIR path."""
    from r4w_tpu.ops.filters import decimating_fir, design_lowpass

    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    ph = (-2.0 * jnp.pi * center_hz / sample_rate
          * jnp.arange(n, dtype=REAL_DTYPE))
    base = x * cis(ph.astype(REAL_DTYPE))
    if taps is None:
        taps = design_lowpass(63, sample_rate / (2.5 * decimation),
                              sample_rate)
    y, _ = decimating_fir(taps, base, decimation)
    return y


def burst_shape(x, ramp: int = 32, window: str = "hann"):
    """Apply raised-cosine amplitude ramps to burst edges
    (burst_shaper.rs): suppresses keying splatter. ramp = samples of
    attack/decay; the middle is untouched."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    if 2 * ramp >= n:
        ramp = max(n // 2 - 1, 1)
    t = jnp.arange(ramp, dtype=REAL_DTYPE) / ramp
    up = 0.5 * (1.0 - jnp.cos(jnp.pi * t))
    env = jnp.concatenate([up, jnp.ones(n - 2 * ramp, REAL_DTYPE),
                           up[::-1]])
    return x * env
