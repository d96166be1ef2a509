"""Pallas TPU kernels for the hot compute paths.

Three kernels re-expressing reference hot loops (SURVEY.md §2.8) the
TPU way:

* `dechirp_power_mxu` — LoRa dechirp + spectrum power as ONE fused
  kernel: the per-symbol downchirp multiply feeds a DFT *matmul* on the
  MXU (split re/im), never spilling the mixed signal to HBM. For
  SF≤9 the K×K DFT-as-matmul keeps the MXU busy where a tiny FFT
  would underutilize it; larger SFs stay on XLA's FFT.
* `fir_decimate` — tiled FIR + decimation: taps live in VMEM, each grid
  step computes a block of decimated outputs as a windowed matmul.
* `nco_mix` — fused oscillator rotate + gain: phase ramp computed
  in-kernel from scalar params (SMEM), no materialized carrier.

All kernels run in interpreter mode off-TPU (tests) and compiled on
TPU. Complex data crosses the pallas boundary as split re/im f32
planes (TPU-native layout; also sidesteps the axon tunnel's complex
transfer gaps — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import REAL_DTYPE

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover - pallas always present in this env
    _HAVE_PALLAS = False


def pallas_available() -> bool:
    return _HAVE_PALLAS


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# --------------------------------------------------------------------------
# 1. Fused dechirp + DFT-power (LoRa demod hot loop, demodulation.rs:167)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dft_mats(k: int):
    """Real/imag DFT matrices (K, K) as float32 numpy."""
    n = np.arange(k)
    w = np.exp(-2j * np.pi * np.outer(n, n) / k)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _dechirp_power_kernel(xr_ref, xi_ref, dr_ref, di_ref, wr_ref, wi_ref,
                          out_ref):
    """One grid step: a tile of symbols.

    x: (TS, K) received symbol block (re/im), d: (K,) downchirp planes
    broadcast, W: (K, K) DFT matrices. out: (TS, K) |spectrum|².
    """
    xr = xr_ref[:]
    xi = xi_ref[:]
    dr = dr_ref[:]
    di = di_ref[:]
    # dechirp: m = x * d (complex multiply), fused in VMEM
    mr = xr * dr - xi * di
    mi = xr * di + xi * dr
    # DFT via MXU: S = m @ W  (complex via 4 real matmuls)
    wr = wr_ref[:]
    wi = wi_ref[:]
    sr = (jnp.dot(mr, wr, preferred_element_type=jnp.float32)
          - jnp.dot(mi, wi, preferred_element_type=jnp.float32))
    si = (jnp.dot(mr, wi, preferred_element_type=jnp.float32)
          + jnp.dot(mi, wr, preferred_element_type=jnp.float32))
    out_ref[:] = sr * sr + si * si


def dechirp_power_mxu(samples: jax.Array, downchirp: jax.Array,
                      tile_symbols: int = 8,
                      interpret: bool | None = None) -> jax.Array:
    """(S, K) complex symbols × (K,) downchirp -> (S, K) spectrum power.

    Pallas path of lora demodulate_symbols: dechirp and DFT are fused in
    one VMEM-resident kernel with the DFT on the MXU.
    """
    if interpret is None:
        interpret = not _on_tpu()
    s, k = samples.shape
    wr_np, wi_np = _dft_mats(k)
    # pad symbol count to tile multiple
    pad = (-s) % tile_symbols
    if pad:
        samples = jnp.pad(samples, ((0, pad), (0, 0)))
    sp = samples.shape[0]
    xr = samples.real.astype(REAL_DTYPE)
    xi = samples.imag.astype(REAL_DTYPE)
    dr = jnp.broadcast_to(downchirp.real.astype(REAL_DTYPE), (tile_symbols, k))
    di = jnp.broadcast_to(downchirp.imag.astype(REAL_DTYPE), (tile_symbols, k))
    grid = (sp // tile_symbols,)
    out = pl.pallas_call(
        _dechirp_power_kernel,
        out_shape=jax.ShapeDtypeStruct((sp, k), REAL_DTYPE),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_symbols, k), lambda i: (i, 0)),
            pl.BlockSpec((tile_symbols, k), lambda i: (i, 0)),
            pl.BlockSpec((tile_symbols, k), lambda i: (0, 0)),
            pl.BlockSpec((tile_symbols, k), lambda i: (0, 0)),
            pl.BlockSpec((k, k), lambda i: (0, 0)),
            pl.BlockSpec((k, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_symbols, k), lambda i: (i, 0)),
        interpret=interpret,
    )(xr, xi, dr, di, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return out[:s]


# --------------------------------------------------------------------------
# 2. Tiled FIR + decimation (filters hot path, filters/fir.rs)
# --------------------------------------------------------------------------


def _fir_kernel(x_ref, taps_ref, out_ref, *, block_out: int, n_taps: int):
    """Grid step i computes outputs [i·B, (i+1)·B) of a factor-1 FIR.

    Mosaic requires lane-dimension load offsets to be provable multiples
    of 128, so overlapping windows cannot be sliced tap-by-tap from the
    ref. Instead one ALIGNED extended block (B + pad) is loaded per 128
    taps and each tap's shift happens on the loaded VALUE with
    `pltpu.roll` (tpu.dynamic_rotate) + an offset-0 static slice."""
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    start = i * block_out
    ext = block_out + _round_up(n_taps, 128)
    w = x_ref[pl.ds(0, 1), pl.ds(start, ext)]  # (1, ext) aligned load
    acc = taps_ref[0, 0] * w[:, :block_out]
    for t in range(1, n_taps):
        # left-shift by t == circular right-shift by ext - t
        shifted = pltpu.roll(w, shift=ext - t, axis=1)
        acc = acc + taps_ref[0, t] * shifted[:, :block_out]
    out_ref[:, :] = acc


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _fir_pallas_1x(x: jax.Array, taps: jax.Array, n_out: int,
                   block_out: int, interpret: bool) -> jax.Array:
    """factor-1 Pallas FIR core: y[j] = Σ_t taps[t]·x[j+t], j < n_out."""
    n_taps = int(taps.shape[-1])
    n_blocks = max(-(-n_out // block_out), 1)
    need = n_blocks * block_out + _round_up(n_taps, 128)
    if need > x.shape[-1]:
        x = jnp.pad(x, (0, need - x.shape[-1]))
    kernel = functools.partial(_fir_kernel, block_out=block_out,
                               n_taps=n_taps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * block_out), REAL_DTYPE),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(x[None, :].shape, lambda i: (0, 0)),  # full input
            pl.BlockSpec((1, n_taps), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_out), lambda i: (0, i)),
        interpret=interpret,
    )(x[None, :], taps[None, :])
    return out[0, :n_out]


def fir_decimate(x: jax.Array, taps: jax.Array, factor: int = 1,
                 block_out: int = 512,
                 interpret: bool | None = None) -> jax.Array:
    """Real FIR with decimation: y[j] = Σ taps[t]·x[j·factor + t].

    (Correlation form; flip taps for convolution.) Returns
    floor((N - n_taps)/factor) + 1 outputs. factor > 1 decomposes into
    the classic polyphase sum of factor-1 FIRs over downsampled planes
    (each an aligned Pallas call):
    y[j] = Σ_p Σ_m taps[m·f+p] · x[(j+m)·f + p].
    """
    if interpret is None:
        interpret = not _on_tpu()
    x = jnp.asarray(x, REAL_DTYPE)
    taps = jnp.asarray(taps, REAL_DTYPE)
    n = x.shape[-1]
    n_taps = taps.shape[-1]
    n_out = max((n - n_taps) // factor + 1, 0)
    if factor == 1:
        return _fir_pallas_1x(x, taps, n_out, block_out, interpret)

    plane_len = -(-n // factor)
    xp = jnp.pad(x, (0, plane_len * factor - n))
    planes = xp.reshape(plane_len, factor).T  # planes[p, j] = x[j·f+p]
    y = None
    for p in range(factor):
        taps_p = taps[p::factor]
        if taps_p.shape[-1] == 0:
            continue
        yp = _fir_pallas_1x(planes[p], taps_p, n_out, block_out, interpret)
        y = yp if y is None else y + yp
    return y


# --------------------------------------------------------------------------
# 3. Fused NCO mix (rotator hot loop, freq_xlating / cfo correction)
# --------------------------------------------------------------------------


def _nco_kernel(params_ref, xr_ref, xi_ref, or_ref, oi_ref):
    """params: [omega(rad/sample), phase0, gain] in SMEM; computes
    (xr+jxi)·gain·e^{j(phase0 + omega·n)} without a materialized carrier."""
    omega = params_ref[0]
    phase0 = params_ref[1]
    gain = params_ref[2]
    block = or_ref.shape[-1]
    n0 = (pl.program_id(0) * block).astype(REAL_DTYPE)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1).astype(
        REAL_DTYPE
    )
    ph = phase0 + omega * (idx + n0)
    c = jnp.cos(ph)
    s = jnp.sin(ph)
    xr = xr_ref[:]
    xi = xi_ref[:]
    or_ref[:] = gain * (xr * c - xi * s)
    oi_ref[:] = gain * (xr * s + xi * c)


def nco_mix(x: jax.Array, freq_hz: float, sample_rate: float,
            phase0: float = 0.0, gain: float = 1.0, block: int = 2048,
            interpret: bool | None = None) -> jax.Array:
    """Fused oscillator mix: x·gain·e^{j2πf t} (complex in/out).

    Measured on v5e (r2 chained-loop bench): 748 Msps vs 975 Msps for
    the plain XLA iota+cis+multiply form — XLA's fusion already wins
    here, so production paths (freq_xlating_fir, cfo correction) keep
    the XLA carrier and this kernel stays as the Pallas reference
    implementation of the rotator (gnuradio_comparison.rs:45 baseline
    100 Msamples/s)."""
    if interpret is None:
        interpret = not _on_tpu()
    x = jnp.asarray(x)
    n = x.shape[-1]
    pad = (-n) % block
    xr = jnp.pad(x.real.astype(REAL_DTYPE), (0, pad))[None, :]
    xi = jnp.pad(x.imag.astype(REAL_DTYPE), (0, pad))[None, :]
    omega = 2.0 * np.pi * freq_hz / sample_rate
    params = jnp.asarray([omega, phase0, gain], REAL_DTYPE)
    n_blocks = xr.shape[-1] // block
    orr, oii = pl.pallas_call(
        _nco_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_blocks * block), REAL_DTYPE),
            jax.ShapeDtypeStruct((1, n_blocks * block), REAL_DTYPE),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3,), lambda i: (0,)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(params, xr, xi)
    return jax.lax.complex(orr[0, :n], oii[0, :n]).astype(jnp.complex64)
