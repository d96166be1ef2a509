"""Pallas TPU kernels for the hot compute paths.

Kernels re-expressing reference hot loops (SURVEY.md §2.8 — the
rustfft FftProcessor, fir paths, and the nco.rs phase-accumulator
oscillator) the TPU way:

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


# --------------------------------------------------------------------------
# 4. Viterbi add-compare-select (viterbi_decoder.rs hot loop, SURVEY §2.8
#    "int8/bf16 min-plus trellis on the MXU")
# --------------------------------------------------------------------------
#
# The XLA lax.scan ACS saturates at ~7 Mbps on v5e: every scan step
# round-trips the (lanes, 2S) candidate intermediates through HBM
# (~800 B per lane-step measured r3). This kernel keeps the (S, 128)
# path-metric block RESIDENT IN VMEM for the whole frame and touches
# HBM only for the per-step codeword metrics (C·4 B/lane) and the
# 16-bit-packed traceback decisions (S/4 B/lane):
#
# - trellis shuffle as exact 0/1 selection MATMULS on the MXU (each
#   row selects one element, so f32 matmul at HIGHEST precision is a
#   bit-exact gather): `sel` places even/odd predecessors of every
#   butterfly in the two sublane halves, `masks[b]` broadcasts the
#   2^R per-codeword metrics onto the source states, `pack` sums
#   decision bits into 16-bit words;
# - the shift-register butterfly (state = previous K-1 bits) makes
#   target b·S/2+m depend only on sources {2m, 2m+1}, so compare-
#   select is a halves max after the selection matmul — no gathers.


@functools.lru_cache(maxsize=None)
def _viterbi_consts(constraint: int, polys: tuple[int, ...]):
    from r4w_tpu.fec.convolutional import _trellis

    outputs_np, _ = _trellis(constraint, polys)
    s, _, r = outputs_np.shape
    half, c = s // 2, 1 << r
    weights = 1 << np.arange(r)
    oidx = (outputs_np.astype(np.int32) * weights[None, None, :]).sum(-1)
    masks = np.zeros((2, s, c), np.float32)          # bm select per (b, st)
    for st in range(s):
        for b in (0, 1):
            masks[b, st, oidx[st, b]] = 1.0
    sel = np.zeros((s, s), np.float32)               # butterfly halves
    for p in range(half):
        sel[p, 2 * p] = 1.0                          # even predecessor
        sel[half + p, 2 * p + 1] = 1.0               # odd predecessor
    w = 16 if s >= 16 else s
    groups = s // w
    pack = np.zeros((groups, s), np.float32)         # 16-bit decision pack
    for st in range(s):
        pack[st // w, st] = float(1 << (st % w))
    # fused forms: one full-width (2S, 2S) selection (block-diag over the
    # two input bits — doubles MXU utilization per pass) and a stacked
    # (2S, C) branch-metric broadcast
    sel2 = np.zeros((2 * s, 2 * s), np.float32)
    sel2[:s, :s] = sel
    sel2[s:, s:] = sel
    mask2 = np.concatenate([masks[0], masks[1]], axis=0)  # (2S, C)
    return masks, sel, pack, w, groups, sel2, mask2


def _viterbi_acs_kernel(bm_ref, selmask_ref, sel_ref, pack_ref,
                        dec_ref, fm_ref, metrics, *, steps: int, s: int,
                        lb: int):
    """One grid step = `steps` ACS iterations with metrics VMEM-resident.

    Precision notes (throughput-critical): Mosaic only lowers DEFAULT
    (single bf16 pass) and HIGHEST (bf16_6x) dot precisions, so the 0/1
    selection matmuls run as an explicit bf16 3-split — x = c1+c2+c3
    with each cᵢ one bf16 chunk of the f32 mantissa — and three
    single-pass matmuls accumulated in f32. Each selection row has a
    single 1.0 (exact in bf16) with all other products 0, and the
    recombining additions are exact, so this is a bit-exact gather at
    half the MXU passes of HIGHEST (verified bit-exact vs the XLA scan
    decoder on v5e in the test suite). The decision pack runs at
    DEFAULT: decisions are 0/1 and weights are powers of two ≤ 2^15 —
    every product is exact in bf16 and the f32 accumulation of ≤16
    such terms is exact.
    """
    half = s // 2
    hi = jnp.float32(-1e9)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        row = jax.lax.broadcasted_iota(jnp.int32, (s, lb), 0)
        metrics[...] = jnp.where(row == 0, 0.0, hi)

    dot_f32 = functools.partial(jax.lax.dot,
                                preferred_element_type=jnp.float32)

    def dot3(a_bf16, x):
        """Exact a @ x for a 0/1 bf16 matrix: bf16_3x by hand."""
        c1 = x.astype(jnp.bfloat16)
        r1 = x - c1.astype(jnp.float32)
        c2 = r1.astype(jnp.bfloat16)
        c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)
        return (dot_f32(a_bf16, c1) + dot_f32(a_bf16, c2)
                + dot_f32(a_bf16, c3))

    def body(t, _):
        m = metrics[...]                              # (S, lb)
        bm_t = bm_ref[t]                              # (C, lb)
        # y_b = sel@m + (sel2@mask2)_b @ bm: the permutation of the
        # metrics is shared by both input bits (compute once, K=S) and
        # the branch-metric broadcast is prefolded through the
        # selection into one constant 0/1 matrix (K=C, tiny)
        z = dot3(sel_ref[...], m)                     # (S, lb) even|odd
        w2 = dot3(selmask_ref[...], bm_t)             # (2S, lb)
        y0 = z + w2[:s]
        y1 = z + w2[s:]
        a0, b0 = y0[:half], y0[half:]
        a1, b1 = y1[:half], y1[half:]
        new = jnp.concatenate(
            [jnp.maximum(a0, b0), jnp.maximum(a1, b1)], axis=0)
        dec = jnp.concatenate([b0 > a0, b1 > a1], axis=0)  # by target s'
        metrics[...] = new
        dec_ref[t] = dot_f32(pack_ref[...], dec.astype(jnp.bfloat16))
        return 0

    jax.lax.fori_loop(0, steps, body, 0)
    fm_ref[...] = metrics[...]


def viterbi_forward(bm: jax.Array, constraint: int,
                    polys: tuple[int, ...],
                    chunk: int = 64,
                    lane_block: int = 2048,
                    interpret: bool | None = None):
    """Pallas Viterbi forward pass.

    bm: (T, C, L) per-codeword branch metrics, L a multiple of 128.
    Returns (decisions (T, G, L) int32 — 16-bit-packed by target state —
    and final_metrics (S, L) f32)."""
    if interpret is None:
        interpret = not _on_tpu()
    _, sel, pack, w, groups, sel2, mask2 = _viterbi_consts(
        constraint, tuple(polys))
    selmask = sel2 @ mask2                      # still 0/1: sel2 rows
    s = sel2.shape[0] // 2                      # are singleton selects
    t_total, c, lanes = bm.shape
    # lane-block width: the serial ACS chain is latency-bound, so wide
    # blocks (many frames per matmul) are what buys throughput; shrink
    # to the actual lane count for small batches
    lb = min(lane_block, lanes)
    assert lanes % 128 == 0 and t_total % chunk == 0 and lanes % lb == 0
    n_lane = lanes // lb
    n_time = t_total // chunk

    kernel = functools.partial(_viterbi_acs_kernel, steps=chunk, s=s,
                               lb=lb)
    dec, fm = pl.pallas_call(
        kernel,
        grid=(n_lane, n_time),
        in_specs=[
            pl.BlockSpec((chunk, c, lb), lambda i, j: (j, 0, i)),
            pl.BlockSpec(selmask.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(sel.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(pack.shape, lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((chunk, groups, lb), lambda i, j: (j, 0, i)),
            pl.BlockSpec((s, lb), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, groups, lanes), jnp.float32),
            jax.ShapeDtypeStruct((s, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((s, lb), jnp.float32)],
        interpret=interpret,
    )(bm, jnp.asarray(selmask, jnp.bfloat16),
      jnp.asarray(sel, jnp.bfloat16), jnp.asarray(pack, jnp.bfloat16))
    return dec.astype(jnp.int32), fm


def _viterbi_tb_kernel(dec_ref, bits_ref, state, *, steps: int, s: int,
                       w: int, groups: int, k: int, lb: int):
    half = s // 2

    @pl.when(pl.program_id(1) == 0)
    def _init():
        state[...] = jnp.zeros((1, lb), jnp.int32)   # terminated: end at 0

    row = jax.lax.broadcasted_iota(jnp.int32, (groups, lb), 0)

    def body(i, _):
        t = steps - 1 - i
        st = state[...]                               # (1, lb)
        dec_t = dec_ref[t]                            # (G, lb)
        # word = dec_t[st // w] without a sublane gather: G-row select
        word = jnp.sum(jnp.where(row == st // w, dec_t, 0), axis=0,
                       keepdims=True)
        j = (word >> (st % w)) & 1
        bits_ref[t] = (st >> (k - 2))[0]
        state[...] = 2 * (st & (half - 1)) + j
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def viterbi_traceback(dec: jax.Array, constraint: int,
                      polys: tuple[int, ...],
                      chunk: int = 64,
                      lane_block: int = 2048,
                      interpret: bool | None = None) -> jax.Array:
    """Pallas survivor traceback over 16-bit-packed decisions.

    dec: (T, G, L) int32 from viterbi_forward (T need NOT be a chunk
    multiple — it is front-padded internally; front padding is traversed
    last, after the real steps, so it cannot perturb the survivor
    state). Returns hard input bits (T, L) int32 (flush bits included —
    caller slices). The per-step work is a handful of VPU integer ops
    on (G, L) vectors with the state vector VMEM-resident, replacing an
    XLA scan whose per-step overhead dominated the whole decode
    (measured 44 µs/step vs ~1 µs here on v5e)."""
    if interpret is None:
        interpret = not _on_tpu()
    _, _, _, w, groups, sel2, _ = _viterbi_consts(constraint, tuple(polys))
    s = sel2.shape[0] // 2
    t_real, g, lanes = dec.shape
    lb = min(lane_block, lanes)
    pad_front = -t_real % chunk
    if pad_front:
        dec = jnp.pad(dec, ((pad_front, 0), (0, 0), (0, 0)))
    t_total = dec.shape[0]
    n_lane = lanes // lb
    n_time = t_total // chunk

    kernel = functools.partial(_viterbi_tb_kernel, steps=chunk, s=s, w=w,
                               groups=groups, k=constraint, lb=lb)
    bits = pl.pallas_call(
        kernel,
        grid=(n_lane, n_time),
        in_specs=[
            pl.BlockSpec((chunk, g, lb),
                         lambda i, j, nt=n_time: (nt - 1 - j, 0, i)),
        ],
        out_specs=pl.BlockSpec((chunk, lb),
                               lambda i, j, nt=n_time: (nt - 1 - j, i)),
        out_shape=jax.ShapeDtypeStruct((t_total, lanes), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, lb), jnp.int32)],
        interpret=interpret,
    )(dec)
    return bits[pad_front:]
