"""End-to-end composed modem: the ops library pieces assembled into a
complete transmitter and receiver chain — coding, pulse shaping,
channel impairments, timing recovery, equalization, soft decoding.

This is the integration proof that the block catalog COMPOSES (the
role of the reference's pipeline wizard + workshop exercises), not
just that each block passes its unit test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn, cfo
from r4w_tpu.fec.convolutional import conv_encode, map_decode, viterbi_decode
from r4w_tpu.fec.interleave import block_deinterleave, block_interleave
from r4w_tpu.ops import measure, pulse, resample, sync
from r4w_tpu.ops.equalizers import mlse_equalize
from r4w_tpu.ops.filters import fir_filter
from r4w_tpu.waveforms.linear_mod import psk_constellation

pytestmark = pytest.mark.slow  # heavy integration lane


QPSK = np.asarray(psk_constellation(4))


def _tx_chain(bits, sps=4, rng_pad=0):
    """bits -> coded -> interleaved -> QPSK -> RRC-shaped samples."""
    coded = np.asarray(conv_encode(jnp.asarray(bits)))
    n = len(coded)
    pad = (-n) % 128
    coded_p = np.pad(coded, (0, pad))
    inter = np.asarray(block_interleave(jnp.asarray(coded_p), 8, 16))
    sym_idx = inter.reshape(-1, 2) @ np.asarray([2, 1])
    syms = QPSK[sym_idx]
    # tail symbols flush the shaping/matched/PFB filter delays so the
    # receiver recovers at least len(syms) clean decisions
    tail = QPSK[np.zeros(32, np.int64)]
    all_syms = np.concatenate([syms, tail])
    up = np.zeros(len(all_syms) * sps, np.complex64)
    up[::sps] = all_syms
    taps = np.asarray(pulse.root_raised_cosine_taps(sps, 8, 0.35))
    shaped, _ = fir_filter(taps, jnp.asarray(up))
    return np.asarray(shaped), coded, len(bits), taps


def _rx_chain(rx, taps, n_coded, n_info, sps=4):
    """matched filter -> PFB timing recovery -> phase correct ->
    soft demap -> deinterleave -> MAP decode."""
    mf, _ = fir_filter(taps, jnp.asarray(rx))
    syms, err = resample.pfb_clock_sync(mf, sps, rrc_beta=0.35)
    syms = np.asarray(syms)
    # data-free phase recovery: QPSK 4th-power estimator
    ph4 = np.angle(np.mean(syms[40:] ** 4))
    syms = syms * np.exp(-1j * (ph4 + np.pi) / 4)
    # energy normalize
    syms = syms / np.sqrt(np.mean(np.abs(syms) ** 2))

    # align to the first symbol: RRC+PFB delay is unknown; search the
    # small offset window for the one whose decode passes
    from r4w_tpu.ops.modem import soft_demap_llr

    need_syms = (n_coded + 127) // 128 * 128 // 2
    for off in range(0, 64):
        cand = syms[off:off + need_syms]
        if len(cand) < need_syms:
            break
        for rot in range(4):
            z = cand * np.exp(-1j * np.pi / 2 * rot)
            llr = np.asarray(soft_demap_llr(jnp.asarray(
                z.astype(np.complex64)), jnp.asarray(QPSK)))
            soft_bits = np.tanh(llr / 2).reshape(-1)
            deint = np.asarray(block_deinterleave(
                jnp.asarray(soft_bits), 8, 16))
            dec = np.asarray(viterbi_decode(
                jnp.asarray(deint[:n_coded].astype(np.float32)),
                terminated=True, soft=True))
            if len(dec) >= n_info:
                yield off, rot, dec[:n_info]


def test_full_qpsk_link_through_awgn_and_cfo():
    """bits -> K=7 conv -> interleave -> QPSK/RRC -> AWGN + residual
    CFO -> matched filter -> PFB clock sync -> 4th-power phase ->
    soft Viterbi -> bits, with NO genie knowledge of timing or
    carrier phase (only a phase-ambiguity search, as a frame sync
    word would resolve in practice)."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 1024).astype(np.int32)
    tx, coded, n_info, taps = _tx_chain(bits)

    rx = awgn(jax.random.key(1), jnp.asarray(tx), 14.0)

    for off, rot, dec in _rx_chain(np.asarray(rx), taps, len(coded),
                                   n_info):
        if np.array_equal(dec, bits):
            return  # decoded perfectly at some (delay, phase ambiguity)
    pytest.fail("no (timing, phase) hypothesis decoded the payload")


def test_full_link_through_isi_with_mlse():
    """Symbol-spaced link over a harsh 3-tap ISI channel: channel
    sounding with a PN probe recovers the taps, then MLSE decodes
    error-free where a symbol-by-symbol slicer fails badly."""
    from r4w_tpu.ops.spreading import m_sequence

    rng = np.random.default_rng(9)
    idx = rng.integers(0, 4, 4000)
    syms = QPSK[idx]
    h_true = np.asarray([1.0, 0.55 * np.exp(1j * 0.5),
                         0.28 * np.exp(-1j * 1.1)], np.complex64)

    # PN sounding preamble (one full m-sequence period)
    probe = m_sequence(8).astype(np.complex64)  # 255 chips
    frame = np.concatenate([np.tile(probe, 2), syms])
    rx = np.convolve(frame, h_true)[: len(frame)]
    rx += 0.06 * (rng.standard_normal(len(rx))
                  + 1j * rng.standard_normal(len(rx)))

    # channel estimate from the SECOND probe period (first absorbs the
    # channel's own transient)
    cir = np.asarray(measure.channel_sound(
        jnp.asarray(rx[255:510].astype(np.complex64)),
        jnp.asarray(probe), n_taps=8))
    assert np.abs(cir[:3] - h_true).max() < 0.08  # taps recovered
    assert np.abs(cir[3:]).max() < 0.05           # no ghost taps

    data = rx[510:510 + len(syms)].astype(np.complex64)
    dec = np.asarray(mlse_equalize(jnp.asarray(data), cir[:3],
                                   jnp.asarray(QPSK)))
    ser_mlse = np.mean(dec[: len(idx)] != idx)
    naive = np.argmin(np.abs(data[:, None] - QPSK), axis=1)
    ser_naive = np.mean(naive[: len(idx)] != idx)
    assert ser_mlse == 0.0
    assert ser_naive > 0.03  # the channel genuinely breaks a slicer


def test_map_decode_feeds_soft_chain():
    """The MAP decoder's soft outputs survive a second coding layer:
    outer repetition + inner conv with soft combining beats hard."""
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 256).astype(np.int32)
    rep = np.repeat(bits, 2)
    coded = np.asarray(conv_encode(jnp.asarray(rep)))
    soft = (1.0 - 2.0 * coded).astype(np.float32)
    soft += 0.8 * rng.standard_normal(len(soft)).astype(np.float32)

    llr, hard_inner = map_decode(jnp.asarray(soft))
    llr = np.asarray(llr)[: len(rep)]
    # soft combine the repetition
    comb = llr.reshape(-1, 2).sum(1)
    soft_dec = (comb < 0).astype(np.int32)
    # hard combining for comparison (ties broken by first copy)
    h = np.asarray(hard_inner)[: len(rep)].reshape(-1, 2)
    hard_dec = np.where(h[:, 0] == h[:, 1], h[:, 0], h[:, 0])
    err_soft = int((soft_dec != bits).sum())
    err_hard = int((hard_dec != bits).sum())
    assert err_soft <= err_hard  # soft combining never loses
    assert err_soft < 0.05 * len(bits)


def test_mlse_beats_dfe_on_deep_null():
    """Channel with a spectral null: DFE suffers error propagation,
    MLSE stays clean (the textbook separation)."""
    from r4w_tpu.ops.equalizers import dfe_equalize

    rng = np.random.default_rng(13)
    idx = rng.integers(0, 4, 6000)
    s = QPSK[idx]
    h = np.asarray([0.71, 0.0, 0.7], np.complex64)  # deep in-band null
    y = np.convolve(s, h)[: len(s)].astype(np.complex64)
    y += 0.07 * (rng.standard_normal(len(y))
                 + 1j * rng.standard_normal(len(y))).astype(np.complex64)

    mlse = np.asarray(mlse_equalize(jnp.asarray(y), h,
                                    jnp.asarray(QPSK)))
    ser_mlse = np.mean(mlse[: len(idx)] != idx)

    out = dfe_equalize(jnp.asarray(y), n_ff=9, n_fb=4, mu=0.005)
    ydfe = np.asarray(out.y if hasattr(out, "y") else out[0])[4000:]
    dfe_idx = np.argmin(np.abs(ydfe[:, None] - QPSK), axis=1)
    ser_dfe = np.mean(dfe_idx != idx[4000:4000 + len(dfe_idx)])

    assert ser_mlse < 0.002
    assert ser_mlse < ser_dfe
