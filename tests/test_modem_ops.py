"""Soft demapping, analog mod/demod, differential, CPM, SC-FDMA,
PAPR, OFDM-IM modem building blocks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r4w_tpu.ops import modem
from r4w_tpu.waveforms.linear_mod import psk_constellation, qam_constellation


def test_soft_llr_signs_match_hard_qpsk():
    con = np.asarray(psk_constellation(4))
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, 500)
    rx = con[idx] + 0.05 * (rng.standard_normal(500)
                            + 1j * rng.standard_normal(500))
    llr = modem.soft_demap_llr(rx.astype(np.complex64), con, 0.05)
    hard = np.asarray(modem.hard_from_llr(llr))
    expect = (idx[:, None] >> np.arange(1, -1, -1)) & 1
    assert np.array_equal(hard, expect)


def test_soft_llr_magnitude_tracks_confidence():
    con = np.asarray(psk_constellation(2))
    near = modem.soft_demap_llr(np.asarray([0.9 + 0j], np.complex64),
                                con, 0.5)
    far = modem.soft_demap_llr(np.asarray([0.1 + 0j], np.complex64),
                               con, 0.5)
    assert abs(float(near[0, 0])) > abs(float(far[0, 0]))


def test_fm_modulate_quadrature_demod_roundtrip():
    rng = np.random.default_rng(1)
    msg = rng.standard_normal(2000).astype(np.float32) * 0.5
    iq = modem.frequency_modulate(msg, sensitivity=0.8)
    rec = np.asarray(modem.quadrature_demod(iq, gain=1.0 / 0.8))
    assert np.allclose(rec[1:], msg[1:], atol=1e-3)


def test_phase_modulate():
    msg = np.asarray([0.0, np.pi / 4, -np.pi / 2], np.float32)
    iq = np.asarray(modem.phase_modulate(msg, 1.0))
    assert np.allclose(np.angle(iq), msg, atol=1e-6)


def test_differential_roundtrip():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 256)
    enc = modem.differential_encode(bits)
    dec = np.asarray(modem.differential_decode(enc))
    assert np.array_equal(dec, bits)


def test_diff_phasor_dqpsk():
    phases = np.cumsum([0, np.pi / 2, np.pi, -np.pi / 2, np.pi / 2])
    x = np.exp(1j * phases).astype(np.complex64)
    d = np.asarray(modem.diff_phasor(x))
    assert np.allclose(np.angle(d), [np.pi / 2, np.pi, -np.pi / 2,
                                     np.pi / 2], atol=1e-6)


def test_msk_constant_envelope_and_phase_steps():
    bits = np.asarray([1, 0, 1, 1, 0, 0, 1])
    sps = 8
    iq = np.asarray(modem.msk_modulate(bits, sps))
    assert np.allclose(np.abs(iq), 1.0, atol=1e-6)
    # phase advances ±pi/2 per symbol
    ph = np.unwrap(np.angle(iq))
    steps = ph[sps - 1::sps]
    d = np.diff(np.concatenate([[0.0], steps]))
    expect = (2 * bits - 1) * np.pi / 2
    assert np.allclose(d, expect, atol=1e-2)


def test_gmsk_spectrum_narrower_than_msk():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 400)
    sps = 8
    msk = np.asarray(modem.msk_modulate(bits, sps))
    gmsk = np.asarray(modem.gmsk_modulate(bits, sps, bt=0.3))
    n = min(len(msk), len(gmsk))

    def oob_power(x):
        s = np.abs(np.fft.fft(x[:n])) ** 2
        f = np.fft.fftfreq(n)
        return np.sum(s[np.abs(f) > 1.5 / sps]) / np.sum(s)

    assert oob_power(gmsk) < oob_power(msk) / 3


def test_cpm_bad_pulse():
    with pytest.raises(ValueError):
        modem.cpm_modulate(np.asarray([1, -1]), 4, pulse="triangle")


def test_sc_fdma_roundtrip_and_papr():
    rng = np.random.default_rng(4)
    con = np.asarray(psk_constellation(4))
    sym = con[rng.integers(0, 4, (6, 32))].astype(np.complex64)
    tx = modem.sc_fdma_modulate(sym, n_fft=64, n_sc=32, cp_len=8)
    rec = np.asarray(modem.sc_fdma_demodulate(np.asarray(tx), 64, 32, 8))
    assert np.allclose(rec, sym, atol=1e-4)
    # DFT-spread keeps PAPR below plain OFDM with the same data
    grid = jnp.zeros((6, 64), jnp.complex64).at[:, :32].set(sym)
    ofdm = np.asarray(jnp.fft.ifft(grid, axis=-1)).reshape(-1)
    papr_sc = float(modem.papr_db(np.asarray(tx).reshape(-1)))
    papr_ofdm = float(modem.papr_db(ofdm))
    assert papr_sc < papr_ofdm


def test_papr_clip_filter_reduces():
    rng = np.random.default_rng(5)
    grid = (rng.standard_normal((1, 256)) + 1j *
            rng.standard_normal((1, 256))).astype(np.complex64)
    x = np.asarray(jnp.fft.ifft(grid, axis=-1)).reshape(-1)
    before = float(modem.papr_db(x))
    y = modem.papr_reduce_clip_filter(x, clip_ratio_db=3.0, band=1.0)
    after = float(modem.papr_db(np.asarray(y)))
    assert after < before - 1.0


def test_cyclic_prefix_roundtrip():
    rng = np.random.default_rng(6)
    blocks = (rng.standard_normal((4, 64)) + 1j *
              rng.standard_normal((4, 64))).astype(np.complex64)
    cp = modem.add_cyclic_prefix(blocks, 16)
    assert cp.shape == (4, 80)
    assert np.allclose(np.asarray(cp)[:, :16], blocks[:, -16:])
    back = np.asarray(modem.remove_cyclic_prefix(cp, 16))
    assert np.allclose(back, blocks)


def test_ofdm_im_roundtrip():
    con = np.asarray(psk_constellation(4))
    n_sub, n_active = 8, 2
    # idx_bits = floor(log2(C(8,2)=28)) = 4; total = 4 + 2*2 = 8
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, (10, 8))
    grid, active = modem.index_modulation_map(bits, n_sub, n_active, con)
    assert grid.shape == (10, 8)
    # exactly n_active nonzero entries per block
    nz = np.count_nonzero(np.abs(np.asarray(grid)) > 1e-6, axis=-1)
    assert np.all(nz == n_active)
    dec = np.asarray(modem.index_modulation_demap(grid, n_sub, n_active,
                                                  con))
    assert np.array_equal(dec, bits)


def test_ofdm_im_wrong_bit_count():
    con = np.asarray(psk_constellation(4))
    with pytest.raises(ValueError):
        modem.index_modulation_map(np.zeros((2, 5), int), 8, 2, con)


def test_soft_llr_16qam_noisy_better_than_hard():
    # soft decisions carry magnitude info; on a Gray-coded 16-QAM burst
    # with noise the LLR signs still give the right bits on clean points
    con = np.asarray(qam_constellation(16))
    rng = np.random.default_rng(8)
    idx = rng.integers(0, 16, 200)
    rx = con[idx].astype(np.complex64)
    llr = modem.soft_demap_llr(rx, con, noise_var=0.1)
    hard = np.asarray(modem.hard_from_llr(llr))
    expect = (idx[:, None] >> np.arange(3, -1, -1)) & 1
    assert np.array_equal(hard, expect)
