"""PSK/QAM roundtrip + known-answer tests (psk.rs:325-360, qam.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import create_waveform, list_waveforms
from r4w_tpu.waveforms import linear_mod as lm


def test_factory_lists_and_creates():
    names = list_waveforms()
    for n in ("BPSK", "QPSK", "16-QAM", "LoRa"):
        assert n in names
    for alias in ("bpsk", "qam16", "16qam", "lora-sf7", "8psk"):
        assert create_waveform(alias, 48_000.0) is not None
    assert create_waveform("NOPE") is None


def test_bpsk_constellation_known_answer():
    # psk.rs:325 test: BPSK points at ±1 on the real axis
    c = lm.psk_constellation(2)
    assert np.allclose(c, [1.0, -1.0], atol=1e-6)


def test_qpsk_constellation_offset():
    c = lm.psk_constellation(4)
    # π/4 offset: all points at (±√2/2, ±√2/2)
    assert np.allclose(np.abs(c.real), np.sqrt(0.5), atol=1e-6)
    assert np.allclose(np.abs(c.imag), np.sqrt(0.5), atol=1e-6)


def test_qam_unit_average_power():
    for order in (16, 64, 256):
        c = lm.qam_constellation(order)
        assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-5


@pytest.mark.parametrize("name", ["BPSK", "QPSK", "8-PSK", "16-QAM",
                                  "64-QAM", "256-QAM"])
def test_roundtrip_clean(name):
    wf = create_waveform(name, 48_000.0)
    data = bytes([0xA5, 0x3C, 0xFF, 0x00, 0x7E, 0x81])
    tx = wf.modulate(data)
    result = wf.demodulate(tx)
    assert np.asarray(result.bits)[: len(data)].tolist() == list(data)


@pytest.mark.parametrize("name,snr", [("BPSK", 10.0), ("QPSK", 12.0),
                                      ("16-QAM", 18.0)])
def test_roundtrip_at_snr(name, snr):
    wf = create_waveform(name, 48_000.0)
    data = bytes(np.random.default_rng(0).integers(0, 256, 32))
    tx = wf.modulate(data)
    rx = awgn(jax.random.key(0), tx, snr)
    result = wf.demodulate(rx)
    assert np.asarray(result.bits)[: len(data)].tolist() == list(data)


def test_bpsk_ber_close_to_theory():
    """BER ≈ Q(sqrt(2·EbN0)) within 10% deviation (MEASURABLE_OBJECTIVES §13).

    With sps samples averaged per symbol, symbol SNR gain = sps.
    """
    import jax.scipy.special as jsp

    wf = create_waveform("BPSK", 48_000.0)
    sps = wf.samples_per_symbol()
    data = np.random.default_rng(1).integers(0, 256, 256)
    tx = wf.modulate(data.astype(np.int32))
    snr_db = -12.0  # per-sample SNR; symbol SNR = snr + 10log10(sps)
    n_err = 0
    n_bits = 0
    tx_bits = np.unpackbits(data.astype(np.uint8))
    for trial in range(4):
        rx = awgn(jax.random.key(trial), tx, snr_db)
        got = np.asarray(create_waveform("BPSK", 48_000.0).demodulate(rx).bits)
        got_bits = np.unpackbits(got.astype(np.uint8))[: tx_bits.size]
        n_err += int((got_bits != tx_bits).sum())
        n_bits += tx_bits.size
    ber = n_err / n_bits
    # BPSK over complex AWGN: BER = Q(sqrt(2·Es/N0)) = 0.5·erfc(sqrt(Es/N0))
    esn0 = 10 ** (snr_db / 10) * sps
    theory = float(0.5 * jsp.erfc(np.sqrt(esn0)))
    assert theory * 0.5 < ber < theory * 2.0, (ber, theory)


def test_vmapped_qpsk_lanes():
    wf = create_waveform("QPSK", 48_000.0)
    data = bytes([0x12, 0x34, 0x56, 0x78])
    tx = wf.modulate(data)
    keys = jax.random.split(jax.random.key(9), 16)
    rxs = jax.vmap(lambda k: awgn(k, tx, 15.0))(keys)
    # batched demod through the pure core
    const = lm.psk_constellation(4)
    idx, _, _ = lm.linear_demodulate_symbols(rxs, jnp.asarray(const),
                                             wf.samples_per_symbol())
    assert idx.shape == (16, len(data) * 8 // 2)
