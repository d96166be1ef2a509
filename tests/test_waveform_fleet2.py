"""Roundtrip/behavior tests for the extended fleet: IoT, HF, PMR,
military FH, beacons."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import create_waveform, list_waveforms

pytestmark = pytest.mark.slow  # heavy integration lane

DATA = bytes([0x5A, 0xC3, 0x0F, 0x99])


def test_reference_name_surface_complete():
    """Every name from WaveformFactory::list (waveform/mod.rs:459-489)
    must resolve in our factory."""
    reference_names = [
        "CW", "OOK", "PPM", "ADS-B", "AM-Broadcast", "FM-Broadcast",
        "NBFM", "ASK", "4-ASK", "BFSK", "4-FSK", "BPSK", "QPSK", "8-PSK",
        "16-QAM", "64-QAM", "256-QAM", "OFDM", "DSSS", "DSSS-QPSK", "FHSS",
        "LoRa", "LoRa-SF7", "LoRa-SF12", "Zigbee", "UWB", "FMCW",
        "STANAG-4285", "ALE", "3G-ALE", "SINCGARS", "HAVEQUICK", "Link-16",
        "MIL-STD-188-110", "P25", "TETRA", "DMR", "GPS-L1CA", "GPS-L5",
        "GLONASS-L1OF", "Galileo-E1", "ELT-121.5", "EPIRB-121.5",
        "PLB-121.5", "Beacon-243",
    ]
    for name in reference_names:
        assert create_waveform(name) is not None, name
    assert len(list_waveforms()) >= 46


@pytest.mark.parametrize("name", ["Zigbee", "UWB", "STANAG-4285",
                                  "MIL-STD-188-110", "3G-ALE", "P25",
                                  "P25-Phase2", "TETRA", "DMR",
                                  "SINCGARS", "HAVEQUICK", "Link-16"])
def test_roundtrip_clean_extended(name):
    wf = create_waveform(name)
    tx = wf.modulate(DATA)
    res = wf.demodulate(tx)
    got = np.asarray(res.bits)[: len(DATA)].tolist()
    assert got == list(DATA), name


def test_ale_roundtrip_with_golay_protection():
    wf = create_waveform("ALE")
    data = bytes([0xAB, 0xCD, 0xEF])  # 24 bits = 1 ALE word
    tx = wf.modulate(data)
    rx = awgn(jax.random.key(0), tx, 10.0)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[:3].tolist() == list(data)


@pytest.mark.parametrize("name,snr", [("P25", 14.0), ("TETRA", 15.0),
                                      ("DMR", 12.0), ("Zigbee", 2.0)])
def test_roundtrip_noisy_extended(name, snr):
    wf = create_waveform(name)
    tx = wf.modulate(DATA)
    rx = awgn(jax.random.key(1), tx, snr)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA), name


def test_fmcw_range_estimation():
    wf = create_waveform("FMCW", 1_000_000.0)
    tx = np.asarray(wf.modulate())
    # simulate a 1500 m target: round-trip delay = 2R/c
    delay_s = 2 * 1500.0 / 299_792_458.0
    d = int(round(delay_s * wf.common.sample_rate))
    echo = np.concatenate([np.zeros(d, np.complex64), tx[: len(tx) - d]])
    est = wf.estimate_range(echo)
    res_m = 299_792_458.0 / (2 * wf.sweep_bandwidth)
    assert abs(est - 1500.0) < 2 * res_m


def test_fhss_antijam_avoids_channels():
    wf = create_waveform("FHSS-AntiJam")
    jammed = wf.__class__(
        common=wf.common, jammed_channels=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    )
    sched = jammed.hop_schedule(200)
    assert not set(sched.tolist()) & set(range(10))
    # still roundtrips
    tx = jammed.modulate(DATA)
    res = jammed.demodulate(tx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)


def test_beacon_sweep_detected():
    wf = create_waveform("ELT-121.5")
    tx = wf.modulate()
    assert tx.shape[0] == int(wf.common.sample_rate)  # 1 s
    res = wf.demodulate(tx)
    assert res.metadata["sweep_detected"] == 1.0
    assert res.metadata["audio_freq_max"] > res.metadata["audio_freq_min"]


def test_sincgars_is_simulator_only():
    wf = create_waveform("SINCGARS")
    info = wf.info()
    assert any("not operational" in c.lower() or "training" in c.lower()
               for c in info.characteristics)
    # deterministic hop pattern from the simulator provider
    assert np.array_equal(wf.hop_schedule(50), wf.hop_schedule(50))


def test_link16_chip_correlation():
    wf = create_waveform("Link-16")
    tx = wf.modulate(bytes([0b10110100]))
    rx = awgn(jax.random.key(2), tx, 10.0)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[:1].tolist() == [0b10110100]


# ----------------------------------------------------- P25 framing


def test_p25_frame_sync_known_answer():
    """The real 48-bit frame sync 0x5575F5FF77FF as 24 dibits
    (p25.rs:117)."""
    from r4w_tpu.waveforms.pmr_waveforms import p25_sync_dibits

    d = p25_sync_dibits()
    assert d.shape == (24,)
    # first 8 dibits of 0x5575F5FF77FF: 55 75 -> 01 01 01 01, 01 11 01 01
    assert d[:8].tolist() == [1, 1, 1, 1, 1, 3, 1, 1]
    # reassemble the word
    word = 0
    for v in d:
        word = (word << 2) | int(v)
    assert word == 0x5575F5FF77FF


def test_p25_nid_bch_roundtrip_and_correction():
    from r4w_tpu.waveforms.pmr_waveforms import (p25_decode_nid,
                                                p25_encode_nid)

    nid = p25_encode_nid(0x293, 0x7)  # default NAC, TSBK
    assert nid.shape == (64,)
    nac, duid, n = p25_decode_nid(nid)
    assert (nac, duid, n) == (0x293, 0x7, 0)
    # BCH(63,16) corrects up to 11 bit errors in the NID
    bad = nid.copy()
    bad[[0, 7, 13, 21, 29, 35, 41, 47, 53, 59, 62]] ^= 1
    nac, duid, n = p25_decode_nid(bad)
    assert (nac, duid, n) == (0x293, 0x7, 11)


def test_p25_metadata_through_noise():
    from r4w_tpu.waveforms.pmr_waveforms import P25
    from r4w_tpu.core.types import CommonParams

    wf = P25(common=CommonParams(sample_rate=48_000.0),
             symbol_rate=4800.0, deviation_unit=600.0,
             nac=0x123, duid="LDU1")
    rx = awgn(jax.random.key(5), wf.modulate(DATA), 12.0)
    res = wf.demodulate(rx)
    assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)
    assert res.metadata["nac"] == 0x123
    assert res.metadata["duid"] == "LDU1"


# ------------------------------------------------- ALE word structure


def test_ale_word_pack_unpack():
    from r4w_tpu.waveforms.hf_waveforms import ALE_WORD_TYPES, AleWord

    # reference type table (ale.rs:26-31)
    assert ALE_WORD_TYPES == {"TO": 0b001, "TIS": 0b011, "TWAS": 0b010,
                              "DATA": 0b101, "REP": 0b110, "CMD": 0b111}
    w = AleWord("TIS", "K1A")
    v = w.encode()
    assert (v >> 21) == 0b011
    assert chr((v >> 14) & 0x7F) == "K"
    assert AleWord.decode(v) == w
    # bit vector roundtrip
    assert AleWord.from_bits(w.to_bits()) == w
    # invalid preamble rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AleWord.decode(0b000 << 21)


def test_ale_individual_call_through_noise():
    from r4w_tpu.waveforms.hf_waveforms import (Ale, ale_demodulate_words,
                                                ale_individual_call,
                                                ale_modulate_words)

    radio = Ale()
    tx = ale_modulate_words(radio, ale_individual_call("BOB", "ANN"))
    rx = awgn(jax.random.key(0), tx, 5.0)
    words = ale_demodulate_words(radio, rx)
    assert [(w.word_type, w.chars) for w in words] == [
        ("TO", "BOB"), ("TO", "BOB"), ("TIS", "ANN")]


# -------------------------------------------- 3G-ALE word structure


def test_ale3g_word_table():
    from r4w_tpu.waveforms.hf_waveforms import (ALE3G_3G_SPECIFIC,
                                                ALE3G_WORD_TYPES)

    # 2G-compatible plus the 3G-specific types (ale3g.rs:66-115)
    assert ALE3G_WORD_TYPES["AMD"] == 0b100
    assert ALE3G_WORD_TYPES["DTM"] == 0b000
    assert ALE3G_WORD_TYPES["TO"] == 0b001  # 2G compat preserved
    assert set(ALE3G_3G_SPECIFIC) == {"AMD", "DTM"}


def test_ale3g_amd_roundtrip_through_noise():
    from r4w_tpu.waveforms.hf_waveforms import (Ale, AmdMessage,
                                                ale3g_receive_amd,
                                                ale3g_send_amd)

    radio = Ale()
    tx = ale3g_send_amd(radio, AmdMessage("QSL UR 59 FT WAYNE"))
    rx = awgn(jax.random.key(2), tx, 6.0)
    out = ale3g_receive_amd(radio, rx)
    assert out.text == "QSL UR 59 FT WAYNE"


def test_ale3g_amd_char_packing():
    from r4w_tpu.waveforms.hf_waveforms import AmdMessage

    words = AmdMessage("ABC").encode_words()
    assert len(words) == 1
    w = words[0]
    assert (w >> 21) == 0b100                         # AMD preamble
    assert ((w >> 12) & 0x3F) == ord("A") - 0x20      # 6-bit subset
    assert AmdMessage.decode_words(words).text == "ABC"


def test_ale3g_dtm_fragmentation():
    from r4w_tpu.waveforms.hf_waveforms import DtmMessage

    frs = DtmMessage.fragment(bytes(range(150)), 64)
    assert [f.sequence for f in frs] == [0, 1, 2]
    assert [f.final for f in frs] == [False, False, True]
    assert b"".join(f.data for f in frs) == bytes(range(150))


def test_ale3g_lqa_score():
    from r4w_tpu.waveforms.hf_waveforms import ale3g_lqa_score

    assert ale3g_lqa_score(0.0, 30.0) == 30   # perfect link
    assert ale3g_lqa_score(0.1, 0.0) == 0     # unusable
    assert 0 < ale3g_lqa_score(0.05, 12.0) < 30
