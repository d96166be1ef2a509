"""Galileo I/NAV word types 1-5 (gnss/inav_words.py) — layout tiling,
field roundtrips at ICD scale factors, two's-complement extremes,
ephemeris assembly fidelity, and end-to-end page transport through
gnss/inav.py encode_page/decode_page."""

import math

import numpy as np
import pytest

from r4w_tpu.gnss import inav, inav_words
from r4w_tpu.gnss.ephemeris import circular_ephemeris_for_position
from r4w_tpu.gnss.inav_words import (SEMI, WORD_LAYOUTS, decode_word,
                                     encode_word, ephemeris_from_words,
                                     words_for_ephemeris)


def test_layouts_tile_128_bits_without_overlap():
    for wtype, lay in WORD_LAYOUTS.items():
        seen = np.zeros(128, bool)
        for f in lay.values():
            assert 1 <= f.lo <= f.hi <= 128, (wtype, f.name)
            assert not seen[f.lo - 1:f.hi].any(), (wtype, f.name)
            seen[f.lo - 1:f.hi] = True
        assert seen.all(), wtype


@pytest.mark.parametrize("wtype", [1, 2, 3, 4, 5])
def test_word_type_field_roundtrips_exactly(wtype):
    rng = np.random.default_rng(wtype)
    vals = {}
    for name, f in WORD_LAYOUTS[wtype].items():
        if name in ("type", "reserved", "spare"):
            continue
        n = f.n_bits
        lo = -(1 << (n - 1)) if f.signed else 0
        hi = (1 << (n - 1)) - 1 if f.signed else (1 << n) - 1
        q = int(rng.integers(lo, hi + 1))
        vals[name] = q * f.scale
    d112, d16 = encode_word(wtype, vals)
    assert d112.shape == (112,) and d16.shape == (16,)
    out = decode_word(d112, d16)
    assert out["type"] == wtype
    for name, v in vals.items():
        # quantized values roundtrip bit-exactly (scale is a power of
        # two or 60; q*scale is exactly representable in f64)
        assert out[name] == v, name


def test_signed_extremes_and_sign_convention():
    # m0 = -1 semicircle is the 32-bit two's-complement minimum
    d112, d16 = encode_word(1, {"m0": -1.0, "iodnav": 1023})
    out = decode_word(d112, d16)
    assert out["m0"] == -1.0
    assert out["iodnav"] == 1023
    # overflow raises rather than wrapping
    with pytest.raises(ValueError):
        encode_word(1, {"m0": 1.0})  # +1 sc exceeds the signed max
    with pytest.raises(ValueError):
        encode_word(1, {"iodnav": 1024})


def test_word5_gst_time_fields():
    d112, d16 = encode_word(5, {"wn": 1234, "tow": 345600.0,
                                "ai0": 25.0, "e1b_hs": 0})
    out = decode_word(d112, d16)
    assert out["wn"] == 1234 and out["tow"] == 345600.0
    assert out["ai0"] == 25.0


def test_unknown_word_type_returns_type_only():
    bits = np.zeros(128, np.int32)
    bits[:6] = [0, 0, 0, 1, 1, 0]  # type 6 (not implemented)
    out = decode_word(bits[:112], bits[112:])
    assert out == {"type": 6}


def _truth_geometry():
    rcv = np.array([6378137.0, 0.0, 0.0])
    pos = np.array([20e6, 12e6, 14e6])
    pos *= 29.6e6 / np.linalg.norm(pos)
    return pos, rcv


def test_ephemeris_through_words_reproduces_position():
    """words_for_ephemeris -> decode -> ephemeris_from_words -> the
    decoded Keplerian set reproduces the truth SV position to < 1 m
    (field quantization only; the synthesized orbit is exact)."""
    pos, rcv = _truth_geometry()
    t_eval = 302400.0
    eph = circular_ephemeris_for_position(pos, rcv, t_eval, prn=11,
                                          af0=2.5e-6, toe_quantum=60.0)
    words = words_for_ephemeris(eph, iodnav=77, svid=11, wn=1100,
                                tow_word5=t_eval)
    decoded = {}
    for d112, d16 in words:
        w = decode_word(d112, d16)
        decoded[w["type"]] = w
    assert set(decoded) == {1, 2, 3, 4, 5}
    eph2 = ephemeris_from_words(decoded, prn=11)
    err = np.linalg.norm(eph2.position(t_eval) - pos)
    assert err < 1.0, f"decoded-ephemeris position error {err:.3f} m"
    assert abs(eph2.clock_bias(t_eval) - eph.clock_bias(t_eval)) < 1e-9
    assert decoded[5]["tow"] == t_eval
    assert decoded[4]["svid"] == 11


def test_ephemeris_from_words_rejects_mixed_iodnav():
    pos, rcv = _truth_geometry()
    eph = circular_ephemeris_for_position(pos, rcv, 7200.0,
                                          toe_quantum=60.0)
    words = words_for_ephemeris(eph, iodnav=5, svid=1, wn=1,
                                tow_word5=7200.0)
    decoded = {decode_word(*w)["type"]: decode_word(*w) for w in words}
    decoded[3] = dict(decoded[3], iodnav=6.0)  # stale word 3
    with pytest.raises(ValueError):
        ephemeris_from_words(decoded, prn=1)


def test_words_survive_page_transport():
    """encode_word -> inav.encode_page -> soft symbols -> decode_page
    -> decode_word: the full E1B transmit/receive chain is lossless."""
    pos, rcv = _truth_geometry()
    eph = circular_ephemeris_for_position(pos, rcv, 43200.0, prn=3,
                                          toe_quantum=60.0)
    words = words_for_ephemeris(eph, iodnav=9, svid=3, wn=42,
                                tow_word5=43200.0)
    stream = np.concatenate([inav.encode_page(d112, d16)
                             for d112, d16 in words])
    soft = 1.0 - 2.0 * stream.astype(np.float64)  # clean channel
    pages = inav.decode_stream(soft)
    assert len(pages) == 5
    got = {}
    for g in pages:
        assert g["crc_ok"]
        w = decode_word(g["data112"], g["data16"])
        got[w["type"]] = w
    # transport is LOSSLESS: page-carried words decode to exactly the
    # same fields as the words decoded directly (quantization happens
    # at encode_word, not in the page pipeline)
    direct = {decode_word(*w)["type"]: decode_word(*w) for w in words}
    assert got == direct
    eph2 = ephemeris_from_words(got, prn=3)
    err = np.linalg.norm(eph2.position(43200.0) - eph.position(43200.0))
    assert err < 0.1  # field-LSB quantization only
    assert got[5]["tow"] == 43200.0


def test_galileo_toe_quantum_snaps_to_60s():
    pos, rcv = _truth_geometry()
    eph = circular_ephemeris_for_position(pos, rcv, 12345.0,
                                          toe_quantum=60.0)
    assert eph.toe % 60.0 == 0.0
    # and the GPS default still snaps to 16 s
    eph16 = circular_ephemeris_for_position(pos, rcv, 12345.0)
    assert eph16.toe % 16.0 == 0.0
