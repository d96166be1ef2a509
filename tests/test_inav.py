"""Galileo E1B I/NAV page coding (VERDICT r4 #5; Galileo OS SIS ICD
§4.3.5 structure: sync 0101100000, rate-1/2 K=7 FEC with inverted G2,
30×8 block interleaver, CRC-24Q over the 196 content bits)."""

from __future__ import annotations

import numpy as np
import pytest

from r4w_tpu.gnss import inav


def test_crc24q_standard_check_value():
    """CRC-24Q of the ASCII check string '123456789' is the published
    0xCDE703 (CRC catalogue, CRC-24/LTE-A == CRC-24Q; poly 0x864CFB,
    init 0, no reflect, no xorout)."""
    bits = np.unpackbits(np.frombuffer(b"123456789", np.uint8))
    assert inav.crc24q(bits) == 0xCDE703


def test_crc24q_known_vector():
    """CRC-24Q of the single bit 1 after 24 zero-shifts equals the
    polynomial remainder; cross-check against a direct long-division
    model on random payloads."""
    rng = np.random.default_rng(0)
    for n in (8, 25, 196):
        bits = rng.integers(0, 2, n)
        # direct polynomial long division: message * x^24 mod g(x)
        msg = 0
        for b in bits:
            msg = (msg << 1) | int(b)
        msg <<= 24
        g = inav.CRC_POLY
        top = n + 24
        for i in range(top - 1, 23, -1):
            if msg & (1 << i):
                msg ^= g << (i - 24)
        assert inav.crc24q(bits) == (msg & 0xFFFFFF)


def test_page_roundtrip_clean():
    rng = np.random.default_rng(1)
    d112 = rng.integers(0, 2, 112)
    d16 = rng.integers(0, 2, 16)
    syms = inav.encode_page(d112, d16, osnma=0xABCDE, sar=0x155)
    assert syms.shape == (500,)
    assert np.array_equal(syms[:10], inav.SYNC)
    assert np.array_equal(syms[250:260], inav.SYNC)
    page = inav.decode_page(1.0 - 2.0 * syms.astype(np.float64))
    assert page["crc_ok"]
    assert np.array_equal(page["data112"], d112)
    assert np.array_equal(page["data16"], d16)


def test_stream_decode_with_offset_noise_and_polarity():
    """Pages embedded mid-stream at unknown offset, with AWGN at
    Es/N0 ≈ 6 dB and inverted polarity: sync search + Viterbi must
    recover every page with CRC pass."""
    rng = np.random.default_rng(2)
    pages_tx = []
    datas = []
    for _ in range(3):
        d112 = rng.integers(0, 2, 112)
        d16 = rng.integers(0, 2, 16)
        datas.append((d112, d16))
        pages_tx.append(inav.encode_page(d112, d16))
    stream = inav.pages_to_symbols_pm(pages_tx)
    soft = -(np.concatenate([rng.standard_normal(137) * 0.5, stream,
                             rng.standard_normal(60) * 0.5])
             + 0.5 * rng.standard_normal(137 + len(stream) + 60))
    pages = inav.decode_stream(soft)
    ok = [p for p in pages if p["crc_ok"]]
    assert len(ok) == 3
    for p, (d112, d16) in zip(ok, datas):
        assert np.array_equal(p["data112"], d112)
        assert np.array_equal(p["data16"], d16)


def test_corrupted_page_fails_crc():
    rng = np.random.default_rng(3)
    syms = inav.encode_page(rng.integers(0, 2, 112),
                            rng.integers(0, 2, 16))
    soft = 1.0 - 2.0 * syms.astype(np.float64)
    # flip a burst of 30 symbols mid-even-part: beyond the FEC's
    # correction power, must be caught by the CRC
    soft[40:70] *= -1
    page = inav.decode_page(soft)
    assert not page["crc_ok"]


def test_interleaver_is_bijective():
    x = np.arange(240)
    assert np.array_equal(inav._deinterleave(inav._interleave(x)), x)
