"""Host back end of the Galileo PVT gate (tools/galileo_pvt.py):
symbol-stream → page/word decode → ephemeris assembly → transmit time,
validated without RF (clean prompt signs at an arbitrary stream
offset, a constant replica code phase)."""

import numpy as np

from r4w_tpu.gnss.ephemeris import circular_ephemeris_for_position
from tools.galileo_pvt import (T_EP, build_sv_nav_symbols,
                               decode_sv_channel)

CODE_LEN = 4092 * 12.0


def _setup(prn=3, k0=23):
    truth = np.array([4500e3, 500e3, 4400e3])
    pos = np.array([20e6, 12e6, 16e6])
    pos *= 29.6e6 / np.linalg.norm(pos)
    t0 = 345_600.0
    tow_w5 = t0 + (250 + 4 * 500) * T_EP
    eph = circular_ephemeris_for_position(pos, truth, t0 + 10.9,
                                          prn=prn, toe_quantum=60.0)
    syms = build_sv_nav_symbols(eph, prn, tow_w5)
    # the word-5 page spans symbols 2250..2749: the tracked window
    # must reach past symbol 2749 (gate duration 11.2 s ≈ 2800 blocks)
    prompt_i = (1.0 - 2.0 * syms[k0:k0 + 2740]).astype(np.float64)
    return t0, eph, prompt_i


def test_decode_transmit_time_exact():
    t0, eph, prompt_i = _setup()
    k0, m_star, cp0 = 23, 2650, 100.0
    code_phase = np.full(len(prompt_i) - 1, cp0)
    rec, eph_dec, t_tx = decode_sv_channel(
        prompt_i, code_phase, cp0, m_star, 3, CODE_LEN)
    assert rec["words"] == [1, 2, 3, 4, 5]
    assert rec["pages_crc_ok"] == 5
    # symbol k0+m_star starts transmitting at t0+(k0+m_star)·T_EP; the
    # replica phase fraction adds (cp0/code_len)·T_EP
    exp = t0 + (k0 + m_star) * T_EP + (cp0 / CODE_LEN) * T_EP
    assert abs(t_tx - exp) < 1e-12
    # decoded ephemeris reproduces the encoded orbit to quantization
    err = np.linalg.norm(eph_dec.position(t_tx) - eph.position(t_tx))
    assert err < 0.1


def test_decode_survives_polarity_flip_and_noise():
    t0, eph, prompt_i = _setup(prn=5)
    rng = np.random.default_rng(0)
    soft = -(prompt_i + 0.35 * rng.standard_normal(len(prompt_i)))
    code_phase = np.full(len(soft) - 1, 4000.0)
    rec, eph_dec, t_tx = decode_sv_channel(
        soft, code_phase, 4000.0, 2650, 5, CODE_LEN)
    assert eph_dec is not None, rec
    assert rec["wn"] == 1100


def test_missing_words_returns_none():
    _t0, _eph, prompt_i = _setup()
    short = prompt_i[:1400]  # < 3 full pages after the filler part
    code_phase = np.full(len(short) - 1, 0.0)
    rec, eph_dec, t_tx = decode_sv_channel(
        short, code_phase, 0.0, 1000, 3, CODE_LEN)
    assert eph_dec is None and t_tx is None
    assert set(rec["words"]) < {1, 2, 3, 4, 5}
