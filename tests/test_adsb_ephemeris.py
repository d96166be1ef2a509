"""ADS-B Mode-S frames, RINEX/SP3 ephemeris, misc DSP ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from r4w_tpu import adsb
from r4w_tpu.gnss import ephemeris as eph
from r4w_tpu.ops import agc as dsp


# ------------------------------------------------------------------ ADS-B


def test_adsb_identification_roundtrip():
    msg = adsb.AdsbMessage(icao=0x4840D6, type_code=4, callsign="KLM1023")
    bits = msg.to_bits()
    assert bits.shape == (112,)
    back = adsb.AdsbMessage.from_bits(bits)
    assert back.crc_ok
    assert back.icao == 0x4840D6
    assert back.callsign == "KLM1023"


def test_adsb_altitude_roundtrip():
    bits = adsb.encode_altitude(0xABCDEF, 38000)
    back = adsb.AdsbMessage.from_bits(bits)
    assert back.crc_ok and back.altitude_ft == 38000


def test_adsb_crc_detects_bit_error():
    bits = adsb.encode_identification(0x123456, "TEST123")
    bad = bits.copy()
    bad[40] ^= 1
    back = adsb.AdsbMessage.from_bits(bad)
    assert back is not None and not back.crc_ok


def test_adsb_over_ppm_waveform():
    msg = adsb.AdsbMessage(icao=0x3C6DD0, type_code=4, callsign="DLH9U")
    iq = adsb.transmit_over_ppm(msg, 8e6)
    back = adsb.receive_over_ppm(iq, 8e6)
    assert back is not None and back.crc_ok
    assert back.icao == 0x3C6DD0 and back.callsign == "DLH9U"


def test_adsb_rejects_non_df17():
    bits = np.zeros(112, np.int32)  # DF=0
    assert adsb.AdsbMessage.from_bits(bits) is None


# -------------------------------------------------------------- ephemeris


def _gps_like_eph(prn=1):
    return eph.BroadcastEphemeris(
        prn=prn, toe=0.0, sqrt_a=np.sqrt(26_560_000.0), e=0.01,
        i0=np.deg2rad(55.0), omega0=0.3, omega=0.5, m0=1.0,
        delta_n=4.5e-9, idot=1e-10, omega_dot=-8e-9,
        af0=1e-5, af1=1e-11,
    )


def test_broadcast_ephemeris_position_sane():
    e = _gps_like_eph()
    p0 = e.position(0.0)
    r = np.linalg.norm(p0)
    assert 2.55e7 < r < 2.75e7  # GPS orbit radius
    # quarter orbit later the satellite has moved a large distance
    p1 = e.position(3600.0)
    assert np.linalg.norm(p1 - p0) > 5e6
    assert abs(e.clock_bias(100.0) - (1e-5 + 1e-9)) < 1e-9


def test_rinex_nav_parse():
    text = (
        "     2.11           N: GPS NAV DATA                         "
        "RINEX VERSION / TYPE\n"
        "                                                            "
        "END OF HEADER\n"
        " 1 24  1  1  0  0  0.0 1.000000000000D-05 1.000000000000D-11"
        " 0.000000000000D+00\n"
        "    0.100000000000D+02 0.218750000000D+02 0.450000000000D-08"
        " 0.100000000000D+01\n"
        "    0.115297734737D-05 0.100000000000D-01 0.655651092529D-05"
        " 0.515365000000D+04\n"
        "    0.000000000000D+00 0.141561031342D-06 0.300000000000D+00"
        " -0.111758708954D-07\n"
        "    0.959931088593D+00 0.287406250000D+03 0.500000000000D+00"
        " -0.800000000000D-08\n"
        "    0.100000000000D-09 0.100000000000D+01 0.229800000000D+04"
        " 0.000000000000D+00\n"
        "    0.200000000000D+01 0.000000000000D+00 0.200000000000D-08"
        " 0.000000000000D+00\n"
        "    0.000000000000D+00 0.400000000000D+01 0.000000000000D+00"
        " 0.000000000000D+00\n"
    )
    ephs = eph.parse_rinex_nav(text)
    assert 1 in ephs
    e = ephs[1][0]
    assert abs(e.sqrt_a - 5153.65) < 0.01
    assert abs(e.e - 0.01) < 1e-9
    p = e.position(e.toe + 100.0)
    assert 2.5e7 < np.linalg.norm(p) < 2.8e7


def test_sp3_parse_and_interpolate():
    text = (
        "#cP2024  1  1  0  0  0.00000000      96 ORBIT IGS14 HLM  IGS\n"
        "*  2024  1  1  0  0  0.00000000\n"
        "PG01  12000.000000  18000.000000  14000.000000    123.456789\n"
        "*  2024  1  1  0 15  0.00000000\n"
        "PG01  12100.000000  17900.000000  14100.000000    123.456900\n"
        "*  2024  1  1  0 30  0.00000000\n"
        "PG01  12200.000000  17800.000000  14200.000000    123.457000\n"
    )
    epochs, recs = eph.parse_sp3(text)
    assert len(epochs) == 3 and len(recs) == 3
    mid = eph.sp3_interpolate(epochs, recs, "G01", 450.0, order=2)
    assert abs(mid[0] - 12050.0) < 1.0  # halfway between samples
    assert abs(mid[1] - 17950.0) < 1.0


# ---------------------------------------------------------------- misc DSP


def test_agc_reaches_target():
    x = (0.05 * np.exp(1j * 0.3 * np.arange(3000))).astype(np.complex64)
    y, gain, _ = dsp.agc(x, target_level=1.0, attack=0.05, decay=0.02)
    assert abs(float(np.abs(np.asarray(y)[-100:]).mean()) - 1.0) < 0.05
    yb = dsp.agc_block(x, 1.0)
    assert abs(float(np.abs(np.asarray(yb)).mean()) - 1.0) < 0.02


def test_cordic_rotation_and_vectoring():
    xr, yr = dsp.cordic_rotate(jnp.asarray([1.0]), jnp.asarray([0.0]),
                               jnp.asarray([np.pi / 3]))
    assert abs(float(xr[0]) - 0.5) < 1e-4
    assert abs(float(yr[0]) - np.sqrt(3) / 2) < 1e-4
    mags, ph = dsp.cordic_magnitude_phase(
        jnp.asarray([3.0, -1.0, -2.0]), jnp.asarray([4.0, 1.0, -2.0]))
    assert np.allclose(np.asarray(mags), [5.0, np.sqrt(2), np.sqrt(8)],
                       atol=1e-4)
    assert np.allclose(np.asarray(ph),
                       np.arctan2([4, 1, -2], [3, -1, -2]), atol=1e-4)


def test_chirp_z_equals_fft_on_unit_circle():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
        np.complex64)
    cz = np.asarray(dsp.chirp_z_transform(jnp.asarray(x), 64,
                                          np.exp(-2j * np.pi / 64)))
    assert np.max(np.abs(cz - np.fft.fft(x))) < 1e-3


def test_zoom_fft_resolves_fine_frequency():
    fs = 1000.0
    t = np.arange(4096) / fs
    tone = np.exp(2j * np.pi * 123.4 * t).astype(np.complex64)
    z = np.asarray(dsp.zoom_fft(jnp.asarray(tone), 100.0, 150.0, 200, fs))
    f_peak = 100 + np.argmax(np.abs(z)) * (50.0 / 200)
    assert abs(f_peak - 123.4) < 0.3


def test_cyclostationary_peaks_at_symbol_rate():
    rng = np.random.default_rng(1)
    bits = rng.choice([-1.0, 1.0], 400)
    x = np.repeat(bits, 10).astype(np.complex64)  # 100 Bd at 1 kS/s
    x += 0.3 * (rng.standard_normal(4000) + 1j * rng.standard_normal(4000))
    on = float(np.max(np.asarray(
        dsp.cyclostationary_detector(jnp.asarray(x), 100.0, 1000.0))))
    off = float(np.max(np.asarray(
        dsp.cyclostationary_detector(jnp.asarray(x), 173.0, 1000.0))))
    assert on > off + 0.1


def test_wigner_ville_tracks_chirp():
    n = 256
    chirp = np.exp(1j * np.pi * 0.5 * np.arange(n) ** 2 / n).astype(
        np.complex64)
    wv = np.asarray(dsp.wigner_ville(jnp.asarray(chirp), 64))
    ridge = np.argmax(np.abs(wv), axis=1)
    assert ridge[200] > ridge[20]
