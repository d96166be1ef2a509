"""Consolidated known-answer vectors across the op library — the
reference's dominant inline-test pattern (SURVEY.md §4): exact
constellation points, filter-response anchors, spreading-code values,
window samples, and transform identities verified against analytic
values, not against our own implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import mapping as mp
from r4w_tpu.ops import pulse, spreading
from r4w_tpu.ops import filters as flt


class TestConstellationTables:
    def test_bpsk_points(self):
        t = np.asarray(mp.constellation_table("bpsk"))
        np.testing.assert_allclose(t, [1 + 0j, -1 + 0j], atol=1e-6)

    def test_qpsk_unit_energy_and_quadrants(self):
        t = np.asarray(mp.constellation_table("qpsk"))
        np.testing.assert_allclose(np.abs(t), 1.0, atol=1e-6)
        # one point per quadrant
        quads = {(p.real > 0, p.imag > 0) for p in t}
        assert len(quads) == 4

    def test_8psk_angles(self):
        t = np.asarray(mp.constellation_table("8psk"))
        ang = np.sort(np.angle(t))
        d = np.diff(ang)
        np.testing.assert_allclose(d, np.pi / 4, atol=1e-5)

    def test_qam16_grid_and_power(self):
        t = np.asarray(mp.constellation_table("qam16"))
        # unit average energy
        assert abs(np.mean(np.abs(t) ** 2) - 1.0) < 1e-5
        # 3:1 level ratio of the outer/inner rails
        re = np.unique(np.round(np.abs(t.real), 6))
        assert len(re) == 2 and abs(re[1] / re[0] - 3.0) < 1e-4

    def test_qam64_point_count(self):
        t = np.asarray(mp.constellation_table("qam64"))
        assert len(np.unique(np.round(t, 6))) == 64


class TestSpreadingCodes:
    def test_barker13_exact(self):
        b = np.asarray(spreading.barker_code(13))
        want = [1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1]
        np.testing.assert_array_equal(b, want)

    def test_barker_sidelobe_bound(self):
        # defining property: aperiodic autocorr sidelobes <= 1
        for n in (7, 11, 13):
            b = np.asarray(spreading.barker_code(n)).astype(float)
            ac = np.correlate(b, b, "full")
            side = np.delete(ac, n - 1)
            assert np.abs(side).max() <= 1.0 + 1e-6

    def test_msequence_balance_and_runs(self):
        seq = np.asarray(spreading.m_sequence(7))  # length 127, ±1
        assert seq.shape[0] == 127
        # balance: one more -1-chip than +1 (or vice versa) — |sum|=1
        assert abs(int(seq.sum())) == 1
        # two-valued periodic autocorrelation: N at 0, -1 elsewhere
        ac = np.array([np.dot(seq, np.roll(seq, k)) for k in range(127)])
        assert ac[0] == 127
        np.testing.assert_array_equal(ac[1:], -1)

    def test_zadoff_chu_cazac(self):
        z = np.asarray(spreading.zadoff_chu(25, 139))
        np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-5)  # CA
        # ZAC: periodic autocorrelation is a delta
        ac = np.fft.ifft(np.abs(np.fft.fft(z)) ** 2)
        assert abs(ac[0]) > 100 * np.abs(ac[1:]).max()

    def test_gold_family_cross_correlation_bound(self):
        # Gold codes of degree 5: three-valued cross-correlation
        # bounded by 2^((n+1)/2)+1 = 9
        a = np.asarray(spreading.gold_code(5, 2)).astype(float)
        b = np.asarray(spreading.gold_code(5, 3)).astype(float)
        cc = np.array([np.dot(a, np.roll(b, k)) for k in range(31)])
        assert np.abs(cc).max() <= 9.0 + 1e-6


class TestFilterAnchors:
    def test_lowpass_minus6db_at_cutoff(self):
        fs, fc = 1.0, 0.125
        taps = np.asarray(flt.design_lowpass(255, fc, fs))
        h = np.abs(np.fft.rfft(taps, 4096))
        f = np.fft.rfftfreq(4096, 1 / fs)
        k = np.argmin(np.abs(f - fc))
        assert abs(20 * np.log10(h[k] / h[0]) + 6.0) < 0.6

    def test_rrc_nyquist_isi_zeros(self):
        # RC = RRC*RRC must have zeros at nonzero symbol multiples
        sps = 8
        rrc = np.asarray(pulse.root_raised_cosine_taps(sps, 12, 0.25))
        rc = np.convolve(rrc, rrc)
        center = len(rc) // 2
        peak = rc[center]
        for k in range(1, 8):
            assert abs(rc[center + k * sps]) < 0.01 * peak

    def test_gaussian_taps_bt_shape(self):
        g = np.asarray(pulse.gaussian_taps(8, 0.3, 4))
        # symmetric, positive, unit-ish area
        np.testing.assert_allclose(g, g[::-1], atol=1e-6)
        assert g.min() >= 0

    def test_hilbert_quadrature(self):
        taps = np.asarray(flt.hilbert_fir_taps(129))
        # antisymmetric type-III
        np.testing.assert_allclose(taps, -taps[::-1], atol=1e-9)
        # 90-degree shift at mid-band
        h = np.fft.rfft(taps, 2048)
        k = 512  # 0.25 cycles/sample
        assert abs(np.angle(h[k] * np.exp(1j * 2 * np.pi * k * 64
                                          / 2048)) + np.pi / 2) < 0.05

    def test_moving_average_dc_gain(self):
        y, _ = flt.moving_average(jnp.ones(64), 8)
        assert abs(float(y[-1]) - 1.0) < 1e-6


class TestTransformIdentities:
    def test_fft_parseval(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(1024)
             + 1j * rng.standard_normal(1024)).astype(np.complex64)
        X = np.asarray(jnp.fft.fft(jnp.asarray(x)))
        assert abs(np.sum(np.abs(x) ** 2)
                   - np.sum(np.abs(X) ** 2) / 1024) < 1e-2

    def test_goertzel_equals_dft_bin(self):
        from r4w_tpu.ops.measure import goertzel_power
        rng = np.random.default_rng(1)
        x = rng.standard_normal(256).astype(np.float32)
        k = 37
        want = np.abs(np.fft.fft(x)[k]) ** 2
        got = float(goertzel_power(jnp.asarray(x), k))
        assert abs(got - want) / want < 1e-3

    def test_cordic_rotation_accuracy(self):
        from r4w_tpu.ops.agc import cordic_rotate
        xr, yr = cordic_rotate(jnp.asarray([1.0]), jnp.asarray([0.0]),
                               jnp.asarray([np.pi / 3]))
        want = np.exp(1j * np.pi / 3)
        assert abs(float(xr[0]) - want.real) < 1e-3
        assert abs(float(yr[0]) - want.imag) < 1e-3


class TestCodingVectors:
    def test_gray_code_table8(self):
        from r4w_tpu.ops.coding import gray_encode
        got = [int(gray_encode(jnp.asarray(i))) for i in range(8)]
        assert got == [0, 1, 3, 2, 6, 7, 5, 4]

    def test_hamming74_known_codeword(self):
        from r4w_tpu.ops.coding import hamming_encode, hamming_decode
        # nibble-valued API: 0..15 in, (4+cr)-bit codeword out
        data = jnp.asarray([0b1011])
        for cr in (1, 2, 3, 4):
            cw = hamming_encode(data, cr)
            back = hamming_decode(cw, cr)
            assert int(back[0]) == 0b1011
        # CR>=3 corrects a single flipped bit
        for cr in (3, 4):
            cw = hamming_encode(data, cr)
            flipped = cw ^ (1 << 2)
            back = hamming_decode(flipped, cr)
            assert int(back[0]) == 0b1011

    def test_mu_law_known_values(self):
        from r4w_tpu.ops.stream_math import mu_law_encode, mu_law_decode
        # mu-law of 0 is 0; full scale maps to 1.0; monotone odd
        assert abs(float(mu_law_encode(jnp.asarray([0.0]))[0])) < 1e-6
        assert abs(float(mu_law_encode(jnp.asarray([1.0]))[0]) - 1.0) \
            < 1e-6
        x = jnp.asarray([0.5])
        assert abs(float(mu_law_decode(mu_law_encode(x))[0]) - 0.5) \
            < 1e-6

    def test_crc_x25_vector(self):
        from r4w_tpu.fec.crc import crc_compute
        data = jnp.asarray(list(b"123456789"))
        # CRC-16/X.25 check value is 0x906E
        assert int(crc_compute(data, "crc16-ibm")) != 0  # smoke
        from r4w_tpu.ops.protocols import crc16_x25
        assert crc16_x25(b"123456789") == 0x906E


class TestWindowAnchors:
    def test_hann_endpoint_and_center(self):
        from r4w_tpu.core.windows import make_window
        w = np.asarray(make_window("hann", 65))
        assert w[0] < 1e-6
        assert abs(w[32] - 1.0) < 1e-6

    def test_hamming_endpoint_value(self):
        from r4w_tpu.core.windows import make_window
        w = np.asarray(make_window("hamming", 65))
        assert abs(w[0] - 0.08) < 0.01

    def test_blackman_sidelobe_level(self):
        from r4w_tpu.core.windows import make_window
        w = np.asarray(make_window("blackman", 128))
        spec = np.abs(np.fft.fft(w, 8192))
        spec = spec / spec[0]
        side = 20 * np.log10(spec[400:4096].max() + 1e-12)
        assert side < -55.0  # Blackman first sidelobe -58 dB


class TestKaHeadlineCount:
    """VERDICT r4 #9: the documented KA-truth count is pinned to
    tools/ka_count.py, not prose. The floor here is the number the
    docs cite; raising the docs means raising this floor."""

    DOCUMENTED_FLOOR = 471

    def test_count_meets_documented_floor(self):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.ka_count import count
        out = count()
        assert out["ka_test_functions"] >= self.DOCUMENTED_FLOOR
        assert out["files"] >= 23
