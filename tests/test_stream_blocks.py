"""Tests for the stream plumbing/scalar-math block batch
(stream_blocks.py — GNU-Radio utility tail)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import stream_blocks as sb


class TestProbes:
    def test_probe_avg_mag_sqrd_converges(self):
        x = jnp.full((4000,), 2.0 + 0j)
        series, final = sb.probe_avg_mag_sqrd(x, alpha=0.01)
        assert abs(float(final) - 4.0) < 0.05
        assert float(series[0]) < float(series[-1])

    def test_probe_power(self):
        x = jnp.full((128,), 3.0 + 4.0j)
        assert abs(float(sb.probe_power(x)) - 25.0) < 1e-3

    def test_probe_density(self):
        bits = jnp.asarray([1, 0] * 2000)
        _, final = sb.probe_density(bits, alpha=0.01)
        assert abs(float(final) - 0.5) < 0.05

    def test_probe_rate(self):
        assert sb.probe_rate(1000, 0.0, 2.0) == 500.0


class TestPeaks:
    def test_peak_detector_finds_single_peak(self):
        x = np.zeros(64, np.float32)
        x[20] = 5.0
        mask = np.asarray(sb.peak_detector(jnp.asarray(x), threshold=1.0))
        assert mask[20] and mask.sum() == 1

    def test_peak_hold_decay(self):
        x = np.zeros(100, np.float32)
        x[0] = 1.0
        series, _ = sb.peak_hold(jnp.asarray(x), decay=0.9)
        s = np.asarray(series)
        assert abs(s[0] - 1.0) < 1e-6
        assert abs(s[10] - 0.9 ** 10) < 1e-4

    def test_plateau_detector(self):
        g = np.zeros(40, np.int32)
        g[5:15] = 1   # long plateau (len 10)
        g[20:23] = 1  # short plateau (len 3)
        pulses = np.asarray(sb.plateau_detector(jnp.asarray(g), min_len=8))
        assert pulses[14] and pulses.sum() == 1

    def test_sample_and_hold(self):
        x = jnp.arange(8.0)
        ctrl = jnp.asarray([1, 0, 0, 1, 0, 0, 1, 0])
        y = np.asarray(sb.sample_and_hold(x, ctrl))
        np.testing.assert_allclose(y, [0, 0, 0, 3, 3, 3, 6, 6])

    def test_sample_counter(self):
        _, n = sb.sample_counter(jnp.zeros(100), state=50)
        assert int(n) == 150


class TestRates:
    def test_integrate_and_dump(self):
        y = sb.integrate_and_dump(jnp.ones(16), 4)
        np.testing.assert_allclose(np.asarray(y), [4, 4, 4, 4])

    def test_keep_m_in_n(self):
        x = jnp.arange(12)
        y = np.asarray(sb.keep_m_in_n(x, m=2, n=4, offset=1))
        np.testing.assert_array_equal(y, [1, 2, 5, 6, 9, 10])

    def test_moving_avg_decim(self):
        y = sb.moving_avg_decim(jnp.ones(64), length=4, decim=2)
        assert abs(float(y[10]) - 1.0) < 1e-6
        assert y.shape[0] == 32

    def test_stretch_and_mute(self):
        y = np.asarray(sb.stretch(jnp.asarray([-5.0, 0.0, 5.0]), -1.0))
        np.testing.assert_allclose(y, [-1, 0, 5])
        m = sb.mute(jnp.ones(4, jnp.complex64), 1.0)
        assert float(jnp.abs(m).sum()) == 0.0

    def test_power_squelch_gates_noise(self):
        x = np.concatenate([np.full(500, 0.01), np.full(3000, 1.0),
                            np.full(500, 0.01)]).astype(np.complex64)
        y, _ = sb.power_squelch(jnp.asarray(x), threshold_db=-10.0,
                                alpha=0.05)
        y = np.asarray(y)
        assert abs(y[0]) == 0.0          # quiet head gated
        assert abs(y[2000]) > 0.5        # strong middle passes

    def test_envelope_detector_tracks(self):
        x = np.concatenate([np.ones(200), np.zeros(800)]).astype(np.float32)
        series, _ = sb.envelope_detector(jnp.asarray(x), attack=0.5,
                                         release=0.01)
        s = np.asarray(series)
        assert s[150] > 0.9
        assert s[-1] < 0.1


class TestSources:
    def test_random_source_kinds(self):
        k = jax.random.key(0)
        b = sb.random_source(k, 256, "uniform_byte")
        assert int(b.min()) >= 0 and int(b.max()) <= 255
        bits = sb.random_source(k, 256, "bits")
        assert set(np.unique(np.asarray(bits))) <= {0, 1}

    def test_signal_source_tones(self):
        fs, f = 1000.0, 100.0
        y = np.asarray(sb.signal_source(1000, fs, f, "exp"))
        spec = np.abs(np.fft.fft(y))
        assert np.argmax(spec) == 100
        sq = np.asarray(sb.signal_source(1000, fs, f, "square"))
        assert set(np.unique(sq)) <= {-1.0, 1.0}
        tri = np.asarray(sb.signal_source(1000, fs, f, "triangle"))
        assert tri.max() <= 1.0 + 1e-6 and tri.min() >= -1.0 - 1e-6

    def test_sweep_covers_band(self):
        y = np.asarray(sb.signal_generator_sweep(4096, 4096.0, 100.0, 900.0))
        # instantaneous freq at start ~100 Hz, at end ~900 Hz
        ph = np.unwrap(np.angle(y))
        inst = np.diff(ph) * 4096.0 / (2 * np.pi)
        assert abs(inst[10] - 100) < 20
        assert abs(inst[-10] - 900) < 30

    def test_null_and_vector_sink(self):
        assert sb.null_sink(sb.null_source(64)) == 64
        sink = sb.VectorSink()
        sink.process(jnp.arange(4))
        sink.process(jnp.arange(4, 8))
        np.testing.assert_array_equal(sink.data(), np.arange(8))

    def test_vector_insert(self):
        y = np.asarray(sb.vector_insert(jnp.zeros(8), jnp.ones(2), period=4))
        np.testing.assert_allclose(y, [1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0])

    def test_throttle_limits_rate(self):
        th = sb.Throttle(10000.0)
        t0 = time.monotonic()
        for _ in range(5):
            th.process(np.zeros(1000))
        dt = time.monotonic() - t0
        assert dt >= 0.4  # 5000 items at 10k/s -> >=0.5 s (allow slack)


class TestScalarMath:
    def test_magnitude_squared(self):
        y = sb.magnitude_squared(jnp.asarray([3 + 4j]))
        assert abs(float(y[0]) - 25.0) < 1e-4

    def test_nlog10_log_max_exp(self):
        assert abs(float(sb.nlog10(jnp.asarray([100.0]))[0]) - 20.0) < 1e-4
        assert abs(float(sb.log_block(jnp.asarray([np.e]))[0]) - 1.0) < 1e-5
        y = sb.max_block(jnp.asarray([1.0, 5.0]), jnp.asarray([3.0, 2.0]))
        np.testing.assert_allclose(np.asarray(y), [3, 5])
        assert abs(float(sb.exponentiate(jnp.asarray([2.0]), 3)[0]) - 8) < 1e-5

    def test_transcendental(self):
        y = sb.transcendental(jnp.asarray([0.0]), "cos")
        assert abs(float(y[0]) - 1.0) < 1e-6
        with pytest.raises(ValueError):
            sb.transcendental(jnp.asarray([0.0]), "nope")


class TestPhaseMix:
    def test_phase_shift_unwrap_wrap(self):
        x = jnp.ones(4, jnp.complex64)
        y = sb.phase_shift(x, np.pi / 2)
        assert abs(float(y[0].real)) < 1e-6 and float(y[0].imag) > 0.99
        p = jnp.asarray([0.0, 3.0, 6.0, 9.0]) % (2 * np.pi)
        un = np.asarray(sb.phase_unwrap(p))
        np.testing.assert_allclose(un, [0, 3, 6, 9], atol=1e-5)
        w = float(sb.phase_wrap(jnp.asarray([3 * np.pi]))[0])
        assert abs(abs(w) - np.pi) < 1e-5

    def test_frequency_shift_continuity(self):
        fs = 1000.0
        x = jnp.ones(100, jnp.complex64)
        y1, ph = sb.frequency_shift(x, 100.0, fs)
        y2, _ = sb.frequency_shift(x, 100.0, fs, phase0=ph)
        both = np.concatenate([np.asarray(y1), np.asarray(y2)])
        spec = np.abs(np.fft.fft(both))
        assert np.argmax(spec) == 20  # 100 Hz over 200 samples @ 1 kHz

    def test_rf_mixer_real_products(self):
        fs = 1000.0
        t = np.arange(2048) / fs
        x = np.cos(2 * np.pi * 100 * t).astype(np.complex64)
        lo = np.cos(2 * np.pi * 30 * t).astype(np.complex64)
        y = np.asarray(sb.rf_mixer(jnp.asarray(x), jnp.asarray(lo), "real"))
        spec = np.abs(np.fft.rfft(y * np.hanning(2048)))
        f = np.fft.rfftfreq(2048, 1 / fs)
        pk = set(np.round(f[np.argsort(spec)[-2:]]).astype(int))
        assert pk == {70, 130}  # sum and difference


class TestMatrices:
    def test_multiply_matrix(self):
        a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        x = jnp.asarray([[1.0, 1.0]])
        y = np.asarray(sb.multiply_matrix(x, a))
        np.testing.assert_allclose(y, [[3, 7]])

    def test_matrix_eigenvalue_hermitian_and_power(self):
        a = jnp.asarray([[2.0, 0.0], [0.0, 5.0]])
        lam, v = sb.matrix_eigenvalue(a)
        assert abs(float(lam) - 5.0) < 1e-5
        lam2, _ = sb.matrix_eigenvalue(a, hermitian=False)
        assert abs(float(lam2.real) - 5.0) < 1e-3


class TestBits:
    def test_endian_swap(self):
        y = sb.endian_swap(jnp.asarray([0x1234]), 16)
        assert int(y[0]) == 0x3412
        y = sb.endian_swap(jnp.asarray([0x12345678]), 32)
        assert int(y[0]) == 0x78563412

    def test_bitwise_ops(self):
        a, b = jnp.asarray([0b1100]), jnp.asarray([0b1010])
        assert int(sb.bitwise_op(a, b, "and")[0]) == 0b1000
        assert int(sb.bitwise_op(a, b, "or")[0]) == 0b1110
        assert int(sb.bitwise_op(a, b, "xor")[0]) == 0b0110

    def test_numeric_conversions(self):
        f = sb.short_to_float(jnp.asarray([16384], jnp.int16))
        assert abs(float(f[0]) - 0.5) < 1e-4
        s = sb.float_to_short(f)
        assert int(s[0]) == 16384
        c = sb.float_to_complex(jnp.asarray([1.0]), jnp.asarray([2.0]))
        assert complex(c[0]) == 1 + 2j

    def test_repack_bits_roundtrip(self):
        bytes_in = jnp.asarray([0xAB, 0xCD])
        nibbles = sb.repack_bits(bytes_in, 8, 4)
        np.testing.assert_array_equal(np.asarray(nibbles),
                                      [0xA, 0xB, 0xC, 0xD])
        back = sb.repack_bits(nibbles, 4, 8)
        np.testing.assert_array_equal(np.asarray(back), [0xAB, 0xCD])

    def test_check_lfsr_clean_and_errored(self):
        # PRBS9: x^9 + x^5 + 1 -> taps over the 9-bit state
        taps, nbits = (1 << 8) | (1 << 4), 9
        state, bits = 0x1FF, []
        for _ in range(600):
            fb = bin(state & taps).count("1") & 1
            bits.append(fb)
            state = ((state << 1) | fb) & ((1 << nbits) - 1)
        errs, tested = sb.check_lfsr(bits, taps, nbits)
        assert errs == 0 and tested == 600 - nbits
        bad = list(bits)
        bad[100] ^= 1
        errs2, _ = sb.check_lfsr(bad, taps, nbits)
        assert errs2 >= 1


class TestStreamSelect:
    def test_stream_switch(self):
        y = sb.stream_switch([jnp.zeros(4), jnp.ones(4)], 1)
        assert float(y.sum()) == 4.0

    def test_stream_to_streams_roundtrip(self):
        x = jnp.arange(12)
        parts = sb.stream_to_streams(x, 3)
        assert parts.shape == (3, 4)
        np.testing.assert_array_equal(np.asarray(parts[1]), [1, 4, 7, 10])
        back = sb.streams_to_stream(parts)
        np.testing.assert_array_equal(np.asarray(back), np.arange(12))
