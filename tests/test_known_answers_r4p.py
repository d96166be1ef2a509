"""Round-4 KA batch P: echo cancellation, beam steering, DPD, channel
sounding, instrument triggers and mask/utility-math truths — asserted
against known channels, array-factor algebra, exact envelope shapes
and numpy, never against the code under test.

Reference roles: acoustic_echo_canceller.rs,
beam_steering_controller.rs, freq_lock_detector.rs,
constellation_rotation_detector.rs, channel_sounder.rs,
power_amplifier_dpd.rs, burst_shaper.rs, regenerate_bb.rs,
network_analyzer.rs, oscilloscope_trigger.rs, spectral_mask.rs,
multipath_profile_extractor.rs, magnitude_squared.rs, nlog10.rs,
max_block.rs, map_bb.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------- echo control


class TestEchoCancelNlms:
    def test_known_echo_path_erle_and_weights(self):
        """mic = h⋆ref with a known 3-tap echo path: NLMS must achieve
        ≥20 dB ERLE after convergence and its weights must converge to
        h itself."""
        from r4w_tpu.ops.audio import echo_cancel_nlms

        rng = np.random.default_rng(1)
        n = 8000
        ref = rng.standard_normal(n).astype(np.float32)
        h = np.array([0.6, -0.3, 0.15], np.float32)
        mic = np.convolve(ref, h)[:n].astype(np.float32)
        err, w = echo_cancel_nlms(jnp.asarray(mic), jnp.asarray(ref),
                                  n_taps=8)
        err = np.asarray(err)
        erle = 10 * np.log10(np.mean(mic[-2000:] ** 2)
                             / np.mean(err[-2000:] ** 2))
        assert erle > 20.0
        w = np.asarray(w)
        assert np.allclose(w[:3], h, atol=0.02)
        assert np.max(np.abs(w[3:])) < 0.02


# ------------------------------------------------------ beam steering


class TestBeamSteering:
    def test_conjugate_phases_give_coherent_array_gain(self):
        """Applying e^{−jφ_n} from beam_steering_phases to the true
        steering vector at the same angle sums coherently to N (the
        array-factor maximum); 4-bit phase shifters lose only the
        sinc-of-quantization factor."""
        from r4w_tpu.ops.beamforming import _steer, beam_steering_phases

        n, ang = 16, 23.0
        v = np.asarray(_steer(n, ang))
        ph = np.asarray(beam_steering_phases(n, ang))
        gain = abs(np.sum(v * np.exp(-1j * ph)))
        assert gain == pytest.approx(n, rel=1e-4)
        phq = np.asarray(beam_steering_phases(n, ang, quant_bits=4))
        gainq = abs(np.sum(v * np.exp(-1j * phq)))
        # E[quantized gain] = N·sinc(π/2^b) ≈ 0.9936·N at 4 bits
        assert gainq > 0.98 * n


# ----------------------------------------------------------- sync


class TestFreqLockDetector:
    def test_locked_vs_unlocked(self):
        from r4w_tpu.ops.sync2 import freq_lock_detector

        rng = np.random.default_rng(2)
        locked = 0.5 + 0.001 * rng.standard_normal(256).astype(np.float32)
        unlocked = 0.1 * rng.standard_normal(256).astype(np.float32)
        assert bool(np.all(freq_lock_detector(jnp.asarray(locked),
                                              tol=0.01)))
        assert not bool(np.any(freq_lock_detector(jnp.asarray(unlocked),
                                                  tol=0.01)))


class TestConstellationRotation:
    def test_qpsk_rotation_estimated_exactly(self):
        """Axis-aligned QPSK {1, j, −1, −j}: s⁴ = 1, so
        angle(E[(s·e^{jθ})⁴])/4 = θ exactly (θ inside ±π/4)."""
        from r4w_tpu.ops.sync2 import constellation_rotation_detect

        rng = np.random.default_rng(3)
        s = (1j ** rng.integers(0, 4, 4096)).astype(np.complex64)
        for theta in (0.2, -0.35):
            got = float(constellation_rotation_detect(
                jnp.asarray(s * np.exp(1j * theta))))
            assert got == pytest.approx(theta, abs=1e-3)


# ----------------------------------------------------- channel probes


class TestChannelSound:
    def test_circular_pn_probe_recovers_cir_exactly(self):
        from r4w_tpu.ops.measure import channel_sound

        n = 256
        # Zadoff-Chu probe: perfectly flat spectrum, so the circular
        # deconvolution is EXACT (a random ±1 probe leaves O(1/√n)
        # autocorrelation cross terms on every tap)
        k = np.arange(n)
        probe = np.exp(-1j * np.pi * 5 * k * k / n).astype(np.complex64)
        h = np.zeros(n, np.complex64)
        h[0], h[3], h[11] = 1.0, -0.5 + 0.2j, 0.25j
        rx = np.fft.ifft(np.fft.fft(probe) * np.fft.fft(h)
                         ).astype(np.complex64)
        cir = np.asarray(channel_sound(jnp.asarray(rx),
                                       jnp.asarray(probe), n_taps=16))
        assert np.max(np.abs(cir - h[:16])) < 1e-3


class TestMultipathProfile:
    def test_two_tap_delays_and_gains(self):
        from r4w_tpu.ops.propagation import multipath_profile

        rng = np.random.default_rng(5)
        n = 512
        tx = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
        h = np.zeros(n, np.complex64)
        h[0], h[9] = 1.0, 0.5j
        rx = np.fft.ifft(np.fft.fft(tx) * np.fft.fft(h)
                         ).astype(np.complex64)
        delays, gains, valid = multipath_profile(tx, rx, n_paths=2)
        d = {int(dd): gg for dd, gg, v in
             zip(np.asarray(delays), np.asarray(gains),
                 np.asarray(valid)) if v}
        assert set(d) == {0, 9}
        assert abs(d[0] - 1.0) < 0.02
        assert abs(d[9] - 0.5j) < 0.02


# -------------------------------------------------------------- DPD


class TestDpd:
    def test_predistortion_suppresses_cubic_distortion(self):
        """Memoryless PA y = x·(1 − 0.2|x|²): indirect-learning DPD
        must cut the distortion power (vs best linear fit) by ≥15 dB."""
        from r4w_tpu.ops.infra_fills import dpd_apply, dpd_learn_polynomial

        rng = np.random.default_rng(6)
        n = 4096
        # 0.3 RMS keeps |x| inside the PA's invertible region (gain
        # 1−0.2|x|² stays positive); past ~0.4 RMS the post-inverse
        # polynomial extrapolates into saturation and diverges
        x = 0.3 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                   ).astype(np.complex64) / np.sqrt(2.0)

        def pa(z):
            return z * (1.0 - 0.2 * np.abs(z) ** 2)

        def dist_power(out, ref):
            g = np.vdot(ref, out) / np.vdot(ref, ref)
            return np.mean(np.abs(out - g * ref) ** 2)

        base = dist_power(pa(x), x)
        coef, _ = dpd_learn_polynomial(jnp.asarray(x),
                                       jnp.asarray(pa(x)), order=7)
        lin = pa(np.asarray(dpd_apply(jnp.asarray(x), coef)))
        improved = dist_power(lin, x)
        assert 10 * np.log10(base / improved) > 15.0


# ---------------------------------------------------- burst shaping


class TestBurstShape:
    def test_exact_raised_cosine_envelope(self):
        from r4w_tpu.ops.stream_math import burst_shape

        n, ramp = 100, 16
        x = np.ones(n, np.float32)
        y = np.asarray(burst_shape(jnp.asarray(x), ramp=ramp))
        t = np.arange(ramp) / ramp
        up = 0.5 * (1 - np.cos(np.pi * t))
        assert np.allclose(y[:ramp], up, atol=1e-5)
        assert np.allclose(y[ramp:n - ramp], 1.0, atol=1e-6)
        assert np.allclose(y[n - ramp:], up[::-1], atol=1e-5)
        assert y[0] == 0.0  # keying starts from zero


class TestRegenerateBb:
    def test_clean_pulses_with_retrigger_holdoff(self):
        from r4w_tpu.ops.mapping import regenerate_bb

        n, period, width = 64, 8, 3
        trig = np.zeros(n, bool)
        trig[[10, 13, 30]] = True  # 13 is inside 10's holdoff
        out = np.asarray(regenerate_bb(jnp.asarray(trig), period,
                                       width, n))
        want = np.zeros(n, np.int32)
        want[10:13] = 1
        want[30:33] = 1
        assert np.array_equal(out, want)


# ------------------------------------------------------- instruments


class TestNetworkAnalyzerS21:
    def test_matches_filter_frequency_response(self):
        from r4w_tpu.ops.instruments import network_analyzer_s21

        rng = np.random.default_rng(7)
        n = 1024
        stim = (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
        h = np.zeros(n, np.complex64)
        h[:4] = [1.0, 0.5, -0.25, 0.1]
        resp = np.fft.ifft(np.fft.fft(stim) * np.fft.fft(h)
                           ).astype(np.complex64)
        mag_db, phase = network_analyzer_s21(jnp.asarray(stim),
                                             jnp.asarray(resp))
        want = np.fft.fft(h)
        assert np.max(np.abs(np.asarray(mag_db)
                             - 20 * np.log10(np.abs(want)))) < 0.05
        dphi = np.angle(np.exp(1j * (np.asarray(phase)
                                     - np.angle(want))))
        assert np.max(np.abs(dphi)) < 0.01


class TestOscilloscopeTrigger:
    def test_crossing_indices_and_alignment(self):
        from r4w_tpu.ops.instruments import oscilloscope_trigger

        fs_per_cycle = 100
        t = np.arange(500)
        x = np.sin(2 * np.pi * t / fs_per_cycle).astype(np.float32)
        # level 0.5 crosses between samples 8 (0.482) and 9 (0.536) of
        # each cycle; the trigger index is the LAST sample below level
        idx, frames, valid = oscilloscope_trigger(
            x, level=0.5, slope="rising", holdoff=50, pre=8, length=32)
        v = np.asarray(valid)
        assert list(np.asarray(idx)[v]) == [8, 108, 208, 308, 408]
        frames = np.asarray(frames)[v]
        assert np.all(frames[:, 8] < 0.5)
        assert np.all(frames[:, 9] >= 0.5)


# ------------------------------------------------------------- masks


class TestSpectralMask:
    def test_piecewise_linear_interpolation(self):
        from r4w_tpu.ops.cognitive import spectral_mask

        pts = [(0.0, 0.0), (10e3, -20.0), (100e3, -40.0)]
        got = np.asarray(spectral_mask(
            jnp.asarray([0.0, 5e3, 10e3, 55e3, -55e3, 200e3]), pts))
        want = np.array([0.0, -10.0, -20.0, -30.0, -30.0, -40.0])
        assert np.allclose(got, want, atol=1e-3)


# --------------------------------------------------------- util math


class TestUtilityMath:
    def test_magnitude_squared_nlog10_max_map(self):
        from r4w_tpu.ops.mapping import map_bb
        from r4w_tpu.ops.stream_blocks import (magnitude_squared,
                                               max_block, nlog10)

        rng = np.random.default_rng(8)
        z = (rng.standard_normal(40)
             + 1j * rng.standard_normal(40)).astype(np.complex64)
        assert np.allclose(np.asarray(magnitude_squared(z)),
                           np.abs(z) ** 2, atol=1e-5)
        p = np.abs(z) ** 2
        assert np.allclose(np.asarray(nlog10(jnp.asarray(p), n=10.0,
                                             k=3.0)),
                           10.0 * np.log10(p) + 3.0, atol=1e-3)
        a = rng.standard_normal(30).astype(np.float32)
        b = rng.standard_normal(30).astype(np.float32)
        c = rng.standard_normal(30).astype(np.float32)
        assert np.array_equal(np.asarray(max_block(a, b, c)),
                              np.maximum(np.maximum(a, b), c))
        table = np.arange(255, -1, -1)
        by = rng.integers(0, 256, 64)
        assert np.array_equal(np.asarray(map_bb(by, table)), 255 - by)
