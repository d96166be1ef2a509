"""Round-4 KA batch M: exact-math truths for the FFT-convolution,
interpolation, compressive-sensing, control, quantization and
utility-math tails — every assertion is against numpy/scipy or a
closed-form law, never the implementation under test.

Reference roles: overlap_save.rs, overlap_add.rs,
lagrange_polynomial_interpolator.rs, mmse_interpolator.rs,
phase_unwrap.rs, compressive_sensing.rs, matrix_eigenvalue.rs,
instantaneous_frequency_estimator.rs, peak_to_average.rs,
noise_blanker.rs, noise_gate.rs, moving_avg_decim.rs,
pid_controller.rs, noise_shaping_quantizer.rs, phase_vocoder.rs,
hyperspectral_spectral_unmixing.rs, multiply_matrix.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------------ FFT convolution


class TestOverlapMethods:
    def test_overlap_save_equals_causal_fir(self):
        """Overlap-save must equal direct causal FIR filtering
        (scipy.signal.lfilter semantics = np.convolve truncated)."""
        from r4w_tpu.ops.filters2 import overlap_save

        rng = np.random.default_rng(1)
        x = rng.standard_normal(3000).astype(np.float32)
        h = rng.standard_normal(47).astype(np.float32)
        got = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h)))
        want = np.convolve(x, h)[: x.shape[0]]
        assert np.max(np.abs(got - want)) < 1e-3

    def test_overlap_save_complex(self):
        from r4w_tpu.ops.filters2 import overlap_save

        rng = np.random.default_rng(2)
        x = (rng.standard_normal(2048)
             + 1j * rng.standard_normal(2048)).astype(np.complex64)
        h = (rng.standard_normal(33)
             + 1j * rng.standard_normal(33)).astype(np.complex64)
        got = np.asarray(overlap_save(jnp.asarray(x), jnp.asarray(h)))
        want = np.convolve(x, h)[: x.shape[0]]
        assert np.max(np.abs(got - want)) < 2e-3

    def test_overlap_add_equals_full_convolution(self):
        from r4w_tpu.ops.filters2 import overlap_add

        rng = np.random.default_rng(3)
        x = rng.standard_normal(2500).astype(np.float32)
        h = rng.standard_normal(65).astype(np.float32)
        got = np.asarray(overlap_add(jnp.asarray(x), jnp.asarray(h),
                                     block=512))
        want = np.convolve(x, h)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-3


# ------------------------------------------------- interpolators


class TestLagrangeInterpolator:
    def test_cubic_reproduces_cubic_polynomials_exactly(self):
        """Order-3 Lagrange interpolation is EXACT on polynomials of
        degree ≤ 3: filtering samples of p(t) = t³−2t²+3t−1 with the
        fractional-delay taps must return p(n − d) exactly, where
        d = mu + 1 is the taps' total delay."""
        from r4w_tpu.ops.filters2 import (lagrange_interpolate,
                                          lagrange_interpolator_taps)

        def p(t):
            return t ** 3 - 2.0 * t ** 2 + 3.0 * t - 1.0

        n = np.arange(32, dtype=np.float64)
        x = p(n)
        mu = 0.37
        d = mu + 1  # (order-1)//2 = 1 for cubic
        y = np.asarray(lagrange_interpolate(
            jnp.asarray(x, jnp.float32), mu, order=3), np.float64)
        interior = np.arange(4, 32)
        want = p(interior - d)
        assert np.max(np.abs(y[interior] - want)
                      / np.maximum(np.abs(want), 1.0)) < 2e-3
        # moment laws: Σh = 1 (constants), Σ i·h = d (linear ramp)
        taps = np.asarray(lagrange_interpolator_taps(3, mu), np.float64)
        assert np.sum(taps) == pytest.approx(1.0, abs=1e-6)
        assert np.sum(np.arange(4) * taps) == pytest.approx(d, abs=1e-5)

    def test_mmse_taps_dc_and_delay(self):
        """MMSE fractional taps: unit DC gain by construction, and a
        low-frequency tone comes out delayed by center + mu samples
        (measured from its phase)."""
        from r4w_tpu.ops.filters2 import (mmse_interpolate,
                                          mmse_interpolator_taps)

        mu = 0.25
        taps = np.asarray(mmse_interpolator_taps(mu, n_taps=8))
        assert np.sum(taps) == pytest.approx(1.0, abs=1e-6)
        f, n = 0.01, 4096
        t = np.arange(n)
        x = np.cos(2 * np.pi * f * t).astype(np.float32)
        y = np.asarray(mmse_interpolate(jnp.asarray(x), mu), np.float64)
        seg = slice(64, n - 64)
        ref = np.exp(-2j * np.pi * f * t[seg])
        ph = np.angle(np.mean(y[seg] * ref) / np.mean(x[seg] * ref))
        delay = -ph / (2 * np.pi * f)
        # windowed-sinc truncation biases the measured group delay by
        # ~0.02 samples; the first moment of the taps is exact
        assert delay == pytest.approx(3.5 + mu, abs=0.05)
        com = np.sum(np.arange(8) * np.asarray(taps, np.float64))
        assert com == pytest.approx(3.5 + mu, abs=1e-5)


# ------------------------------------------------------ phase utils


class TestPhaseUnwrap:
    def test_matches_numpy_unwrap(self):
        from r4w_tpu.ops.stream_blocks import phase_unwrap, phase_wrap

        rng = np.random.default_rng(4)
        truth = np.cumsum(rng.uniform(-0.8, 2.2, 300)).astype(np.float32)
        wrapped = np.angle(np.exp(1j * truth))
        got = np.asarray(phase_unwrap(jnp.asarray(wrapped)))
        want = np.unwrap(wrapped)
        assert np.max(np.abs(got - want)) < 1e-3
        # wrap(unwrap(x)) returns the original wrapped angles
        rewrap = np.asarray(phase_wrap(jnp.asarray(got)))
        assert np.max(np.abs(np.angle(np.exp(1j * (rewrap - wrapped)))
                             )) < 1e-4


class TestInstantaneousFrequency:
    def test_linear_chirp_law(self):
        """IF of exp(j2π(f0·t + k·t²/2)) is f0 + k·t; the backward
        phase difference lands midway between samples."""
        from r4w_tpu.ops.filters2 import instantaneous_frequency

        fs, n = 1000.0, 2000
        f0, k = 50.0, 100.0  # 100 Hz/s sweep
        t = np.arange(n) / fs
        x = np.exp(2j * np.pi * (f0 * t + 0.5 * k * t ** 2)
                   ).astype(np.complex64)
        f = np.asarray(instantaneous_frequency(jnp.asarray(x), fs))
        want = f0 + k * (t - 0.5 / fs)
        assert np.max(np.abs(f[1:] - want[1:])) < 0.05


# ------------------------------------------------ compressive sensing


class TestOmp:
    def test_exact_sparse_recovery(self):
        """OMP recovers a 4-sparse vector from 32 Gaussian
        measurements of dimension 64 exactly (support and values)."""
        from r4w_tpu.ops.applied import omp

        rng = np.random.default_rng(5)
        m, n, k = 32, 64, 4
        a = rng.standard_normal((m, n)).astype(np.float32)
        a /= np.linalg.norm(a, axis=0, keepdims=True)
        support = np.sort(rng.choice(n, k, replace=False))
        x = np.zeros(n, np.float32)
        x[support] = np.array([2.0, -1.5, 1.0, 3.0], np.float32)
        y = a @ x
        coef, sup = omp(a, jnp.asarray(y), sparsity=k)
        assert np.array_equal(np.sort(np.asarray(sup)), support)
        assert np.max(np.abs(np.asarray(coef) - x)) < 1e-3


# --------------------------------------------------------- matrices


class TestMatrixEigenvalue:
    def test_hermitian_matches_numpy(self):
        from r4w_tpu.ops.stream_blocks import matrix_eigenvalue

        rng = np.random.default_rng(6)
        b = rng.standard_normal((6, 6)).astype(np.float32)
        a = (b + b.T) / 2
        lam, v = matrix_eigenvalue(jnp.asarray(a), hermitian=True)
        want = np.max(np.linalg.eigvalsh(a))
        assert float(lam) == pytest.approx(want, rel=1e-4)
        # eigen-residual ‖Av − λv‖ ≈ 0
        r = a @ np.asarray(v) - float(lam) * np.asarray(v)
        assert np.linalg.norm(r) < 1e-3

    def test_power_iteration_general(self):
        from r4w_tpu.ops.stream_blocks import matrix_eigenvalue

        rng = np.random.default_rng(7)
        # entrywise-positive matrix: Perron-Frobenius guarantees the
        # dominant eigenvalue is real, simple and positive — the
        # regime where real power iteration provably converges
        a = (rng.random((5, 5)) + 0.1).astype(np.float32)
        lam, _ = matrix_eigenvalue(jnp.asarray(a), hermitian=False)
        ev = np.linalg.eigvals(a)
        want = ev[np.argmax(np.abs(ev))]
        assert abs(np.imag(want)) < 1e-6
        assert complex(lam) == pytest.approx(complex(want), rel=1e-3)


class TestMultiplyMatrix:
    def test_exact_vs_numpy(self):
        from r4w_tpu.ops.stream_blocks import multiply_matrix

        rng = np.random.default_rng(8)
        x = rng.standard_normal((10, 4)).astype(np.float32)
        a = rng.standard_normal((3, 4)).astype(np.float32)
        got = np.asarray(multiply_matrix(jnp.asarray(x), jnp.asarray(a)))
        assert np.allclose(got, x @ a.T, atol=1e-5)


# ----------------------------------------------------- noise / gating


class TestNoiseBlanker:
    def test_impulse_zeroed_signal_untouched(self):
        from r4w_tpu.ops.filters2 import noise_blanker

        x = np.ones(1000, np.float32)
        x[500] = 100.0
        y = np.asarray(noise_blanker(jnp.asarray(x),
                                     threshold_sigma=4.0))
        assert y[500] == 0.0
        mask = np.ones(1000, bool)
        mask[500] = False
        assert np.array_equal(y[mask], x[mask])


class TestNoiseGate:
    def test_gate_opens_closes_and_has_hysteresis(self):
        from r4w_tpu.ops.filters2 import noise_gate

        open_db = -20.0  # close defaults to -26 dB
        loud = 10.0 ** (-10.0 / 20.0)
        mid = 10.0 ** (-23.0 / 20.0)   # between close and open
        quiet = 10.0 ** (-40.0 / 20.0)
        # loud burst passes, deep silence is gated
        x = np.concatenate([np.full(300, loud),
                            np.full(300, quiet)]).astype(np.float32)
        y = np.asarray(noise_gate(jnp.asarray(x), open_db))
        assert y[250] == pytest.approx(loud, rel=1e-3)
        assert abs(y[-1]) < 0.1 * quiet
        # hysteresis: a mid-level hold keeps whatever state preceded it
        a = np.concatenate([np.full(300, loud),
                            np.full(300, mid)]).astype(np.float32)
        ya = np.asarray(noise_gate(jnp.asarray(a), open_db))
        assert ya[-1] == pytest.approx(mid, rel=1e-2)  # stayed open
        b = np.full(300, mid, np.float32)
        yb = np.asarray(noise_gate(jnp.asarray(b), open_db))
        assert abs(yb[-1]) < 1e-3  # never opened


class TestMovingAvgDecim:
    def test_exact_vs_numpy(self):
        from r4w_tpu.ops.stream_blocks import moving_avg_decim

        rng = np.random.default_rng(9)
        x = rng.standard_normal(257).astype(np.float32)
        got = np.asarray(moving_avg_decim(jnp.asarray(x), length=8,
                                          decim=4, scale=2.0))
        kern = np.full(8, 2.0 / 8, np.float32)
        want = np.convolve(x, kern, mode="full")[:257][::4]
        assert np.allclose(got, want, atol=1e-5)


# ----------------------------------------------------- control loops


class TestPidController:
    def test_unit_step_closed_form(self):
        """For a unit-step error, u[n] = kp + ki·(n+1) + kd·δ[n]
        exactly — the discrete PID law with the derivative firing
        once on the step edge."""
        from r4w_tpu.ops.sync2 import pid_controller

        kp, ki, kd = 1.5, 0.2, 0.7
        e = np.ones(20, np.float32)
        u, (integ, prev) = pid_controller(jnp.asarray(e), kp, ki, kd)
        u = np.asarray(u)
        n = np.arange(20)
        want = kp + ki * (n + 1) + kd * (n == 0)
        assert np.allclose(u, want, atol=1e-5)
        assert float(integ) == pytest.approx(20.0)
        assert float(prev) == pytest.approx(1.0)


# ------------------------------------------------------ quantization


class TestNoiseShapingQuantizer:
    def test_dc_average_and_spectral_tilt(self):
        """First-order error-feedback (sigma-delta) quantization of a
        DC input: the time-average equals the input exactly (the
        feedback loop integrates the error to zero), and the error
        spectrum is high-pass — low-band error power ≪ high-band."""
        from r4w_tpu.ops.filters2 import noise_shaping_quantize

        n_bits = 4  # q = 0.125; 0.3 is NOT representable
        x = np.full(4096, 0.3, np.float32)
        y = np.asarray(noise_shaping_quantize(jnp.asarray(x), n_bits))
        assert float(np.mean(y)) == pytest.approx(0.3, abs=1e-3)
        assert np.max(np.abs(y - x)) <= 0.125 + 1e-6
        err = y - x
        spec = np.abs(np.fft.rfft(err)) ** 2
        n4 = len(spec) // 4
        assert np.sum(spec[1:n4]) < 0.05 * np.sum(spec[-n4:])


# ---------------------------------------------------- phase vocoder


class TestPhaseVocoder:
    @pytest.mark.slow
    def test_time_stretch_preserves_pitch(self):
        """rate = 0.5 (2× slower): output is ~2× longer but the tone
        frequency is unchanged — the defining vocoder property."""
        from r4w_tpu.ops.audio import phase_vocoder

        fs, f0 = 16000.0, 440.0
        n = 16384
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(phase_vocoder(jnp.asarray(x), rate=0.5))
        assert y.shape[0] > 1.7 * n
        seg = y[4096: 4096 + 8192] * np.hanning(8192)
        spec = np.abs(np.fft.rfft(seg))
        f_peak = np.argmax(spec) * fs / 8192
        assert f_peak == pytest.approx(f0, abs=4.0)


# ------------------------------------------------------ hyperspectral


class TestHyperspectralUnmix:
    def test_noiseless_abundances_recovered(self):
        from r4w_tpu.ops.sensing import hyperspectral_unmix

        rng = np.random.default_rng(10)
        k, bands, pix = 3, 16, 40
        e = rng.random((k, bands)).astype(np.float32) + 0.1
        a_true = rng.random((pix, k)).astype(np.float32)
        cube = a_true @ e
        a_hat = np.asarray(hyperspectral_unmix(jnp.asarray(cube),
                                               jnp.asarray(e),
                                               n_iter=600))
        assert np.max(np.abs(a_hat - a_true)) < 2e-2


# ----------------------------------------------------------- PAPR


class TestPeakToAverage:
    def test_known_vectors(self):
        """Constant envelope → 0 dB; a lone peak among zeros of a
        length-N vector → 10·log10(N) exactly."""
        from r4w_tpu.ops.mapping import peak_to_average

        const = np.exp(1j * np.linspace(0, 5, 64)).astype(np.complex64)
        assert float(peak_to_average(jnp.asarray(const))) \
            == pytest.approx(0.0, abs=1e-3)
        spike = np.zeros(128, np.complex64)
        spike[17] = 3.0
        assert float(peak_to_average(jnp.asarray(spike))) \
            == pytest.approx(10 * np.log10(128.0), abs=1e-3)
