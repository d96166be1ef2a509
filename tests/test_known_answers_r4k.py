"""Round-4 KA batch K: cepstral, cyclostationary, higher-order-
statistics and change-detection truths — each block checked against an
independent analytic law (echo-cepstrum series, CAF Fourier
coefficients, PLV phase-jitter law, CUSUM delay law, HOSVD
all-orthogonality, Tucker exact reconstruction), not against the
implementation itself.

Reference roles: cepstral_analysis.rs, cyclic_autocorrelation.rs,
spectral_correlation_analyzer.rs, entropy_calculator.rs,
power_law_spectrum_estimator.rs, phase_coherence_analyzer.rs,
expectation_maximization.rs, matrix_completion_nuclear.rs,
tensor_hosvd.rs, subspace_tracker.rs,
time_series_changepoint_detector.rs, time_frequency_reassignment.rs,
modal_analysis_prony_extended.rs, empirical_mode.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------------------ cepstrum


class TestEchoCepstrumSeries:
    """Truth: for x = δ[n] + a·δ[n−D] (|a|<1) the real cepstrum is the
    EXACT known series  c[kD] = (−1)^{k+1} a^k / (2k)  (k ≥ 1), from
    log|1 + a e^{−jωD}| = Σ (−1)^{k+1} (a^k/k) cos(kωD) and
    IFFT{cos(kωD)} = ½ at quefrency ±kD."""

    def test_echo_quefrency_amplitudes(self):
        from r4w_tpu.ops.applied import real_cepstrum

        n, d, a = 512, 32, 0.5
        x = np.zeros(n, np.float32)
        x[0] = 1.0
        x[d] = a
        c = np.asarray(real_cepstrum(jnp.asarray(x)))
        assert c[d] == pytest.approx(a / 2.0, rel=1e-4)
        assert c[2 * d] == pytest.approx(-(a ** 2) / 4.0, rel=1e-3)
        assert c[3 * d] == pytest.approx((a ** 3) / 6.0, rel=1e-2)
        # nothing at non-multiple quefrencies
        q = np.arange(1, n // 2)
        off = q[q % d != 0]
        assert np.max(np.abs(c[off])) < 1e-3

    def test_missing_fundamental_pitch(self):
        """Cepstral pitch hears the MISSING fundamental: harmonics at
        2f0..5f0 only (no f0 energy) still yield quefrency 1/f0."""
        from r4w_tpu.ops.applied import cepstral_pitch

        fs, f0 = 8000.0, 125.0  # period = 64 samples exactly
        t = np.arange(4096) / fs
        x = sum(np.cos(2 * np.pi * k * f0 * t) for k in (2, 3, 4, 5))
        # fmin=100 keeps the search inside one period (the cepstrum
        # also has rahmonics at 2/f0, 3/f0 — octave ambiguity is
        # inherent to cepstral pitch, not a defect)
        got = float(cepstral_pitch(jnp.asarray(x, jnp.float32), fs,
                                   fmin=100.0))
        assert got == pytest.approx(f0, rel=0.02)


# ----------------------------------------- cyclic autocorrelation


class TestCyclicAutocorrelation:
    """Truths from the defining Fourier-coefficient form
    R_α(τ) = ⟨x(t+τ)x*(t) e^{−j2παt}⟩."""

    def test_pure_tone_is_not_cyclostationary(self):
        """x = e^{j2πf t} with DFT-exact f: x(t+τ)x*(t) = e^{j2πfτ}
        is CONSTANT in t, so R_α(τ) = e^{j2πfτ}·δ[α] exactly when the
        α grid sits on DFT frequencies k/N."""
        from r4w_tpu.ops.spectral2 import cyclic_autocorrelation

        n, k0 = 1024, 37
        t = np.arange(n)
        x = np.exp(2j * np.pi * k0 * t / n).astype(np.complex64)
        alphas = np.array([0.0, 1 / n * 3, 1 / n * 64, 0.25])
        caf = np.asarray(cyclic_autocorrelation(
            jnp.asarray(x), alphas, max_lag=8))  # (n_alpha, 17)
        assert np.allclose(np.abs(caf[0]), 1.0, atol=1e-3)
        # phase law at α=0: R_0(τ) = e^{j2π k0 τ / n}
        lags = np.arange(-8, 9)
        expect = np.exp(2j * np.pi * k0 * lags / n)
        assert np.max(np.abs(caf[0] - expect)) < 5e-3
        assert np.max(np.abs(caf[1:])) < 1e-3

    def test_am_cycle_feature_amplitude(self):
        """|x(t)|² = 1 + cos(2πt/P) ⇒ R_{1/P}(0) = ½ exactly (the
        Fourier coefficient of the envelope), R_α(0) = 0 at other
        DFT-exact nonzero α."""
        from r4w_tpu.ops.spectral2 import cyclic_autocorrelation

        n, p = 1024, 16
        t = np.arange(n)
        env = 1.0 + np.cos(2 * np.pi * t / p)
        x = np.sqrt(env).astype(np.complex64)
        alphas = np.array([1.0 / p, 2.0 / p, 3.0 / n, 7.0 / n])
        caf = np.asarray(cyclic_autocorrelation(
            jnp.asarray(x), alphas, max_lag=4))
        mid = 4  # τ = 0 column
        assert abs(caf[0, mid]) == pytest.approx(0.5, abs=5e-3)
        assert abs(caf[1, mid]) < 5e-3
        assert abs(caf[2, mid]) < 5e-3
        assert abs(caf[3, mid]) < 5e-3


class TestSpectralCorrelation:
    """Truth: the SCD feature lives at the frequency SEPARATION of
    spectral lines. Two tones at DFT bins k1 < k2 produce a frame
    product X(f)X*(f+α) that is large only at (α = 0) and at
    (α = k2−k1, f = k1)."""

    def test_two_tone_separation_feature(self):
        from r4w_tpu.ops.spectral2 import spectral_correlation

        n_fft, k1, k2 = 256, 10, 30
        n = 16 * n_fft
        t = np.arange(n)
        x = (np.exp(2j * np.pi * k1 * t / n_fft)
             + np.exp(2j * np.pi * k2 * t / n_fft)).astype(np.complex64)
        scd = np.asarray(spectral_correlation(
            jnp.asarray(x), n_fft=n_fft, n_alpha=64))  # (64, 256)
        sep = k2 - k1
        # the α = sep row peaks at f = k1
        assert int(np.argmax(scd[sep])) == k1
        # and dominates every α row away from 0 and sep (the Hann
        # window leaks each line over ±2 bins, so adjacent-α rows
        # carry legitimate self-product energy)
        far = np.array([a for a in range(3, 64) if abs(a - sep) > 2])
        assert scd[sep, k1] > 100.0 * np.max(scd[far])


# ----------------------------------------------- spectral statistics


class TestSpectralEntropy:
    def test_tone_entropy_zero_noise_entropy_one(self):
        """Normalized spectral entropy: a DFT-exact tone puts ALL
        energy in one bin → H = 0; white Gaussian noise spreads it
        uniformly in expectation → H → 1."""
        from r4w_tpu.ops.spectral2 import spectral_entropy

        n_fft, n = 256, 4096
        t = np.arange(n)
        tone = np.exp(2j * np.pi * 8 * t / n_fft).astype(np.complex64)
        h_tone = float(spectral_entropy(jnp.asarray(tone), n_fft))
        rng = np.random.default_rng(7)
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)).astype(np.complex64)
        h_noise = float(spectral_entropy(jnp.asarray(noise), n_fft))
        assert h_tone < 0.02
        assert h_noise > 0.93

    def test_two_equal_tones_entropy(self):
        """Two equal tones: p = (½, ½) ⇒ H = ln2 / ln(n_fft) exactly."""
        from r4w_tpu.ops.spectral2 import spectral_entropy

        n_fft, n = 256, 2048
        t = np.arange(n)
        x = (np.exp(2j * np.pi * 8 * t / n_fft)
             + np.exp(2j * np.pi * 40 * t / n_fft)).astype(np.complex64)
        h = float(spectral_entropy(jnp.asarray(x), n_fft))
        assert h == pytest.approx(np.log(2) / np.log(n_fft), abs=5e-3)


class TestPowerLawFit:
    def test_recovers_synthesized_exponent(self):
        """Shape white noise to S(f) ∝ f^{−β} in the frequency domain
        (known β), fit must recover β."""
        from r4w_tpu.ops.spectral2 import power_law_fit

        beta = 2.0
        n = 1 << 16
        rng = np.random.default_rng(3)
        f = np.fft.rfftfreq(n, 1.0)
        mag = np.zeros_like(f)
        mag[1:] = f[1:] ** (-beta / 2.0)
        phases = np.exp(2j * np.pi * rng.random(f.shape))
        x = np.fft.irfft(mag * phases, n).astype(np.float32)
        b, _ = power_law_fit(jnp.asarray(x), 1.0, n_fft=1024)
        assert float(b) == pytest.approx(beta, abs=0.25)


class TestPhaseLockingValue:
    def test_constant_offset_is_unity(self):
        from r4w_tpu.ops.spectral2 import phase_locking_value

        rng = np.random.default_rng(11)
        ph = rng.uniform(-np.pi, np.pi, 2048)
        a = np.exp(1j * ph).astype(np.complex64)
        b = (a * np.exp(1j * 0.7)).astype(np.complex64)
        assert float(phase_locking_value(a, b)) == pytest.approx(
            1.0, abs=1e-4)

    def test_gaussian_jitter_law(self):
        """Gaussian phase jitter σ: PLV = E[e^{jΔφ}] = e^{−σ²/2}
        (Gaussian characteristic function)."""
        from r4w_tpu.ops.spectral2 import phase_locking_value

        rng = np.random.default_rng(12)
        n, sigma = 1 << 16, 0.5
        ph = rng.uniform(-np.pi, np.pi, n)
        a = np.exp(1j * ph).astype(np.complex64)
        b = np.exp(1j * (ph + sigma * rng.standard_normal(n))
                   ).astype(np.complex64)
        got = float(phase_locking_value(a, b))
        assert got == pytest.approx(np.exp(-sigma ** 2 / 2), abs=0.01)

    def test_independent_phases_vanish(self):
        from r4w_tpu.ops.spectral2 import phase_locking_value

        rng = np.random.default_rng(13)
        n = 1 << 14
        a = np.exp(1j * rng.uniform(-np.pi, np.pi, n)).astype(np.complex64)
        b = np.exp(1j * rng.uniform(-np.pi, np.pi, n)).astype(np.complex64)
        assert float(phase_locking_value(a, b)) < 4.0 / np.sqrt(n)


# ---------------------------------------------------- EM / completion


class TestEmGmm1d:
    def test_two_separated_gaussians(self):
        from r4w_tpu.ops.spectral2 import em_gmm_1d

        rng = np.random.default_rng(21)
        n = 4000
        w_true = 0.3
        comp = rng.random(n) < w_true
        x = np.where(comp, rng.normal(-3.0, 0.5, n),
                     rng.normal(3.0, 0.5, n)).astype(np.float32)
        mu, sig, w = (np.asarray(v) for v in em_gmm_1d(
            jnp.asarray(x), k=2, n_iter=60))
        assert mu[0] == pytest.approx(-3.0, abs=0.1)
        assert mu[1] == pytest.approx(3.0, abs=0.1)
        assert sig[0] == pytest.approx(0.5, abs=0.1)
        assert w[0] == pytest.approx(w_true, abs=0.04)
        assert np.sum(w) == pytest.approx(1.0, abs=1e-3)


class TestMatrixCompletion:
    def test_rank1_missing_entries_recovered(self):
        from r4w_tpu.ops.spectral2 import matrix_complete_svt

        rng = np.random.default_rng(31)
        u = rng.standard_normal(24)
        v = rng.standard_normal(18)
        truth = np.outer(u, v).astype(np.float32)
        mask = (rng.random(truth.shape) < 0.6).astype(np.float32)
        got = np.asarray(matrix_complete_svt(
            truth * mask, mask, rank=1, n_iter=200))
        missing = mask == 0
        err = (np.linalg.norm((got - truth)[missing])
               / np.linalg.norm(truth[missing]))
        assert err < 0.1


class TestHosvd:
    def test_tucker_exact_reconstruction_and_all_orthogonality(self):
        """Full-rank HOSVD reconstructs EXACTLY (Tucker with full
        factor ranks), factors are orthonormal, and the core satisfies
        De Lathauwer's all-orthogonality: distinct slices along every
        mode are mutually orthogonal."""
        from r4w_tpu.ops.spectral2 import hosvd

        rng = np.random.default_rng(41)
        t = rng.standard_normal((4, 5, 6)).astype(np.float32)
        core, factors = hosvd(jnp.asarray(t))
        core = np.asarray(core)
        factors = [np.asarray(f) for f in factors]
        for f in factors:
            assert np.allclose(f.T @ f, np.eye(f.shape[1]), atol=1e-4)
        rec = core
        for mode, u in enumerate(factors):
            rec = np.moveaxis(
                np.tensordot(u, np.moveaxis(rec, mode, 0), axes=1),
                0, mode)
        assert np.allclose(rec, t, atol=1e-3)
        for mode in range(3):
            unf = np.moveaxis(core, mode, 0).reshape(core.shape[mode], -1)
            gram = unf @ unf.T
            off = gram - np.diag(np.diag(gram))
            assert np.max(np.abs(off)) < 1e-2 * np.max(np.diag(gram))


class TestPastSubspace:
    def test_rank1_stream_converges_to_signal_direction(self):
        from r4w_tpu.ops.spectral2 import past_subspace_track

        rng = np.random.default_rng(51)
        n_dim, n, t_len = 1, 8, 400
        v = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        v = (v / np.linalg.norm(v)).astype(np.complex64)
        s = (rng.standard_normal(t_len)
             + 1j * rng.standard_normal(t_len)).astype(np.complex64)
        noise = 0.02 * (rng.standard_normal((t_len, n))
                        + 1j * rng.standard_normal((t_len, n)))
        x = s[:, None] * v[None, :] + noise.astype(np.complex64)
        q, _ = past_subspace_track(jnp.asarray(x), n_dim=n_dim)
        q = np.asarray(q)[:, 0]
        align = abs(np.vdot(q, v)) / (np.linalg.norm(q))
        assert align > 0.97


# ------------------------------------------------- change detection


class TestCusumDelayLaw:
    def test_detection_delay_matches_page_bound(self):
        """Page's CUSUM with drift k and threshold h: after a mean
        shift of δσ the statistic grows ~(δ−k) per sample, so the
        detection delay ≈ h/(δ−k). δ=2, k=0.5, h=8 ⇒ ≈ 5.3 samples."""
        from r4w_tpu.ops.detect import cusum_changepoint

        rng = np.random.default_rng(61)
        n, k_change = 600, 400
        x = rng.standard_normal(n).astype(np.float32)
        x[k_change:] += 2.0
        alarm, gp, _ = cusum_changepoint(jnp.asarray(x), drift=0.5,
                                         threshold=8.0)
        alarm = int(alarm)
        delay = alarm - k_change
        assert 0 < delay < 25  # 5.3 expected; generous noise allowance
        # pre-change false-alarm check: gp stays under threshold
        assert float(jnp.max(gp[:k_change])) < 8.0

    def test_negative_shift_triggers_minus_side(self):
        from r4w_tpu.ops.detect import cusum_changepoint

        rng = np.random.default_rng(62)
        n, k_change = 600, 300
        x = rng.standard_normal(n).astype(np.float32)
        x[k_change:] -= 2.0
        alarm, gp, gm = cusum_changepoint(jnp.asarray(x), drift=0.5,
                                          threshold=8.0)
        alarm = int(alarm)
        assert 0 < alarm - k_change < 25
        assert float(gm[alarm]) > 8.0 >= float(gp[alarm])


# --------------------------------------------------- reassignment/EMD


class TestReassignedSpectrogram:
    def test_tone_energy_concentrates_to_one_bin(self):
        """Reassignment must undo the Hann-window leakage of a
        DFT-exact tone: ≥90% of the energy lands in the true bin,
        versus <80% for the plain windowed spectrogram."""
        from r4w_tpu.ops.spectral2 import reassigned_spectrogram

        n_fft, hop, k0 = 256, 64, 19
        n = 4096
        t = np.arange(n)
        x = np.exp(2j * np.pi * k0 * t / n_fft).astype(np.complex64)
        ra = np.asarray(reassigned_spectrogram(
            jnp.asarray(x), 1.0, n_fft=n_fft, hop=hop))
        conc = np.sum(ra[:, k0]) / np.sum(ra)
        # plain windowed reference concentration (numpy, independent)
        n_frames = (n - n_fft) // hop + 1
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)
        plain = np.abs(np.fft.fft(x[idx] * np.hanning(n_fft),
                                  axis=-1)) ** 2
        conc_plain = np.sum(plain[:, k0]) / np.sum(plain)
        assert conc > 0.90
        assert conc > conc_plain + 0.1


class TestEmdSeparation:
    def test_fast_tone_rides_first_imf_trend_in_residue(self):
        from r4w_tpu.ops.spectral2 import emd

        n = 1024
        t = np.arange(n) / n
        fast = np.sin(2 * np.pi * 60 * t)
        trend = 2.0 * t - 1.0
        x = (fast + trend).astype(np.float32)
        comps = np.asarray(emd(jnp.asarray(x), n_imfs=3))
        imf0, residue = comps[0], comps[-1]

        def corr(a, b):
            a = a - a.mean()
            b = b - b.mean()
            return abs(np.sum(a * b)) / (
                np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)

        assert corr(imf0, fast) > 0.9
        assert corr(residue, trend) > 0.9
        # decomposition is conservative: components sum back to x
        assert np.allclose(comps.sum(axis=0), x, atol=1e-3)


class TestModalFrequencies:
    def test_damped_mode_frequency_and_zeta(self):
        """One damped complex mode z = e^{(−ζω_n + jω_d)/f_s}:
        modal_frequencies must return (f_d, ζ) — the discrete-time
        pole's angle and normalized decay — both known exactly."""
        from r4w_tpu.ops.spectral2 import modal_frequencies

        fs, f_d, zeta = 1000.0, 80.0, 0.03
        w_d = 2 * np.pi * f_d
        w_n = w_d / np.sqrt(1 - zeta ** 2)
        sigma = -zeta * w_n
        n = np.arange(256)
        z = np.exp((sigma + 1j * w_d) / fs)
        x = (1.5 * z ** n).astype(np.complex64)
        freq, zeta_hat, amp = (np.asarray(v) for v in
                               modal_frequencies(x, fs, order=4))
        assert freq[0] == pytest.approx(f_d, rel=0.01)
        assert zeta_hat[0] == pytest.approx(zeta, rel=0.15)
        assert amp[0] == pytest.approx(1.5, rel=0.05)
