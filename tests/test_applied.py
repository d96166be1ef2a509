"""Applied-DSP block tests (catalog tail batch II)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import applied as ap


class TestDenoise:
    def test_spectral_subtraction_improves_snr(self):
        rng = np.random.default_rng(0)
        t = np.arange(16384)
        clean = np.sin(2 * np.pi * 0.03 * t).astype(np.float32)
        noise = 0.5 * rng.standard_normal(16384).astype(np.float32)
        noisy = np.concatenate([noise[:2048],
                                (clean + noise)[2048:]])
        out = np.asarray(ap.spectral_subtraction(jnp.asarray(noisy)))
        seg = slice(4096, 12288)
        snr_in = clean[seg].var() / (noisy[seg] - clean[seg]).var()
        snr_out = clean[seg].var() / (out[seg] - clean[seg]).var()
        assert snr_out > 2.0 * snr_in  # >3 dB improvement

    @pytest.mark.slow
    def test_wavelet_denoise_improves_snr(self):
        rng = np.random.default_rng(1)
        t = np.arange(4096)
        clean = np.sin(2 * np.pi * 0.005 * t).astype(np.float32)
        noisy = clean + 0.3 * rng.standard_normal(4096).astype(np.float32)
        out = np.asarray(ap.wavelet_denoise(jnp.asarray(noisy)))
        assert (out - clean).var() < 0.5 * (noisy - clean).var()


class TestSpeech:
    def test_cepstral_pitch(self):
        fs = 8000.0
        t = np.arange(4096) / fs
        f0 = 147.0
        # harmonic-rich "voiced" signal
        x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
        got = float(ap.cepstral_pitch(jnp.asarray(x, jnp.float32), fs))
        assert got == pytest.approx(f0, rel=0.03)

    def test_lpc_whitens_ar_process(self):
        """LPC on an AR(2) process must recover the AR coefficients."""
        from scipy.signal import lfilter

        rng = np.random.default_rng(2)
        e = rng.standard_normal(16384)
        a_true = [1.0, -1.2, 0.7]
        x = lfilter([1.0], a_true, e)
        a_est, gain = ap.lpc_coefficients(x, order=2)
        assert np.allclose(a_est, a_true, atol=0.03)
        assert gain == pytest.approx(1.0, abs=0.1)

    @pytest.mark.slow
    def test_lpc_vocoder_roundtrip(self):
        fs = 8000.0
        t = np.arange(2400) / fs
        x = np.sin(2 * np.pi * 200 * t) + 0.4 * np.sin(2 * np.pi * 700 * t)
        y = ap.lpc_analysis_synthesis(x.astype(np.float32))
        err = y[240:2160] - x[240:2160]
        assert err.var() < 1e-3 * x.var()  # near-exact reconstruction


class TestVibration:
    def test_bearing_fault_detection(self):
        """Amplitude-modulated resonance at the fault rate shows up in
        the envelope spectrum, invisible in the raw spectrum floor."""
        fs = 10_000.0
        t = np.arange(40_000) / fs
        fault_hz = 87.0
        carrier = np.sin(2 * np.pi * 3200.0 * t)
        am = (1.0 + 0.8 * (np.cos(2 * np.pi * fault_hz * t) > 0.95))
        rng = np.random.default_rng(3)
        vib = (am * carrier + 0.3 * rng.standard_normal(len(t))
               ).astype(np.float32)
        score_fault = ap.bearing_fault_metric(jnp.asarray(vib), fs,
                                              fault_hz)
        score_wrong = ap.bearing_fault_metric(jnp.asarray(vib), fs, 63.0)
        assert score_fault > 3.0 * score_wrong
        assert score_fault > 10.0


class TestLocalization:
    def test_trilateration_exact(self):
        anchors = np.asarray([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0],
                              [100.0, 100.0]])
        target = np.asarray([37.0, 64.0])
        ranges = np.linalg.norm(anchors - target, axis=1)
        est = ap.trilaterate(anchors, ranges)
        assert np.allclose(est, target, atol=1e-6)

    def test_trilateration_noisy(self):
        rng = np.random.default_rng(4)
        anchors = rng.uniform(0, 1000, (6, 2))
        target = np.asarray([400.0, 300.0])
        ranges = np.linalg.norm(anchors - target, axis=1) \
            + rng.normal(0, 1.0, 6)
        est = ap.trilaterate(anchors, ranges)
        assert np.linalg.norm(est - target) < 10.0


class TestSeparation:
    def test_fastica_unmixes_two_sources(self):
        rng = np.random.default_rng(5)
        n = 20_000
        s1 = np.sign(rng.standard_normal(n))          # super-gaussian-ish
        s2 = rng.uniform(-1.7, 1.7, n)                # sub-gaussian
        mix = np.asarray([[0.8, 0.6], [0.3, -0.9]]) @ np.stack([s1, s2])
        rec, _ = ap.fastica_2x2(mix)
        # each recovered source must correlate strongly with one true
        corr = np.abs(np.corrcoef(np.vstack([rec, [s1, s2]]))[:2, 2:])
        assert corr.max(axis=1).min() > 0.95
        # and they pair with DIFFERENT true sources
        assert corr.argmax(axis=1)[0] != corr.argmax(axis=1)[1]


class TestCompressiveSensing:
    def test_omp_recovers_sparse_vector(self):
        rng = np.random.default_rng(6)
        a = rng.standard_normal((64, 256))
        a /= np.linalg.norm(a, axis=0)
        x = np.zeros(256)
        support = [12, 97, 200]
        x[support] = [2.0, -1.5, 3.0]
        y = a @ x
        rec, got_support = ap.omp(a, y, sparsity=3)
        # jit-safe OMP returns arrays (f32 masked normal equations)
        assert np.asarray(got_support).tolist() == sorted(support)
        assert np.allclose(np.asarray(rec), x, atol=1e-4)


class TestModulationClassifier:
    def _syms(self, points, n=8192, seed=0, snr_db=18.0):
        rng = np.random.default_rng(seed)
        s = points[rng.integers(0, len(points), n)]
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                 ) * np.sqrt(0.5) * 10 ** (-snr_db / 20)
        return (s + noise).astype(np.complex64)

    def test_classifies_linear_schemes(self):
        from r4w_tpu.waveforms.linear_mod import (psk_constellation,
                                                  qam_constellation)

        assert ap.classify_modulation(
            self._syms(psk_constellation(2))) == "BPSK"
        assert ap.classify_modulation(
            self._syms(psk_constellation(4))) == "QPSK"
        assert ap.classify_modulation(
            self._syms(psk_constellation(8))) == "8PSK"
        assert ap.classify_modulation(
            self._syms(qam_constellation(16))) == "QAM"

    def test_classifies_fm_like(self):
        n = np.arange(8192)
        phase = np.cumsum(0.2 * np.sin(2 * np.pi * 0.001 * n))
        fm = np.exp(1j * phase).astype(np.complex64)
        assert ap.classify_modulation(fm) == "FM/FSK"
