"""Tests for higher-order/cyclostationary spectral fills (spectral2.py)."""

import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import spectral2 as sp


class TestCyclo:
    def test_cyclic_autocorr_bpsk_symbol_rate(self):
        rng = np.random.default_rng(0)
        sps = 8
        bits = 2.0 * rng.integers(0, 2, 512) - 1.0
        x = np.repeat(bits, sps).astype(np.complex64)
        # cyclic feature at alpha = 1/sps
        alphas = [0.0, 1.0 / sps, 0.37 / sps]
        caf = np.asarray(sp.cyclic_autocorrelation(jnp.asarray(x),
                                                   alphas, max_lag=4))
        mag = np.abs(caf)
        assert mag[1].max() > 5 * mag[2].max()  # true cycle >> random

    def test_spectral_correlation_shape(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(8192)
             + 1j * rng.standard_normal(8192)).astype(np.complex64)
        scd = np.asarray(sp.spectral_correlation(jnp.asarray(x),
                                                 n_fft=128, n_alpha=16))
        assert scd.shape == (16, 128)
        # alpha=0 row is the PSD — largest energy
        assert scd[0].sum() > scd[8].sum()

    def test_bispectrum_detects_quadratic_coupling(self):
        fs = 1000.0
        t = np.arange(64 * 128) / fs
        rng = np.random.default_rng(2)
        f1, f2 = 60.0, 110.0
        ph1, ph2 = 0.7, 1.9
        coupled = (np.cos(2 * np.pi * f1 * t + ph1)
                   + np.cos(2 * np.pi * f2 * t + ph2)
                   + 0.8 * np.cos(2 * np.pi * (f1 + f2) * t + ph1 + ph2))
        uncoupled = (np.cos(2 * np.pi * f1 * t + ph1)
                     + np.cos(2 * np.pi * f2 * t + ph2)
                     + 0.8 * np.cos(2 * np.pi * (f1 + f2) * t
                                    + 2 * np.pi * rng.uniform()))
        k1 = round(f1 / fs * 128)
        k2 = round(f2 / fs * 128)
        b_c = np.asarray(sp.bispectrum(jnp.asarray(
            coupled.astype(np.float32)), 128))[k1, k2]
        # coupled bispectrum peak should be strong and localized
        b_full = np.asarray(sp.bispectrum(jnp.asarray(
            coupled.astype(np.float32)), 128))
        assert b_c > 0.5 * b_full.max()


class TestEmdProny:
    def test_emd_separates_scales(self):
        t = np.arange(2048)
        fast = np.sin(2 * np.pi * 0.2 * t)
        slow = np.sin(2 * np.pi * 0.005 * t)
        imfs = np.asarray(sp.emd(fast + slow, n_imfs=3))
        # first IMF correlates with the fast component
        c_fast = abs(np.corrcoef(imfs[0], fast)[0, 1])
        assert c_fast > 0.8
        # sum reconstructs
        np.testing.assert_allclose(imfs.sum(0), fast + slow, atol=1e-6)

    def test_prony_recovers_damped_tone(self):
        fs = 1000.0
        n = 200
        t = np.arange(n) / fs
        f0, tau = 50.0, 0.05
        x = np.exp(-t / tau) * np.exp(2j * np.pi * f0 * t)
        z, a = sp.prony(x.astype(np.complex64), order=2)
        z = np.asarray(z)
        best = z[np.argmax(np.imag(z))]
        f_est = np.angle(best) * fs / (2 * np.pi)
        assert abs(f_est - f0) < 1.0

    def test_modal_analysis(self):
        fs = 1000.0
        t = np.arange(500) / fs
        x = (np.exp(-10 * t) * np.sin(2 * np.pi * 80 * t)).astype(
            np.float32)
        freqs, zetas, amps = sp.modal_frequencies(x, fs, order=6)
        f = np.asarray(freqs)
        assert any(abs(fi - 80) < 3 for fi in f[:2])


class TestReassign:
    def test_reassignment_sharpens_tone(self):
        fs = 1000.0
        t = np.arange(8192) / fs
        x = np.exp(2j * np.pi * 203.7 * t).astype(np.complex64)
        ra = np.asarray(sp.reassigned_spectrogram(jnp.asarray(x), fs,
                                                  n_fft=256, hop=128))
        # energy concentrated in very few bins per frame
        frame = ra[10]
        top2 = np.sort(frame)[-2:].sum()
        assert top2 > 0.9 * frame.sum()


class TestStats:
    def test_spectral_entropy_extremes(self):
        rng = np.random.default_rng(3)
        noise = (rng.standard_normal(4096)
                 + 1j * rng.standard_normal(4096)).astype(np.complex64)
        tone = np.exp(2j * np.pi * 0.125 * np.arange(4096)).astype(
            np.complex64)  # bin-centered (off-grid tones leak)
        hn = float(sp.spectral_entropy(jnp.asarray(noise)))
        ht = float(sp.spectral_entropy(jnp.asarray(tone)))
        assert hn > 0.9 and ht < 0.2

    def test_power_law_fit(self):
        rng = np.random.default_rng(4)
        # brown noise: beta ~ 2
        w = rng.standard_normal(1 << 16)
        brown = np.cumsum(w)
        beta, _ = sp.power_law_fit(brown.astype(np.float32))
        assert 1.5 < beta < 2.5

    def test_plv(self):
        t = np.arange(4096)
        a = np.exp(2j * np.pi * 0.01 * t)
        b = np.exp(2j * np.pi * 0.01 * t + 1j * 0.5)
        rng = np.random.default_rng(5)
        c = np.exp(2j * np.pi * rng.uniform(size=4096))
        assert float(sp.phase_locking_value(a, b)) > 0.99
        assert float(sp.phase_locking_value(a, c)) < 0.1

    def test_em_gmm_recovers_modes(self):
        rng = np.random.default_rng(6)
        x = np.concatenate([rng.normal(-2.0, 0.3, 2000),
                            rng.normal(3.0, 0.5, 3000)])
        mu, sig, w = sp.em_gmm_1d(jnp.asarray(x.astype(np.float32)), 2)
        mu = np.asarray(mu)
        assert abs(mu[0] + 2.0) < 0.2 and abs(mu[1] - 3.0) < 0.2
        assert abs(float(w[1]) - 0.6) < 0.1

    def test_matrix_completion_low_rank(self):
        rng = np.random.default_rng(7)
        u = rng.standard_normal((16, 2))
        v = rng.standard_normal((2, 16))
        m = (u @ v).astype(np.float32)
        mask = rng.uniform(size=m.shape) < 0.7
        x = sp.matrix_complete_svt(jnp.asarray(m * mask),
                                   jnp.asarray(mask), rank=2,
                                   n_iter=200)
        err = np.abs(np.asarray(x) - m)[~mask].mean()
        scale = np.abs(m).mean()
        assert err < 0.35 * scale

    def test_hosvd_reconstructs(self):
        rng = np.random.default_rng(8)
        t = rng.standard_normal((4, 5, 6)).astype(np.float32)
        core, factors = sp.hosvd(t)
        rec = core
        for mode, u in enumerate(factors):
            rec = jnp.moveaxis(
                jnp.tensordot(u, jnp.moveaxis(rec, mode, 0), axes=1),
                0, mode)
        np.testing.assert_allclose(np.asarray(rec), t, atol=1e-3)

    def test_past_tracks_dominant_subspace(self):
        rng = np.random.default_rng(9)
        n, t_len = 8, 2000
        direction = rng.standard_normal(n)
        direction /= np.linalg.norm(direction)
        sig = rng.standard_normal(t_len)
        x = (np.outer(sig, direction) * 5.0
             + 0.1 * rng.standard_normal((t_len, n))).astype(
            np.complex64)
        q, _ = sp.past_subspace_track(jnp.asarray(x), n_dim=1)
        q = np.asarray(q)[:, 0]
        align = abs(np.vdot(q, direction)) / np.linalg.norm(direction)
        assert align > 0.95


class TestImageTools:
    def test_anomaly_score_flags_new_emitter(self):
        rng = np.random.default_rng(10)
        spec = rng.normal(0, 1, (64, 128)).astype(np.float32)
        spec[40:, 60] += 20.0  # a new line appears after training
        score = np.asarray(sp.spectrogram_anomaly_score(
            jnp.asarray(spec), n_train=16))
        assert score[45] > 2 * score[:16].mean()

    def test_waterfall_enhance_range(self):
        rng = np.random.default_rng(11)
        img = rng.uniform(0, 10, (32, 64)).astype(np.float32)
        out = np.asarray(sp.waterfall_enhance(jnp.asarray(img)))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_time_raster(self):
        r = np.asarray(sp.time_raster(jnp.arange(10), 3))
        assert r.shape == (3, 3)
        np.testing.assert_array_equal(r[1], [3, 4, 5])
