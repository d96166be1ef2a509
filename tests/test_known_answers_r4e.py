"""Round-4 KA batch E: channel-model and hardware-impairment blocks vs
independent truths — 3GPP TS 36.101 Annex B.2 tap tables, the Jakes
J₀(2πf_dτ) autocorrelation (scipy.special.j0), Rayleigh/Rician moment
identities, the Wiener-phase-noise coherence decay exp(−πΔν|τ|),
two-ray notch algebra, Saleh/Rapp AM-AM closed forms, and exact
IQ-imbalance estimator identities.

Reference roles: channel.rs:95-304 (TDL), doppler.rs:87-240 (Jakes),
hw_impairments.rs (phase noise :33, IQ imbalance :114, DC :166),
power_amplifier_model.rs, quadrature_demod.rs, doppler.rs:71
(velocity↔Doppler).
"""

import numpy as np
import pytest
import scipy.special

import jax
import jax.numpy as jnp


# ------------------------------------------------- 3GPP TDL tap tables


# Published 3GPP TS 36.101 Annex B.2.1 tables (delay ns, power dB) —
# typed here from the standard, NOT imported from the implementation.
TS36101 = {
    "EPA": ([0, 30, 70, 90, 110, 190, 410],
            [0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8]),
    "EVA": ([0, 30, 150, 310, 370, 710, 1090, 1730, 2510],
            [0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9]),
    "ETU": ([0, 50, 120, 200, 230, 500, 1600, 2300, 5000],
            [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0]),
}


class TestTdlProfiles:
    @pytest.mark.parametrize("name", ["EPA", "EVA", "ETU"])
    def test_tap_tables_match_ts36101(self, name):
        from r4w_tpu.channel.tdl import TDL_PROFILES

        delays, powers = TDL_PROFILES[name]
        want_d, want_p = TS36101[name]
        assert list(delays) == want_d
        np.testing.assert_allclose(list(powers), want_p)

    @pytest.mark.parametrize("name", ["EPA", "EVA", "ETU"])
    def test_rms_delay_spread_recomputed_from_standard(self, name):
        """τ_rms recomputed here from the published table must equal
        the block's report (textbook power-weighted second moment)."""
        from r4w_tpu.channel.tdl import rms_delay_spread

        d = np.asarray(TS36101[name][0], np.float64) * 1e-9
        p = 10.0 ** (np.asarray(TS36101[name][1], np.float64) / 10.0)
        p /= p.sum()
        mean = (p * d).sum()
        want = np.sqrt((p * (d - mean) ** 2).sum())
        assert abs(rms_delay_spread(name) - want) < 1e-12

    def test_epa_rms_delay_spread_published_value(self):
        """3GPP quotes EPA ≈ 45 ns, EVA ≈ 357 ns, ETU ≈ 991 ns."""
        from r4w_tpu.channel.tdl import rms_delay_spread

        assert abs(rms_delay_spread("EPA") * 1e9 - 45.0) < 3.0
        assert abs(rms_delay_spread("EVA") * 1e9 - 357.0) < 10.0
        assert abs(rms_delay_spread("ETU") * 1e9 - 991.0) < 15.0


# --------------------------------------------------- Jakes statistics


class TestJakesModel:
    def test_autocorrelation_follows_bessel_j0(self):
        """Clarke/Jakes: R(τ) = J₀(2π f_d τ) — cross-checked against
        scipy.special.j0 out to the first null and beyond."""
        from r4w_tpu.channel.doppler import jakes_fading

        fd, fs, n = 80.0, 8000.0, 1 << 15
        acc = None
        n_keys = 12
        for s in range(n_keys):
            h = np.asarray(jakes_fading(jax.random.key(s), n, fd, fs,
                                        n_oscillators=32))
            h = h - h.mean()
            lags = np.arange(0, 400, 8)
            r = np.array([np.vdot(h[:n - L], h[L:]).real
                          for L in lags]) / (n - lags)
            r = r / r[0]
            acc = r if acc is None else acc + r
        r = acc / n_keys
        tau = np.arange(0, 400, 8) / fs
        want = scipy.special.j0(2 * np.pi * fd * tau)
        np.testing.assert_allclose(r, want, atol=0.08)

    def test_envelope_rayleigh_moments(self):
        """Rayleigh envelope with E[r²]=Ω: E[r⁴]/E[r²]² = 2 exactly
        (the defining second/fourth moment identity)."""
        from r4w_tpu.channel.doppler import jakes_fading

        h = np.concatenate([
            np.asarray(jakes_fading(jax.random.key(100 + s), 1 << 15,
                                    120.0, 12000.0, n_oscillators=64))
            for s in range(6)])
        r2 = np.abs(h) ** 2
        ratio = np.mean(r2 ** 2) / np.mean(r2) ** 2
        assert abs(ratio - 2.0) < 0.12

    def test_velocity_to_doppler_closed_form(self):
        from r4w_tpu.channel.doppler import velocity_to_doppler

        # 30 m/s at GPS L1: 30·1575.42e6/299792458 = 157.65 Hz
        got = float(velocity_to_doppler(30.0, 1_575_420_000.0))
        assert abs(got - 30.0 * 1_575_420_000.0 / 299_792_458.0) < 1e-6


class TestRicianMoments:
    def test_k_factor_moment_estimator(self):
        """Rician envelope: the standard moment-based K̂ from
        (E[r²], E[r⁴]) must recover the configured K-factor."""
        from r4w_tpu.channel.channel import rician

        k_cfg = 4.0
        ones = jnp.ones(200_000, jnp.complex64)
        y = np.asarray(rician(jax.random.key(3), ones, k_cfg))
        r2 = np.abs(y) ** 2
        m2, m4 = np.mean(r2), np.mean(r2 ** 2)
        # K̂ = sqrt(2m2²−m4)/(m2−sqrt(2m2²−m4))  (classic estimator)
        a = np.sqrt(max(2 * m2 * m2 - m4, 0.0))
        k_hat = a / max(m2 - a, 1e-12)
        assert abs(k_hat - k_cfg) / k_cfg < 0.15


# -------------------------------------------------- two-ray multipath


class TestTwoRayAlgebra:
    def test_notch_and_peak_frequencies(self):
        """H(f) = 1 + a·e^{-j2πfD/fs}: a tone at f = fs/(2D) lands in
        the null (|1−a|), a tone at fs/D on the peak (1+a)."""
        from r4w_tpu.channel.channel import multipath_2ray

        fs, d, a = 1024.0, 8, 0.8
        n = 4096
        t = np.arange(n)
        f_null = fs / (2 * d)  # e^{-jπ} = −1
        f_peak = fs / d        # e^{-j2π} = +1
        for f, want in ((f_null, 1.0 - a), (f_peak, 1.0 + a)):
            x = np.exp(2j * np.pi * f * t / fs).astype(np.complex64)
            y = np.asarray(multipath_2ray(x, d, a))
            mag = np.abs(y[d:]).mean()
            assert abs(mag - want) < 0.02, (f, mag, want)


# ------------------------------------------------- Wiener phase noise


class TestPhaseNoiseCoherence:
    def test_coherence_decay_exp_pi_linewidth_tau(self):
        """Wiener (random-walk) phase noise with linewidth Δν:
        E[x(t+τ)x*(t)] = exp(−π·Δν·|τ|) — the Lorentzian-lineshape
        coherence identity."""
        from r4w_tpu.ops.impairments import phase_noise

        fs, lw, n = 100_000.0, 200.0, 1 << 18
        x = np.ones(n, np.complex64)
        y = np.asarray(phase_noise(jax.random.key(5), x, lw, fs))
        for lag_s in (0.5e-3, 1e-3, 2e-3):
            lag = int(lag_s * fs)
            coh = np.abs(np.vdot(y[:n - lag], y[lag:])) / (n - lag)
            want = np.exp(-np.pi * lw * lag_s)
            assert abs(coh - want) < 0.05, (lag_s, coh, want)


# ------------------------------------------------------ IQ imbalance


class TestIqImbalance:
    def test_estimator_recovers_configured_exactly(self):
        """On circular input the blind estimator's expectation equals
        the configured (gain, phase) — algebra of the I'=gI,
        Q'=Qcosφ+Isinφ model."""
        from r4w_tpu.ops.impairments import iq_imbalance, \
            iq_imbalance_estimate

        rng = np.random.default_rng(7)
        x = ((rng.standard_normal(400_000)
              + 1j * rng.standard_normal(400_000)) / np.sqrt(2)
             ).astype(np.complex64)
        g_db, ph_deg = 1.0, 4.0
        y = iq_imbalance(x, g_db, ph_deg)
        g_hat, ph_hat = iq_imbalance_estimate(y)
        assert abs(float(g_hat) - 10 ** (g_db / 20)) < 5e-3
        assert abs(np.rad2deg(float(ph_hat)) - ph_deg) < 0.3

    def test_correct_inverts_to_clean_evm(self):
        from r4w_tpu.ops.impairments import (iq_imbalance,
                                             iq_imbalance_correct,
                                             iq_imbalance_estimate)

        t = np.arange(65536)
        x = np.exp(2j * np.pi * 0.073 * t).astype(np.complex64)
        y = iq_imbalance(x, 0.8, 3.0)
        g, ph = iq_imbalance_estimate(y)
        z = np.asarray(iq_imbalance_correct(y, g, ph))
        evm = np.sqrt(np.mean(np.abs(z - x) ** 2))
        assert evm < 0.02

    def test_image_tone_level_matches_decomposition(self):
        """For a CW tone through the imbalance, the image-to-signal
        ratio equals |g−e^{−jφ}|²/|g+e^{jφ}|² (derived by writing
        I'+jQ' in terms of e^{±jωt})."""
        from r4w_tpu.ops.impairments import iq_imbalance

        n = 8192
        k = 512  # tone bin
        t = np.arange(n)
        x = np.exp(2j * np.pi * k * t / n).astype(np.complex64)
        g, ph = 10 ** (1.0 / 20), np.deg2rad(3.0)
        y = np.asarray(iq_imbalance(x, 1.0, 3.0))
        spec = np.fft.fft(y) / n
        sig = abs(spec[k])
        img = abs(spec[-k])
        want = abs(g - np.exp(-1j * ph)) / abs(g + np.exp(1j * ph))
        assert abs(img / sig - want) < 1e-3


# ---------------------------------------------------- PA closed forms


class TestPaModels:
    def test_saleh_am_am_formula(self):
        """Saleh TWT AM-AM: A(r) = α·r/(1+β·r²) with the published
        α=2.1587, β=1.1517 defaults."""
        from r4w_tpu.ops.impairments import saleh_pa

        r = np.array([0.1, 0.5, 1.0, 1.5], np.float32)
        x = (r + 0j).astype(np.complex64)
        y = np.asarray(saleh_pa(x))
        want = 2.1587 * r / (1 + 1.1517 * r * r)
        np.testing.assert_allclose(np.abs(y), want, rtol=1e-5)

    def test_rapp_am_am_formula_and_phase_preservation(self):
        """Rapp SSPA: |y| = r/(1+(r/sat)^{2p})^{1/2p}, zero AM-PM."""
        from r4w_tpu.ops.impairments import rapp_pa

        r = np.array([0.2, 0.8, 1.0, 2.0], np.float32)
        phase = 0.7
        x = (r * np.exp(1j * phase)).astype(np.complex64)
        y = np.asarray(rapp_pa(x, saturation=1.0, smoothness=2.0))
        want = r / (1 + (r / 1.0) ** 4) ** 0.25
        np.testing.assert_allclose(np.abs(y), want, rtol=1e-5)
        np.testing.assert_allclose(np.angle(y), phase, atol=1e-5)


# ------------------------------------------------- misc exact blocks


class TestMiscExact:
    def test_quadrature_demod_constant_tone_gain(self):
        """FM discriminator on a pure tone: y = gain·2π·f/fs exactly."""
        from r4w_tpu.ops.modem import quadrature_demod

        fs, f0, gain = 48_000.0, 1234.5, 2.5
        t = np.arange(4096) / fs
        x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        y = np.asarray(quadrature_demod(x, gain))
        want = gain * 2 * np.pi * f0 / fs
        np.testing.assert_allclose(y[1:], want, rtol=2e-4)

    def test_dc_offset_exact_spectral_line(self):
        from r4w_tpu.ops.impairments import dc_offset

        rng = np.random.default_rng(11)
        x = (rng.standard_normal(4096)
             + 1j * rng.standard_normal(4096)).astype(np.complex64)
        y = np.asarray(dc_offset(x, 0.25, -0.1))
        np.testing.assert_allclose(np.mean(y - x), 0.25 - 0.1j,
                                   atol=1e-6)

    def test_awgn_hits_configured_snr(self):
        from r4w_tpu.channel.channel import awgn, measure_snr

        t = np.arange(1 << 16)
        x = jnp.asarray(np.exp(2j * np.pi * 0.01 * t), jnp.complex64)
        for snr in (0.0, 10.0, 20.0):
            y = awgn(jax.random.key(2), x, snr)
            got = float(measure_snr(x, y))
            assert abs(got - snr) < 0.3, (snr, got)

    def test_block_fading_constant_within_blocks(self):
        from r4w_tpu.channel.channel import block_fading

        x = jnp.ones(4096, jnp.complex64)
        y = np.asarray(block_fading(jax.random.key(9), x, 256))
        blocks = y.reshape(-1, 256)
        # constant gain inside each coherence block
        assert np.abs(blocks - blocks[:, :1]).max() < 1e-6
        # and the gains actually vary across blocks
        assert np.abs(blocks[:, 0] - blocks[0, 0]).max() > 1e-3
