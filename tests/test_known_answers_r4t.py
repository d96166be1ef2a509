"""Round-4 KA batch T: sonar/NDT/OTDR/wind-profiler geometry, pulse-
pair Doppler, hop patterns, AMC cumulants, GSC nulling and protocol
formatting — against the sonar/ultrasound two-way range laws, the
pulse-pair estimator law v = angle(R1)·PRF/2π, published cumulant
values (BPSK |C20|=1, QPSK |C20|=0, |C40|: 2 vs 1), and exact
roundtrips.

Reference roles: sonar_bottom_profiler.rs, ultrasonic_ndt_processor.rs,
otdr_pulse_analyzer.rs, wind_profiler_radar.rs,
parametric_doppler_estimator.rs, tracking_doppler_estimator.rs,
frequency_hopper.rs, automatic_modulation_classifier.rs,
generalized_sidelobe_canceller.rs, protocol_formatter.rs,
signal_source.rs, radiometer roles, radar_cross_section_estimator.rs,
weather_radar_clutter_suppressor.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------------------ sonar / NDT


class TestBottomProfile:
    def test_two_way_depth_law(self):
        """Echo at sample k ⇒ depth = c·k/(2·fs) exactly."""
        from r4w_tpu.ops.radar_sonar import bottom_profile

        fs, c = 50e3, 1500.0
        pings = np.zeros((3, 2000), np.float32)
        ks = [400, 800, 1200]
        for p, k in enumerate(ks):
            pings[p, k:k + 10] = 1.0
        depths = np.asarray(bottom_profile(jnp.asarray(pings), fs, c))
        want = np.array(ks) * c / (2.0 * fs)
        assert np.allclose(depths, want, atol=c / (2 * fs))


class TestNdtThickness:
    def test_backwall_echo_spacing(self):
        """Repeating back-wall echoes every k samples ⇒ thickness =
        v·k/(2·fs)."""
        from r4w_tpu.ops.radar_sonar import ndt_thickness

        fs, v, k_true = 100e6, 5900.0, 170
        echo = np.zeros(4096, np.float32)
        for m in range(1, 8):
            echo[m * k_true:m * k_true + 6] = 1.0 / m
        th, k = ndt_thickness(jnp.asarray(echo), fs, v)
        assert int(k) == k_true
        assert float(th) == pytest.approx(v * k_true / (2 * fs),
                                          rel=1e-6)


class TestOtdrAnalyze:
    def test_slope_and_event_classification(self):
        """0.2 dB/km fiber sampled at 1 sample/10 m with a −0.8 dB
        splice at 3 km and a +1.5 dB reflective connector at 7 km."""
        from r4w_tpu.ops.radar_sonar import otdr_analyze

        n = 1000  # 10 m per sample → 10 km
        slope = -0.2 / 100.0  # dB per sample (0.2 dB/km)
        y = slope * np.arange(n)
        y[300:] -= 0.8
        y[700:720] += 1.5  # reflective spike region start
        slope_est, pos, is_refl, mags, valid = otdr_analyze(
            y, fs=1.0, event_threshold_db=0.3)
        assert float(slope_est) == pytest.approx(slope, abs=1e-6)
        v = np.asarray(valid)
        kinds = {int(i): bool(r) for i, r, ok in
                 zip(np.asarray(pos), np.asarray(is_refl), v) if ok}
        assert kinds.get(300) is False   # loss
        assert kinds.get(700) is True    # reflection
        mag = {int(i): float(m) for i, m, ok in
               zip(np.asarray(pos), np.asarray(mags), v) if ok}
        assert mag[300] == pytest.approx(0.8, abs=0.02)
        assert mag[700] == pytest.approx(1.5, abs=0.02)


# ----------------------------------------------------- pulse-pair


class TestPulsePairDoppler:
    def test_parametric_and_gated_estimators(self):
        """Pulse-pair law: f = angle(E[x·x*₋₁])·rate/2π — exact for a
        pure tone below Nyquist/2."""
        from r4w_tpu.ops.radar_sonar import (parametric_doppler_estimate,
                                             tracking_doppler_estimate,
                                             wind_profile)

        fs, f0, n = 1000.0, 123.0, 512
        t = np.arange(n) / fs
        x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        got = float(parametric_doppler_estimate(jnp.asarray(x), fs))
        assert got == pytest.approx(f0, abs=0.01)
        # burst matrix: two bursts at different Dopplers
        prf = 1000.0
        p = np.arange(64) / prf
        bursts = np.stack([np.exp(2j * np.pi * 100.0 * p),
                           np.exp(2j * np.pi * -250.0 * p)]
                          ).astype(np.complex64)
        f_tr = np.asarray(tracking_doppler_estimate(jnp.asarray(bursts),
                                                    prf))
        assert f_tr[0] == pytest.approx(100.0, abs=0.1)
        assert f_tr[1] == pytest.approx(-250.0, abs=0.1)
        # wind profiler: per-gate radial velocity (same law per column)
        gates = np.stack([np.exp(2j * np.pi * 50.0 * p),
                          np.exp(2j * np.pi * -120.0 * p)], axis=1
                         ).astype(np.complex64)
        v = np.asarray(wind_profile(jnp.asarray(gates), prf, None))
        assert v[0] == pytest.approx(50.0, abs=0.1)
        assert v[1] == pytest.approx(-120.0, abs=0.1)


class TestWeatherClutterSuppress:
    def test_dc_notch_keeps_weather(self):
        from r4w_tpu.ops.radar_sonar import weather_clutter_suppress

        n_p, n_g, k_w = 32, 4, 6
        sl = np.arange(n_p)
        clutter = 10.0 * np.ones((n_p, n_g))
        weather = np.exp(2j * np.pi * k_w * sl / n_p)[:, None] \
            * np.ones((1, n_g))
        out = np.asarray(weather_clutter_suppress(
            jnp.asarray((clutter + weather).astype(np.complex64))))
        assert np.max(np.abs(out - weather)) < 1e-5


class TestRcsEstimate:
    def test_radar_equation_inverse(self):
        """Forward radar equation then the RCS solve must return the
        σ we started with — exact algebra."""
        from r4w_tpu.ops.radar_sonar import rcs_estimate

        pt, g, lam, r, sigma = 1e3, 30.0, 0.03, 10e3, 2.5
        pr = pt * g * g * lam ** 2 * sigma / ((4 * np.pi) ** 3 * r ** 4)
        got = rcs_estimate(pr, pt, g, g, lam, r)
        assert float(got) == pytest.approx(sigma, rel=1e-9)


# -------------------------------------------------- frequency hopping


class TestHopPattern:
    def test_deterministic_in_range_and_nondegenerate(self):
        from r4w_tpu.ops.infra_fills import (hop_frequencies,
                                             hop_pattern_lfsr)

        n_ch, n_hops = 50, 400
        p1 = np.asarray(hop_pattern_lfsr(n_ch, n_hops, seed=0x5A))
        p2 = np.asarray(hop_pattern_lfsr(n_ch, n_hops, seed=0x5A))
        assert np.array_equal(p1, p2)  # deterministic from the seed
        assert p1.min() >= 0 and p1.max() < n_ch
        # pseudo-random: visits most channels, no long dwell
        assert len(np.unique(p1)) > 0.8 * n_ch
        assert np.max(np.diff(np.nonzero(np.diff(p1))[0])) < 10
        f = np.asarray(hop_frequencies(p1, 902e6, 500e3))
        assert np.allclose(f, 902e6 + p1 * 500e3)


# ---------------------------------------------------------- AMC


class TestModulationCumulants:
    def test_published_cumulant_values(self):
        """Unit-power M-PSK: |C20| = 1 for BPSK, 0 for QPSK;
        |C40| = 2 for BPSK, 1 for QPSK — the standard AMC separation
        plane."""
        from r4w_tpu.ops.applied import classify_modulation, \
            modulation_features

        rng = np.random.default_rng(1)
        n = 8192
        bpsk = (2.0 * rng.integers(0, 2, n) - 1.0).astype(np.complex64)
        fb = modulation_features(bpsk)
        assert fb["abs_c20"] == pytest.approx(1.0, abs=1e-5)
        assert fb["abs_c40"] == pytest.approx(2.0, abs=1e-4)
        qpsk = (1j ** rng.integers(0, 4, n)).astype(np.complex64)
        fq = modulation_features(qpsk)
        assert fq["abs_c20"] < 0.05
        assert fq["abs_c40"] == pytest.approx(1.0, abs=0.05)
        assert classify_modulation(bpsk) == "BPSK"
        assert classify_modulation(qpsk) == "QPSK"


# ----------------------------------------------------------- GSC


class TestGscCancel:
    def test_interferer_suppressed_look_preserved(self):
        """Look-direction tone preserved, off-axis interferer driven
        into the adaptive branch: output interference power must drop
        by ≥15 dB vs the unadapted fixed beamformer."""
        from r4w_tpu.ops.beamforming import gsc_cancel

        rng = np.random.default_rng(2)
        n_el, t_len = 8, 4000
        look, jam = 0.0, 35.0

        def steer(deg):
            return np.exp(1j * 2 * np.pi * 0.5
                          * np.sin(np.deg2rad(deg))
                          * np.arange(n_el))

        s = np.exp(2j * np.pi * 0.01 * np.arange(t_len))
        j = 10.0 * np.exp(2j * np.pi * 0.173 * np.arange(t_len))
        x = (steer(look)[:, None] * s[None, :]
             + steer(jam)[:, None] * j[None, :]).astype(np.complex64)
        out = np.asarray(gsc_cancel(jnp.asarray(x), look))
        tail = out[t_len // 2:]
        # project the residual onto the two waveforms
        sig_amp = abs(np.vdot(s[t_len // 2:], tail)) / (t_len / 2)
        jam_amp = abs(np.vdot(j[t_len // 2:], tail)) / (t_len / 2) * 10.0
        assert sig_amp == pytest.approx(1.0, rel=0.1)
        assert jam_amp < 0.15 * sig_amp


# ------------------------------------------------------- misc exact


class TestSignalSource:
    def test_waveform_shapes_exact(self):
        from r4w_tpu.ops.stream_blocks import signal_source

        n, fs, f = 100, 100.0, 10.0
        t = np.arange(n) / fs
        assert np.allclose(np.asarray(signal_source(n, fs, f, "cos")),
                           np.cos(2 * np.pi * f * t), atol=1e-5)
        # phase offset keeps samples off the exact half-cycle edge
        # (f32 rounding at frac == 0.5 is convention, not correctness)
        ph = 0.3
        sq = np.asarray(signal_source(n, fs, f, "square", phase=ph))
        assert set(np.unique(sq)) == {-1.0, 1.0}
        want = np.where((f * t + ph / (2 * np.pi)) % 1.0 < 0.5,
                        1.0, -1.0)
        assert np.array_equal(sq, want)
        ex = np.asarray(signal_source(n, fs, f, "complex"))
        assert np.allclose(ex, np.exp(2j * np.pi * f * t), atol=1e-5)


class TestProtocolFormat:
    def test_kv_and_json_roundtrip(self):
        from r4w_tpu.ops.packets import protocol_format, protocol_parse

        fields = {"id": "42", "mode": "qpsk", "snr": "12.5"}
        for fmt in ("kv", "json"):
            wire = protocol_format(fields, fmt)
            assert protocol_parse(wire, fmt) == fields
        assert protocol_format(fields, "kv") == \
            b"id=42;mode=qpsk;snr=12.5"
        with pytest.raises(ValueError):
            protocol_format(fields, "xml")


class TestRadiometer:
    def test_total_power_and_cross_correlation(self):
        from r4w_tpu.ops.instruments import (radiometer_total_power,
                                             telescope_cross_correlate)

        rng = np.random.default_rng(3)
        x = (2.0 * (rng.standard_normal(4096)
                    + 1j * rng.standard_normal(4096))
             / np.sqrt(2.0)).astype(np.complex64)  # power 4.0
        p, dt_over_t = radiometer_total_power(jnp.asarray(x),
                                              frame=1024)
        assert np.allclose(np.asarray(p), 4.0, rtol=0.1)
        # radiometer equation: fractional sensitivity = 1/√N per frame
        assert float(dt_over_t) == pytest.approx(1.0 / np.sqrt(1024))
        # correlated signal delayed by 5 samples → fringe delay ±5
        a = (rng.standard_normal(2048)
             + 1j * rng.standard_normal(2048)).astype(np.complex64)
        b = np.roll(a, 5)
        vis, k, lags = telescope_cross_correlate(jnp.asarray(a),
                                                 jnp.asarray(b),
                                                 n_lags=16)
        assert abs(int(k)) == 5
        # uncorrelated streams: visibility ~ 1/√N of the signal power
        c = (rng.standard_normal(2048)
             + 1j * rng.standard_normal(2048)).astype(np.complex64)
        vis2, _, _ = telescope_cross_correlate(jnp.asarray(a),
                                               jnp.asarray(c))
        assert abs(complex(vis2)) < 0.2
        assert abs(complex(vis)) < 0.2  # roll-5 kills the 0-lag mean
