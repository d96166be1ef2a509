"""Round-4 KA batch S: geophysics/photonics/nuclear/vibration sensing
truths — each against the defining closed form (S4 of a known
intensity law, OCT fringe-frequency↔depth, BPM difference-over-sum,
order tracking under an RPM ramp, blade-tip jitter statistics) or an
independently synthesized scene.

Reference roles: ionospheric_scintillation_detector.rs/analyzer.rs,
magnetic_anomaly_detector.rs, gravity_gradiometer_processor.rs,
lightning_stroke_analyzer.rs, cosmic_ray_detector.rs,
fiber_bragg_grating_interrogator.rs, optical_coherence_tomography.rs,
mr_spectroscopy_processor.rs, nuclear_spectroscopy_analyzer.rs,
particle_accelerator_bpm.rs, vibration_order_tracker.rs,
railroad_wheel_flat_detector.rs, turbine_blade_tip_timing.rs,
wind_turbine_vibration_monitor.rs, geomagnetic_storm_detector.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ----------------------------------------------------- scintillation


class TestScintillationIndices:
    def test_s4_closed_forms(self):
        """S4 = std(P)/mean(P): 0 for steady power; for
        P = P0(1 + m·cos) it is m/√2 exactly."""
        from r4w_tpu.ops.sensing import scintillation_s4

        steady = np.full(500, 3.0, np.float32)
        s4 = np.asarray(scintillation_s4(jnp.asarray(steady), frame=50))
        assert np.max(s4) < 1e-4
        m = 0.4
        t = np.arange(500)
        p = 2.0 * (1.0 + m * np.cos(2 * np.pi * t / 25)).astype(
            np.float32)  # integer cycles per 50-sample frame
        s4m = np.asarray(scintillation_s4(jnp.asarray(p), frame=50))
        assert np.allclose(s4m, m / np.sqrt(2.0), atol=5e-3)

    def test_sigma_phi_detrends_linear_ramp(self):
        """σ_φ must be blind to a pure carrier ramp (linear phase) and
        report exactly the std of added Gaussian phase noise."""
        from r4w_tpu.ops.sensing import scintillation_sigma_phi

        rng = np.random.default_rng(1)
        n, sigma = 1000, 0.3
        ramp = 0.05 * np.arange(n)
        noise = sigma * rng.standard_normal(n)
        out = np.asarray(scintillation_sigma_phi(
            jnp.asarray((ramp + noise).astype(np.float32)), frame=100))
        assert np.mean(out) == pytest.approx(sigma, rel=0.1)
        clean = np.asarray(scintillation_sigma_phi(
            jnp.asarray(ramp.astype(np.float32)), frame=100))
        assert np.max(clean) < 1e-3


# -------------------------------------------------------- geophysics


class TestMagneticAnomaly:
    def test_dipole_bump_detected_baseline_ignored(self):
        from r4w_tpu.ops.sensing import magnetic_anomaly_detect

        n = 2000
        t = np.arange(n)
        earth = 50000.0 + 10.0 * np.sin(2 * np.pi * t / n)  # slow drift
        anomaly = 20.0 * np.exp(-0.5 * ((t - 1200) / 15.0) ** 2)
        mask, resid = magnetic_anomaly_detect(
            jnp.asarray((earth + anomaly).astype(np.float32)),
            baseline_window=256, threshold_nt=5.0)
        mask = np.asarray(mask)
        hits = np.nonzero(mask)[0]
        assert hits.size > 0
        assert 1150 < hits.mean() < 1250
        assert not mask[:800].any()  # drift alone must not trigger
        assert float(np.max(np.asarray(resid))) == pytest.approx(
            20.0, rel=0.1)


class TestGravityGradient:
    def test_linear_field_gives_constant_gradients(self):
        from r4w_tpu.ops.sensing import gravity_gradient_tensor

        y, x = np.mgrid[0:16, 0:20].astype(np.float32)
        spacing = 2.0
        gz = 3.0 * x * spacing + 7.0 * y * spacing
        tzx, tzy = gravity_gradient_tensor(jnp.asarray(gz), spacing)
        assert np.allclose(np.asarray(tzx), 3.0, atol=1e-4)
        assert np.allclose(np.asarray(tzy), 7.0, atol=1e-4)


class TestLightningStrokes:
    def test_toa_polarity_rise_time(self):
        from r4w_tpu.ops.sensing import lightning_stroke_analyze

        rng = np.random.default_rng(2)
        fs, n = 1e6, 100_000
        e = 0.01 * rng.standard_normal(n)
        rise = 120  # samples to peak
        for start, pol in ((20_000, +1), (60_000, -1)):
            ramp = np.linspace(0, 1, rise)
            decay = np.exp(-np.arange(800) / 300.0)
            e[start:start + rise] += pol * ramp
            e[start + rise:start + rise + 800] += pol * decay
        times, pols, rises, valid = lightning_stroke_analyze(e, fs)
        assert int(np.sum(np.asarray(valid))) == 2
        for k, (start, want_pol) in enumerate(((20_000, 1),
                                               (60_000, -1))):
            toa, pol, rt = float(times[k]), int(pols[k]), float(rises[k])
            # TOA is the threshold crossing: somewhere on the ramp
            assert start / fs <= toa <= (start + rise) / fs
            assert pol == want_pol
            # exact identity: trigger time + reported rise = the peak
            assert toa + rt == pytest.approx((start + rise - 1) / fs,
                                             abs=3 / fs)


class TestCosmicRayCoincidence:
    def test_counts_only_coincident_hits(self):
        from r4w_tpu.ops.sensing import cosmic_ray_coincidence

        rng = np.random.default_rng(3)
        n = 5000
        a = 0.1 * rng.standard_normal(n).astype(np.float32)
        b = 0.1 * rng.standard_normal(n).astype(np.float32)
        for i in (500, 1500, 2500):   # true coincidences (within ±3)
            a[i] = 50.0
            b[i + 2] = 50.0
        a[4000] = 50.0                # singles: must NOT count
        b[4500] = 50.0
        got = int(cosmic_ray_coincidence(jnp.asarray(a), jnp.asarray(b),
                                         window=3))
        assert got == 3


class TestGeomagneticStorm:
    def test_quiet_vs_disturbed(self):
        """K-like index log2(1 + range/5): a 5 nT range gives exactly
        1.0; a 1500 nT storm window trips the >5 disturbance flag."""
        from r4w_tpu.ops.sensing import geomagnetic_storm_index

        fs, w = 1.0, 60
        quiet = np.zeros(10 * w, np.float32)
        quiet[::2] = 5.0  # 5 nT peak-to-peak
        k, flag = geomagnetic_storm_index(jnp.asarray(quiet), fs, w)
        assert np.allclose(np.asarray(k), 1.0, atol=1e-5)
        assert not bool(flag)
        storm = np.zeros(10 * w, np.float32)
        storm[::2] = 1500.0
        k2, flag2 = geomagnetic_storm_index(jnp.asarray(storm), fs, w)
        assert bool(flag2) and float(np.max(np.asarray(k2))) > 8.0


# ---------------------------------------------------------- photonics


class TestFbgInterrogator:
    def test_centroid_peak_wavelength(self):
        from r4w_tpu.ops.sensing import fbg_wavelength_shift

        wl = np.linspace(1540.0, 1560.0, 400).astype(np.float32)
        lam0 = 1551.37
        spec = np.exp(-0.5 * ((wl - lam0) / 0.2) ** 2).astype(np.float32)
        got = float(fbg_wavelength_shift(jnp.asarray(spec),
                                         jnp.asarray(wl)))
        assert got == pytest.approx(lam0, abs=0.02)


class TestOctAScan:
    def test_fringe_frequency_maps_to_depth_bin(self):
        """SD-OCT: a reflector at depth bin k produces a k-space
        fringe cos(2π·k·n/N); the A-scan must peak at exactly bin k
        with no DC leak."""
        from r4w_tpu.ops.sensing import oct_a_scan

        n, k0 = 1024, 77
        nn = np.arange(n)
        fringe = (5.0 + np.cos(2 * np.pi * k0 * nn / n)).astype(
            np.float32)
        a = np.asarray(oct_a_scan(jnp.asarray(fringe)))
        assert int(np.argmax(a)) == k0
        assert a[0] < 1e-3 * a[k0]  # DC removed


class TestMrsQuantify:
    def test_two_metabolite_amplitude_ratio(self):
        from r4w_tpu.ops.sensing import mrs_quantify

        fs, n = 2000.0, 2048
        t = np.arange(n) / fs
        fid = (3.0 * np.exp(2j * np.pi * 250.0 * t)
               + 1.0 * np.exp(2j * np.pi * -180.0 * t)
               ).astype(np.complex64) * np.exp(-t * 3.0)
        out = np.asarray(mrs_quantify(jnp.asarray(fid), fs,
                                      (250.0, -180.0, 400.0)))
        assert out[0] / out[1] == pytest.approx(3.0, rel=0.1)
        assert out[2] < 0.05 * out[0]  # empty shift ≈ noise floor


class TestGammaSpectrum:
    def test_photopeaks_at_known_energies(self):
        """Cs-137 (662 keV) + Co-60 (1332 keV) pulse heights: the
        histogram peak finder must flag both photopeak bins."""
        from r4w_tpu.ops.sensing import gamma_spectrum

        rng = np.random.default_rng(4)
        heights = np.concatenate([
            rng.normal(662.0, 15.0, 4000),
            rng.normal(1332.0, 25.0, 2500),
        ]).astype(np.float32)
        hist, peaks = gamma_spectrum(jnp.asarray(heights), n_bins=256,
                                     e_max=3000.0)
        found = np.asarray(peaks)
        found = found[~np.isnan(found)]
        bin_w = 3000.0 / 256
        assert np.any(np.abs(found - 662.0) < 2 * bin_w)
        assert np.any(np.abs(found - 1332.0) < 2 * bin_w)


class TestBpmPosition:
    def test_difference_over_sum(self):
        """Centered beam → (0,0); a pure +x displacement raises A+D
        against B+C by exactly the normalized imbalance."""
        from r4w_tpu.ops.sensing import bpm_position

        x, y = bpm_position((1.0, 1.0, 1.0, 1.0))
        assert float(x) == 0.0 and float(y) == 0.0
        # A=+x+y, B=-x+y, C=-x-y, D=+x-y with 10% +x imbalance
        x2, y2 = bpm_position((1.1, 0.9, 0.9, 1.1))
        assert float(x2) == pytest.approx(0.1, abs=1e-6)
        assert float(y2) == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------- vibration


class TestOrderTracking:
    def test_order2_line_under_rpm_ramp(self):
        """A 2nd-order vibration under a 600→1800 rpm ramp smears in
        the frequency domain but must concentrate at order 2 in the
        angle domain."""
        from r4w_tpu.ops.sensing import envelope_order_spectrum

        fs, n = 2000.0, 40_000
        t = np.arange(n) / fs
        rpm = np.linspace(600.0, 1800.0, n)
        phase_revs = np.cumsum(rpm / 60.0) / fs
        vib = np.cos(2 * np.pi * 2.0 * phase_revs).astype(np.float32)
        orders = np.asarray(envelope_order_spectrum(vib, fs, rpm,
                                                    n_orders=6))
        assert int(np.argmax(orders)) == 1  # order 2 (1-indexed k=2)
        others = np.delete(orders, 1)
        assert orders[1] > 10.0 * np.max(others)


class TestWheelFlat:
    def test_impacts_at_rotation_period_detected(self):
        from r4w_tpu.ops.sensing import wheel_flat_detect

        rng = np.random.default_rng(5)
        fs, circ, speed = 5000.0, 2.8, 20.0   # period = 0.14 s
        n = 50_000
        vib = 0.1 * rng.standard_normal(n).astype(np.float32)
        period = int(circ / speed * fs)
        for k in range(100, n - 50, period):
            vib[k:k + 20] += 3.0 * np.exp(-np.arange(20) / 5.0)
        flat, score = wheel_flat_detect(jnp.asarray(vib), fs, circ,
                                        speed)
        assert bool(flat)
        healthy = 0.1 * rng.standard_normal(n).astype(np.float32)
        flat2, _ = wheel_flat_detect(jnp.asarray(healthy), fs, circ,
                                     speed)
        assert not bool(flat2)


class TestTurbineTipTiming:
    def test_vibrating_blade_stands_out(self):
        """Blades arrive every 60/(rpm·n_blades) s; only blade 2
        carries ±30 µs sinusoidal deflection jitter — its per-blade
        std must match and the others stay at zero."""
        from r4w_tpu.ops.sensing import turbine_tip_timing

        rpm, n_blades, n_rev = 3000.0, 8, 50
        period = 60.0 / rpm / n_blades
        idx = np.arange(n_rev * n_blades)
        t = idx * period
        jit = 30e-6 * np.sin(2 * np.pi * np.arange(n_rev) / 7.0)
        t = t.reshape(n_rev, n_blades)
        t[:, 2] += jit
        out = np.asarray(turbine_tip_timing(
            jnp.asarray(t.reshape(-1), jnp.float32), rpm, n_blades))
        assert out.shape == (n_blades,)
        assert int(np.argmax(out)) == 2
        assert out[2] == pytest.approx(np.std(jit), rel=0.15)
        others = np.delete(out, 2)
        assert np.max(others) < 0.2 * out[2]
