"""Round-4 KA batch J: the last blocks with no dedicated test — each
now verified against an independent truth (numpy re-derivations,
closed-form FMCW/Foschini-Miljanic algebra, IEC 61000-4-3 levels,
Radon-projection geometry). Found by extending
tools/block_test_audit.py to per-file mention counts: these eight
registry blocks were exercised only by the audit itself.

Reference roles: acoustic_impedance_tomographer.rs,
emc_radiated_immunity.rs, matched_filter_pulse_radar.rs,
phase_locked_loop_biquad.rs, power_control.rs,
radio_direction_finder.rs, range_velocity_decoupling_processor.rs,
seismic_arrival_detector.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------- impedance tomography


class TestImpedanceTomography:
    """Truth: Radon geometry — a centered disc phantom projects to the
    SAME profile p(t) = 2·√(r²−t²) at every angle, and filtered
    backprojection must reconstruct a centered, radially symmetric
    peak."""

    def test_centered_disc_reconstructs_centered_peak(self):
        from r4w_tpu.ops.sensing import impedance_tomography_backproject

        n_det, n_px, r = 64, 33, 0.4
        t = np.linspace(-1, 1, n_det)
        profile = 2.0 * np.sqrt(np.maximum(r * r - t * t, 0.0))
        angles = np.arange(0.0, 180.0, 10.0)
        meas = np.tile(profile, (angles.size, 1)).astype(np.float32)
        img = np.asarray(impedance_tomography_backproject(
            meas, angles, n_px=n_px))
        c = n_px // 2
        yy, xx = np.mgrid[:n_px, :n_px]
        rad_px = np.hypot(yy - c, xx - c)
        r_px = r * (n_px - 1) / 2.0  # disc radius in pixels (~6.4)
        inside = img[rad_px < 0.5 * r_px]
        outside = img[rad_px > 2.0 * r_px]
        # a disc indicator reconstructs to a flat positive plateau
        # inside and ~zero outside (FBP of a constant-density disc)
        assert np.min(inside) > 0
        assert np.ptp(inside) < 0.3 * np.mean(inside)
        assert np.mean(inside) > 5.0 * np.mean(np.abs(outside))
        # radial symmetry: the four mid-radius compass points agree
        q = int(round(r / 2 * (n_px - 1) / 2))
        pts = [img[c + q, c], img[c - q, c], img[c, c + q], img[c, c - q]]
        assert np.ptp(pts) < 0.25 * abs(np.mean(pts)) + 1e-6


# ------------------------------------------------ EMC immunity


class TestEmcRadiatedImmunity:
    """Truth: IEC 61000-4-3 — the required test field is the nominal
    level times the 1.8 peak factor of 80 % AM, flat over the sweep."""

    def test_levels_match_iec_61000_4_3(self):
        from r4w_tpu.ops.instruments import immunity_test_levels

        f = np.logspace(np.log10(80e6), np.log10(1e9), 31)
        lv = np.asarray(immunity_test_levels(f, field_v_per_m=3.0))
        np.testing.assert_allclose(lv, 5.4, atol=1e-5)  # 3 V/m × 1.8
        lv10 = np.asarray(immunity_test_levels(f, field_v_per_m=10.0))
        np.testing.assert_allclose(lv10, 18.0, atol=1e-4)


# ------------------------------------------ pulse-radar matched filter


class TestMatchedFilterPulseRadar:
    """Truth: numpy FFT cross-correlation — the compressed pulse peaks
    at the embedded delay with energy ‖replica‖²."""

    def test_peak_at_delay_with_replica_energy(self):
        from r4w_tpu.ops.radar_sonar import matched_filter_pulses

        rng = np.random.default_rng(11)
        n, k = 256, 32
        replica = (rng.standard_normal(k) + 1j * rng.standard_normal(k)
                   ).astype(np.complex64)
        delays = [0, 17, 100, 200]
        cube = np.zeros((len(delays), n), np.complex64)
        for i, d in enumerate(delays):
            cube[i, d:d + k] = replica
        out = np.asarray(matched_filter_pulses(cube, replica))
        for i, d in enumerate(delays):
            assert int(np.argmax(np.abs(out[i]))) == d
            assert abs(out[i, d]) == pytest.approx(
                float(np.sum(np.abs(replica) ** 2)), rel=1e-4)

    def test_matches_numpy_fft_correlation(self):
        from r4w_tpu.ops.radar_sonar import matched_filter_pulses

        rng = np.random.default_rng(12)
        n, k = 128, 16
        cube = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
                ).astype(np.complex64)
        rep = (rng.standard_normal(k) + 1j * rng.standard_normal(k)
               ).astype(np.complex64)
        nfft = 1 << (2 * n - 1).bit_length()
        want = np.fft.ifft(np.fft.fft(cube, nfft, axis=-1)
                           * np.conj(np.fft.fft(rep, nfft)), axis=-1)[:, :n]
        got = np.asarray(matched_filter_pulses(cube, rep))
        np.testing.assert_allclose(got, want, atol=1e-3)


# ------------------------------------------------------ biquad PLL


class TestPllBiquad:
    """Truth: a pure carrier at a fixed frequency offset — the locked
    loop's frequency state must settle on the true offset and the
    phase estimate must advance at that rate."""

    def test_locks_to_carrier_offset(self):
        from r4w_tpu.ops.sync2 import pll_biquad

        n = 4096
        f0 = 0.01  # cycles/sample
        x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
        phases, freqs = pll_biquad(x, loop_bw=0.05)
        f_est = float(np.mean(np.asarray(freqs)[-512:]))  # rad/sample
        assert f_est == pytest.approx(2 * np.pi * f0, rel=0.02)
        # steady-state phase slope equals the carrier rate
        ph = np.unwrap(np.asarray(phases)[-512:])
        slope = np.polyfit(np.arange(512), ph, 1)[0]
        assert slope == pytest.approx(2 * np.pi * f0, rel=0.02)


# --------------------------------------------------- power control


class TestPowerControl:
    """Truths: the up/down command law, and the Foschini–Miljanic
    fixed point solved independently as a linear system."""

    def test_step_command_signs(self):
        from r4w_tpu.ops.cognitive import power_control_step

        cmd = np.asarray(power_control_step(
            np.asarray([3.0, 9.9, 10.1, 25.0]), target_db=10.0,
            step_db=2.0))
        np.testing.assert_array_equal(cmd, [2.0, 2.0, -2.0, -2.0])

    def test_converges_to_linear_system_fixed_point(self):
        from r4w_tpu.ops.cognitive import power_control_converge

        rng = np.random.default_rng(5)
        L = 4
        g = rng.uniform(0.01, 0.05, (L, L)).astype(np.float32)
        np.fill_diagonal(g, rng.uniform(1.0, 2.0, L))
        noise = np.full(L, 0.05, np.float32)
        target_db = 5.0
        p, sinr_db = power_control_converge(g, noise, target_db,
                                            n_iter=200)
        # independent truth: p* solves (I - t·F) p = t·u with
        # F = off-diagonal gains / own gain, u = noise / own gain
        t = 10.0 ** (target_db / 10.0)
        diag = np.diag(g).astype(float)
        F = g / diag[:, None]
        np.fill_diagonal(F, 0.0)
        p_star = np.linalg.solve(np.eye(L) - t * F, t * noise / diag)
        assert np.all(p_star > 0)  # feasible instance
        np.testing.assert_allclose(np.asarray(p), p_star, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(sinr_db), target_db,
                                   atol=0.01)


# -------------------------------------------- pseudo-Doppler DF


class TestRadioDirectionFinder:
    """Truth: a pseudo-Doppler commutated antenna produces FM at the
    rotation rate whose phase IS the bearing — build the FM signal
    analytically and require the bearing back."""

    @pytest.mark.parametrize("bearing_deg", [0.0, 50.0, 200.0, 315.0])
    def test_recovers_constructed_bearing(self, bearing_deg):
        from r4w_tpu.ops.instruments import df_bearing_pseudodoppler

        fs, rot, n = 48000.0, 500.0, 9600
        t = np.arange(n) / fs
        beta = 2.0  # FM index of the commutation
        ph = beta * np.sin(2 * np.pi * rot * t + np.deg2rad(bearing_deg))
        x = np.exp(1j * ph).astype(np.complex64)
        got = float(np.asarray(df_bearing_pseudodoppler(x, fs, rot)))
        err = (got - bearing_deg + 180.0) % 360.0 - 180.0
        assert abs(err) < 2.0


# ---------------------------------------- FMCW range/velocity


class TestRangeVelocityDecoupling:
    """Truth: triangle-FMCW algebra — up-chirp beat f_up = f_r − f_d,
    down-chirp beat f_dn = f_r + f_d, so f_r = (f_up+f_dn)/2 and
    f_d = (f_dn−f_up)/2."""

    def test_recovers_range_and_velocity_beats(self):
        from r4w_tpu.ops.radar_sonar import range_velocity_decouple

        n_d, n_r = 8, 64
        rng_axis = np.linspace(0.0, 1000.0, n_r).astype(np.float32)
        vel_axis = np.zeros(n_d, np.float32)
        f_r, f_d = 500.0, 125.0  # true beat components (axis units)
        k_up = int(np.argmin(np.abs(rng_axis - (f_r - f_d))))
        k_dn = int(np.argmin(np.abs(rng_axis - (f_r + f_d))))
        up = np.zeros((n_d, n_r), np.float32)
        dn = np.zeros((n_d, n_r), np.float32)
        up[3, k_up] = 1.0
        dn[5, k_dn] = 1.0
        r, v = range_velocity_decouple(up, dn, rng_axis, vel_axis)
        step = rng_axis[1] - rng_axis[0]
        assert float(r) == pytest.approx(f_r, abs=step)
        assert float(v) == pytest.approx(f_d, abs=step)


# ----------------------------------------------- seismic STA/LTA


class TestSeismicArrivalDetector:
    """Truths: an exact numpy moving-average re-derivation of the
    STA/LTA ratio, and the classic property that an onset drives the
    ratio above threshold at (and not before) the arrival."""

    def test_ratio_matches_numpy_rederivation(self):
        from r4w_tpu.ops.sensing import sta_lta

        rng = np.random.default_rng(9)
        x = rng.standard_normal(600).astype(np.float32)
        n_sta, n_lta = 10, 50
        got = np.asarray(sta_lta(x, n_sta, n_lta))
        a = np.abs(x)
        sta = np.convolve(a, np.ones(n_sta) / n_sta, mode="valid")
        lta = np.convolve(a, np.ones(n_lta) / n_lta, mode="valid")
        m = min(sta.size, lta.size)
        want = sta[-m:] / np.maximum(lta[-m:], 1e-12)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_pick_finds_onset_time(self):
        from r4w_tpu.ops.sensing import seismic_pick

        fs = 100.0
        rng = np.random.default_rng(10)
        n = int(20 * fs)
        x = 0.01 * rng.standard_normal(n)
        onset_s = 12.0
        k = int(onset_s * fs)
        x[k:] += np.sin(2 * np.pi * 5.0 * np.arange(n - k) / fs)
        t_pick = float(np.asarray(seismic_pick(x.astype(np.float32), fs)))
        assert onset_s - 0.1 <= t_pick <= onset_s + 1.0

    def test_no_event_returns_nan(self):
        from r4w_tpu.ops.sensing import seismic_pick

        rng = np.random.default_rng(13)
        x = rng.standard_normal(2000).astype(np.float32)
        assert np.isnan(float(np.asarray(seismic_pick(x, 100.0,
                                                      threshold=50.0))))
