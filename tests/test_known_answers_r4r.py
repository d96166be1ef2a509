"""Round-4 KA batch R: GPS time algebra, IRIG-B framing, radar
tracking, lidar multi-return, STAP constraints, telemetry framing and
arbitrary-ratio resampling — against calendar facts (GPS week 2086),
the MVDR distortionless constraint, and exact frame layouts.

Reference roles: gps_time.rs, irig_b_decoder.rs,
automotive_radar_tracker.rs, lidar_peak_matcher.rs,
space_time_adaptive_processor.rs, telemetry_framer.rs,
interpolating_resampler.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------- GPS time


class TestGpsTime:
    def test_known_calendar_fact_and_roundtrip(self):
        """2020-01-01T00:00:00 UTC (unix 1577836800) is GPS week 2086,
        TOW 259218 (Wednesday 00:00 + 18 leap seconds) — a published
        calendar fact."""
        from r4w_tpu.ops.sync2 import GpsTime

        g = GpsTime.from_unix(1577836800.0)
        assert g.week == 2086
        assert g.tow == pytest.approx(259218.0, abs=1e-6)
        assert g.to_unix() == pytest.approx(1577836800.0, abs=1e-6)
        # week rollover boundary: one second before a Sunday 00:00
        g2 = GpsTime.from_unix(1577836800.0 - 259218.0 - 1.0)
        assert g2.week == 2085
        assert g2.tow == pytest.approx(604799.0, abs=1e-6)


class TestIrigB:
    def test_encode_decode_roundtrip_and_markers(self):
        from r4w_tpu.ops.sync2 import irig_b_decode, irig_b_encode

        tod = 13 * 3600 + 47 * 60 + 29  # 13:47:29
        widths, sym = irig_b_encode(tod)
        widths = np.asarray(widths)
        assert widths.shape[0] == 100
        # position markers P0, P1..P9 at 0, 9, 19, ..., 99 are 0.8
        marker_pos = [0] + list(range(9, 100, 10))
        assert np.allclose(widths[marker_pos], 0.8)
        others = np.setdiff1d(np.arange(100), marker_pos)
        assert np.all(widths[others] < 0.65)
        assert int(irig_b_decode(widths)) == tod

    def test_midnight_and_end_of_day(self):
        from r4w_tpu.ops.sync2 import irig_b_decode, irig_b_encode

        for tod in (0, 23 * 3600 + 59 * 60 + 59):
            widths, _ = irig_b_encode(tod)
            assert int(irig_b_decode(np.asarray(widths))) == tod


# ------------------------------------------------------ radar tracking


class TestRadarTracker:
    def test_cv_target_confirmed_and_velocity_estimated(self):
        """A 10 m/s constant-velocity target over 20 scans: exactly
        one confirmed track whose velocity estimate converges; a
        single-scan ghost never confirms; a missed scan coasts."""
        from r4w_tpu.ops.radar_adv import RadarTracker

        dt, v_true, r0 = 0.1, 10.0, 100.0
        tk = RadarTracker(dt, confirm_hits=3, max_misses=3)
        confirmed = []
        for k in range(20):
            dets = [r0 + v_true * dt * k]
            if k == 5:
                dets.append(500.0)  # one-scan ghost, far away
            if k == 12:
                dets = []           # dropout: the track must coast
            confirmed = tk.step(np.asarray(dets))
        assert len(confirmed) == 1
        tr = confirmed[0]
        assert tr.x[0] == pytest.approx(r0 + v_true * dt * 19, abs=1.0)
        assert tr.x[1] == pytest.approx(v_true, abs=1.5)


class TestLidarPeakMatch:
    def test_two_returns_at_exact_offsets(self):
        from r4w_tpu.ops.radar_sonar import lidar_peak_match

        tpl = np.exp(-0.5 * ((np.arange(15) - 7) / 2.0) ** 2
                     ).astype(np.float32)
        w = np.zeros(300, np.float32)
        d1, d2 = 60, 150
        w[d1:d1 + 15] += 1.0 * tpl
        w[d2:d2 + 15] += 0.6 * tpl
        out = np.asarray(lidar_peak_match(jnp.asarray(w),
                                          jnp.asarray(tpl),
                                          max_returns=4))
        valid = out[out[:, 0] >= 0]
        assert valid.shape[0] == 2
        assert valid[0, 0] == d1 and valid[1, 0] == d2
        # relative amplitudes preserved by matched filtering
        assert valid[1, 1] / valid[0, 1] == pytest.approx(0.6, abs=0.02)


class TestStapWeights:
    def test_distortionless_constraint_and_interferer_null(self):
        """MVDR/STAP law: wᴴv = 1 EXACTLY (unit gain on the target
        steering vector) while a strong interference direction present
        in the training data is suppressed by orders of magnitude."""
        from r4w_tpu.ops.radar_adv import stap_weights

        rng = np.random.default_rng(1)
        nm, k = 16, 400
        ph_t, ph_i = 0.5, 1.7
        v = np.exp(1j * ph_t * np.arange(nm)).astype(np.complex64)
        u = np.exp(1j * ph_i * np.arange(nm)).astype(np.complex64)
        amp_i = 30.0
        snaps = (amp_i * (rng.standard_normal((k, 1))
                          + 1j * rng.standard_normal((k, 1))) * u[None, :]
                 + 0.7 * (rng.standard_normal((k, nm))
                          + 1j * rng.standard_normal((k, nm)))
                 ).astype(np.complex64)
        w = np.asarray(stap_weights(jnp.asarray(snaps), jnp.asarray(v)))
        assert np.conj(w) @ v == pytest.approx(1.0 + 0j, abs=1e-4)
        # interferer response at least 20 dB below the target's
        assert abs(np.conj(w) @ u) < 0.1


class TestTelemetryFrame:
    def test_layout_roundtrip_and_crc(self):
        from r4w_tpu.ops.packets import telemetry_frame, telemetry_parse

        vals = np.array([1.23, -45.67, 0.0, 327.67], np.float64)
        frame = telemetry_frame(vals, frame_id=7)
        assert frame[:2] == b"\xeb\x90"
        assert frame[2] == 7 and frame[3] == 4
        fid, got = telemetry_parse(frame)
        assert fid == 7
        assert np.allclose(got, vals, atol=0.005)  # 0.01 LSB fixed-pt
        bad = bytearray(frame)
        bad[6] ^= 1
        assert telemetry_parse(bytes(bad)) is None
        assert telemetry_parse(b"\x12\x34" + frame[2:]) is None


class TestInterpolatingResampler:
    def test_arbitrary_ratio_preserves_tone(self):
        """rate = in/out = 0.75 (upsample 4/3): output length scales
        by 1/rate and a mid-band tone keeps unit amplitude."""
        from r4w_tpu.ops.filters2 import interpolating_resampler

        n, f = 4096, 0.05  # cycles/sample at the input rate
        t = np.arange(n)
        x = np.cos(2 * np.pi * f * t).astype(np.float32)
        rate = 0.75
        y = np.asarray(interpolating_resampler(jnp.asarray(x), rate))
        assert y.shape[0] == pytest.approx(n / rate, abs=8)
        ty = np.arange(y.shape[0]) * rate
        seg = slice(64, y.shape[0] - 64)
        ref = np.exp(-2j * np.pi * f * ty[seg])
        amp = 2.0 * np.abs(np.mean(y[seg] * ref))
        assert amp == pytest.approx(1.0, rel=0.03)
