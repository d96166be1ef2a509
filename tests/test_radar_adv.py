"""STAP / clutter / integration / tracking tests (catalog tail IV)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import radar_adv as ra


class TestStap:
    def _scene(self, seed=0):
        """N=4 elements, M=8 pulses: clutter ridge (fs == fd) + noise."""
        rng = np.random.default_rng(seed)
        n, m, k = 4, 8, 200
        snaps = np.zeros((k, n * m), np.complex64)
        for i in range(k):
            x = (rng.standard_normal(n * m)
                 + 1j * rng.standard_normal(n * m)) * np.sqrt(0.005)
            # clutter patches: fd == fs along the ridge
            for fs in rng.uniform(-0.5, 0.5, 12):
                v = np.asarray(ra.space_time_steering(n, m, fs, fs))
                x += (rng.standard_normal() + 1j * rng.standard_normal()
                      ) * v * 1.0
            snaps[i] = x
        return n, m, snaps

    def test_stap_nulls_clutter_keeps_target(self):
        n, m, snaps = self._scene()
        # target: same spatial freq as clutter at fs=0.1 but different
        # Doppler -> separable only jointly
        v_tgt = np.asarray(ra.space_time_steering(n, m, 0.1, -0.35))
        w = np.asarray(ra.stap_weights(jnp.asarray(snaps),
                                       jnp.asarray(v_tgt)))
        # unit gain on target by construction
        assert abs(np.conj(w) @ v_tgt - 1.0) < 1e-3
        # clutter (fs=fd=0.1) strongly suppressed relative to target
        v_clut = np.asarray(ra.space_time_steering(n, m, 0.1, 0.1))
        assert abs(np.conj(w) @ v_clut) < 0.1

    def test_stap_beats_nonadaptive_sinr(self):
        n, m, snaps = self._scene(1)
        v_tgt = np.asarray(ra.space_time_steering(n, m, 0.1, -0.35))
        r = snaps.conj().T @ snaps / len(snaps)
        w_stap = np.asarray(ra.stap_weights(jnp.asarray(snaps),
                                            jnp.asarray(v_tgt)))
        w_conv = v_tgt / (np.conj(v_tgt) @ v_tgt)
        sinr_stap = ra.sinr_loss(jnp.asarray(w_stap), jnp.asarray(v_tgt),
                                 jnp.asarray(r))
        sinr_conv = ra.sinr_loss(jnp.asarray(w_conv), jnp.asarray(v_tgt),
                                 jnp.asarray(r))
        assert sinr_stap > 10 * sinr_conv  # >10 dB improvement


class TestClutterIntegration:
    def test_clutter_notch_removes_static_keeps_mover(self):
        m, nr = 16, 64
        rng = np.random.default_rng(2)
        pulses = 0.01 * (rng.standard_normal((m, nr))
                         + 1j * rng.standard_normal((m, nr))
                         ).astype(np.complex64)
        pulses[:, 10] += 5.0                     # static clutter
        mover = 2.0 * np.exp(2j * np.pi * 0.25 * np.arange(m))
        pulses[:, 30] += mover.astype(np.complex64)
        out = np.asarray(ra.clutter_notch(jnp.asarray(pulses)))
        p_static = (np.abs(out[:, 10]) ** 2).mean()
        p_mover = (np.abs(out[:, 30]) ** 2).mean()
        assert p_mover > 100 * p_static
        assert p_mover > 0.5 * (np.abs(mover) ** 2).mean()

    def test_coherent_gain(self):
        m = 64
        rng = np.random.default_rng(3)
        sig = np.ones((m, 1), np.complex64)
        noise = ((rng.standard_normal((m, 1))
                  + 1j * rng.standard_normal((m, 1))) / np.sqrt(2)
                 ).astype(np.complex64)
        ci = np.asarray(ra.coherent_integrate(jnp.asarray(sig + noise)))
        # coherent sum: signal amplitude m, noise power m -> SNR gain m
        assert abs(ci[0]) == pytest.approx(m, rel=0.2)
        nci = np.asarray(ra.noncoherent_integrate(jnp.asarray(sig)))
        assert nci[0] == pytest.approx(m, rel=1e-6)


class TestTracker:
    def test_tracks_constant_velocity_target(self):
        tracker = ra.RadarTracker(dt=0.1, gate=20.0)
        rng = np.random.default_rng(4)
        confirmed = []
        for k in range(30):
            r_true = 1000.0 - 30.0 * 0.1 * k   # closing at 30 m/s
            z = r_true + rng.normal(0, 2.0)
            confirmed = tracker.step([z])
        assert len(confirmed) == 1
        tr = confirmed[0]
        assert tr.x[0] == pytest.approx(1000.0 - 30.0 * 0.1 * 29, abs=10)
        assert tr.x[1] == pytest.approx(-30.0, abs=5.0)

    def test_two_targets_and_dropout(self):
        tracker = ra.RadarTracker(dt=0.1, gate=15.0, max_misses=2)
        for k in range(10):
            dets = [500.0 + 5.0 * k, 900.0 - 8.0 * k]
            confirmed = tracker.step(dets)
        assert len(confirmed) == 2
        # one target disappears; its track must die after max_misses
        for k in range(10, 16):
            confirmed = tracker.step([500.0 + 5.0 * k])
        assert len(confirmed) == 1
