"""PVT navigation-solution tests: synthetic constellations with known
truth, Keplerian-orbit geometry, DOP behavior, and the code-phase →
pseudorange plumbing."""

import numpy as np
import pytest

from r4w_tpu.gnss import pvt
from r4w_tpu.gnss.coordinates import lla_to_ecef


def _constellation(truth, n=8, seed=0, radius=26_560e3):
    """n satellites on a MEO shell with decent sky spread."""
    rng = np.random.default_rng(seed)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(np.radians(15), np.radians(85), n)
    up = truth / np.linalg.norm(truth)
    # build a local frame
    east = np.cross([0, 0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    sats = []
    for a, e in zip(az, el):
        los = (np.cos(e) * (np.sin(a) * east + np.cos(a) * north)
               + np.sin(e) * up)
        # place the satellite along the LOS at shell radius
        # solve |truth + t*los| = radius
        b = 2 * truth @ los
        c = truth @ truth - radius ** 2
        t = (-b + np.sqrt(b * b - 4 * c)) / 2
        sats.append(truth + t * los)
    return np.asarray(sats)


class TestPointSolution:
    def test_exact_fix(self):
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        sats = _constellation(truth)
        bias = 8_500.0  # 28 µs clock error in meters
        rho = np.linalg.norm(sats - truth, axis=1) + bias
        sol = pvt.solve_position(sats, rho)
        assert np.linalg.norm(sol.position_ecef - truth) < 1e-3
        assert sol.clock_bias_m == pytest.approx(bias, abs=1e-3)
        assert np.abs(sol.residuals_m).max() < 1e-3
        assert sol.iterations <= 6

    def test_noisy_fix_accuracy_tracks_dop(self):
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        sats = _constellation(truth, n=10, seed=1)
        rng = np.random.default_rng(2)
        sigma = 3.0  # m UERE
        rho = (np.linalg.norm(sats - truth, axis=1) + 12_000.0
               + rng.normal(0, sigma, len(sats)))
        sol = pvt.solve_position(sats, rho)
        err = np.linalg.norm(sol.position_ecef - truth)
        assert err < 5 * sigma * sol.pdop  # within the DOP budget
        assert sol.gdop > sol.pdop > 0
        assert sol.hdop > 0 and sol.vdop > 0

    def test_lla_output(self):
        truth = np.asarray(lla_to_ecef(-33.9, 18.4, 50.0))
        sats = _constellation(truth, seed=3)
        rho = np.linalg.norm(sats - truth, axis=1)
        sol = pvt.solve_position(sats, rho)
        lla = sol.lla
        assert lla[0] == pytest.approx(-33.9, abs=1e-6)
        assert lla[1] == pytest.approx(18.4, abs=1e-6)
        assert lla[2] == pytest.approx(50.0, abs=0.01)

    def test_needs_four_sats(self):
        truth = np.asarray(lla_to_ecef(0.0, 0.0, 0.0))
        sats = _constellation(truth)[:3]
        with pytest.raises(ValueError, match=">= 4"):
            pvt.solve_position(sats, np.ones(3))

    def test_bad_geometry_raises_dop(self):
        """Satellites clustered in one sky quadrant -> worse DOP than a
        spread constellation."""
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 0.0))
        spread = _constellation(truth, n=8, seed=4)
        rng = np.random.default_rng(5)
        az = rng.uniform(0.1, 0.6, 8)   # clustered azimuths
        el = rng.uniform(np.radians(40), np.radians(60), 8)
        up = truth / np.linalg.norm(truth)
        east = np.cross([0, 0, 1.0], up)
        east /= np.linalg.norm(east)
        north = np.cross(up, east)
        cluster = []
        for a, e in zip(az, el):
            los = (np.cos(e) * (np.sin(a) * east + np.cos(a) * north)
                   + np.sin(e) * up)
            b = 2 * truth @ los
            c = truth @ truth - 26_560e3 ** 2
            t = (-b + np.sqrt(b * b - 4 * c)) / 2
            cluster.append(truth + t * los)
        cluster = np.asarray(cluster)
        rho_s = np.linalg.norm(spread - truth, axis=1)
        rho_c = np.linalg.norm(cluster - truth, axis=1)
        dop_s = pvt.solve_position(spread, rho_s).gdop
        dop_c = pvt.solve_position(cluster, rho_c).gdop
        assert dop_c > 2 * dop_s


class TestMultiSystem:
    """solve_position_multi: one clock-bias state per constellation
    (ISB/GGTO formulation)."""

    def test_recovers_distinct_system_biases(self):
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        gps = _constellation(truth, n=5, seed=10)
        gal = _constellation(truth, n=5, seed=11, radius=29_600e3)
        sats = np.concatenate([gps, gal])
        systems = ["gps"] * 5 + ["gal"] * 5
        b = {"gps": 39_000.0, "gal": 39_126.0}  # 126 m ISB
        rho = (np.linalg.norm(sats - truth, axis=1)
               + np.asarray([b[s] for s in systems]))
        sol = pvt.solve_position_multi(sats, rho, systems)
        assert np.linalg.norm(sol.position_ecef - truth) < 1e-3
        assert sol.system_biases_m["gps"] == pytest.approx(b["gps"],
                                                           abs=1e-3)
        assert sol.system_biases_m["gal"] == pytest.approx(b["gal"],
                                                           abs=1e-3)
        assert sol.clock_bias_m == pytest.approx(b["gps"], abs=1e-3)
        assert np.abs(sol.residuals_m).max() < 1e-3

    def test_single_shared_bias_aliases_isb_into_position(self):
        """The failure mode the multi solve exists for: solving a
        dual-constellation set with ONE clock state leaks the
        inter-system bias into the position estimate."""
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        gps = _constellation(truth, n=5, seed=10)
        gal = _constellation(truth, n=5, seed=11, radius=29_600e3)
        sats = np.concatenate([gps, gal])
        systems = ["gps"] * 5 + ["gal"] * 5
        isb = 130.0
        rho = (np.linalg.norm(sats - truth, axis=1)
               + np.where(np.arange(10) < 5, isb, 0.0))
        err_single = np.linalg.norm(
            pvt.solve_position(sats, rho).position_ecef - truth)
        err_multi = np.linalg.norm(
            pvt.solve_position_multi(sats, rho,
                                     systems).position_ecef - truth)
        assert err_multi < 1e-3
        assert err_single > 10 * max(err_multi, 1.0)

    def test_degenerates_to_single_system(self):
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        sats = _constellation(truth, n=6, seed=12)
        rho = np.linalg.norm(sats - truth, axis=1) + 7_000.0
        sol = pvt.solve_position_multi(sats, rho, ["gps"] * 6)
        ref = pvt.solve_position(sats, rho)
        assert np.linalg.norm(sol.position_ecef
                              - ref.position_ecef) < 1e-6
        assert sol.gdop == pytest.approx(ref.gdop, rel=1e-9)
        assert sol.system_biases_m == {"gps": pytest.approx(7_000.0,
                                                            abs=1e-3)}

    def test_needs_enough_sats_for_states(self):
        truth = np.asarray(lla_to_ecef(0.0, 0.0, 0.0))
        sats = _constellation(truth, n=4, seed=13)
        with pytest.raises(ValueError, match=">= 5"):
            pvt.solve_position_multi(sats, np.ones(4),
                                     ["gps", "gps", "gal", "gal"])

    def test_noisy_dual_fix_beats_isb_magnitude(self):
        """With metre-level noise and a 130 m ISB, the joint fix stays
        at the noise·DOP scale, nowhere near the ISB scale."""
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
        gps = _constellation(truth, n=5, seed=14)
        gal = _constellation(truth, n=5, seed=15, radius=29_600e3)
        sats = np.concatenate([gps, gal])
        systems = ["gps"] * 5 + ["gal"] * 5
        rng = np.random.default_rng(16)
        rho = (np.linalg.norm(sats - truth, axis=1)
               + np.where(np.arange(10) < 5, 130.0, 0.0)
               + rng.normal(0, 3.0, 10))
        sol = pvt.solve_position_multi(sats, rho, systems)
        err = np.linalg.norm(sol.position_ecef - truth)
        assert err < 5 * 3.0 * sol.pdop
        assert (sol.system_biases_m["gps"] - sol.system_biases_m["gal"]
                == pytest.approx(130.0, abs=15.0))


class TestVelocity:
    def test_velocity_and_drift(self):
        truth = np.asarray(lla_to_ecef(45.0, 7.0, 100.0))
        v_truth = np.asarray([30.0, -12.0, 4.0])
        drift = 1.5  # m/s clock drift
        sats = _constellation(truth, n=8, seed=6)
        rng = np.random.default_rng(7)
        svel = rng.normal(0, 3000.0, sats.shape)  # MEO velocities
        d = sats - truth
        u = d / np.linalg.norm(d, axis=1)[:, None]
        rr = np.sum(u * (svel - v_truth), axis=1) + drift
        rho = np.linalg.norm(d, axis=1)
        sol = pvt.solve_position(sats, rho)
        sol = pvt.solve_velocity(sol, sats, svel, rr)
        assert np.linalg.norm(sol.velocity_ecef - v_truth) < 1e-6
        assert sol.clock_drift_mps == pytest.approx(drift, abs=1e-9)


class TestPseudorangePlumbing:
    def test_code_phase_to_pseudorange(self):
        # a 68.802 ms transit: 68 integer ms + 0.802 ms of code phase
        chips = 0.802e-3 * 1_023_000.0  # chips into the C/A period
        rho = pvt.pseudoranges_from_code_phase([chips], 1_023_000.0,
                                               [68.0])
        want = 68.802e-3 * pvt.SPEED_OF_LIGHT
        assert rho[0] == pytest.approx(want, rel=1e-9)


class TestWithKepler:
    def test_fix_from_keplerian_constellation(self):
        """Position fix using satellites propagated by the environment
        model's Keplerian orbits — the stack's own geometry."""
        from r4w_tpu.gnss.environment import KeplerianOrbit

        truth = np.asarray(lla_to_ecef(45.0, 7.0, 200.0))
        sats = []
        for plane in range(6):
            for slot in range(4):
                orb = KeplerianOrbit(raan_deg=60.0 * plane,
                                     mean_anomaly_deg=90.0 * slot
                                     + 15.0 * plane)
                pos, _vel = orb.propagate(3600.0)
                sats.append(np.asarray(pos).reshape(-1)[:3])
        sats = np.asarray(sats)
        # keep satellites above the horizon
        up = truth / np.linalg.norm(truth)
        vis = ((sats - truth) @ up) > 0.1 * np.linalg.norm(sats - truth,
                                                          axis=1)
        sats = sats[vis]
        assert len(sats) >= 4, "need visible satellites from the model"
        rho = np.linalg.norm(sats - truth, axis=1) + 5_000.0
        sol = pvt.solve_position(sats, rho)
        assert np.linalg.norm(sol.position_ecef - truth) < 1e-2
        assert sol.clock_bias_m == pytest.approx(5_000.0, abs=1e-2)
