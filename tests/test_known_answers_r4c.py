"""Round-4 KA batch C: navigation + propagation blocks vs independent
truths — scipy.spatial.transform.Rotation, textbook kinematics, ITU /
Friis / Kepler closed forms.

Targets the thin registry tails quaternion_attitude_tracker,
inertial_nav_processor, magnetometer_vector_rotator,
particle_filter_tracker, digital_twin_state_observer,
spatio_temporal_fusion, satellite_tle_propagator,
satellite_link_predictor, link_budget_optimizer,
troposcatter_propagation, free_space_optical_channel,
multipath_equalizer_sparse, dynamic_channel (VERDICT r3 weak #2).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax

from r4w_tpu.ops import navigation as NAV
from r4w_tpu.ops import propagation as P


# ------------------------------------------------------ quaternion core


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quat_rotate_matches_scipy_rotation(seed):
    """Hamilton wxyz quaternion rotation == scipy (xyzw) Rotation."""
    rng = np.random.default_rng(seed)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    v = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(NAV.quat_rotate(q.astype(np.float32), v))
    ref = Rotation.from_quat([q[1], q[2], q[3], q[0]]).apply(v)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_quat_multiply_composes_like_scipy():
    rng = np.random.default_rng(5)
    qa = rng.standard_normal(4); qa /= np.linalg.norm(qa)
    qb = rng.standard_normal(4); qb /= np.linalg.norm(qb)
    got = np.asarray(NAV.quat_multiply(qa.astype(np.float32),
                                       qb.astype(np.float32)))
    ra = Rotation.from_quat([qa[1], qa[2], qa[3], qa[0]])
    rb = Rotation.from_quat([qb[1], qb[2], qb[3], qb[0]])
    rc = (ra * rb).as_quat()          # xyzw
    ref = np.asarray([rc[3], rc[0], rc[1], rc[2]])
    if np.sign(ref[0]) != np.sign(got[0]):
        ref = -ref                     # double-cover sign freedom
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_quat_to_euler_matches_scipy_zyx():
    rng = np.random.default_rng(9)
    eul = rng.uniform(-1.0, 1.0, 3)    # roll, pitch, yaw (safe range)
    r = Rotation.from_euler("ZYX", [eul[2], eul[1], eul[0]])
    xyzw = r.as_quat()
    q = np.asarray([xyzw[3], xyzw[0], xyzw[1], xyzw[2]], np.float32)
    roll, pitch, yaw = NAV.quat_to_euler(q)
    np.testing.assert_allclose(
        [float(roll), float(pitch), float(yaw)], eul, atol=1e-5)


# --------------------------------------------------- attitude/strapdown


def test_mahony_integrates_constant_yaw_rate():
    """Pure z-rotation at 0.5 rad/s with gravity along -z body (level):
    yaw after T seconds = omega*T; roll/pitch stay ~0."""
    dt, n, omega = 0.01, 400, 0.5
    gyro = np.tile([0.0, 0.0, omega], (n, 1)).astype(np.float32)
    accel = np.tile([0.0, 0.0, 9.81], (n, 1)).astype(np.float32)
    track = np.asarray(NAV.attitude_track_mahony(gyro, accel, dt))
    roll, pitch, yaw = NAV.quat_to_euler(track[-1])
    assert abs(float(yaw) - omega * n * dt) < 0.02
    assert abs(float(roll)) < 0.02 and abs(float(pitch)) < 0.02


def test_mahony_levels_from_tilted_start():
    """With zero gyro and gravity measured along a tilted direction the
    accelerometer correction drives the estimate to the true tilt."""
    dt, n = 0.01, 3000
    tilt = 0.3  # rad about body x
    g_body = Rotation.from_euler("x", -tilt).apply([0.0, 0.0, 9.81])
    gyro = np.zeros((n, 3), np.float32)
    accel = np.tile(g_body, (n, 1)).astype(np.float32)
    track = np.asarray(NAV.attitude_track_mahony(gyro, accel, dt,
                                                 kp=2.0))
    roll, pitch, _ = NAV.quat_to_euler(track[-1])
    assert abs(abs(float(roll)) - tilt) < 0.03
    assert abs(float(pitch)) < 0.03


def test_strapdown_constant_accel_quadratic_position():
    """Level vehicle, constant 2 m/s² along body-x, no rotation:
    p(T) = ½aT² and v(T) = aT (discrete-Euler exact sums)."""
    dt, n, a = 0.01, 500, 2.0
    accel = np.tile([a, 0.0, 9.81], (n, 1)).astype(np.float32)
    gyro = np.zeros((n, 3), np.float32)
    ps, vs, qs = NAV.strapdown_integrate(accel, gyro, dt)
    v_end = float(np.asarray(vs)[-1, 0])
    p_end = float(np.asarray(ps)[-1, 0])
    T = n * dt
    assert abs(v_end - a * T) < 1e-3
    # Euler sum: p = a·dt²·Σk = a·dt²·n(n+1)/2
    p_exact = a * dt * dt * n * (n + 1) / 2
    assert abs(p_end - p_exact) < 1e-3
    # attitude unchanged, z-position unchanged (gravity cancels)
    assert abs(float(np.asarray(ps)[-1, 2])) < 1e-2


def test_imu_aided_update_exact_blend():
    p = np.asarray([10.0, 0.0, 0.0], np.float32)
    f = np.asarray([20.0, 0.0, 0.0], np.float32)
    blended, _ = NAV.imu_aided_update(p, [0, 0, 0], f, fix_weight=0.25)
    np.testing.assert_allclose(np.asarray(blended), [12.5, 0, 0])


def test_magnetometer_rotate_headings():
    """Identity attitude: mag north -> heading 0; a +90° yaw attitude
    rotates a body-x field to nav-y -> heading -90° (east turn)."""
    north = np.asarray([1.0, 0.0, 0.0], np.float32)
    _, h0 = NAV.magnetometer_rotate(north, [1.0, 0.0, 0.0, 0.0])
    assert abs(float(h0)) < 1e-6
    yaw90 = Rotation.from_euler("z", np.pi / 2).as_quat()  # xyzw
    q = [yaw90[3], yaw90[0], yaw90[1], yaw90[2]]
    m_nav, h = NAV.magnetometer_rotate(north, q)
    np.testing.assert_allclose(np.asarray(m_nav), [0, 1, 0], atol=1e-6)
    assert abs(float(h) + np.pi / 2) < 1e-5


# -------------------------------------------- estimators and observers


def test_particle_filter_beats_raw_measurement_noise():
    """CV target: posterior-mean track RMSE must be well below the
    r_std measurement noise it is given (filtering gain)."""
    rng = np.random.default_rng(17)
    n, r_std = 200, 2.0
    truth = 0.5 * np.arange(n)
    z = (truth + r_std * rng.standard_normal(n)).astype(np.float32)
    est = np.asarray(NAV.particle_filter_track(
        z, jax.random.PRNGKey(0), n_particles=1024, q_std=0.05,
        r_std=r_std))
    rmse = np.sqrt(np.mean((est[50:] - truth[50:]) ** 2))
    assert rmse < 0.6 * r_std


def test_luenberger_observer_matches_numpy_recursion_and_converges():
    """x̂ₖ₊₁ = A x̂ₖ + B uₖ + L(yₖ − C x̂ₖ) — exact recursion match,
    and the estimate converges to the true state of the plant."""
    a = np.asarray([[0.95, 0.1], [0.0, 0.9]], np.float32)
    b = np.asarray([[0.0], [1.0]], np.float32)
    c = np.asarray([1.0, 0.0], np.float32)
    l_gain = np.asarray([0.4, 0.3], np.float32)
    n = 120
    u = 0.1 * np.ones((n, 1), np.float32)
    # simulate the true plant from a nonzero initial state
    x_true = np.zeros((n, 2))
    x = np.asarray([3.0, -1.0])
    for k in range(n):
        x_true[k] = x
        x = a @ x + b[:, 0] * u[k, 0]
    y = x_true[:, 0].astype(np.float32)
    got = np.asarray(NAV.luenberger_observe(y, a, b, c, l_gain, u))
    # exact numpy recursion
    xh = np.zeros(2)
    ref = np.zeros((n, 2))
    for k in range(n):
        xh = a @ xh + b[:, 0] * u[k, 0] + l_gain * (y[k] - c @ xh)
        ref[k] = xh
    np.testing.assert_allclose(got, ref, atol=1e-3)
    assert np.abs(got[-1] - x_true[-1]).max() < 0.05


def test_spatio_temporal_fuse_inverse_variance_exact():
    tracks = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)  # (S,T)
    var = np.asarray([1.0, 4.0], np.float32)
    fused, fvar = NAV.spatio_temporal_fuse(tracks, var)
    w = 1 / var
    ref = (tracks * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose(np.asarray(fused), ref, rtol=1e-6)
    assert abs(float(fvar) - 1 / w.sum()) < 1e-6


# ------------------------------------------------- propagation physics


def test_fspl_known_value_2g4_1km():
    """Textbook: FSPL(1 km, 2.4 GHz) = 32.44 + 20log10(f_MHz·d_km)
    = 100.05 dB."""
    assert abs(float(P.fspl_db(1000.0, 2.4e9)) - 100.05) < 0.05


def test_link_budget_noise_floor_is_ktb():
    lb = P.link_budget(10.0, 0.0, 0.0, 1e3, 1e9, 1e6,
                       system_temp_k=290.0)
    # kT at 290 K = -203.98 dBW/Hz; B=1 MHz adds 60 dB
    assert abs(lb["noise_dbw"] - (-143.98)) < 0.05
    assert abs((lb["cn0_dbhz"] - lb["cn_db"]) - 60.0) < 1e-6


def test_link_budget_optimize_closes_the_loop():
    """Feeding the solved TX power back must hit required C/N + margin
    exactly."""
    need = P.link_budget_optimize(5e4, 2.0e9, 5e6, required_cn_db=10.0,
                                  margin_db=3.0)
    lb = P.link_budget(float(need), 0.0, 0.0, 5e4, 2.0e9, 5e6)
    assert abs(lb["cn_db"] - 13.0) < 1e-6


def test_troposcatter_loss_scaling_laws():
    """NBS-101 form: +30 dB/decade in f and θ, +10 dB/decade in d."""
    base = P.troposcatter_loss_db(100.0, 900.0, 10.0)
    assert abs(P.troposcatter_loss_db(1000.0, 900.0, 10.0)
               - base - 10.0) < 1e-9
    assert abs(P.troposcatter_loss_db(100.0, 9000.0, 10.0)
               - base - 30.0) < 1e-9
    assert abs(P.troposcatter_loss_db(100.0, 900.0, 100.0)
               - base - 30.0) < 1e-9


def test_fso_margin_decreases_with_range_and_fog():
    m1 = P.fso_link_margin_db(20.0, 500.0, visibility_km=10.0)
    m2 = P.fso_link_margin_db(20.0, 2000.0, visibility_km=10.0)
    m3 = P.fso_link_margin_db(20.0, 500.0, visibility_km=0.5)
    assert m2 < m1 and m3 < m1
    # Kruse term alone: 13/V dB per km — range 500 m at V=0.5 km
    # costs 13.0 dB vs 0.65 dB at V=10 -> ~12.35 dB margin delta
    assert abs((m1 - m3) - (13.0 / 0.5 - 13.0 / 10.0) * 0.5) < 1e-6


def test_hata_urban_against_published_example():
    """Okumura-Hata urban, f=900 MHz, h_b=30 m, h_m=1.5 m, d=5 km:
    the published formula evaluates to 151.02 dB."""
    loss = P.propagation_loss_db("hata_urban", 5000.0, 900e6,
                                 h_tx_m=30.0, h_rx_m=1.5)
    f, hb, hm, d = 900.0, 30.0, 1.5, 5.0
    a_hm = (1.1 * np.log10(f) - 0.7) * hm - (1.56 * np.log10(f) - 0.8)
    ref = (69.55 + 26.16 * np.log10(f) - 13.82 * np.log10(hb) - a_hm
           + (44.9 - 6.55 * np.log10(hb)) * np.log10(d))
    assert abs(loss - ref) < 1e-6
    assert abs(loss - 151.02) < 0.05


# ------------------------------------------------------- orbits/passes


def _circular_tle(mean_motion_rev_day=15.5, inc_deg=51.6):
    return P.Tle(inclination_deg=inc_deg, raan_deg=0.0,
                 eccentricity=0.0, arg_perigee_deg=0.0,
                 mean_anomaly_deg=0.0,
                 mean_motion_rev_day=mean_motion_rev_day)


def test_tle_propagate_radius_matches_keplers_third_law():
    """Circular orbit: r = (μ/n²)^⅓ for every sample; ISS-like
    15.5 rev/day -> a ≈ 6793 km."""
    tle = _circular_tle()
    t = np.linspace(0, 3000.0, 64)
    pos = np.asarray(P.tle_propagate(tle, t), np.float64)
    r = np.linalg.norm(pos, axis=-1)
    mu = 3.986004418e14
    n_rad = 15.5 * 2 * np.pi / 86400.0
    a = (mu / n_rad**2) ** (1 / 3)
    assert abs(a - 6.793e6) < 2e4
    np.testing.assert_allclose(r, a, rtol=2e-5)


def test_tle_propagate_period_and_inclination():
    tle = _circular_tle()
    T = 86400.0 / 15.5
    p0 = np.asarray(P.tle_propagate(tle, [0.0]))[0]
    p1 = np.asarray(P.tle_propagate(tle, [T]))[0]
    assert np.linalg.norm(p1 - p0) < 0.02 * np.linalg.norm(p0)
    # |z|max over the orbit = a·sin(i)
    t = np.linspace(0, T, 512)
    pos = np.asarray(P.tle_propagate(tle, t), np.float64)
    zmax = np.abs(pos[:, 2]).max()
    a = np.linalg.norm(pos, axis=-1).mean()
    assert abs(zmax / a - np.sin(np.deg2rad(51.6))) < 1e-3


def test_tle_parse_iss_line_fields():
    """Real-format ISS TLE lines parse field-exactly."""
    l1 = ("1 25544U 98067A   24001.50000000  .00016717  00000-0  "
          "10270-3 0  9000")
    l2 = ("2 25544  51.6400 208.9163 0006317  69.9862  25.2906 "
          "15.54225995 00000")
    tle = P.Tle.parse(l1, l2)
    assert abs(tle.inclination_deg - 51.64) < 1e-9
    assert abs(tle.eccentricity - 0.0006317) < 1e-9
    assert abs(tle.mean_motion_rev_day - 15.54225995) < 1e-9
    assert tle.epoch_yr == 2024


def test_pass_predict_finds_overhead_window():
    """Site on the equator at x-axis; equatorial circular orbit passes
    directly overhead once per revolution."""
    tle = _circular_tle(inc_deg=0.0)
    site = np.asarray([6.371e6, 0.0, 0.0])
    T = 86400.0 / 15.5
    t = np.linspace(0, T, 2000)
    t0s, t1s, els, valid = P.pass_predict(tle, site, t,
                                          min_elevation_deg=10.0)
    v = np.asarray(valid)
    assert int(np.sum(v)) >= 1
    best = float(np.max(np.asarray(els)[v]))
    assert best > 85.0  # directly overhead at t=0 (MA=0, RAAN=0)


# --------------------------------------------------- channel est/equal


def test_ls_channel_estimate_recovers_known_fir():
    rng = np.random.default_rng(23)
    h = np.asarray([1.0, 0.0, 0.5 - 0.2j, 0.0, -0.1j], np.complex64)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
         ).astype(np.complex64)
    y = np.convolve(x, h)[: x.shape[0]].astype(np.complex64)
    got = np.asarray(P.ls_channel_estimate(x, y, n_taps=5))
    np.testing.assert_allclose(got, h, atol=2e-3)


def test_freq_domain_sound_flat_for_identity_channel():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64)
    h, imp = P.freq_domain_sound(x, x)
    np.testing.assert_allclose(np.asarray(h), 1.0, atol=1e-2)
    imp = np.abs(np.asarray(imp))
    assert imp[0] > 50 * imp[1:].max()


def test_sparse_multipath_equalize_restores_qpsk():
    """Known two-ray channel, circular per-block convolution: ZF with
    the true taps must restore the constellation."""
    rng = np.random.default_rng(31)
    nfft = 1024
    sym = ((rng.integers(0, 2, 4 * nfft) * 2 - 1)
           + 1j * (rng.integers(0, 2, 4 * nfft) * 2 - 1)
           ).astype(np.complex64) / np.sqrt(2)
    taps = [(0, 1.0 + 0j), (7, 0.4 - 0.3j)]
    h = np.zeros(nfft, np.complex64)
    for d, g in taps:
        h[d] = g
    hf = np.fft.fft(h)
    rx = np.fft.ifft(np.fft.fft(sym.reshape(-1, nfft), axis=-1) * hf,
                     axis=-1).reshape(-1).astype(np.complex64)
    eq = np.asarray(P.sparse_multipath_equalize(rx, taps, nfft))
    evm = np.sqrt(np.mean(np.abs(eq - sym) ** 2))
    assert evm < 0.1


def test_dynamic_channel_markov_occupancy():
    """Two-state Markov chain: stationary bad-state probability =
    p_gb/(p_gb+p_bg); long-run SNR trace must match it."""
    ch = P.DynamicChannel(snr_good_db=20.0, snr_bad_db=0.0,
                          p_gb=0.05, p_bg=0.3, seed=42)
    trace = np.asarray([ch.step() for _ in range(30000)])
    frac_bad = float((trace == 0.0).mean())
    expect = 0.05 / 0.35
    assert abs(frac_bad - expect) < 0.02
    # deterministic given seed
    ch2 = P.DynamicChannel(snr_good_db=20.0, snr_bad_db=0.0,
                           p_gb=0.05, p_bg=0.3, seed=42)
    trace2 = np.asarray([ch2.step() for _ in range(100)])
    np.testing.assert_array_equal(trace[:100], trace2)


def test_rain_attenuation_power_law_shape():
    """ITU-R P.838 form γ = k·R^α: log-linear in rain rate; at
    20 GHz / 25 mm/h the specific attenuation is a few dB/km
    (P.838-3 H-pol gives ≈2.6 dB/km; the compact fit must land in
    the same decade)."""
    g1 = P.rain_attenuation_db_per_km(10.0, 20.0)
    g2 = P.rain_attenuation_db_per_km(40.0, 20.0)
    g3 = P.rain_attenuation_db_per_km(160.0, 20.0)
    # power law: equal ratios for equal rate ratios
    assert abs((g2 / g1) - (g3 / g2)) < 0.05 * (g2 / g1)
    assert 1.0 < P.rain_attenuation_db_per_km(25.0, 20.0) < 5.0
    # increasing in frequency through Ku/Ka
    assert P.rain_attenuation_db_per_km(25.0, 30.0) > \
        P.rain_attenuation_db_per_km(25.0, 12.0)
