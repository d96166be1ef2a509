"""Scenario-fidelity tests: receiver trajectory, nav-data overlay, E1C
secondary code, geometry-driven amplitude, multipath presets
(scenario.rs:320-455, satellite_emitter.rs:218-345,
environment/multipath.rs — VERDICT r1 missing #2)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.gnss import acquisition, prn, scenario, tracking

warnings.filterwarnings("ignore", message=".*synthetic codes.*")

MACH3_YAML = "/root/reference/e1c_8prn_60s_mach3_ftwayne_berne.yaml"


# ------------------------------------------------------------- trajectory


def test_trajectory_geometry_known_answer():
    cfg = scenario.load_scenario_yaml(MACH3_YAML)
    traj = cfg.receiver.trajectory
    assert traj is not None
    # YAML header: "~51 km, heading 153°" at Mach 3
    assert abs(traj.distance_m() / 1000.0 - 51.4) < 1.0
    assert abs(traj.heading_deg() - 153.0) < 1.0
    assert traj.speed_mps == 1029.0
    # endpoint interpolation
    assert np.allclose(traj.position_at(0.0), traj.start_lla, atol=1e-9)
    assert np.allclose(traj.position_at(1.0), traj.end_lla, atol=1e-9)
    mid = traj.position_at(0.5)
    assert traj.start_lla[0] > mid[0] > traj.end_lla[0]  # moving south


def test_trajectory_drives_doppler_tracks():
    """Receiver motion changes per-SV Doppler over time; a static
    receiver with the same satellites drifts differently."""
    cfg = scenario.load_scenario_yaml(MACH3_YAML)
    gen = scenario.GnssScenario(cfg)
    st0 = gen.status(0.0)
    st30 = gen.status(30.0)
    # t=0 Doppler equals the commanded YAML values exactly (anchoring)
    for s, cfg_s in zip(st0, gen.satellites):
        assert abs(s["doppler_hz"] - cfg_s.doppler_hz) < 1e-6
    deltas = np.array([b["doppler_hz"] - a["doppler_hz"]
                       for a, b in zip(st0, st30)])
    # all SVs drift, and not identically (geometry-dependent)
    assert np.all(np.abs(deltas) < 500.0)
    assert np.ptp(deltas) > 5.0

    static = scenario.ScenarioConfig(
        satellites=cfg.satellites,
        receiver=scenario.ReceiverConfig(
            lat_deg=cfg.receiver.lat_deg, lon_deg=cfg.receiver.lon_deg,
            alt_m=cfg.receiver.alt_m),
        sample_rate=cfg.sample_rate, start_time_gps_s=cfg.start_time_gps_s,
        duration_s=cfg.duration_s)
    gen2 = scenario.GnssScenario(static)
    d_static = np.array([b["doppler_hz"] - a["doppler_hz"]
                         for a, b in zip(gen2.status(0.0), gen2.status(30.0))])
    # Mach-3 motion contributes extra Doppler drift vs static
    assert np.max(np.abs(deltas - d_static)) > 5.0


# ------------------------------------------------------- nav-data overlay


def _per_period_prompts(rx, code_wave, fs, period_s, n_periods):
    """Correlate each code period against the zero-lag replica."""
    lp = int(round(fs * period_s))
    idx = (np.arange(lp) * scenario.CHIP_RATE * scenario.SUBCHIP / fs
           ).astype(np.int64) % len(code_wave)
    rep = code_wave[idx]
    out = []
    for k in range(n_periods):
        seg = rx[k * lp: (k + 1) * lp]
        out.append(np.vdot(rep.astype(np.complex64), seg))
    return np.asarray(out)


def test_nav_bits_overlay_on_gps():
    """Custom ±1 nav bits modulate the GPS C/A stream at 20 periods/bit
    (satellite_emitter.rs:284-291 nav overlay)."""
    fs = 2.046e6
    bits = (1, -1, -1, 1, -1)
    sat = scenario.SatelliteConfig(signal="GpsL1Ca", prn=7, cn0_dbhz=80.0,
                                   doppler_hz=0.0, range_m=0.0,
                                   nav_data=True, nav_bits=bits)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=fs,
                                  duration_s=0.1, seed=5)
    gen = scenario.GnssScenario(cfg)
    rx = np.asarray(gen.generate(0.1, block_size=1 << 18))
    wave = scenario._spread_waveform(sat)
    prompts = _per_period_prompts(rx, wave, fs, 1023 / 1.023e6, 100)
    signs = np.sign(prompts.real)
    want = np.repeat(np.asarray(bits, np.float64), 20)
    assert np.array_equal(signs, want)


def test_nav_alternating_pattern_default():
    """nav_data without explicit bits uses the reference's alternating
    (bit_idx + prn) % 2 pattern."""
    fs = 2.046e6
    sat = scenario.SatelliteConfig(signal="GpsL1Ca", prn=4, cn0_dbhz=80.0,
                                   doppler_hz=0.0, range_m=0.0,
                                   nav_data=True)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=fs,
                                  duration_s=0.08, seed=6)
    gen = scenario.GnssScenario(cfg)
    rx = np.asarray(gen.generate(0.08, block_size=1 << 18))
    wave = scenario._spread_waveform(sat)
    prompts = _per_period_prompts(rx, wave, fs, 1023 / 1.023e6, 80)
    signs = np.sign(prompts.real)
    # prn=4 even: bit_idx 0 -> +1, bit_idx 1 -> -1, ...
    want = np.repeat([1.0, -1.0, 1.0, -1.0], 20)
    assert np.array_equal(signs, want)


def test_e1c_secondary_code_overlay():
    """E1C periods carry the 25-chip ICD secondary code
    (satellite_emitter.rs:293, galileo_e1_codes.rs:29)."""
    fs = 4.092e6
    sat = scenario.SatelliteConfig(signal="GalileoE1C", prn=3, cn0_dbhz=80.0,
                                   doppler_hz=0.0, range_m=0.0)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=fs,
                                  duration_s=0.1, seed=8)
    gen = scenario.GnssScenario(cfg)
    rx = np.asarray(gen.generate(0.1, block_size=1 << 19))
    wave = scenario._spread_waveform(sat)
    prompts = _per_period_prompts(rx, wave, fs, 4092 / 1.023e6, 25)
    signs = np.sign(prompts.real)
    assert np.array_equal(signs, scenario.E1C_SECONDARY)


def test_lnav_bits_roundtrip_through_scenario_tracking():
    """Acceptance: real LNAV subframe bits overlaid on a scenario-
    generated GPS capture are recovered by DLL/PLL tracking + nav-bit
    extraction (VERDICT r1 next-round #2 'done =' clause)."""
    from r4w_tpu.gnss import nav_message

    fs = 2.046e6
    sub = nav_message.build_subframe(1, tow_count=17)
    bits_pm = tuple(int(b) for b in (1 - 2 * sub[:20]))  # first 20 bits
    sat = scenario.SatelliteConfig(signal="GpsL1Ca", prn=9, cn0_dbhz=60.0,
                                   doppler_hz=800.0, range_m=0.0,
                                   nav_data=True, nav_bits=bits_pm)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=fs,
                                  duration_s=0.42, seed=9)
    gen = scenario.GnssScenario(cfg)
    rx = jnp.asarray(gen.generate(0.42, block_size=1 << 19))
    code = prn.gps_ca_code(9).astype(np.float32)
    tcfg = tracking.TrackingConfig(sample_rate=fs)
    st = tracking.init_state(tcfg, code_phase_chips=0.0, doppler_hz=800.0)
    n_blocks = int(0.42 * fs) // tcfg.block_size
    _st, out = tracking.track(tcfg, st,
                              rx[: n_blocks * tcfg.block_size],
                              jnp.asarray(code))
    prompt_i = np.asarray(out.prompt_i)
    nav = tracking.extract_nav_bits(prompt_i[: 400], bits_per_symbol=20)
    nav = np.asarray(nav)
    want = np.asarray(bits_pm, np.float64)
    # tracking sign ambiguity: accept either polarity
    agree = np.mean(nav == want)
    assert agree > 0.95 or agree < 0.05, f"agree={agree}"


# ------------------------------------------- geometry-driven amplitude


def test_geometry_driven_cn0_when_not_configured():
    """cn0_dbhz=None derives C/N0 from EIRP - FSPL + antenna gain + 204
    (scenario.rs:443-449): GPS-like geometry lands in 30-45 dB-Hz."""
    sat = scenario.SatelliteConfig(signal="GpsL1Ca", prn=1, cn0_dbhz=None,
                                   range_m=23_000_000.0, elevation_deg=45.0,
                                   tx_power_dbw=15.0)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=2.046e6)
    gen = scenario.GnssScenario(cfg)
    st = gen.status(0.0)[0]
    assert 30.0 < st["cn0_dbhz"] < 45.0
    # farther satellite -> lower C/N0 (FSPL)
    sat_far = scenario.SatelliteConfig(
        signal="GpsL1Ca", prn=1, cn0_dbhz=None, range_m=27_000_000.0,
        elevation_deg=45.0, tx_power_dbw=15.0)
    gen2 = scenario.GnssScenario(
        scenario.ScenarioConfig(satellites=(sat_far,), sample_rate=2.046e6))
    assert gen2.status(0.0)[0]["cn0_dbhz"] < st["cn0_dbhz"]


def test_thermal_noise_is_kt_nf():
    """Noise floor follows kT*NF*fs with the +160 dB baseband shift
    (scenario.rs:531-540): doubling NF raises noise rms by 3 dB."""
    sat = scenario.SatelliteConfig(signal="GpsL1Ca", prn=1, cn0_dbhz=10.0,
                                   range_m=0.0)

    def rms(nf):
        cfg = scenario.ScenarioConfig(
            satellites=(sat,), sample_rate=2.046e6, seed=11,
            receiver=scenario.ReceiverConfig(noise_figure_db=nf))
        g = scenario.GnssScenario(cfg)
        x = np.asarray(g.generate_block(50_000))
        return float(np.sqrt(np.mean(np.abs(x) ** 2)))

    r2, r5 = rms(2.0), rms(5.0)
    assert abs(20.0 * np.log10(r5 / r2) - 3.0) < 0.3
    # absolute level: sqrt(kT*NF*fs)*1e8
    want = np.sqrt(1.380649e-23 * 290.0 * 10 ** 0.2 * 2.046e6) * 1e8
    assert abs(r2 / want - 1.0) < 0.05


# ------------------------------------------------------------- multipath


def test_multipath_preset_tables():
    taps = scenario.multipath_taps("suburban", 45.0)
    assert len(taps) == 3 and taps[0] == (0.0, 0.0, 0.0)
    # low elevation strengthens reflections, high weakens them
    low = scenario.multipath_taps("urbancanyon", 10.0)
    high = scenario.multipath_taps("urbancanyon", 80.0)
    assert low[1][1] > high[1][1]
    assert scenario.multipath_taps("opensky", 5.0) == [(0.0, 0.0, 0.0)]


def test_multipath_changes_composite_power():
    """Enabled multipath adds correlated delayed energy: composite power
    ratio matches the sum of tap power coefficients."""
    fs = 5e6
    sat = scenario.SatelliteConfig(signal="GalileoE1C", prn=3, cn0_dbhz=90.0,
                                   range_m=0.0, elevation_deg=45.0)

    def power(enabled):
        cfg = scenario.ScenarioConfig(
            satellites=(sat,), sample_rate=fs, seed=13,
            environment=scenario.EnvironmentConfig(
                multipath_preset="Suburban", multipath_enabled=enabled))
        g = scenario.GnssScenario(cfg)
        x = np.asarray(g.generate_block(100_000))
        return float(np.mean(np.abs(x) ** 2))

    p_off, p_on = power(False), power(True)
    # suburban taps: 1 + 10^-0.6 + 10^-1.2 in power, with cross terms from
    # sub-sample overlap; accept a broad band around the incoherent sum
    assert p_on > p_off * 1.05
    assert p_on < p_off * 2.5


# ---------------------------------------------- secondary-safe acquisition


@pytest.mark.slow
def test_acquisition_align_refine_beats_secondary_transitions():
    """E1C secondary-code sign flips straddle unaligned correlation
    windows and can erase the peak; the alignment verification pass
    (PcpsConfig.align_refine) restores the full non-coherent gain."""
    fs = 4.092e6
    # range chosen so the code boundary lands mid-window (worst case)
    rng = 0.5 * 4092 / 1.023e6 * scenario.LIGHT_SPEED
    sat = scenario.SatelliteConfig(signal="GalileoE1C", prn=3, cn0_dbhz=40.0,
                                   doppler_hz=700.0, range_m=rng)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=fs,
                                  duration_s=0.06, seed=21)
    gen = scenario.GnssScenario(cfg)
    rx = jnp.asarray(gen.generate(0.06, block_size=1 << 18))
    waves = [scenario._spread_waveform(
        scenario.SatelliteConfig(signal="GalileoE1C", prn=p))
        for p in (3, 7)]
    L = int(round(fs * 4092 / 1.023e6))
    codes = acquisition.sampled_code_bank(
        waves, scenario.CHIP_RATE * scenario.SUBCHIP, fs, L, n_subphases=2)
    base = dict(doppler_max_hz=1500.0, doppler_step_hz=250.0,
                threshold=1.0, coherent_periods=14)
    res = acquisition.acquire(
        rx, codes, [3, 7], fs, acquisition.PcpsConfig(**base))
    off = acquisition.acquire(
        rx, codes, [3, 7], fs,
        acquisition.PcpsConfig(**base, align_refine=False))
    assert bool(res.detected[0])
    assert not bool(res.detected[1])
    assert abs(float(res.doppler_hz[0]) - 700.0) <= 250.0
    # the refined metric strictly improves on the unaligned one here
    assert float(res.peak_metric[0]) > float(off.peak_metric[0])


# -------------------------------------------------------- YAML parsing


def test_mach3_yaml_full_parse():
    cfg = scenario.load_scenario_yaml(MACH3_YAML)
    assert len(cfg.satellites) == 8
    assert cfg.seed == 42  # output.seed, not top-level
    assert cfg.start_time_gps_s == 1442003372.627
    assert cfg.environment.multipath_preset == "OpenSky"
    assert not cfg.environment.multipath_enabled
    assert cfg.receiver.antenna == "patch"
    assert cfg.receiver.antenna_peak_gain_dbi == 5.0


# ------------------------------------------------- checkpoint/resume


def test_scenario_checkpoint_resume_bit_identical():
    """generate → state() → (fresh scenario) restore → generate
    continues the capture bit-identically (SURVEY §5.4 persistence:
    long scenario runs survive process restarts)."""
    import json

    sat = scenario.SatelliteConfig(signal="GalileoE1C", prn=5,
                                   cn0_dbhz=40.0, doppler_hz=900.0,
                                   range_m=2.2e7, orbital_dynamics=True)
    cfg = scenario.ScenarioConfig(satellites=(sat,), sample_rate=4.092e6,
                                  duration_s=0.1, seed=11)
    blk = 1 << 16
    fs = cfg.sample_rate
    # checkpoints must land on block boundaries: per-block noise draws
    # and Doppler-ramp endpoints depend on the block partitioning
    dur2 = (2 * blk + 0.25) / fs  # exactly 2 blocks after int()

    ref = scenario.GnssScenario(cfg)
    whole = np.asarray(ref.generate(2 * dur2, block_size=blk))

    g1 = scenario.GnssScenario(cfg)
    first = np.asarray(g1.generate(dur2, block_size=blk))
    snap = json.loads(json.dumps(g1.state()))  # via-JSON roundtrip
    g2 = scenario.GnssScenario(cfg).restore(snap)
    second = np.asarray(g2.generate(dur2, block_size=blk))

    resumed = np.concatenate([first, second])
    assert resumed.shape == whole.shape
    np.testing.assert_array_equal(resumed, whole)


class TestAnchoredOrbitalConsistency:
    def test_anchored_range_rate_matches_anchored_doppler(self):
        """Orbital anchoring must keep code and carrier physically
        consistent: d(range)/dt == −doppler·c/f at all times, even when
        the YAML's configured t=0 Doppler differs from this
        propagator's orbital value (regression: un-anchored range made
        the generated code phase sawtooth against the carrier by up to
        40 subchips/s — one E1C SV untrackable, ~3 dB loss on all)."""
        from r4w_tpu.gnss import scenario as sc

        sat = sc.SatelliteConfig(
            signal="GalileoE1C", prn=5, cn0_dbhz=40.0,
            doppler_hz=2500.0, range_m=2.3e7, elevation_deg=30.0,
            plane=1, slot=3, orbital_dynamics=True)
        cfg = sc.ScenarioConfig(satellites=(sat,), sample_rate=4.092e6,
                                seed=1)
        gen = sc.GnssScenario(cfg)
        # configured Doppler wildly differs from the orbital t0 value
        assert abs(float(gen._orb_dop_t0[0]) - 2500.0) > 100.0
        for t0, dt in ((0.0, 0.5), (1.0, 0.25), (5.0, 1.0)):
            d0, r0, _, _ = gen._sat_state(t0)
            d1, r1, _, _ = gen._sat_state(t0 + dt)
            rr = (r1[0] - r0[0]) / dt
            want = -0.5 * (d0[0] + d1[0]) * sc.LIGHT_SPEED \
                / sc.GALILEO_E1_HZ
            assert abs(rr - want) < 0.5, (t0, rr, want)

    def test_anchored_t0_values_still_match_config(self):
        from r4w_tpu.gnss import scenario as sc

        sat = sc.SatelliteConfig(
            signal="GalileoE1C", prn=5, cn0_dbhz=40.0,
            doppler_hz=-1800.0, range_m=2.4e7, elevation_deg=25.0,
            plane=2, slot=5, orbital_dynamics=True)
        cfg = sc.ScenarioConfig(satellites=(sat,), sample_rate=4.092e6,
                                seed=2)
        gen = sc.GnssScenario(cfg)
        d0, r0, _, _ = gen._sat_state(0.0)
        assert abs(d0[0] - (-1800.0)) < 1e-6
        assert abs(r0[0] - 2.4e7) < 1e-3
