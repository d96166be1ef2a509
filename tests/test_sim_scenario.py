"""Multi-emitter scenario engine tests (VERDICT r1 component 44:
Emitter/Trajectory engine, scenario/engine.rs:273)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.sim.scenario import (
    BaseEmitter,
    NoiseJammerEmitter,
    SceneConfig,
    ScenarioEngine,
    SweepJammerEmitter,
    ToneEmitter,
    Trajectory,
    WaveformEmitter,
    SPEED_OF_LIGHT,
)


def _peak_freq(x, fs):
    spec = np.abs(np.fft.fft(np.asarray(x)))
    k = int(np.argmax(spec))
    n = len(x)
    return (k - n if k > n // 2 else k) * fs / n


class TestTrajectory:
    def test_static(self):
        tr = Trajectory.static(45.0, 7.0, 100.0)
        s0, s1 = tr.state_at(0.0), tr.state_at(100.0)
        assert np.allclose(s0.position_ecef, s1.position_ecef)
        assert np.allclose(s0.velocity_ecef, 0.0)

    def test_linear_northward(self):
        tr = Trajectory.linear(45.0, 7.0, 0.0, (0.0, 100.0, 0.0))
        s = tr.state_at(10.0)
        moved = np.linalg.norm(
            s.position_ecef - tr.state_at(0.0).position_ecef)
        assert moved == pytest.approx(1000.0, rel=1e-6)
        assert np.linalg.norm(s.velocity_ecef) == pytest.approx(100.0,
                                                               rel=1e-9)

    def test_waypoints_interpolation(self):
        tr = Trajectory.from_waypoints([
            (0.0, 45.0, 7.0, 0.0), (10.0, 45.0, 7.1, 0.0)])
        mid = tr.state_at(5.0).position_ecef
        a = tr.state_at(0.0).position_ecef
        b = tr.state_at(10.0).position_ecef
        assert np.allclose(mid, (a + b) / 2.0, atol=1e-6)
        # clamped outside the range
        assert np.allclose(tr.state_at(-5.0).position_ecef, a)
        assert np.allclose(tr.state_at(50.0).position_ecef, b)

    def test_circular_period(self):
        omega = 2 * np.pi / 60.0  # one revolution per minute
        tr = Trajectory.circular(45.0, 7.0, 0.0, radius_m=500.0,
                                 omega_rad_s=omega)
        p0 = tr.state_at(0.0).position_ecef
        p_full = tr.state_at(60.0).position_ecef
        p_half = tr.state_at(30.0).position_ecef
        assert np.allclose(p0, p_full, atol=1e-3)
        assert np.linalg.norm(p_half - p0) == pytest.approx(1000.0, rel=1e-3)
        # tangential speed = r·ω
        v = np.linalg.norm(tr.state_at(0.0).velocity_ecef)
        assert v == pytest.approx(500.0 * omega, rel=1e-6)


class TestGeometry:
    def test_doppler_from_approach_speed(self):
        """Emitter closing at 100 m/s radially -> f_d = v·f/c."""
        cfg = SceneConfig(sample_rate=1e6, duration_s=0.01)
        # receiver at origin; emitter 10 km east moving west (toward rx)
        rx = Trajectory.static(45.0, 7.0, 0.0)
        em = ToneEmitter(
            id="t", carrier_hz=1e9, power_dbm=30.0,
            trajectory=Trajectory.linear(45.0, 7.1272, 0.0,
                                         (-100.0, 0.0, 0.0)))
        eng = ScenarioEngine(cfg, [em], rx)
        st = eng.emitter_status(0.0)[0]
        expected = 100.0 * 1e9 / SPEED_OF_LIGHT  # ~333.6 Hz
        assert st.doppler_hz == pytest.approx(expected, rel=0.05)
        assert st.range_m == pytest.approx(10_000, rel=0.01)

    def test_fspl_power(self):
        cfg = SceneConfig()
        em = ToneEmitter(id="t", carrier_hz=1e9, power_dbm=30.0,
                         trajectory=Trajectory.static(45.0, 7.0127, 0.0))
        eng = ScenarioEngine(cfg, [em], Trajectory.static(45.0, 7.0, 0.0))
        st = eng.emitter_status(0.0)[0]
        # FSPL(1 km, 1 GHz) = 92.45 dB
        assert st.path_loss_db == pytest.approx(92.45, abs=0.3)
        assert st.received_power_dbm == pytest.approx(30.0 - st.path_loss_db)


class TestEngine:
    def _tone_scene(self, offset_hz=10_000.0, vel=(0.0, 0.0, 0.0)):
        cfg = SceneConfig(sample_rate=250_000.0, duration_s=0.05,
                          block_size=4096, noise_figure_db=6.0)
        em = ToneEmitter(id="tone", carrier_hz=1e9, power_dbm=30.0,
                         offset_hz=offset_hz,
                         trajectory=Trajectory.linear(45.0, 7.0127, 0.0,
                                                      vel))
        eng = ScenarioEngine(cfg, [em], Trajectory.static(45.0, 7.0, 0.0),
                             reference_power_dbm=-70.0)
        return eng

    def test_tone_with_doppler(self):
        v = -300.0  # closing at 300 m/s (east->west toward rx)
        eng = self._tone_scene(offset_hz=10_000.0, vel=(v, 0.0, 0.0))
        iq = eng.generate_all()
        dop = 300.0 * 1e9 / SPEED_OF_LIGHT  # ~1000.6 Hz
        got = _peak_freq(iq, 250_000.0)
        assert got == pytest.approx(10_000.0 + dop, abs=100.0)

    def test_block_phase_continuity(self):
        eng = self._tone_scene(offset_hz=5000.0)
        a = np.asarray(eng.generate_block(2048))
        b = np.asarray(eng.generate_block(2048))
        x = np.concatenate([a, b])
        # instantaneous frequency stays near 5 kHz across the boundary
        d = np.angle(x[1:] * np.conj(x[:-1]))
        f_inst = d * 250_000.0 / (2 * np.pi)
        boundary = f_inst[2040:2056]
        assert np.all(np.abs(boundary - 5000.0) < 500.0)

    def test_power_scaling_between_emitters(self):
        cfg = SceneConfig(sample_rate=250_000.0, duration_s=0.02)
        mk = lambda dbm, off, name: ToneEmitter(
            id=name, carrier_hz=1e9, power_dbm=dbm, offset_hz=off,
            trajectory=Trajectory.static(45.0, 7.0127, 0.0))
        eng = ScenarioEngine(cfg, [mk(30.0, 10e3, "strong"),
                                   mk(10.0, -30e3, "weak")],
                             Trajectory.static(45.0, 7.0, 0.0),
                             reference_power_dbm=-70.0)
        iq = np.asarray(eng.generate_all())
        spec = np.abs(np.fft.fft(iq)) ** 2
        n = len(iq)
        k_strong = int(round(10e3 / 250e3 * n))
        k_weak = (int(round(-30e3 / 250e3 * n)) + n) % n
        ratio_db = 10 * np.log10(spec[k_strong] / spec[k_weak])
        assert ratio_db == pytest.approx(20.0, abs=1.5)

    def test_emitter_activity_window(self):
        cfg = SceneConfig(sample_rate=100_000.0, duration_s=0.02,
                          block_size=1000)
        em = ToneEmitter(id="burst", carrier_hz=1e9, power_dbm=40.0,
                         offset_hz=10e3, t_on=0.01,
                         trajectory=Trajectory.static(45.0, 7.01, 0.0))
        eng = ScenarioEngine(cfg, [em], Trajectory.static(45.0, 7.0, 0.0),
                             reference_power_dbm=-70.0)
        iq = np.asarray(eng.generate_all())
        first = np.mean(np.abs(iq[:900]) ** 2)
        second = np.mean(np.abs(iq[1100:2000]) ** 2)
        assert second > 10 * first  # emitter switches on at t=10 ms

    def test_waveform_emitter_decodable(self):
        payload = bytes([0xC4, 0x7E])
        cfg = SceneConfig(sample_rate=125_000.0, duration_s=0.05,
                          noise_figure_db=3.0)
        em = WaveformEmitter(id="bpsk", carrier_hz=433e6, power_dbm=30.0,
                             waveform_name="BPSK", payload=payload,
                             sample_rate=125_000.0,
                             trajectory=Trajectory.static(45.0, 7.001, 0.0))
        eng = ScenarioEngine(cfg, [em], Trajectory.static(45.0, 7.0, 0.0),
                             reference_power_dbm=-40.0)
        iq = eng.generate_all()
        from r4w_tpu.waveforms import create_waveform

        wf = create_waveform("BPSK", 125_000.0)
        burst_len = len(em._burst)
        res = wf.demodulate(iq[:burst_len])
        assert np.asarray(res.bits)[:2].tolist() == list(payload)

    def test_noise_jammer_raises_floor(self):
        cfg = SceneConfig(sample_rate=250_000.0, duration_s=0.02)
        quiet = ScenarioEngine(cfg, [], Trajectory.static(45.0, 7.0, 0.0))
        jam = ScenarioEngine(
            cfg,
            [NoiseJammerEmitter(id="j", carrier_hz=1e9, power_dbm=40.0,
                                trajectory=Trajectory.static(45.0, 7.01,
                                                             0.0))],
            Trajectory.static(45.0, 7.0, 0.0), reference_power_dbm=-70.0)
        p_quiet = float(jnp.mean(jnp.abs(quiet.generate_all()) ** 2))
        p_jam = float(jnp.mean(jnp.abs(jam.generate_all()) ** 2))
        assert p_jam > 100 * p_quiet

    def test_sweep_jammer_covers_band(self):
        cfg = SceneConfig(sample_rate=250_000.0, duration_s=0.02)
        em = SweepJammerEmitter(id="sw", carrier_hz=1e9, power_dbm=40.0,
                                sweep_hz=100e3, period_s=0.01,
                                trajectory=Trajectory.static(45.0, 7.01,
                                                             0.0))
        eng = ScenarioEngine(cfg, [em], Trajectory.static(45.0, 7.0, 0.0),
                             reference_power_dbm=-70.0)
        iq = np.asarray(eng.generate_all())
        d = np.angle(iq[1:] * np.conj(iq[:-1]))
        f_inst = d * 250e3 / (2 * np.pi)
        # the sweep should traverse most of ±50 kHz
        assert f_inst.max() > 30e3 and f_inst.min() < -30e3

    def test_progress_and_reset(self):
        eng = self._tone_scene()
        assert eng.progress == 0.0 and not eng.is_done
        eng.generate_all()
        assert eng.is_done and eng.progress == 1.0
        eng.reset()
        assert eng.progress == 0.0
