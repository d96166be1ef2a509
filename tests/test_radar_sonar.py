"""Tests for radar/sonar/lidar fills (radar_sonar.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import radar_sonar as rs


def _chirp(n, k=0.5):
    t = np.arange(n) / n
    return np.exp(1j * np.pi * k * n * t * t).astype(np.complex64)


def _pd_cube(n_pulses=32, n_range=128, tgt_rng=40, tgt_dop_cyc=0.2,
             replica=None, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    rep = replica if replica is not None else _chirp(16)
    cube = noise * (rng.standard_normal((n_pulses, n_range))
                    + 1j * rng.standard_normal((n_pulses, n_range)))
    for p in range(n_pulses):
        phase = np.exp(2j * np.pi * tgt_dop_cyc * p)
        cube[p, tgt_rng:tgt_rng + rep.shape[0]] += rep * phase
    return cube.astype(np.complex64), rep


class TestPulseDoppler:
    def test_pd_map_peak_location(self):
        cube, rep = _pd_cube()
        rd = np.asarray(rs.pulse_doppler_process(jnp.asarray(cube),
                                                 jnp.asarray(rep)))
        k = np.unravel_index(np.argmax(rd), rd.shape)
        # Doppler 0.2 cyc/pulse over 32 pulses -> bin 16+6=22 shifted
        assert abs(k[0] - (16 + round(0.2 * 32))) <= 1
        assert abs(k[1] - 40) <= 1

    def test_rd_detector_flags_target(self):
        cube, rep = _pd_cube()
        rd, det = rs.range_doppler_detect(jnp.asarray(cube),
                                          jnp.asarray(rep))
        d = np.asarray(det)
        k = np.unravel_index(np.argmax(np.asarray(rd)), d.shape)
        assert d[k]
        assert d.sum() < 0.02 * d.size

    def test_range_migration_straightens(self):
        # target walking 0.5 bins/pulse
        n_pulses, n_range = 16, 128
        cube = np.zeros((n_pulses, n_range), np.complex64)
        for p in range(n_pulses):
            # fractional shift via frequency ramp
            f = np.fft.fftfreq(n_range)
            imp = np.fft.ifft(np.exp(-2j * np.pi * f * (30 + 0.5 * p)))
            cube[p] = imp
        fixed = np.asarray(rs.range_migration_correct(
            jnp.asarray(cube), -0.5))
        peaks = np.argmax(np.abs(fixed), axis=-1)
        assert np.all(peaks == peaks[0])

    def test_doppler_estimators(self):
        fs = 1000.0
        t = np.arange(512) / fs
        x = np.exp(2j * np.pi * 37.0 * t).astype(np.complex64)
        est = float(rs.parametric_doppler_estimate(jnp.asarray(x), fs))
        assert abs(est - 37.0) < 1.0
        bursts = np.stack([x[:128], x[:128] * np.exp(1j * 0.1)])
        v = np.asarray(rs.tracking_doppler_estimate(jnp.asarray(bursts),
                                                    fs))
        assert np.all(np.abs(v - 37.0) < 2.0)

    def test_doppler_pre_correct(self):
        fs = 1000.0
        t = np.arange(256) / fs
        x = np.exp(2j * np.pi * 50 * t).astype(np.complex64)
        y = np.asarray(rs.doppler_pre_correct(jnp.asarray(x), 50.0, fs))
        assert np.abs(np.diff(np.angle(y[10:50]))).max() < 0.01


class TestBistaticIsar:
    def test_bistatic_map_peak_at_delay(self):
        rng = np.random.default_rng(1)
        ref = (rng.standard_normal(1024)
               + 1j * rng.standard_normal(1024)).astype(np.complex64)
        surv = 0.5 * np.roll(ref, 37)
        amb = np.asarray(rs.bistatic_range_doppler(jnp.asarray(ref),
                                                   jnp.asarray(surv),
                                                   n_doppler=8,
                                                   n_range=128))
        k = np.unravel_index(np.argmax(amb), amb.shape)
        assert k[1] == 37

    def test_isar_is_pd_map(self):
        cube, rep = _pd_cube()
        a = np.asarray(rs.isar_image(jnp.asarray(cube), jnp.asarray(rep)))
        b = np.asarray(rs.pulse_doppler_process(jnp.asarray(cube),
                                                jnp.asarray(rep)))
        np.testing.assert_allclose(a, b)


class TestSonar:
    def test_sonar_tvg_and_range_axis(self):
        fs, c = 100e3, 1500.0
        rep = _chirp(64)
        rx = np.zeros(4096, np.complex64)
        rx[1000:1064] = 0.01 * rep  # weak distant echo
        env, rng_axis = rs.sonar_process(jnp.asarray(rx),
                                         jnp.asarray(rep), fs, c)
        env = np.asarray(env)
        assert abs(np.argmax(env) - 1000) <= 2
        assert abs(float(rng_axis[1000]) - 1000 * c / (2 * fs)) < 1e-3

    def test_bottom_profiler(self):
        fs, c = 100e3, 1500.0
        pings = np.zeros((3, 2048), np.complex64)
        for i, d in enumerate((400, 500, 600)):
            pings[i, d:d + 20] = 1.0
        depth = np.asarray(rs.bottom_profile(jnp.asarray(pings), fs, c))
        want = np.array([400, 500, 600]) * c / (2 * fs)
        np.testing.assert_allclose(depth, want, atol=0.1)

    def test_sas_focuses_point_target(self):
        fs, c = 100e3, 1500.0
        rep = _chirp(32)
        positions = np.linspace(-2.0, 2.0, 16)
        tgt_x, tgt_r = 0.3, 12.0
        pings = np.zeros((16, 4096), np.complex64)
        for i, px in enumerate(positions):
            rng = np.sqrt((tgt_x - px) ** 2 + tgt_r ** 2)
            k = int(2 * rng / c * fs)
            pings[i, k:k + 32] += rep
        img = np.asarray(rs.sas_image(jnp.asarray(pings),
                                      jnp.asarray(rep),
                                      positions,
                                      np.linspace(-1.0, 1.0, 21),
                                      np.linspace(11.0, 13.0, 21),
                                      c=c, fs=fs))
        k = np.unravel_index(np.argmax(img), img.shape)
        # peak near x=0.3 (index ~13 of 21), r=12 (index ~10 of 21)
        assert abs(k[0] - 13) <= 2 and abs(k[1] - 10) <= 2


class TestDisplayClassify:
    def test_ppi_maps_north(self):
        scan = np.zeros((360, 64), np.float32)
        scan[90, 32] = 1.0  # azimuth 90 deg, mid range
        img = np.asarray(rs.radar_display_ppi(jnp.asarray(scan), 101))
        k = np.unravel_index(np.argmax(img), img.shape)
        # angle 90 deg -> +y direction, x ~ center
        assert abs(k[1] - 50) <= 2 and k[0] > 60

    @pytest.mark.slow
    def test_waveform_classifier(self):
        fs = 1e6
        n = 4096
        t = np.arange(n) / fs
        cw = np.exp(2j * np.pi * 1e3 * t).astype(np.complex64)
        lfm = _chirp(n, k=0.8)
        rng = np.random.default_rng(2)
        barker = np.repeat(np.array([1, 1, 1, -1, -1, 1, -1] * 32),
                           16).astype(np.complex64)[:n]
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)).astype(np.complex64)
        assert rs.radar_waveform_classify(jnp.asarray(cw), fs) == "cw"
        assert rs.radar_waveform_classify(jnp.asarray(lfm), fs) == "lfm"
        assert rs.radar_waveform_classify(jnp.asarray(noise), fs) == \
            "noise"
        assert rs.radar_waveform_classify(jnp.asarray(barker), fs) in (
            "phase-coded", "cw")

    def test_pdw_extraction(self):
        fs = 1e6
        x = np.zeros(4096, np.complex64)
        t = np.arange(200) / fs
        x[500:700] = np.exp(2j * np.pi * 50e3 * t)
        x[2000:2100] = 0.5 * np.exp(2j * np.pi * -30e3 * t[:100])
        toas, widths, amps, freqs, valid = rs.pulse_descriptors(x, fs)
        assert int(np.sum(np.asarray(valid))) == 2
        assert abs(float(toas[0]) - 500e-6) < 5e-6
        assert abs(float(widths[0]) - 200e-6) < 10e-6
        assert abs(float(freqs[0]) - 50e3) < 2e3
        assert abs(float(freqs[1]) + 30e3) < 2e3


class TestAutomotiveLidar:
    def test_fmcw_automotive_angle(self):
        n_rx, n_chirps, n_samp = 4, 16, 64
        cube = np.zeros((n_rx, n_chirps, n_samp), np.complex64)
        # target: range bin 10, doppler 0.25 cyc, AoA phase 0.5 rad/elem
        for a in range(n_rx):
            for p in range(n_chirps):
                ph = 0.5 * a + 2 * np.pi * 0.25 * p
                tone = np.exp(2j * np.pi * 10 * np.arange(n_samp)
                              / n_samp + 1j * ph)
                cube[a, p] = tone
        rd, angle = rs.fmcw_automotive(jnp.asarray(cube))
        k = np.unravel_index(np.argmax(np.asarray(rd)),
                             np.asarray(rd).shape)
        assert k[1] == 10
        assert abs(k[0] - (8 + 4)) <= 1  # doppler 0.25*16=4, shifted
        assert np.asarray(angle).argmax() != 32  # off-boresight

    def test_lidar_peaks_and_cloud(self):
        tpl = np.exp(-0.5 * ((np.arange(21) - 10) / 3.0) ** 2)
        w = np.zeros(512)
        w[100:121] += tpl
        w[300:321] += 0.7 * tpl
        peaks = rs.lidar_peak_match(jnp.asarray(w.astype(np.float32)),
                                    jnp.asarray(tpl.astype(np.float32)))
        ks = [k for k, _ in peaks]
        assert any(abs(k - 100) <= 1 for k in ks)
        assert any(abs(k - 300) <= 1 for k in ks)
        pc = np.asarray(rs.lidar_point_cloud([10.0], [90.0], [0.0]))
        np.testing.assert_allclose(pc[0], [0, 10, 0], atol=1e-5)


class TestGprOtdrNdt:
    def test_gpr_background_removal(self):
        rng = np.random.default_rng(3)
        n_tr, n_t = 32, 256
        layer = np.zeros(n_t)
        layer[50] = 1.0  # flat layer in every trace
        traces = np.tile(layer, (n_tr, 1))
        traces[16, 120] += 1.0  # point target in one trace
        img = np.asarray(rs.gpr_image(jnp.asarray(
            traces.astype(np.float32))))
        assert img[16, 120] > 5 * img[8, 50]  # layer removed, target kept
        ratio = np.asarray(rs.gpr_discriminate(jnp.asarray(img), 8))
        assert np.isfinite(ratio).all()

    def test_otdr_events(self):
        n = 2000
        y = -0.002 * np.arange(n)  # fiber slope
        y[800:] -= 0.8             # splice loss
        y[1400] += 1.5             # reflective event
        slope, pos, is_refl, mags, valid = rs.otdr_analyze(y, fs=1e9)
        assert abs(float(slope) + 0.002) < 2e-4
        kinds = {bool(r) for r, ok in zip(np.asarray(is_refl),
                                          np.asarray(valid)) if ok}
        assert False in kinds and True in kinds  # loss + reflection

    def test_ndt_thickness(self):
        fs, v = 100e6, 5900.0
        echo = np.zeros(4096)
        for k in range(5):
            echo[500 + k * 340] = 0.8 ** k  # multiples of round trip
        thick, lag = rs.ndt_thickness(echo, fs, v)
        assert lag == 340
        assert abs(thick - v * 340 / (2 * fs)) < 1e-6


class TestWeather:
    def test_rcs_estimate_inverts_radar_equation(self):
        sigma = 3.0
        lam, r, pt, g = 0.03, 1000.0, 1e3, 100.0
        pr = pt * g * g * lam ** 2 * sigma / ((4 * np.pi) ** 3 * r ** 4)
        est = rs.rcs_estimate(pr, pt, g, g, lam, r)
        assert abs(float(est) - sigma) < 1e-6

    def test_clutter_suppression_keeps_weather(self):
        n_pulses, n_gates = 64, 16
        rng = np.random.default_rng(5)
        clutter = np.ones((n_pulses, n_gates))          # DC (stationary)
        weather = 0.3 * np.exp(2j * np.pi * 0.2
                               * np.arange(n_pulses))[:, None]
        cube = (clutter + weather).astype(np.complex64)
        out = np.asarray(rs.weather_clutter_suppress(jnp.asarray(cube)))
        spec = np.abs(np.fft.fft(out[:, 0]))
        assert spec[0] < 1e-6                 # clutter notched
        assert spec[round(0.2 * 64)] > 1.0    # weather preserved
        v = np.asarray(rs.wind_profile(jnp.asarray(cube), 1000.0, None))
        assert np.isfinite(v).all()
