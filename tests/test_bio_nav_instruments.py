"""Tests for biomedical, instrument/EMC/DF, and navigation fills."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import biomedical as bio
from r4w_tpu.ops import instruments as inst
from r4w_tpu.ops import navigation as nav


def _ecg(fs=250.0, hr_bpm=72.0, n_s=20.0, seed=0):
    """Synthetic ECG: gaussian R spikes on a noisy baseline."""
    rng = np.random.default_rng(seed)
    n = int(fs * n_s)
    x = 0.02 * rng.standard_normal(n)
    period = 60.0 / hr_bpm
    peaks = []
    t = 0.3
    while t * fs < n - 50:
        k = int(t * fs)
        x[k - 5:k + 6] += np.exp(-0.5 * ((np.arange(-5, 6)) / 1.5) ** 2)
        peaks.append(k)
        t += period
    return x.astype(np.float32), peaks


class TestEcg:
    def test_qrs_detection_rate(self):
        fs = 250.0
        x, true_peaks = _ecg(fs)
        peaks, valid = bio.qrs_detect(x, fs)
        got = np.asarray(peaks)[np.asarray(valid)]
        assert abs(len(got) - len(true_peaks)) <= 1
        hr = np.asarray(bio.heart_rate_series(got, fs))
        assert abs(np.median(hr) - 72.0) < 4.0

    def test_arrhythmia_rules(self):
        fs = 250.0
        normal = [int(k * fs * 60 / 72) for k in range(20)]
        brady = [int(k * fs * 60 / 40) for k in range(10)]
        tachy = [int(k * fs * 60 / 150) for k in range(30)]
        rng = np.random.default_rng(1)
        irr = np.cumsum(rng.uniform(0.4, 1.4, 20)) * fs
        assert bio.arrhythmia_classify(normal, fs) == "normal"
        assert bio.arrhythmia_classify(brady, fs) == "bradycardia"
        assert bio.arrhythmia_classify(tachy, fs) == "tachycardia"
        assert bio.arrhythmia_classify(irr.astype(int), fs) == \
            "irregular"

    def test_ecg_clean_removes_mains(self):
        fs = 250.0
        t = np.arange(2500) / fs
        sig = np.sin(2 * np.pi * 1.2 * t)
        mains = 0.5 * np.sin(2 * np.pi * 50 * t)
        y = np.asarray(bio.ecg_clean((sig + mains).astype(np.float32),
                                     fs))
        spec = np.abs(np.fft.rfft(y))
        f = np.fft.rfftfreq(2500, 1 / fs)
        k50 = np.argmin(np.abs(f - 50))
        kx = np.argmin(np.abs(f - 1.2))
        assert spec[k50] < 0.05 * spec[kx]


class TestEegEmg:
    def test_band_powers_alpha(self):
        fs = 250.0
        t = np.arange(5000) / fs
        alpha = np.sin(2 * np.pi * 10 * t).astype(np.float32)
        bp = bio.eeg_band_powers(alpha, fs)
        assert float(bp["alpha"]) > 10 * float(bp["beta"])
        ratio = bio.bci_alpha_blocking(alpha, 0.1 * alpha, fs)
        assert ratio > 10.0

    def test_emg_decomposition_two_units(self):
        fs = 2000.0
        x = np.zeros(20000)
        big = list(range(500, 20000, 1500))
        small = list(range(1100, 20000, 1700))
        for k in big:
            x[k] = 2.0
        for k in small:
            x[k] = 0.8
        ks, unit, valid = bio.emg_decompose_mu(x, fs, n_units=2,
                                               threshold_sigma=3.0)
        u = np.asarray(unit)[np.asarray(valid)]
        sizes = sorted(int(np.sum(u == k)) for k in range(2))
        assert sizes[0] >= len(small) - 2
        assert sizes[1] >= len(big) - 2

    def test_gesture_features_and_classify(self):
        rng = np.random.default_rng(2)
        rest = 0.05 * rng.standard_normal((2, 1000))
        fist = 1.0 * rng.standard_normal((2, 1000))
        f_rest = bio.emg_gesture_features(rest.astype(np.float32), 2000.0)
        f_fist = bio.emg_gesture_features(fist.astype(np.float32), 2000.0)
        templates = {"rest": np.asarray(f_rest),
                     "fist": np.asarray(f_fist)}
        probe = 0.9 * rng.standard_normal((2, 1000))
        got = bio.gesture_classify_nn(bio.emg_gesture_features(
            probe.astype(np.float32), 2000.0), templates)
        assert got == "fist"

    def test_species_features(self):
        fs = 22050.0
        t = np.arange(int(fs)) / fs
        # chirpy call: 4 syllables of a 3 kHz tone
        env = (np.sin(2 * np.pi * 4 * t) > 0.5).astype(float)
        call = env * np.sin(2 * np.pi * 3000 * t)
        f = bio.species_features(call.astype(np.float32), fs)
        assert abs(f["peak_hz"] - 3000) < 100
        assert 2.0 < f["syllable_rate_hz"] < 6.0


class TestInstruments:
    def test_s21_of_known_filter(self):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(4096)
             + 1j * rng.standard_normal(4096)).astype(np.complex64)
        y = 0.5 * x  # flat -6 dB device
        mag, ph = inst.network_analyzer_s21(jnp.asarray(x),
                                            jnp.asarray(y))
        assert abs(float(jnp.mean(mag)) + 6.02) < 0.1

    def test_scope_trigger_alignment(self):
        t = np.arange(4096)
        x = np.sin(2 * np.pi * t / 128).astype(np.float32)
        idx, frames, valid = inst.oscilloscope_trigger(
            x, 0.0, "rising", holdoff=64, pre=4, length=32,
            max_captures=40)
        v = np.asarray(valid)
        assert int(np.sum(v)) >= 30
        f = np.asarray(frames)[v]
        # all frames nearly identical (aligned captures)
        assert np.abs(f - f[0]).max() < 0.06

    def test_jitter_analyzer(self):
        rng = np.random.default_rng(4)
        period = 1e-6
        edges = np.cumsum(np.full(1000, period)) \
            + 1e-9 * rng.standard_normal(1000)
        j = inst.jitter_analyze(edges, period)
        assert 0.5e-9 < j["tie_rms_s"] < 3e-9

    def test_power_meter(self):
        x = np.full(1000, 1.0 + 0j)  # 1 V peak into 50 ohm -> 10 dBm
        avg, pk = inst.power_meter_dbm(jnp.asarray(x))
        assert abs(float(avg) - 10.0) < 0.1

    def test_vsa_report(self):
        from r4w_tpu.ops import mapping as mp
        rng = np.random.default_rng(5)
        table = mp.constellation_table("qpsk")
        pts = np.asarray(table)[rng.integers(0, 4, 1000)]
        noisy = pts + 0.03 * (rng.standard_normal(1000)
                              + 1j * rng.standard_normal(1000))
        rep = inst.vector_signal_analyze(
            jnp.asarray(noisy.astype(np.complex64)), table)
        assert 0.01 < float(rep["evm_rms"]) < 0.1
        assert float(rep["snr_est_db"]) > 20.0


class TestRfCircuits:
    def test_quarter_wave_transform(self):
        # λ/4 line: Zin = Z0²/ZL
        zin = inst.transmission_line_input_impedance(100.0, 50.0,
                                                     np.pi / 2)
        assert abs(zin - 25.0) < 0.1

    def test_stub_match_improves_vswr(self):
        zl = 100.0 + 50.0j
        before = inst.vswr(zl)
        d, l, after = inst.stub_match(zl)
        assert after < 1.3 < before

    def test_microstrip_z0_monotone(self):
        z_narrow, _ = inst.microstrip_impedance(0.5)
        z_wide, _ = inst.microstrip_impedance(4.0)
        assert z_narrow > z_wide
        z50, _ = inst.microstrip_impedance(1.9, 4.4)
        assert 40.0 < z50 < 65.0

    def test_dipole_resonance(self):
        length, frac = inst.dipole_optimize(100e6)
        assert abs(frac - 0.468) < 0.01

    def test_iq_calibrator_fixes_imbalance(self):
        rng = np.random.default_rng(6)
        z = (rng.standard_normal(20000)
             + 1j * rng.standard_normal(20000)).astype(np.complex64)
        bad = z.real + 1j * (0.8 * z.imag + 0.1 * z.real)
        fixed, est = inst.iq_impairment_calibrate(
            jnp.asarray(bad.astype(np.complex64)))
        f = np.asarray(fixed)
        gain_after = np.mean(f.real ** 2) / np.mean(f.imag ** 2)
        cross_after = abs(np.mean(f.real * f.imag))
        assert abs(gain_after - 1.0) < 0.05
        assert cross_after < 0.02


class TestEmc:
    def test_pim_frequencies_and_level(self):
        prods = inst.pim_products(1930e6, 1990e6, 3)
        assert 1870e6 in prods  # 2f1 - f2
        fs = 1e9
        t = np.arange(65536) / fs
        x = (np.exp(2j * np.pi * 100e6 * t)
             + np.exp(2j * np.pi * 120e6 * t)
             + 0.001 * np.exp(2j * np.pi * 80e6 * t))  # IM3 at 2f1-f2
        dbc = inst.pim_level(jnp.asarray(x.astype(np.complex64)),
                             100e6, 120e6, fs)
        assert -70 < dbc < -50

    def test_emi_scan_finds_emission(self):
        fs = 1e6
        t = np.arange(65536) / fs
        x = (0.001 * np.random.default_rng(7).standard_normal(65536)
             + 0.1 * np.sin(2 * np.pi * 150e3 * t))
        freqs, qp, avg = inst.emi_conducted_scan(
            jnp.asarray(x.astype(np.float32)), fs, rbw_hz=10e3)
        k = np.argmin(np.abs(np.asarray(freqs) - 150e3))
        assert np.argmax(np.asarray(qp)) == k

    def test_injection_locking(self):
        fs = 1e6
        t = np.arange(32768) / fs
        free = np.exp(2j * np.pi * (100e3 * t
                                    + 50 * np.cumsum(
                                        np.random.default_rng(8)
                                        .standard_normal(32768)) / fs))
        locked = np.exp(2j * np.pi * 101e3 * t)
        lk, mean_f, std_f = inst.injection_locking_detect(
            jnp.asarray(locked.astype(np.complex64)), fs, 100e3)
        assert lk
        nl, _, _ = inst.injection_locking_detect(
            jnp.asarray(free.astype(np.complex64)), fs, 100e3)
        assert not nl

    def test_spur_scan_and_cancel(self):
        fs = 1e6
        t = np.arange(65536) / fs
        x = (np.exp(2j * np.pi * 100e3 * t)
             + 0.001 * np.exp(2j * np.pi * 250e3 * t))
        sfreqs, dbcs, valid = inst.spur_scan(
            jnp.asarray(x.astype(np.complex64)), fs, 100e3)
        assert any(abs(float(f) - 250e3) < 100
                   for f, v in zip(np.asarray(sfreqs),
                                   np.asarray(valid)) if v)
        clean = np.asarray(inst.spur_cancel(
            jnp.asarray(x.astype(np.complex64)), [250e3], fs))
        spec = np.abs(np.fft.fft(clean))
        k = round(250e3 / fs * 65536)
        assert spec[k] < 1.0  # spur crushed (was ~65)


class TestDf:
    def test_watson_watt_bearing(self):
        fs = 10_000.0
        t = np.arange(2048) / fs
        sig = np.sin(2 * np.pi * 500 * t)
        for true_deg in (30.0, 120.0):
            th = np.deg2rad(true_deg)
            ns = np.cos(th) * sig
            ew = np.sin(th) * sig
            got = float(inst.watson_watt_bearing(
                ns.astype(np.float32), ew.astype(np.float32),
                sense=sig.astype(np.float32)))
            assert min(abs(got - true_deg), 360 - abs(got - true_deg)) \
                < 3.0

    def test_triangulation(self):
        stations = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
        tgt = np.array([40.0, 60.0])
        bearings = []
        for s in stations:
            d = tgt - s
            bearings.append(np.rad2deg(np.arctan2(d[0], d[1])))
        pos = np.asarray(inst.triangulate_bearings(stations, bearings))
        assert np.linalg.norm(pos - tgt) < 1.0

    def test_gps_spoof_detector(self):
        spoofed, flags = inst.gps_spoof_detect(
            np.full(8, 48.0), np.full(8, 100.0), 5e-6)
        assert spoofed
        ok, _ = inst.gps_spoof_detect(
            np.array([38.0, 44.0, 41.0, 35.0, 47.0]),
            np.array([-2000.0, 1500.0, 300.0, -800.0, 2500.0]), 1e-9)
        assert not ok


class TestFingerprint:
    def test_modulation_fingerprint_separates(self):
        from r4w_tpu.ops import mapping as mp
        rng = np.random.default_rng(9)
        bpsk = np.asarray(mp.constellation_table("bpsk"))[
            rng.integers(0, 2, 4000)]
        qam16 = np.asarray(mp.constellation_table("qam16"))[
            rng.integers(0, 16, 4000)]
        f_b = np.asarray(inst.modulation_fingerprint(
            jnp.asarray(bpsk.astype(np.complex64))))
        f_q = np.asarray(inst.modulation_fingerprint(
            jnp.asarray(qam16.astype(np.complex64))))
        assert f_b[0] > 0.9 and f_q[0] < 0.1  # |C20| separates

    def test_rf_device_fingerprint_stable(self):
        rng = np.random.default_rng(10)
        base = (rng.standard_normal(8192)
                + 1j * rng.standard_normal(8192)).astype(np.complex64)
        dev_a = base.real + 1j * 0.9 * base.imag
        f1 = np.asarray(inst.rf_device_fingerprint(
            jnp.asarray(dev_a[:4096].astype(np.complex64))))
        f2 = np.asarray(inst.rf_device_fingerprint(
            jnp.asarray(dev_a[4096:].astype(np.complex64))))
        assert abs(f1[1] - f2[1]) < 0.05  # gain feature is stable

    def test_environment_map_peak_near_strong_node(self):
        pos = np.array([[0.0, 0.0], [50.0, 50.0]])
        pw = np.array([-80.0, -30.0])
        m = np.asarray(inst.rf_environment_map(pw, pos, grid_n=16,
                                               extent=60.0))
        ky, kx = np.unravel_index(np.argmax(m), m.shape)
        # strong node at (50,50) -> upper-right of the grid
        assert kx > 10 and ky > 10

    def test_protocol_anomaly(self):
        lens = np.concatenate([np.full(50, 100.0), [100.0, 5000.0]])
        ivs = np.concatenate([np.full(50, 1.0), [1.0, 1.0]])
        z = np.asarray(inst.protocol_anomaly_score(lens, ivs))
        assert z[-1] > 10 * z[10]

    def test_radiometer_and_correlator(self):
        rng = np.random.default_rng(11)
        common = (rng.standard_normal(4096)
                  + 1j * rng.standard_normal(4096))
        a = (common + 0.5 * rng.standard_normal(4096)).astype(
            np.complex64)
        b = (np.roll(common, 7)
             + 0.5 * rng.standard_normal(4096)).astype(np.complex64)
        p, sens = inst.radiometer_total_power(jnp.asarray(a))
        assert sens < 0.05
        vis, lag, lags = inst.telescope_cross_correlate(
            jnp.asarray(a), jnp.asarray(b))
        assert lag == -7 or lag == 7


class TestNavigation:
    def test_mahony_levels_from_tilt(self):
        dt = 0.01
        n = 2000
        gyro = np.zeros((n, 3), np.float32)
        accel = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
        # start from a 20-deg roll error
        q0 = jnp.asarray([np.cos(0.175), np.sin(0.175), 0.0, 0.0],
                         jnp.float32)
        track = nav.attitude_track_mahony(gyro, accel, dt, kp=2.0,
                                          q0=q0)
        roll, pitch, _ = nav.quat_to_euler(track[-1])
        assert abs(float(roll)) < 0.02

    def test_strapdown_constant_accel(self):
        dt = 0.01
        n = 100
        accel = np.tile([1.0, 0.0, 9.81], (n, 1)).astype(np.float32)
        gyro = np.zeros((n, 3), np.float32)
        ps, vs, qs = nav.strapdown_integrate(accel, gyro, dt)
        # x = 0.5 a t^2 with t = 1 s
        assert abs(float(ps[-1, 0]) - 0.5) < 0.05
        assert abs(float(vs[-1, 0]) - 1.0) < 0.05
        assert abs(float(ps[-1, 2])) < 0.05  # gravity cancelled

    def test_imu_aiding_pulls_to_fix(self):
        p, v = nav.imu_aided_update(jnp.asarray([10.0, 0.0, 0.0]),
                                    jnp.zeros(3),
                                    jnp.asarray([0.0, 0.0, 0.0]),
                                    fix_weight=0.5)
        assert abs(float(p[0]) - 5.0) < 1e-6

    def test_magnetometer_heading(self):
        # level attitude, mag pointing north -> heading 0
        m_nav, hdg = nav.magnetometer_rotate(
            jnp.asarray([1.0, 0.0, 0.5]),
            jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        assert abs(float(hdg)) < 1e-6

    def test_particle_filter_tracks_ramp(self):
        rng = np.random.default_rng(12)
        true = 0.5 * np.arange(200)
        z = true + 2.0 * rng.standard_normal(200)
        track = np.asarray(nav.particle_filter_track(
            z.astype(np.float32), jax.random.key(0)))
        err = np.abs(track[50:] - true[50:]).mean()
        raw = np.abs(z[50:] - true[50:]).mean()
        assert err < 0.7 * raw

    def test_luenberger_estimates_velocity(self):
        dt = 0.1
        a = np.array([[1.0, dt], [0.0, 1.0]])
        b = np.zeros((2, 1))
        c = np.array([1.0, 0.0])
        l_g = np.array([0.5, 0.5])
        true_v = 2.0
        y = true_v * dt * np.arange(200)
        xs = np.asarray(nav.luenberger_observe(
            y.astype(np.float32), a, b, c, l_g))
        assert abs(xs[-1, 1] - true_v) < 0.1

    def test_fusion_weights_by_variance(self):
        tracks = jnp.asarray([[1.0, 1.0], [3.0, 3.0]])
        fused, var = nav.spatio_temporal_fuse(tracks,
                                              jnp.asarray([0.1, 10.0]))
        assert float(fused[0]) < 1.2  # dominated by the good sensor
        assert float(np.asarray(var).reshape(-1)[0]) < 0.1
