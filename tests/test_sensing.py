"""Tests for applied-sensing fills (sensing.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import sensing as sn


class TestAcoustic:
    def test_ae_hit_counting(self):
        rng = np.random.default_rng(0)
        x = 0.01 * rng.standard_normal(4096)
        x[1000:1020] += 2.0
        x[3000:3010] += 1.5
        n, starts, energies, valid = sn.acoustic_emission_count(x)
        assert int(n) == 2
        assert int(np.sum(np.asarray(valid))) == 2
        assert abs(int(starts[0]) - 1000) < 5
        # masked tail carries zero energy and invalid flags
        assert not np.any(np.asarray(valid)[2:])
        assert np.all(np.asarray(energies)[2:] == 0.0)
        assert float(energies[0]) > float(energies[1]) > 0.0

    def test_gunshot_localization(self):
        fs, c = 48_000.0, 343.0
        mics = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0],
                         [10.0, 10.0]])
        src = np.array([3.0, 4.0])
        rng = np.random.default_rng(1)
        pulse = rng.standard_normal(64)
        n = 8192
        sigs = []
        for m in mics:
            d = np.linalg.norm(src - m)
            delay = int(round(d / c * fs))
            s = np.zeros(n)
            s[delay + 1000: delay + 1064] = pulse
            sigs.append(s.astype(np.float32))
        pos = np.asarray(sn.gunshot_localize(sigs, mics, fs, c))
        assert np.linalg.norm(pos - src) < 1.0

    def test_leak_locator_midpoint_and_offset(self):
        fs, v, dist = 10_000.0, 1200.0, 120.0
        rng = np.random.default_rng(2)
        noise = rng.standard_normal(16384)
        # leak at 40 m from sensor A: arrives at A first by
        # (80-40)/1200 s
        dt = (80.0 - 40.0) / v
        lag = int(round(dt * fs))
        a = noise
        b = np.roll(noise, lag)
        pos = sn.leak_locate(a.astype(np.float32),
                             b.astype(np.float32), dist, fs, v)
        assert abs(pos - 40.0) < 5.0

    def test_avalanche_beacon_pulses(self):
        fs = 1000.0
        x = np.zeros(5000, np.complex64)
        for k in range(5):
            x[k * 1000: k * 1000 + 100] = 1.0  # 457k pulse train
        pulses, _ = sn.avalanche_beacon_search(jnp.asarray(x), fs)
        assert np.asarray(pulses).sum() == 5

    def test_drone_detector_finds_blade_rate(self):
        fs = 8000.0
        t = np.arange(16384) / fs
        x = sum(np.sin(2 * np.pi * 150 * k * t) / k
                for k in range(1, 5))
        f0, strength = sn.drone_acoustic_detect(
            jnp.asarray(np.asarray(x, np.float32)), fs)
        assert abs(f0 - 150.0) < 5.0


class TestVibration:
    def test_order_tracking_flat_rpm(self):
        fs = 10_000.0
        rpm = 3000.0  # 50 Hz shaft
        t = np.arange(40_000) / fs
        vib = np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(
            2 * np.pi * 150 * t)  # orders 1 and 3
        orders = np.asarray(sn.envelope_order_spectrum(
            vib, fs, np.full_like(t, rpm), n_orders=5))
        assert orders[0] > 3 * orders[1]       # order 1 strong
        assert orders[2] > 3 * orders[1]       # order 3 strong

    def test_wheel_flat(self):
        fs = 5000.0
        circ, speed = 3.0, 30.0     # period 0.1 s -> 500 samples
        n = 50_000
        rng = np.random.default_rng(3)
        clean = 0.1 * rng.standard_normal(n)
        flat = clean.copy()
        for k in range(500, n, 500):
            flat[k:k + 10] += 3.0
        det_f, score_f = sn.wheel_flat_detect(flat, fs, circ, speed)
        det_c, score_c = sn.wheel_flat_detect(clean, fs, circ, speed)
        assert det_f and score_f > score_c

    def test_wheel_flat_sub_resolution_period(self):
        """ADVICE r4: lag < 2 used to produce an empty window and a
        jnp.max crash; now returns a clean (False, 0.0)."""
        rng = np.random.default_rng(5)
        vib = rng.standard_normal(1000)
        # period 0.03 m / 30 m/s = 1 ms -> lag 1 at fs=1000
        det, score = sn.wheel_flat_detect(vib, 1000.0, 0.03, 30.0)
        assert not bool(det) and float(score) == 0.0
        # lag >= n branch still clean too
        det, score = sn.wheel_flat_detect(vib, 1000.0, 3000.0, 1.0)
        assert not bool(det) and float(score) == 0.0

    def test_tip_timing_flags_wobbly_blade(self):
        rpm, nb = 3000.0, 4
        period = 60.0 / rpm / nb
        t = []
        rng = np.random.default_rng(4)
        for rev in range(50):
            for b in range(nb):
                jit = 1e-5 * rng.standard_normal() * (10 if b == 2
                                                      else 1)
                t.append((rev * nb + b) * period + jit)
        stds = np.asarray(sn.turbine_tip_timing(np.asarray(t), rpm, nb))
        assert np.argmax(stds) == 2

    def test_bearing_bands(self):
        fs = 10_000.0
        t = np.arange(40_000) / fs
        # impacts at BPFO=87 Hz modulating a 3 kHz resonance
        impacts = (np.sin(2 * np.pi * 87 * t) > 0.99).astype(float)
        vib = np.convolve(impacts, np.sin(2 * np.pi * 3000
                                          * np.arange(64) / fs)
                          * np.exp(-np.arange(64) / 10))[:t.shape[0]]
        h = sn.bearing_health_bands(jnp.asarray(
            vib.astype(np.float32)), fs, 87.0, 117.0)
        assert float(h["bpfo"]) > 3 * float(h["bpfi"])

    def test_structural_shift_sign(self):
        fs = 1000.0
        t = np.arange(8192) / fs
        base = np.sin(2 * np.pi * 100 * t)
        damaged = np.sin(2 * np.pi * 95 * t)  # stiffness loss
        shift = np.asarray(sn.structural_modal_shift(base, damaged, fs,
                                                     n_modes=1))
        assert shift[0] < -0.02

    def test_dam_seepage_score(self):
        fs = 10_000.0
        t = np.arange(16384) / fs
        quiet = np.sin(2 * np.pi * 100 * t)
        seep = quiet + 2.0 * np.sin(2 * np.pi * 1000 * t)
        s_q = float(sn.dam_seepage_score(quiet.astype(np.float32), fs))
        s_s = float(sn.dam_seepage_score(seep.astype(np.float32), fs))
        assert s_s > 10 * s_q


class TestSeismic:
    def _quake(self, fs=100.0, n=6000, arrival=3000, seed=5):
        rng = np.random.default_rng(seed)
        x = 0.05 * rng.standard_normal(n)
        t = np.arange(n - arrival) / fs
        x[arrival:] += np.exp(-t / 10.0) * np.sin(2 * np.pi * 2.0
                                                  * t) * 3.0
        return x

    def test_sta_lta_pick(self):
        fs = 100.0
        x = self._quake(fs)
        pick = sn.seismic_pick(x, fs)
        assert pick is not None and abs(pick - 30.0) < 2.0

    def test_classifier_labels(self):
        fs = 100.0
        quake = self._quake(fs)
        rng = np.random.default_rng(6)
        noise = 0.05 * rng.standard_normal(6000)
        assert sn.seismic_classify(quake, fs) == "earthquake"
        assert sn.seismic_classify(noise, fs) == "noise"


class TestSpaceWeather:
    def test_s4_index(self):
        rng = np.random.default_rng(7)
        steady = np.ones(1000)
        scint = 1.0 + 0.5 * rng.standard_normal(1000)
        s4_lo = float(np.mean(np.asarray(sn.scintillation_s4(
            steady.astype(np.float32)))))
        s4_hi = float(np.mean(np.asarray(sn.scintillation_s4(
            np.abs(scint).astype(np.float32)))))
        assert s4_lo < 0.05 and s4_hi > 0.2

    def test_sigma_phi_detrends(self):
        t = np.arange(500)
        ramp = 0.01 * t          # linear drift is not scintillation
        sp = np.asarray(sn.scintillation_sigma_phi(ramp))
        assert sp.max() < 0.05

    def test_geomagnetic_index(self):
        fs = 1.0
        quiet = np.zeros(600)
        rng = np.random.default_rng(8)
        storm = np.concatenate([np.zeros(300),
                                200.0 * rng.standard_normal(300)])
        _, flag_q = sn.geomagnetic_storm_index(quiet, fs)
        _, flag_s = sn.geomagnetic_storm_index(storm, fs)
        assert not flag_q and flag_s

    def test_magnetic_anomaly(self):
        b = np.full(2000, 50_000.0)
        b[1000:1050] += 20.0
        mask, resid = sn.magnetic_anomaly_detect(b)
        m = np.asarray(mask)
        assert m[1010] and m[:900].sum() == 0

    def test_gravity_gradients(self):
        xs = np.linspace(-1, 1, 21)
        gz = np.add.outer(np.zeros(21), xs)  # linear in x
        tzx, tzy = sn.gravity_gradient_tensor(gz, spacing_m=0.1)
        assert abs(float(jnp.mean(tzx)) - 1.0) < 1e-4
        assert abs(float(jnp.mean(tzy))) < 1e-6

    def test_lightning_and_cosmic(self):
        fs = 1e6
        e = 0.01 * np.random.default_rng(9).standard_normal(100_000)
        e[50_000:50_050] += np.linspace(0, 5, 50)  # positive stroke
        times, pols, rises, valid = sn.lightning_stroke_analyze(e, fs)
        assert int(np.sum(np.asarray(valid))) == 1
        assert int(pols[0]) == 1
        a = np.zeros(1000)
        b = np.zeros(1000)
        a[[100, 500, 900]] = 10.0
        b[[101, 499, 700]] = 10.0
        assert sn.cosmic_ray_coincidence(a, b) == 2


class TestPhotonicNuclear:
    def test_fbg_peak(self):
        wl = np.linspace(1549.0, 1551.0, 201)
        spec = np.exp(-((wl - 1550.3) / 0.05) ** 2)
        est = float(sn.fbg_wavelength_shift(
            jnp.asarray(spec.astype(np.float32)),
            jnp.asarray(wl.astype(np.float32))))
        assert abs(est - 1550.3) < 0.02

    def test_oct_a_scan_depth(self):
        k = np.arange(1024)
        depth_bin = 100
        interf = np.cos(2 * np.pi * depth_bin * k / 1024)
        a = np.asarray(sn.oct_a_scan(interf.astype(np.float32)))
        assert abs(np.argmax(a) - depth_bin) <= 1

    def test_photoacoustic_focus(self):
        fs, c = 20e6, 1500.0
        sensors = np.stack([np.linspace(-0.01, 0.01, 16),
                            np.zeros(16)], axis=-1)
        src = np.array([0.002, 0.01])
        n_t = 600
        data = np.zeros((16, n_t), np.float32)
        for s in range(16):
            d = np.linalg.norm(sensors[s] - src)
            k = int(d / c * fs)
            if k < n_t:
                data[s, k] = 1.0
        # image a small grid around the source
        gx, gy = np.meshgrid(np.linspace(-0.005, 0.005, 11),
                             np.linspace(0.005, 0.015, 11))
        px = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        img = np.asarray(sn.photoacoustic_reconstruct(
            data, sensors, px, c, fs)).reshape(11, 11)
        ky, kx = np.unravel_index(np.argmax(img), img.shape)
        assert abs(gx[ky, kx] - src[0]) < 2e-3
        assert abs(gy[ky, kx] - src[1]) < 2e-3

    def test_mrs_quantify(self):
        fs = 1000.0
        t = np.arange(1024) / fs
        fid = (np.exp(2j * np.pi * 100 * t) * np.exp(-t * 5)
               + 0.5 * np.exp(2j * np.pi * -150 * t)
               * np.exp(-t * 5)).astype(np.complex64)
        amps = np.asarray(sn.mrs_quantify(jnp.asarray(fid), fs,
                                          [100.0, -150.0, 300.0]))
        assert amps[0] > amps[1] > amps[2]

    def test_gamma_peaks(self):
        rng = np.random.default_rng(10)
        cs137 = rng.normal(662.0, 10.0, 5000)
        k40 = rng.normal(1460.0, 15.0, 2000)
        h, peaks = sn.gamma_spectrum(np.concatenate([cs137, k40]))
        assert any(abs(p - 662) < 30 for p in peaks)
        assert any(abs(p - 1460) < 40 for p in peaks)

    def test_bpm_position(self):
        # beam displaced +x: A and D see more signal
        x, y = sn.bpm_position([1.2, 0.8, 0.8, 1.2])
        assert float(x) > 0.05 and abs(float(y)) < 1e-6

    def test_langmuir(self):
        v = np.linspace(-20, 10, 300)
        te = 2.0
        i_e = 1.0 * np.exp(np.clip((v + 5.0) / te, -30, 0))
        i = i_e - 0.05  # ion saturation offset
        out = sn.langmuir_analyze(v, i)
        assert abs(out["te_ev"] - te) < 0.5

    def test_plasma_impedance(self):
        fs = 1e6
        t = np.arange(1024) / fs
        vw = 10 * np.cos(2 * np.pi * 13.56e3 * t)
        iw = 2 * np.cos(2 * np.pi * 13.56e3 * t - np.pi / 4)
        z = complex(sn.plasma_impedance(vw.astype(np.float32),
                                        iw.astype(np.float32)))
        assert abs(abs(z) - 5.0) < 0.2
        assert abs(np.angle(z) - np.pi / 4) < 0.05


class TestEnvHealth:
    def test_hyperspectral_unmixing(self):
        rng = np.random.default_rng(11)
        em = np.abs(rng.standard_normal((3, 32))).astype(np.float32)
        ab_true = np.abs(rng.standard_normal((50, 3))).astype(np.float32)
        cube = ab_true @ em
        ab = np.asarray(sn.hyperspectral_unmix(jnp.asarray(cube),
                                               jnp.asarray(em),
                                               n_iter=500))
        err = np.abs(ab - ab_true).mean() / ab_true.mean()
        assert err < 0.1

    def test_soil_moisture_monotone(self):
        theta_dry, _ = sn.soil_moisture_permittivity(np.asarray([0.2]))
        theta_wet, _ = sn.soil_moisture_permittivity(np.asarray([0.6]))
        assert float(theta_wet[0]) > float(theta_dry[0])

    def test_spo2(self):
        spo2, r = sn.spo2_ratio(0.02, 1.0, 0.04, 1.0)
        assert abs(spo2 - (110 - 25 * 0.5)) < 1e-6

    def test_tidal_fit_recovers_m2(self):
        t = np.arange(0, 24 * 30, 0.5)  # 30 days hourly-ish
        m2 = 1.2 * np.cos(2 * np.pi / 12.42 * t + 0.4)
        s2 = 0.4 * np.cos(2 * np.pi / 12.00 * t - 1.0)
        h = 5.0 + m2 + s2
        amps, phases, mean = sn.tidal_harmonic_fit(h, t)
        assert abs(float(amps[0]) - 1.2) < 0.05
        assert abs(float(amps[1]) - 0.4) < 0.05
        assert abs(mean - 5.0) < 0.05
