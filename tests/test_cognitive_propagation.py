"""Tests for cognitive-radio and propagation fills."""

import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import cognitive as cg
from r4w_tpu.ops import propagation as pr


def _band_with_tones(n=32768, tone_channels=(3, 12), n_channels=16,
                     seed=0):
    rng = np.random.default_rng(seed)
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    t = np.arange(n)
    for ch in tone_channels:
        # channel ch of n_channels spanning the fftshifted band
        f = (ch + 0.5) / n_channels - 0.5
        x += np.exp(2j * np.pi * f * t)
    return x.astype(np.complex64)


class TestSpectrumMgmt:
    def test_channel_occupancy(self):
        x = _band_with_tones()
        busy, ch_db = cg.channel_occupancy(jnp.asarray(x), 16)
        b = np.asarray(busy)
        assert b[3] and b[12] and b.sum() == 2

    def test_broker_grants_cleanest(self):
        brk = cg.SpectrumBroker(4)
        occ = [10.0, -20.0, 5.0, -10.0]
        assert brk.request("a", occ) == 1
        assert brk.request("b", occ) == 3
        brk.release("a")
        assert brk.request("c", occ) == 1

    def test_learner_prefers_idle(self):
        lrn = cg.SpectrumLearner(3)
        for _ in range(50):
            lrn.observe([1, 0, 1])
        assert lrn.pick() == 1

    def test_cognitive_engine_step(self):
        eng = cg.CognitiveEngine(16)
        out = eng.step(jnp.asarray(_band_with_tones()), snr_db=12.0)
        assert out["channel"] not in (3, 12)
        assert cg.mcs_info(out["mcs"])["bits_per_symbol"] >= 4

    def test_coexistence_report(self):
        duty, power = cg.coexistence_report(
            jnp.asarray(_band_with_tones()), 16)
        d = np.asarray(duty)
        assert d[3] > 0.9 and d[0] < 0.1


class TestInterference:
    def test_classifier_kinds(self):
        fs = 1e6
        n = 8192
        t = np.arange(n) / fs
        tone = np.exp(2j * np.pi * 1e3 * t).astype(np.complex64)
        pulsed = np.zeros(n, np.complex64)
        pulsed[::512] = 1.0
        rng = np.random.default_rng(1)
        wide = (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
        assert cg.interference_classify(tone, fs) == "tone"
        assert cg.interference_classify(pulsed, fs) == "pulsed"
        assert cg.interference_classify(wide, fs) == "wideband"

    def test_excision_removes_tone_keeps_signal(self):
        rng = np.random.default_rng(2)
        spread = (2.0 * rng.integers(0, 2, 16384) - 1.0).astype(
            np.complex64)
        tone = 10.0 * np.exp(2j * np.pi * 0.13 * np.arange(16384))
        clean = np.asarray(cg.interference_excise(
            jnp.asarray(spread + tone.astype(np.complex64))))
        # tone power crushed
        spec = np.abs(np.fft.fft(clean[:8192]))
        k = round(0.13 * 8192)
        assert spec[k] < 0.05 * 8192
        # spread correlation survives
        corr = np.abs(np.vdot(clean[:8192], spread[:8192])) / 8192
        assert corr > 0.5


class TestLinkAdapt:
    def test_mcs_ladder_monotone(self):
        idxs = [cg.link_adapt(s) for s in (-5, 0, 8, 16, 25)]
        assert idxs == sorted(idxs)
        assert cg.mcs_info(idxs[-1])["name"] == "64qam-5/6"

    def test_carrier_aggregation(self):
        sched = cg.carrier_aggregation_schedule(
            [20.0, 5.0, 12.0], {"u1": 1500, "u2": 500})
        got_u1 = sum(b for _, b in sched["u1"])
        assert got_u1 >= 1500 or len(sched["u1"]) == 2
        all_ch = [c for u in sched.values() for c, _ in u]
        assert len(all_ch) == len(set(all_ch))  # no double booking

    def test_power_control_converges_to_target(self):
        g = np.array([[1.0, 0.1], [0.1, 1.0]])
        p, sinr = pr_power = cg.power_control_converge(
            g, [0.01, 0.01], target_db=10.0)
        np.testing.assert_allclose(np.asarray(sinr), [10.0, 10.0],
                                   atol=0.1)

    def test_timing_advance(self):
        adv, dist = cg.timing_advance(1030, 1000, 1e6)
        assert adv == -30
        assert abs(dist - 30 / 1e6 * 3e8 / 2) < 1e3


class TestMac:
    def test_lorawan_duty_cycle(self):
        sched = cg.lorawan_schedule({"dev1": 1.0}, duty_cycle=0.01,
                                    horizon_s=1000.0)
        times = sched["dev1"]
        assert len(times) == 10  # 1 s airtime per 100 s
        assert times[1] - times[0] >= 99.0

    def test_csma_waits_for_idle(self):
        busy = np.zeros(100, bool)
        busy[:50] = True
        t, rounds = cg.csma_backoff_trace(busy, seed=1)
        assert t >= 50

    def test_waveform_diversity(self):
        assert cg.waveform_diversity_pick({"jamming": True}) == "fhss"
        assert cg.waveform_diversity_pick(
            {"multipath_rms_us": 5.0}) == "ofdm"
        assert cg.waveform_diversity_pick({"snr_db": -5.0}) == "lora"

    def test_rf_router(self):
        out = cg.rf_route({"a": jnp.ones(4), "b": 2 * jnp.ones(4)},
                          {"out1": ["a", "b"], "out2": ["b"]})
        assert float(out["out1"][0]) == 3.0
        assert float(out["out2"][0]) == 2.0


class TestMasksLpi:
    def test_spectral_mask_and_compliance(self):
        mask = [(0.0, 0.0), (1e6, -20.0), (5e6, -60.0)]
        lim = np.asarray(cg.spectral_mask([0.0, 2e6], mask))
        assert lim[0] == 0.0 and -60.0 < lim[1] < -20.0
        ok, margin = cg.mask_compliance([-30.0, -70.0], [1e6, 5e6],
                                        mask)
        assert ok and margin > 0
        bad, m2 = cg.mask_compliance([-10.0], [1e6], mask)
        assert not bad and m2 < 0

    def test_lpi_metrics_rank_signals(self):
        rng = np.random.default_rng(3)
        n = 16384
        noiselike = (rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64)
        tone = np.exp(2j * np.pi * 0.125 * np.arange(n)).astype(
            np.complex64)
        m_n = cg.lpi_metrics(jnp.asarray(noiselike))
        m_t = cg.lpi_metrics(jnp.asarray(tone))
        assert float(m_n["psd_peak_avg_db"]) < float(
            m_t["psd_peak_avg_db"])
        assert float(m_n["spectral_entropy"]) > float(
            m_t["spectral_entropy"])


class TestLinkBudget:
    def test_budget_matches_hand_calc(self):
        b = pr.link_budget(10.0, 20.0, 30.0, 1000e3, 2.4e9, 1e6)
        # FSPL at 1000 km / 2.4 GHz ≈ 160.05 dB
        assert abs(b["path_loss_db"] - 160.05) < 0.2
        assert abs(b["prx_dbw"] - (60.0 - b["path_loss_db"])) < 1e-9
        assert abs(b["cn0_dbhz"] - (b["cn_db"] + 60.0)) < 1e-6

    def test_optimizer_closes_the_loop(self):
        p = pr.link_budget_optimize(100e3, 900e6, 25e3, 10.0)
        b = pr.link_budget(p, 0.0, 0.0, 100e3, 900e6, 25e3)
        assert abs(b["cn_db"] - 13.0) < 0.01  # target + 3 dB margin


class TestSatellite:
    _L1 = ("1 25544U 98067A   26047.50000000  .00016717  00000-0"
           "  10270-3 0  9000")
    _L2 = ("2 25544  51.6400 208.9163 0006317  69.9862 290.2000 "
           "15.54225995 10000")

    def test_tle_parse_and_orbit_radius(self):
        tle = pr.Tle.parse(self._L1, self._L2)
        assert abs(tle.inclination_deg - 51.64) < 0.01
        pos = np.asarray(pr.tle_propagate(tle, np.arange(0, 5400, 60.0)))
        r = np.linalg.norm(pos, axis=-1)
        # ISS-ish orbit radius ~6.79e6 m
        assert np.all(np.abs(r - 6.79e6) < 1e5)

    def test_pass_prediction_finds_windows(self):
        tle = pr.Tle.parse(self._L1, self._L2)
        # site under the orbit's descending node (RAAN-180 = 28.9 deg
        # ECI longitude) so the ground track passes overhead
        lon = np.deg2rad(28.9)
        site = 6371e3 * np.array([np.cos(lon), np.sin(lon), 0.0])
        t = np.arange(0, 6 * 5400, 30.0)
        t0s, t1s, els, valid = pr.pass_predict(tle, site, t,
                                               min_elevation_deg=0.0)
        nv = int(np.sum(np.asarray(valid)))
        assert nv >= 1
        for k in range(nv):
            assert float(t1s[k]) > float(t0s[k]) and float(els[k]) > 0.0


class TestWeatherProp:
    def test_rain_attenuation_increases_with_rate_and_freq(self):
        a1 = pr.rain_attenuation_db_per_km(10.0, 10.0)
        a2 = pr.rain_attenuation_db_per_km(50.0, 10.0)
        a3 = pr.rain_attenuation_db_per_km(10.0, 30.0)
        assert a2 > a1 and a3 > a1
        # sanity: ~0.1-2 dB/km at 10 GHz / 10 mm/h
        assert 0.05 < a1 < 3.0

    def test_propagation_models_ordering(self):
        fspl = pr.propagation_loss_db("fspl", 5000.0, 900e6)
        tworay = pr.propagation_loss_db("two_ray", 5000.0, 900e6)
        hata = pr.propagation_loss_db("hata_urban", 5000.0, 900e6)
        assert tworay > fspl          # beyond breakpoint
        assert hata > fspl
        tr = pr.troposcatter_loss_db(200.0, 900.0)
        assert tr > 150.0

    def test_fso_margin_degrades_in_fog(self):
        clear = pr.fso_link_margin_db(10.0, 1000.0, visibility_km=20.0)
        fog = pr.fso_link_margin_db(10.0, 1000.0, visibility_km=0.5)
        assert clear > fog


class TestSounding:
    def test_freq_sound_and_profile(self):
        rng = np.random.default_rng(4)
        tx = (rng.standard_normal(1024)
              + 1j * rng.standard_normal(1024)).astype(np.complex64)
        # channel: taps at 0 and 37
        rx = tx + 0.5 * np.roll(tx, 37)
        delays, gains, valid = pr.multipath_profile(
            tx, rx.astype(np.complex64), n_paths=2)
        d = {int(dd): gg for dd, gg, v in
             zip(np.asarray(delays), np.asarray(gains),
                 np.asarray(valid)) if v}
        assert set(d) == {0, 37}
        assert abs(abs(d[37]) - 0.5) < 0.05

    def test_sparse_equalizer_flattens(self):
        rng = np.random.default_rng(5)
        tx = (rng.standard_normal(4096)
              + 1j * rng.standard_normal(4096)).astype(np.complex64)
        rx = tx + 0.5 * np.roll(tx, 37)
        eq = np.asarray(pr.sparse_multipath_equalize(
            jnp.asarray(rx), [(0, 1.0 + 0j), (37, 0.5 + 0j)],
            n_fft=4096))
        err = np.mean(np.abs(eq - tx) ** 2) / np.mean(np.abs(tx) ** 2)
        assert err < 0.05

    def test_ls_channel_estimate(self):
        rng = np.random.default_rng(6)
        x = (rng.standard_normal(512)
             + 1j * rng.standard_normal(512)).astype(np.complex64)
        h_true = np.array([1.0, 0.0, 0.4 - 0.2j, 0.0, 0.1],
                          np.complex64)
        y = np.convolve(x, h_true)[: x.shape[0]]
        h = np.asarray(pr.ls_channel_estimate(x, y, n_taps=5))
        np.testing.assert_allclose(h, h_true, atol=1e-3)

    def test_dynamic_channel_switches(self):
        ch = pr.DynamicChannel(seed=3)
        snrs = [ch.step() for _ in range(500)]
        assert 0.0 in snrs and 20.0 in snrs
        # mostly good (stationary distribution p_bad ~ 1/7)
        frac_bad = np.mean(np.asarray(snrs) == 0.0)
        assert 0.02 < frac_bad < 0.4

    def test_mode_sounder_finds_layers(self):
        f = np.linspace(2e6, 30e6, 200)
        resp = np.exp(-((f - 7e6) / 1e6) ** 2) \
            + 0.6 * np.exp(-((f - 14e6) / 1e6) ** 2)
        mfreqs, mags, valid = pr.mode_sound(resp, f)
        freqs = [float(x) for x, v in zip(np.asarray(mfreqs),
                                          np.asarray(valid)) if v]
        assert any(abs(x - 7e6) < 3e5 for x in freqs)
        assert any(abs(x - 14e6) < 3e5 for x in freqs)
