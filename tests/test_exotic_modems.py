"""Tests for specialty modems & power-systems fills (exotic_modems.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import exotic_modems as xm
from r4w_tpu.ops import mapping as mp


class TestWsjt:
    def test_jt65_roundtrip(self):
        rng = np.random.default_rng(0)
        syms = rng.integers(0, 65, 30)
        x = xm.jt65_modulate(jnp.asarray(syms))
        got = np.asarray(xm.jt65_demodulate(x))
        np.testing.assert_array_equal(got, syms)

    def test_wspr_roundtrip_with_noise(self):
        rng = np.random.default_rng(1)
        syms = rng.integers(0, 4, 40)
        x = np.asarray(xm.wspr_modulate(jnp.asarray(syms)))
        x = x + 0.5 * (rng.standard_normal(x.shape[0])
                       + 1j * rng.standard_normal(x.shape[0]))
        got = np.asarray(xm.wspr_demodulate(
            jnp.asarray(x.astype(np.complex64))))
        np.testing.assert_array_equal(got, syms)

    def test_phase_continuity(self):
        x = np.asarray(xm.wspr_modulate(jnp.asarray([0, 3, 1])))
        dphi = np.abs(np.diff(np.angle(x[1:] * np.conj(x[:-1]))))
        assert dphi.max() < 0.1  # no phase jumps at symbol edges


class TestAcousticPlc:
    def test_underwater_roundtrip_multipath(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 50)
        x = np.asarray(xm.underwater_modulate(jnp.asarray(bits)))
        # reverberant channel: direct + delayed echo
        x = x + 0.4 * np.roll(x, 37)
        got = np.asarray(xm.underwater_demodulate(
            jnp.asarray(x.astype(np.complex64))))
        np.testing.assert_array_equal(got, bits)

    def test_plc_roundtrip_with_narrowband_noise(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 40)
        x = np.asarray(xm.plc_modulate(jnp.asarray(bits)))
        t = np.arange(x.shape[0]) / 250e3
        # narrowband interferer right on carrier 0
        x = x + 0.8 * np.exp(2j * np.pi * 75e3 * t)
        got = np.asarray(xm.plc_demodulate(
            jnp.asarray(x.astype(np.complex64))))
        # S-FSK: the clean carrier still decides most bits
        assert np.mean(got == bits) > 0.9


class TestBackscatter:
    def test_rfid_fm0_decode(self):
        fs, blf = 1e6, 40e3
        half = int(fs / blf / 2)
        bits = np.array([1, 0, 1, 1, 0, 0, 1, 0])
        # FM0: bit 1 = constant level in the bit (flips at boundary);
        # bit 0 = mid-bit transition
        level = 1.0
        sig = []
        for b in bits:
            level = -level  # boundary transition
            if b:
                sig += [level] * (2 * half)
            else:
                sig += [level] * half + [-level] * half
                level = -level
        x = (np.asarray(sig) + 2.0).astype(np.complex64)  # carrier bias
        got = np.asarray(xm.rfid_backscatter_decode(jnp.asarray(x),
                                                    blf, fs))
        np.testing.assert_array_equal(got, bits)

    def test_ambient_backscatter(self):
        rng = np.random.default_rng(4)
        frames = np.repeat([1, 0, 1, 1, 0], 64).astype(float)
        env = 1.0 + 0.3 * frames + 0.02 * rng.standard_normal(320)
        bits, _ = xm.ambient_backscatter_detect(
            jnp.asarray(env.astype(np.float32)), frame=64)
        np.testing.assert_array_equal(np.asarray(bits), [1, 0, 1, 1, 0])


class TestVlcOptical:
    def test_vlc_manchester_roundtrip(self):
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, 64)
        w = xm.vlc_modulate(jnp.asarray(bits), sps=8)
        assert float(jnp.min(w)) >= 0.0  # intensity is non-negative
        got = np.asarray(xm.vlc_demodulate(w, sps=8))
        np.testing.assert_array_equal(got, bits)

    def test_vppm_dimming_duty(self):
        w = np.asarray(xm.vlc_modulate(jnp.asarray([1, 0] * 8), sps=16,
                                       kind="vppm", dimming=0.25))
        assert abs(w.mean() - 0.25) < 0.05  # duty == dimming

    def test_coherent_receiver_fixes_phase(self):
        rng = np.random.default_rng(6)
        table = mp.constellation_table("qpsk")
        idx = rng.integers(0, 4, 3000)
        tx = np.asarray(table)[idx] * np.exp(1j * 0.6) * 3.0
        got, y = xm.coherent_optical_receive(
            jnp.asarray(tx.astype(np.complex64)), table)
        tail_ok = np.mean(np.abs(np.angle(np.asarray(y[2000:]) ** 4))
                          < 0.3)
        assert tail_ok > 0.9

    def test_wdm_mux_demux(self):
        rng = np.random.default_rng(7)
        chans = [np.repeat(rng.standard_normal(32), 64).astype(
            np.complex64) for _ in range(3)]
        x = xm.wdm_mux([jnp.asarray(c) for c in chans])
        back = np.asarray(xm.wdm_demux(x, 3))
        # correlation per channel (skip filter transient)
        for k in range(3):
            c = np.corrcoef(back[k][200:-200].real,
                            chans[k][150:-250].real)[0, 1]
            assert abs(c) > 0.7

    def test_mzi_transfer(self):
        t0 = float(xm.photonic_mzi_transfer(jnp.asarray(0.0)))
        tpi = float(xm.photonic_mzi_transfer(jnp.asarray(np.pi)))
        assert t0 > 0.99 and tpi < 0.01


class TestDab:
    def test_dab_dqpsk_roundtrip(self):
        rng = np.random.default_rng(8)
        nc = 64
        bits = rng.integers(0, 2, 2 * nc * 4)  # 4 OFDM symbols
        x, _ = xm.dab_symbol_modulate(jnp.asarray(bits), n_carriers=nc,
                                      n_fft=128)
        got = np.asarray(xm.dab_symbol_demodulate(x, n_carriers=nc,
                                                  n_fft=128))
        np.testing.assert_array_equal(got, bits)

    def test_drm_params(self):
        p = xm.drm_ofdm_params("B")
        assert p["carriers"] == 206


class TestPower:
    def test_pmu_estimates_offnominal_freq(self):
        fs = 10_000.0
        t = np.arange(2000) / fs
        v = 1.5 * np.cos(2 * np.pi * 50.3 * t + 0.4)
        amp, ph, f = xm.pmu_phasor(jnp.asarray(v.astype(np.float32)),
                                   fs, 50.0)
        assert abs(float(amp) - 1.5) < 0.05
        assert abs(float(f) - 50.3) < 0.05

    def test_harmonics_thd(self):
        fs = 10_000.0
        t = np.arange(4000) / fs
        v = np.sin(2 * np.pi * 50 * t) + 0.1 * np.sin(2 * np.pi * 150
                                                      * t)
        amps, thd = xm.harmonics_analyze(
            jnp.asarray(v.astype(np.float32)), fs, 50.0)
        a = np.asarray(amps)
        assert abs(a[0] - 1.0) < 0.02 and abs(a[2] - 0.1) < 0.02
        assert abs(float(thd) - 0.1) < 0.02

    def test_power_quality_events(self):
        fs, f0 = 5000.0, 50.0
        cyc = int(fs / f0)
        t = np.arange(cyc) / fs
        base = np.sin(2 * np.pi * f0 * t)
        sig = np.concatenate([base, base, 0.5 * base, base, 1.3 * base,
                              0.0 * base])
        events = xm.power_quality_classify(sig, fs, f0)
        kinds = [k for _, k in events]
        assert "sag" in kinds and "swell" in kinds
        assert "interruption" in kinds

    def test_mppt_climbs_hill(self):
        # P(v) peaks at v=5
        def panel(v):
            return max(0.0, 10.0 - (v - 5.0) ** 2) / max(v, 0.1)

        v = 2.0
        state = (0.0, 0.0, 1.0)
        for _ in range(100):
            i = panel(v)
            v, state = xm.mppt_perturb_observe(v, i, 0.1, state)
        assert abs(v - 5.0) < 0.5

    def test_bldc_sectors(self):
        sector, drive = xm.bldc_commutation(np.array([0.01]), 1)
        assert sector[0] == 0
        np.testing.assert_array_equal(drive[0], [1, -1, 0])
        s2, _ = xm.bldc_commutation(np.array([np.pi]), 1)
        assert s2[0] == 3

    def test_4_20ma_roundtrip(self):
        ma = xm.industrial_4_20ma_encode(jnp.asarray([0.0, 50.0, 100.0]),
                                         0.0, 100.0)
        np.testing.assert_allclose(np.asarray(ma), [4, 12, 20])
        back = xm.industrial_4_20ma_decode(ma, 0.0, 100.0)
        np.testing.assert_allclose(np.asarray(back), [0, 50, 100])


class TestQkd:
    def test_bb84_clean_and_noisy(self):
        a, b, qber = xm.bb84_sift(None, 4000, error_rate=0.0)
        assert qber == 0.0
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert 1600 < a.shape[0] < 2400  # ~half sifted
        _, _, qber2 = xm.bb84_sift(None, 4000, error_rate=0.1)
        assert 0.05 < qber2 < 0.15  # eavesdropper/noise detectable
