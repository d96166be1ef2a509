"""Tests for symbol-mapping & composed-modem fills (mapping.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import mapping as mp


class TestMapping:
    def test_map_demap_roundtrip_all_constellations(self):
        for name in ("bpsk", "qpsk", "8psk", "qam16", "qam64"):
            table = mp.constellation_table(name)
            m = table.shape[0]
            idx = jnp.arange(m, dtype=jnp.int32)
            pts = mp.symbol_map(idx, table)
            back = mp.symbol_demap(pts, table)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    def test_symbol_slicer_qpsk(self):
        x = jnp.asarray([1 + 1j, -1 + 1j, 1 - 1j, -1 - 1j])
        s = np.asarray(mp.symbol_slicer(x, "qpsk"))
        np.testing.assert_array_equal(s, [0, 2, 1, 3])

    def test_chunks_to_symbols(self):
        table = mp.constellation_table("qpsk")
        bits = jnp.asarray([0, 0, 0, 1, 1, 0, 1, 1])
        pts = mp.chunks_to_symbols(bits, table, 2)
        np.testing.assert_array_equal(
            np.asarray(mp.symbol_demap(pts, table)), [0, 1, 2, 3])

    def test_map_bb(self):
        t = jnp.asarray(list(range(255, -1, -1)))
        y = mp.map_bb(jnp.asarray([0, 1, 255]), t)
        np.testing.assert_array_equal(np.asarray(y), [255, 254, 0])

    def test_constellation_receiver_metrics(self):
        table = mp.constellation_table("qpsk")
        rng = np.random.default_rng(0)
        idx = rng.integers(0, 4, 500)
        pts = np.asarray(mp.symbol_map(jnp.asarray(idx), table))
        noisy = pts + 0.05 * (rng.standard_normal(500)
                              + 1j * rng.standard_normal(500))
        got, evm, margin = mp.constellation_receiver(
            jnp.asarray(noisy.astype(np.complex64)), table)
        np.testing.assert_array_equal(np.asarray(got), idx)
        assert 0.02 < float(evm) < 0.12
        assert float(margin) > 0.5

    def test_soft_decision_decode(self):
        bits, conf = mp.soft_decision_decode(jnp.asarray([5.0, -5.0, 0.1]))
        np.testing.assert_array_equal(np.asarray(bits), [0, 1, 0])
        c = np.asarray(conf)
        assert c[0] > 0.95 and c[2] < 0.1

    def test_vector_quantize(self):
        cb = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
        idx, rec = mp.vector_quantize(jnp.asarray([[0.1, -0.1],
                                                   [0.9, 1.2]]), cb)
        np.testing.assert_array_equal(np.asarray(idx), [0, 1])
        np.testing.assert_allclose(np.asarray(rec)[1], [1, 1])


class TestOqpskQam:
    def test_oqpsk_roundtrip(self):
        rng = np.random.default_rng(1)
        bits = jnp.asarray(rng.integers(0, 2, 128), jnp.int32)
        tx = mp.oqpsk_modulate(bits, sps=4)
        rx = mp.oqpsk_demodulate(tx, sps=4)
        np.testing.assert_array_equal(np.asarray(rx)[:120],
                                      np.asarray(bits)[:120])

    def test_oqpsk_no_zero_crossings(self):
        rng = np.random.default_rng(2)
        bits = jnp.asarray(rng.integers(0, 2, 256), jnp.int32)
        tx = np.asarray(mp.oqpsk_modulate(bits, sps=4))
        # envelope never collapses through zero (min |x| bounded away)
        assert np.abs(tx[8:-8]).min() > 0.4

    def test_qam_transceiver_clean_and_noisy(self):
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, 4000), jnp.int32)
        _, rx = mp.qam_transceiver(bits, 16)
        np.testing.assert_array_equal(np.asarray(rx), np.asarray(bits))
        _, rx_n = mp.qam_transceiver(bits, 16, snr_db=20.0,
                                     key=jax.random.key(0))
        ber = np.mean(np.asarray(rx_n) != np.asarray(bits))
        assert ber < 0.01


class TestAnalog:
    def test_am_demod_recovers_tone(self):
        fs = 48_000.0
        t = np.arange(9600) / fs
        msg = 0.5 * np.sin(2 * np.pi * 1000 * t)
        x = ((1.0 + msg)).astype(np.complex64)  # baseband AM envelope
        y = np.asarray(mp.am_demod(jnp.asarray(x)))
        spec = np.abs(np.fft.rfft(y[200:] * np.hanning(len(y) - 200)))
        f = np.fft.rfftfreq(len(y) - 200, 1 / fs)
        assert abs(f[np.argmax(spec)] - 1000) < 20

    def test_ssb_suppresses_opposite_sideband(self):
        fs = 8000.0
        t = np.arange(8192) / fs
        audio = np.sin(2 * np.pi * 700 * t).astype(np.float32)
        usb = np.asarray(mp.ssb_modulate(jnp.asarray(audio), fs,
                                         upper=True))
        spec = np.abs(np.fft.fft(usb * np.hanning(8192)))
        pos = spec[int(700 / fs * 8192) - 5:int(700 / fs * 8192) + 5].max()
        neg = spec[-int(700 / fs * 8192) - 5:-int(700 / fs * 8192)
                   + 5].max()
        assert pos > 20 * neg

    def test_fm_receiver_tone(self):
        fs = 240_000.0
        t = np.arange(48_000) / fs
        msg = np.sin(2 * np.pi * 1000 * t)
        dev = 75_000.0
        phase = 2 * np.pi * dev * np.cumsum(msg) / fs
        x = np.exp(1j * phase).astype(np.complex64)
        audio = np.asarray(mp.fm_receiver(jnp.asarray(x), fs,
                                          audio_rate=48_000.0))
        spec = np.abs(np.fft.rfft(audio[500:] * np.hanning(
            len(audio) - 500)))
        f = np.fft.rfftfreq(len(audio) - 500, 1 / 48_000.0)
        assert abs(f[np.argmax(spec[5:])] + 0 - 1000) < 100 or \
            abs(f[np.argmax(spec)] - 1000) < 100

    def test_fm_stereo_decoder_separates(self):
        fs = 192_000.0
        t = np.arange(96_000) / fs
        left = np.sin(2 * np.pi * 800 * t)
        right = np.sin(2 * np.pi * 2000 * t)
        pilot = 0.1 * np.sin(2 * np.pi * 19_000 * t)
        sub = (left - right) / 2 * np.sin(2 * np.pi * 38_000 * t)
        mpx = ((left + right) / 2 + pilot + sub).astype(np.float32)
        L, R, present = mp.fm_stereo_decode(jnp.asarray(mpx), fs)
        assert bool(present)
        L, R = np.asarray(L)[2000:], np.asarray(R)[2000:]
        fL = np.fft.rfftfreq(L.shape[0], 1 / fs)
        sL = np.abs(np.fft.rfft(L * np.hanning(L.shape[0])))
        sR = np.abs(np.fft.rfft(R * np.hanning(R.shape[0])))
        iL800 = np.argmin(np.abs(fL - 800))
        iL2000 = np.argmin(np.abs(fL - 2000))
        # left channel dominated by 800 Hz, right by 2 kHz
        assert sL[iL800] > 3 * sL[iL2000]
        assert sR[iL2000] > 3 * sR[iL800]

    def test_rds_subcarrier_demod_runs(self):
        fs = 192_000.0
        n = 96_000
        t = np.arange(n) / fs
        rng = np.random.default_rng(4)
        # build an RDS-modulated MPX: pilot + 57k BPSK data
        n_bits = int(n / fs * 1187.5) + 2
        diff_bits = rng.integers(0, 2, n_bits)
        enc = np.cumsum(diff_bits) % 2  # differential encode
        sps = fs / 1187.5
        sym_idx = np.minimum((t * 1187.5).astype(int), n_bits - 1)
        bpsk = 2.0 * enc[sym_idx] - 1.0
        pilot = 0.1 * np.sin(2 * np.pi * 19_000 * t)
        mpx = (pilot + 0.3 * bpsk * np.cos(2 * np.pi * 57_000 * t)
               ).astype(np.float32)
        bits, soft = mp.rds_subcarrier_demod(jnp.asarray(mpx), fs)
        got = np.asarray(bits)[4:-4]
        want = diff_bits[4:4 + got.shape[0]]
        match = np.mean(got == want)
        # sign ambiguity of the recovered carrier → accept either
        assert match > 0.9 or match < 0.1


class TestOfdmAlloc:
    def test_allocate_deallocate_roundtrip(self):
        rng = np.random.default_rng(5)
        occupied = [-10, -5, -2, 2, 5, 10]
        pilots = [-7, 7]
        data = (rng.standard_normal(18)
                + 1j * rng.standard_normal(18)).astype(np.complex64)
        grid = mp.ofdm_carrier_allocate(jnp.asarray(data), 32,
                                        occupied, pilots)
        assert grid.shape == (3, 32)
        assert complex(grid[0, (-7) % 32]) == 1 + 0j
        back = np.asarray(mp.ofdm_carrier_deallocate(grid, occupied))
        np.testing.assert_allclose(back[:18], data, atol=1e-6)

    def test_waterfill_properties(self):
        gains = jnp.asarray([1.0, 1.0, 0.01])
        p = np.asarray(mp.multicarrier_waterfill(gains, 10.0))
        assert abs(p.sum() - 10.0) < 0.01
        assert p[0] > p[2]  # bad channel gets less (or zero)

    def test_pilot_insert(self):
        s = jnp.arange(8).astype(jnp.complex64)
        y = np.asarray(mp.pilot_insert(s, 9 + 0j, 4))
        np.testing.assert_allclose(y[:5], [9, 0, 1, 2, 3])
        np.testing.assert_allclose(y[5:10], [9, 4, 5, 6, 7])


class TestPaprDetect:
    def test_cfr_reduces_papr(self):
        rng = np.random.default_rng(6)
        x = (rng.standard_normal(4096)
             + 1j * rng.standard_normal(4096)).astype(np.complex64)
        before = float(mp.peak_to_average(jnp.asarray(x)))
        after = float(mp.peak_to_average(
            mp.crest_factor_reduce(jnp.asarray(x), 3.0)))
        assert after < before

    def test_incoherent_detector_mfsk(self):
        fs = 8000.0
        freqs = [500.0, 1000.0, 1500.0, 2000.0]
        sym_len = 80
        rng = np.random.default_rng(7)
        syms = rng.integers(0, 4, 50)
        t = np.arange(sym_len) / fs
        x = np.concatenate([
            np.exp(2j * np.pi * freqs[s] * t) for s in syms
        ]).astype(np.complex64)
        got, _ = mp.incoherent_detect(jnp.asarray(x), freqs, fs, sym_len)
        np.testing.assert_array_equal(np.asarray(got), syms)

    def test_regenerate_bb(self):
        trig = np.zeros(100, bool)
        trig[[10, 12, 50]] = True  # 12 is a retrigger within period
        y = np.asarray(mp.regenerate_bb(trig, period=20, width=5, n=100))
        assert y[10:15].all() and not y[12 + 5]
        assert y[50:55].all()
        assert y.sum() == 10
