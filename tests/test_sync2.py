"""Tests for second-tier sync/timing/control blocks (sync2.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import sync2


def _tone(n, f, fs, snr_db=None, seed=0):
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
        x = x + sigma * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
    return x.astype(np.complex64)


class TestCarrier:
    def test_afc_centers_tone(self):
        fs = 10_000.0
        x = _tone(4000, 200.0, fs)
        y, hz, f_fin = sync2.afc(jnp.asarray(x), fs, alpha=0.05)
        assert abs(float(f_fin) - 200.0) < 10.0
        # corrected signal is near DC
        res = np.angle(np.asarray(y)[3001:3500]
                       * np.conj(np.asarray(y)[3000:3499]))
        assert abs(np.mean(res)) * fs / (2 * np.pi) < 20.0

    def test_carrier_recovery_qpsk(self):
        rng = np.random.default_rng(0)
        syms = np.exp(1j * (np.pi / 4 + np.pi / 2
                            * rng.integers(0, 4, 4000)))
        rot = syms * np.exp(1j * 0.3)  # constant phase error
        y, ph = sync2.carrier_recovery_mpsk(
            jnp.asarray(rot.astype(np.complex64)), order=4, bw=0.05)
        tail = np.asarray(y)[3000:]
        # the loop locks the 4th-power angle to zero (axis-aligned
        # constellation, modulo the inherent pi/2 ambiguity)
        errs = np.abs(np.angle(tail ** 4)) > 0.5
        assert errs.mean() < 0.05

    def test_pll_tracks_freq(self):
        fs = 8000.0
        x = _tone(6000, 40.0, fs)
        _, _, freqs = sync2.pll_carrier_tracking(jnp.asarray(x),
                                                 loop_bw=0.05)
        f_est = float(np.mean(np.asarray(freqs)[4000:])) * fs / (2 * np.pi)
        assert abs(f_est - 40.0) < 2.0
        lock = sync2.freq_lock_detector(freqs, tol=0.01, window=256)
        assert bool(np.asarray(lock)[-1])

    def test_rotation_detector(self):
        rng = np.random.default_rng(1)
        # axis-aligned QPSK (the detector's reference orientation)
        syms = np.exp(1j * (np.pi / 2 * rng.integers(0, 4, 2000)))
        rot = (syms * np.exp(1j * 0.2)).astype(np.complex64)
        est = float(sync2.constellation_rotation_detect(jnp.asarray(rot)))
        assert abs(est - 0.2) < 0.03

    def test_tuning_estimator(self):
        fs = 48_000.0
        x = _tone(8192, 1234.0, fs, snr_db=20)
        est = float(sync2.tuning_estimate(jnp.asarray(x), fs))
        assert abs(est - 1234.0) < 30.0


class TestTiming:
    def _bpsk(self, sps, n_sym, offset, seed=0):
        rng = np.random.default_rng(seed)
        bits = 2.0 * rng.integers(0, 2, n_sym) - 1.0
        up = np.zeros(n_sym * sps)
        up[::sps] = bits
        pulse = np.ones(sps)  # rectangular
        x = np.convolve(up, pulse)[:n_sym * sps]
        return np.roll(x, offset).astype(np.complex64), bits

    def test_feedforward_timing_estimate(self):
        sps = 8
        # RC-ish shaping needed for square-law timing tone; use
        # a raised-cosine pulse via hanning window
        rng = np.random.default_rng(2)
        n_sym = 512
        bits = 2.0 * rng.integers(0, 2, n_sym) - 1.0
        up = np.zeros(n_sym * sps)
        up[::sps] = bits
        pulse = np.hanning(2 * sps)
        for off in (0, 3, 5):
            x = np.roll(np.convolve(up, pulse)[:n_sym * sps], off)
            tau = float(sync2.feedforward_timing_estimate(
                jnp.asarray(x.astype(np.complex64)), sps))
            # estimator returns the pulse-center phase; relative shifts
            # must track the applied offset
            if off == 0:
                base = tau
            else:
                assert abs((tau - base - off) % sps) < 1.0 or \
                       abs((tau - base - off) % sps - sps) < 1.0

    def test_blind_timing_recover_decodes(self):
        sps = 8
        rng = np.random.default_rng(3)
        n_sym = 256
        bits = 2.0 * rng.integers(0, 2, n_sym) - 1.0
        up = np.zeros(n_sym * sps)
        up[::sps] = bits
        pulse = np.hanning(2 * sps)
        x = np.convolve(up, pulse)[: n_sym * sps]
        syms, tau = sync2.blind_timing_recover(
            jnp.asarray(x.astype(np.complex64)), sps)
        s = np.sign(np.asarray(syms).real)
        # aligned sampling: decisions match bits (up to small edge loss)
        k = min(len(s), n_sym) - 2
        match = np.mean(s[1:k] == bits[1:k])
        assert match > 0.95

    def test_symbol_sync_mm_converges(self):
        sps = 4
        rng = np.random.default_rng(4)
        n_sym = 2000
        bits = 2.0 * rng.integers(0, 2, n_sym) - 1.0
        up = np.zeros(n_sym * sps)
        up[::sps] = bits
        pulse = np.hanning(2 * sps)
        x = np.convolve(up, pulse)[:n_sym * sps].astype(np.complex64)
        syms = np.asarray(sync2.symbol_sync_mm(jnp.asarray(x), sps,
                                               bw=0.05))
        tail = np.sign(syms.real[-500:])
        # after convergence the magnitudes should cluster near peaks
        assert np.mean(np.abs(syms.real[-500:])) > 0.5

    def test_ted_zero_at_aligned(self):
        # ideal eye: symbol centers are +-1, transition midpoints are
        # the linear average -> Gardner error is exactly zero when the
        # strobes land on centers
        sps = 8
        rng = np.random.default_rng(10)
        bits = 2.0 * rng.integers(0, 2, 201) - 1.0
        centers = np.arange(201) * sps
        t = np.arange(200 * sps)
        x = np.interp(t, centers, bits).astype(np.complex64)
        e = np.asarray(sync2.timing_error_detector(jnp.asarray(x), sps))
        assert abs(np.mean(e)) < 0.05
        h = np.asarray(sync2.hybrid_timing_phase_detector(
            jnp.asarray(x), sps))
        assert np.isfinite(h).all()

    def test_delay_lock_loop_converges(self):
        # chips oversampled by sps so the correlation triangle is wide
        # enough for the +-sps/2 early/late pull-in
        sps = 4
        rng = np.random.default_rng(5)
        chips = 2.0 * rng.integers(0, 2, 32) - 1.0
        ref = np.repeat(chips, sps).astype(np.complex64)
        x = np.zeros(512, np.complex64)
        true_delay = 6
        x[true_delay:true_delay + ref.shape[0]] = ref
        final, _ = sync2.delay_lock_loop(jnp.asarray(x), jnp.asarray(ref),
                                         sps, bw=0.2)
        assert abs(float(final) - true_delay) < 1.5


class TestCorrelators:
    def test_cross_correlator_lag(self):
        rng = np.random.default_rng(6)
        b = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        x = np.zeros(256, np.complex64)
        x[100:164] = b
        lags, c = sync2.cross_correlator(jnp.asarray(x), jnp.asarray(b))
        k = int(np.argmax(np.abs(np.asarray(c))))
        assert int(np.asarray(lags)[k]) == 100

    def test_correlate_estimate_phase(self):
        rng = np.random.default_rng(7)
        p = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        x = np.zeros(256, np.complex64)
        x[50:114] = p * np.exp(1j * 0.7)
        found, lag, phase, gain = sync2.correlate_estimate(
            jnp.asarray(x), jnp.asarray(p), threshold=0.3)
        assert bool(found) and int(lag) == 50
        assert abs(float(phase) - 0.7) < 0.05

    def test_periodic_autocorrelator_cyclic(self):
        seg = np.exp(2j * np.pi * np.random.default_rng(8)
                     .standard_normal(32)).astype(np.complex64)
        x = np.tile(seg, 12)
        vals = np.asarray(sync2.periodic_autocorrelator(
            jnp.asarray(x), 32, 4))
        assert np.all(np.abs(vals) > 0.9)

    def test_golay_pair_perfect_autocorr(self):
        ga, gb = sync2.golay_complementary_pair(32)
        ca = np.correlate(np.asarray(ga), np.asarray(ga), "full")
        cb = np.correlate(np.asarray(gb), np.asarray(gb), "full")
        s = ca + cb
        assert abs(s[31] - 64.0) < 1e-4
        assert np.abs(np.delete(s, 31)).max() < 1e-4

    def test_preamble_gen(self):
        p = np.asarray(sync2.preamble_gen("alternating", 16))
        np.testing.assert_array_equal(p[:4], [1, 0, 1, 0])
        b = np.asarray(sync2.preamble_gen("barker13", 13))
        assert b.sum() == 9


class TestAgcGate:
    def test_feedforward_agc_normalizes(self):
        x = 0.01 * np.ones(512, np.complex64)
        y = np.asarray(sync2.feedforward_agc(jnp.asarray(x), 1.0, 64))
        assert abs(np.abs(y).mean() - 1.0) < 0.01

    def test_agc_attack_decay(self):
        x = np.concatenate([np.full(500, 0.1), np.full(500, 10.0)])
        y, _ = sync2.agc_attack_decay(jnp.asarray(x.astype(np.complex64)),
                                      1.0, attack=0.2, decay=0.05)
        y = np.abs(np.asarray(y))
        assert abs(y[450] - 1.0) < 0.3   # gained up
        assert abs(y[-1] - 1.0) < 0.3    # gained down after step

    def test_burst_gate_hang(self):
        p = np.full(100, -40.0)
        p[10:30] = 0.0
        g = np.asarray(sync2.burst_gating_controller(
            jnp.asarray(p), open_db=-10.0, close_db=-30.0, hang=8))
        assert g[15] == 1
        assert g[33] == 1      # hang keeps it open briefly
        assert g[60] == 0      # eventually closes


class TestControl:
    def test_pid_settles_error(self):
        # PID acting on a constant error: integral term ramps output
        u, (integ, last) = sync2.pid_controller(
            jnp.ones(100), kp=1.0, ki=0.1, kd=0.0)
        u = np.asarray(u)
        assert u[0] < u[-1]
        assert abs(float(integ) - 100.0) < 1e-4

    def test_control_loop_tracks(self):
        phs, fs, _ = sync2.control_loop_2nd(jnp.ones(200), 0.1)
        assert float(np.asarray(phs)[-1]) > float(np.asarray(phs)[0])


class TestClocks:
    def test_gps_time_roundtrip(self):
        t = 1_700_000_000.0
        g = sync2.GpsTime.from_unix(t)
        assert abs(g.to_unix() - t) < 1e-6
        assert 0 <= g.tow < 604800

    def test_irig_b_roundtrip(self):
        for tod in (0, 3661, 86399 - 1):
            w, _ = sync2.irig_b_encode(tod)
            assert sync2.irig_b_decode(w) == tod % 86400

    def test_network_time_offset(self):
        # server clock 5 s ahead; symmetric 0.1 s path delay
        t1, t2, t3, t4 = 0.0, 5.1, 5.2, 0.3
        off, delay = sync2.network_time_offset(t1, t2, t3, t4)
        assert abs(off - 5.0) < 1e-9
        assert abs(delay - 0.2) < 1e-9

    def test_multi_rate_clock(self):
        clk = sync2.MultiRateClock(1000.0, (2, 5))
        a, b = clk.advance(10)
        assert (a, b) == (5, 2)
        assert clk.time() == 0.01

    def test_allan_deviation_white_noise(self):
        rng = np.random.default_rng(9)
        y = rng.standard_normal(10_000).astype(np.float32)
        s1 = float(sync2.csac_allan_deviation(jnp.asarray(y), 10))
        s2 = float(sync2.csac_allan_deviation(jnp.asarray(y), 100))
        # white FM: sigma ~ tau^-1/2
        assert s2 < s1
        assert abs(s1 / s2 - np.sqrt(10)) < 1.5
