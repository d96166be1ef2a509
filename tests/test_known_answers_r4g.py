"""Round-4 KA batch G: synchronizer S-curve laws and equalizer
optimality identities — timing-error detectors must have odd-symmetric
S-curves with a zero at perfect timing (Gardner/M&M/early-late theory),
Schmidl-Cox must peak at the constructed preamble with unit metric,
and the closed-form MMSE/FDE equalizers must satisfy the Wiener
optimality condition checked against an independently built normal-
equation in numpy.

Reference roles: gardner_ted.rs, mueller_muller_ted.rs,
early_late_gate.rs, ofdm_sync_schmidl_cox.rs, costas_loop.rs, pll.rs,
fll_band_edge.rs, mmse_equalizer.rs, frequency_domain_equalizer.rs,
mlse_equalizer.rs, cma_equalizer.rs.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _rc_pulse(sps, span=8, beta=0.5):
    """Raised-cosine pulse (textbook closed form, built here)."""
    t = np.arange(-span * sps, span * sps + 1) / sps
    num = np.cos(np.pi * beta * t)
    den = 1 - (2 * beta * t) ** 2
    p = np.sinc(t) * np.where(np.abs(den) < 1e-8,
                              np.pi / 4, num / np.maximum(np.abs(den),
                                                          1e-8)
                              * np.sign(den))
    # fix the removable singularity exactly
    sing = np.abs(den) < 1e-8
    p[sing] = np.sinc(t[sing]) * np.pi / 4
    return p


def _bpsk_wave(n_sym, sps, shift, seed=0, beta=0.5):
    """RC-shaped BPSK, sampled with a fractional timing shift (via
    frequency-domain delay, exact)."""
    rng = np.random.default_rng(seed)
    a = 2.0 * rng.integers(0, 2, n_sym) - 1.0
    up = np.zeros(n_sym * sps)
    up[::sps] = a
    x = np.convolve(up, _rc_pulse(sps, beta=beta))
    n = len(x)
    f = np.fft.fftfreq(n)
    x = np.fft.ifft(np.fft.fft(x) * np.exp(-2j * np.pi * f * shift))
    return x.astype(np.complex64), a


class TestTimingSCurves:
    def _mean_err(self, fn, shift, sps=8, **kw):
        x, _ = _bpsk_wave(400, sps, shift + sps * 8, **kw)
        e = np.asarray(fn(jnp.asarray(x), sps))
        return float(np.mean(e[8:-8]))

    def test_gardner_zero_at_perfect_timing_and_odd(self):
        from r4w_tpu.ops.sync import gardner_ted

        e0 = self._mean_err(gardner_ted, 0.0)
        ep = self._mean_err(gardner_ted, 1.5)
        em = self._mean_err(gardner_ted, -1.5)
        scale = max(abs(ep), abs(em))
        assert abs(e0) < 0.2 * scale  # zero crossing at τ=0
        assert np.sign(ep) == -np.sign(em)  # odd S-curve
        # odd symmetry magnitude within 30%
        assert abs(ep + em) < 0.3 * scale

    def test_mueller_muller_zero_and_odd(self):
        from r4w_tpu.ops.sync import mueller_muller_ted

        e0 = self._mean_err(mueller_muller_ted, 0.0)
        ep = self._mean_err(mueller_muller_ted, 1.0)
        em = self._mean_err(mueller_muller_ted, -1.0)
        scale = max(abs(ep), abs(em))
        assert abs(e0) < 0.2 * scale
        assert np.sign(ep) == -np.sign(em)

    def test_early_late_zero_and_odd(self):
        from r4w_tpu.ops.sync import early_late_gate

        e0 = self._mean_err(early_late_gate, 0.0)
        ep = self._mean_err(early_late_gate, 1.0)
        em = self._mean_err(early_late_gate, -1.0)
        scale = max(abs(ep), abs(em))
        assert abs(e0) < 0.25 * scale
        assert np.sign(ep) == -np.sign(em)

    def test_best_timing_offset_exact(self):
        from r4w_tpu.ops.sync import best_timing_offset

        sps = 8
        for true_off in (0, 3, 5):
            x, _ = _bpsk_wave(256, sps, 0.0, seed=4, beta=0.9)
            got = int(best_timing_offset(jnp.asarray(
                np.roll(x, true_off)), sps))
            # energy-max strobe: RC pulse peaks at the symbol instants
            assert (got - true_off) % sps in (0, 1, sps - 1)


class TestSchmidlCox:
    def test_peak_position_and_unit_metric(self):
        from r4w_tpu.ops.sync import schmidl_cox

        rng = np.random.default_rng(3)
        half = 64
        h = (rng.standard_normal(half) + 1j * rng.standard_normal(half)
             ).astype(np.complex64)
        pre = np.concatenate([h, h])
        # realistic frame: noise, preamble, then unit-power DATA (an
        # all-quiet tail lets the relative R floor create spurious
        # metric spikes — the metric is defined for continuous signals)
        x = (0.05 * (rng.standard_normal(500)
                     + 1j * rng.standard_normal(500))).astype(np.complex64)
        d0 = 137
        x[d0:d0 + 2 * half] += pre
        data = (rng.standard_normal(500 - d0 - 2 * half)
                + 1j * rng.standard_normal(500 - d0 - 2 * half))
        x[d0 + 2 * half:] += data.astype(np.complex64)
        d_hat, m, _ = schmidl_cox(jnp.asarray(x), half)
        m = np.asarray(m)
        # M = |P|²/R² == 1 on the preamble start (identical halves)
        assert m[d0] > 0.95
        assert abs(int(d_hat) - d0) <= 2


class TestCarrierLoops:
    def test_cfo_estimate_exact_on_tone(self):
        from r4w_tpu.ops.sync import cfo_estimate

        fs, f0 = 50_000.0, 1234.56
        t = np.arange(16384) / fs
        x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        got = float(cfo_estimate(jnp.asarray(x), fs))
        assert abs(got - f0) < 2.0

    def test_pll_tracks_frequency_offset(self):
        from r4w_tpu.ops.sync import pll_track_tone

        fs = 1.0
        df = 0.004  # cycles/sample
        n = 4000
        x = np.exp(2j * np.pi * df * np.arange(n)).astype(np.complex64)
        out = pll_track_tone(jnp.asarray(x), loop_bw=0.02)
        freq = np.asarray(out.freq)
        # steady state: tracked frequency == offset (rad/sample)
        want = 2 * np.pi * df
        assert abs(float(np.mean(freq[-500:])) - want) < 0.1 * want

    def test_costas_locks_bpsk_phase(self):
        from r4w_tpu.ops.sync import costas_loop

        rng = np.random.default_rng(9)
        a = 2.0 * rng.integers(0, 2, 4000) - 1.0
        phi = 0.6
        x = (a * np.exp(1j * phi)).astype(np.complex64)
        out = costas_loop(jnp.asarray(x), loop_bw=0.02)
        y = np.asarray(out.y)[-1000:]
        # locked: the derotated output is real BPSK (Q ≈ 0, |I| ≈ 1)
        assert np.abs(y.imag).mean() < 0.05
        np.testing.assert_allclose(np.abs(y.real), 1.0, atol=0.05)
        # and the loop's final phase equals the offset (mod π)
        resid = (float(out.phase) - phi) % np.pi
        resid = min(resid, np.pi - resid)
        assert resid < 0.1

    def test_fll_band_edge_tracks_offset_sign_and_magnitude(self):
        """Band-edge FLL theory: the loop frequency converges toward
        the injected carrier offset with the matching sign, and stays
        at zero for an offset-free input."""
        from r4w_tpu.ops.sync import fll_band_edge

        sps = 4
        x, _ = _bpsk_wave(1200, sps, 0.0, seed=7, beta=0.35)
        n = len(x)
        t = np.arange(n)
        for df in (0.01, -0.01):
            yin = (x * np.exp(2j * np.pi * df * t)).astype(np.complex64)
            _y, track = fll_band_edge(jnp.asarray(yin), sps,
                                      rolloff=0.35)
            tail = float(np.mean(np.asarray(track)[-800:])) / (2 * np.pi)
            assert np.sign(tail) == np.sign(df), (df, tail)
            assert abs(tail) > 0.3 * abs(df), (df, tail)
        _y0, track0 = fll_band_edge(jnp.asarray(x.astype(np.complex64)),
                                    sps, rolloff=0.35)
        assert abs(float(np.mean(np.asarray(track0)[-800:]))
                   / (2 * np.pi)) < 0.002


class TestEqualizerOptimality:
    CH = np.array([1.0, 0.45 - 0.2j, -0.25j], np.complex128)

    def _mse(self, w, h, gamma, delay):
        """Analytic MSE J(w) for unit-power iid symbols + AWGN,
        built independently from the convolution matrix."""
        n = len(w)
        hm = np.zeros((n + len(h) - 1, n), np.complex128)
        for i in range(n):
            hm[i:i + len(h), i] = h
        e_d = np.zeros(n + len(h) - 1, np.complex128)
        e_d[delay] = 1.0
        r = hm.conj().T @ hm + np.eye(n) / gamma
        return float(np.real(w.conj() @ r @ w
                             - 2 * np.real(w.conj() @ (hm.conj().T @ e_d))
                             + 1.0))

    def test_mmse_weights_satisfy_wiener_optimality(self):
        """J(w_mmse) ≤ J(w_mmse + δ) for random perturbations δ — the
        defining property, evaluated with an independently constructed
        quadratic form."""
        from r4w_tpu.ops.equalizers import mmse_block_equalize

        n_taps, snr_db = 15, 20.0
        delay = (n_taps + len(self.CH)) // 2
        rng = np.random.default_rng(5)
        rx = (rng.standard_normal(64)
              + 1j * rng.standard_normal(64)).astype(np.complex64)
        _, w = mmse_block_equalize(rx, self.CH, snr_db, n_taps, delay)
        w = np.asarray(w, np.complex128)
        gamma = 10 ** (snr_db / 10)
        j0 = self._mse(w, self.CH, gamma, delay)
        for k in range(8):
            d = 0.02 * (rng.standard_normal(n_taps)
                        + 1j * rng.standard_normal(n_taps))
            assert self._mse(w + d, self.CH, gamma, delay) > j0

    def test_mmse_cascade_approaches_zf_at_high_snr(self):
        from r4w_tpu.ops.equalizers import mmse_block_equalize

        n_taps, delay = 31, (31 + 3) // 2
        rx = np.zeros(64, np.complex64)
        _, w = mmse_block_equalize(rx, self.CH, 60.0, n_taps, delay)
        casc = np.convolve(np.asarray(w), self.CH)
        peak = np.argmax(np.abs(casc))
        assert peak == delay
        assert abs(casc[peak]) > 0.98
        side = np.abs(np.delete(casc, peak)).max()
        assert side < 0.05

    def test_fde_exactly_inverts_circular_channel_high_snr(self):
        from r4w_tpu.ops.equalizers import fde_equalize

        rng = np.random.default_rng(6)
        n = 64
        x = ((rng.integers(0, 2, n) * 2 - 1)
             + 1j * (rng.integers(0, 2, n) * 2 - 1)).astype(np.complex64)
        h = np.zeros(n, np.complex64)
        h[:3] = self.CH.astype(np.complex64)
        rx = np.fft.ifft(np.fft.fft(x) * np.fft.fft(h)).astype(
            np.complex64)
        y = np.asarray(fde_equalize(rx[None, :], np.fft.fft(h),
                                    snr_db=80.0))[0]
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_mlse_exact_recovery_two_tap_channel(self):
        from r4w_tpu.ops.equalizers import mlse_equalize

        rng = np.random.default_rng(8)
        a = (2.0 * rng.integers(0, 2, 60) - 1.0).astype(np.complex64)
        h = np.array([1.0, 0.9], np.complex64)  # deep ISI
        y = np.convolve(a, h)[: len(a)].astype(np.complex64)
        const = np.array([-1.0, 1.0], np.complex64)
        sym = np.asarray(mlse_equalize(y, h, const))
        got = const[sym] if sym.dtype.kind in "iu" else sym
        np.testing.assert_allclose(got.real[:50], a.real[:50], atol=0.1)

    def test_cma_restores_constant_modulus(self):
        from r4w_tpu.ops.equalizers import cma_equalize

        rng = np.random.default_rng(10)
        a = np.exp(1j * (np.pi / 4 + np.pi / 2
                         * rng.integers(0, 4, 4000))).astype(np.complex64)
        rx = np.convolve(a, np.array([1.0, 0.3], np.complex64)
                         )[: len(a)].astype(np.complex64)
        y, _err, _w = cma_equalize(jnp.asarray(rx), n_taps=11, mu=0.01)
        y = np.asarray(y)
        mod_in = np.abs(np.abs(rx) - 1.0).mean()
        mod_out = np.abs(np.abs(y[-1000:]) - 1.0).mean()
        assert mod_out < 0.5 * mod_in
