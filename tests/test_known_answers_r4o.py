"""Round-4 KA batch O: MIMO detection/precoding, synchrophasor, FM
receive chain, rate conversion, jitter, OSTBC, LPC and peak-logic
truths — all against closed forms (SVD diagonalization, FM
de-emphasis attenuation 1/√(1+(2πfτ)²), AR-process prediction filter,
exact peak-hold recursion) or numpy rederivations.

Reference roles: mimo_detector.rs, mimo_precoder.rs,
mimo_spatial_multiplexer.rs, orthogonal_space_time_block_code.rs,
phasor_measurement_unit.rs, fm_receiver.rs, sample_rate_converter.rs,
jitter_analyzer.rs, header_payload_demux.rs,
ultra_wideband_ranging.rs, peak_detector.rs, peak_hold.rs,
pilot_inserter.rs, speech_codec_lpc.rs, music_pitch_detector.rs,
periodic_autocorrelator.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# -------------------------------------------------------------- MIMO


class TestMimoDetectors:
    H = np.array([[0.9 + 0.2j, -0.4 + 0.7j],
                  [0.1 - 1.1j, 0.8 + 0.3j]], np.complex64)

    def test_zf_and_mmse_exact_recovery(self):
        """Noiseless y = H·x: ZF is exact for any invertible H; MMSE
        with σ² → 0 converges to ZF."""
        from r4w_tpu.ops.beamforming import (mimo_detect_mmse,
                                             mimo_detect_zf)

        rng = np.random.default_rng(1)
        x = (rng.standard_normal((50, 2))
             + 1j * rng.standard_normal((50, 2))).astype(np.complex64)
        y = x @ self.H.T
        zf = np.asarray(mimo_detect_zf(jnp.asarray(y), self.H))
        assert np.max(np.abs(zf - x)) < 1e-4
        mmse = np.asarray(mimo_detect_mmse(jnp.asarray(y), self.H,
                                           1e-8))
        assert np.max(np.abs(mmse - x)) < 1e-3

    def test_ml_detection_exact_indices(self):
        from r4w_tpu.ops.beamforming import mimo_detect_ml

        rng = np.random.default_rng(2)
        con = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))
                     ).astype(np.complex64)
        idx_true = rng.integers(0, 4, (30, 2))
        x = con[idx_true]
        y = x @ self.H.T
        combos, cand = mimo_detect_ml(jnp.asarray(y), self.H, con)
        assert np.array_equal(np.asarray(combos), idx_true)
        assert np.max(np.abs(np.asarray(cand) - x)) < 1e-5


class TestSvdPrecoding:
    def test_diagonalizes_channel(self):
        """Uᴴ·H·V = diag(s) with s ≥ 0 descending — the defining SVD
        precoding identity; precode→channel→combine turns the MIMO
        channel into independent scalar pipes."""
        from r4w_tpu.ops.beamforming import (mimo_precode_svd,
                                             spatial_multiplex)

        rng = np.random.default_rng(3)
        h = (rng.standard_normal((3, 3))
             + 1j * rng.standard_normal((3, 3))).astype(np.complex64)
        v, uh, s = mimo_precode_svd(h)
        v, uh, s = np.asarray(v), np.asarray(uh), np.asarray(s)
        eff = uh @ h @ v
        assert np.allclose(eff, np.diag(s), atol=1e-4)
        assert np.all(np.diff(s) <= 1e-6) and np.all(s >= 0)
        # unitarity of the precoder (power-preserving)
        assert np.allclose(v.conj().T @ v, np.eye(3), atol=1e-5)
        # spatial multiplexer normalizes total power across antennas
        streams = [np.ones(8, np.complex64)] * 4
        sm = np.asarray(spatial_multiplex(streams))
        assert np.sum(np.abs(sm[:, 0]) ** 2) == pytest.approx(1.0,
                                                              abs=1e-5)


class TestOstbc34:
    def test_orthogonal_design_and_recovery(self):
        """Rate-3/4 OSTBC: each 4×4 block satisfies
        BᴴB = (|s1|²+|s2|²+|s3|²)·I (complex orthogonal design), and
        matched-filter decoding through any flat channel returns the
        symbols exactly."""
        from r4w_tpu.ops.beamforming import (ostbc34_decode,
                                             ostbc34_encode)

        rng = np.random.default_rng(4)
        syms = (np.exp(1j * (np.pi / 4 + np.pi / 2
                             * rng.integers(0, 4, 12)))
                ).astype(np.complex64)
        blocks = np.asarray(ostbc34_encode(jnp.asarray(syms)))
        for b in blocks:
            gram = b.conj().T @ b
            assert np.allclose(gram, 3.0 * np.eye(4), atol=1e-5)
        h = (rng.standard_normal(4)
             + 1j * rng.standard_normal(4)).astype(np.complex64)
        rx = np.einsum("bta,a->bt", blocks, h)
        est = np.asarray(ostbc34_decode(jnp.asarray(rx), h))
        assert np.max(np.abs(est - syms)) < 1e-4


# ------------------------------------------------------ synchrophasor


class TestPmuPhasor:
    def test_amplitude_phase_frequency(self):
        from r4w_tpu.ops.exotic_modems import pmu_phasor

        fs, n = 6400.0, 1280  # 10 cycles at 50 Hz
        amp, ph = 1.5, 0.3
        t = np.arange(n) / fs
        x = amp * np.cos(2 * np.pi * 50.0 * t + ph)
        a, p, f = pmu_phasor(jnp.asarray(x, jnp.float32), fs)
        assert float(a) == pytest.approx(amp, rel=1e-3)
        assert float(p) == pytest.approx(ph, abs=5e-3)
        assert float(f) == pytest.approx(50.0, abs=0.01)
        # off-nominal input: the phase-slope corrector must report it
        x2 = np.cos(2 * np.pi * 50.5 * t)
        _, _, f2 = pmu_phasor(jnp.asarray(x2, jnp.float32), fs)
        assert float(f2) == pytest.approx(50.5, abs=0.05)


class TestPeriodicAutocorrelator:
    def test_periodic_vs_noise(self):
        from r4w_tpu.ops.sync2 import periodic_autocorrelator

        rng = np.random.default_rng(5)
        p, reps = 64, 12
        blk = (rng.standard_normal(p)
               + 1j * rng.standard_normal(p)).astype(np.complex64)
        per = np.tile(blk, reps)
        vals = np.asarray(periodic_autocorrelator(jnp.asarray(per), p,
                                                  n_periods=4))
        assert np.min(np.abs(vals)) > 0.999
        noise = (rng.standard_normal(p * reps) + 1j
                 * rng.standard_normal(p * reps)).astype(np.complex64)
        nv = np.asarray(periodic_autocorrelator(jnp.asarray(noise), p,
                                                n_periods=4))
        assert np.max(np.abs(nv)) < 0.2


# ---------------------------------------------------------- FM chain


class TestFmReceiver:
    def test_tone_amplitude_with_deemphasis_law(self):
        """FM mod (known deviation) → fm_receiver: the demodulated
        tone comes back at amplitude A/√(1+(2πf_m·τ)²) — quadrature
        discriminator gain exactly cancels the deviation scaling,
        leaving only the 75 µs de-emphasis pole."""
        from r4w_tpu.ops.mapping import fm_receiver
        from r4w_tpu.ops.modem import frequency_modulate

        fs, f_m, a_m, dev = 480e3, 1000.0, 0.8, 75e3
        n = 1 << 15
        t = np.arange(n) / fs
        msg = (a_m * np.cos(2 * np.pi * f_m * t)).astype(np.float32)
        # VCO sensitivity scaled so peak deviation = dev·a_m
        sens = 2 * np.pi * dev / fs
        tx = frequency_modulate(jnp.asarray(msg), sens)
        audio = np.asarray(fm_receiver(tx, fs, deviation_hz=dev))
        seg = slice(n // 2, n)
        ref = np.exp(-2j * np.pi * f_m * t[seg])
        amp = 2.0 * np.abs(np.mean(audio[seg] * ref))
        tau = 75e-6
        expect = a_m / np.sqrt(1.0 + (2 * np.pi * f_m * tau) ** 2)
        assert amp == pytest.approx(expect, rel=0.02)


class TestSampleRateConverter:
    def test_rational_ratio_preserves_tone(self):
        from r4w_tpu.ops.filters2 import sample_rate_converter

        fs_in, fs_out, f0 = 48000.0, 32000.0, 1000.0
        n = 1 << 14
        t = np.arange(n) / fs_in
        x = np.cos(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(sample_rate_converter(jnp.asarray(x), fs_in,
                                             fs_out))
        assert y.shape[0] == pytest.approx(n * fs_out / fs_in, abs=4)
        seg = y[512:-512]
        to = np.arange(seg.shape[0]) / fs_out
        ref = np.exp(-2j * np.pi * f0 * to)
        amp = 2.0 * np.abs(np.mean(seg * ref))
        assert amp == pytest.approx(1.0, rel=0.05)


# --------------------------------------------------------- metrology


class TestJitterAnalyzer:
    def test_known_tie_statistics(self):
        from r4w_tpu.ops.instruments import jitter_analyze

        rng = np.random.default_rng(6)
        n, period, sigma = 2000, 1e-6, 5e-9
        tie_true = sigma * rng.standard_normal(n)
        tie_true[0] = 0.0  # TIE is measured relative to the first edge
        edges = np.arange(n) * period + tie_true
        out = jitter_analyze(jnp.asarray(edges, jnp.float32), period)
        assert float(out["tie_rms_s"]) == pytest.approx(
            np.std(tie_true), rel=0.05)
        assert float(out["tie_pp_s"]) == pytest.approx(
            np.ptp(tie_true), rel=0.05)
        assert float(out["period_jitter_rms_s"]) == pytest.approx(
            np.std(np.diff(edges)), rel=0.05)


class TestTwrRange:
    def test_closed_form(self):
        from r4w_tpu.ops.mimo import twr_range

        c = 299_792_458.0
        d_true = 37.5
        t_reply = 1e-3
        t_round = t_reply + 2 * d_true / c
        assert twr_range(t_round, t_reply) == pytest.approx(d_true,
                                                            rel=1e-9)


class TestHeaderPayloadDemux:
    def test_exact_split(self):
        from r4w_tpu.ops.packets import header_payload_demux

        frame = bytes(range(40))
        h, p = header_payload_demux(frame, 7)
        assert h == frame[:7] and p == frame[7:]
        assert h + p == frame


# ---------------------------------------------------------- peaks


class TestPeakLogic:
    def test_peak_detector_exact_mask(self):
        from r4w_tpu.ops.stream_blocks import peak_detector

        x = np.array([0, 1, 0, 3, 2, 5, 5, 1, 0, 2], np.float32)
        mask = np.asarray(peak_detector(jnp.asarray(x), threshold=0.5,
                                        look=1))
        # local maxima above 0.5: indices 1, 3, 5 and 6 (plateau, both
        # >= neighbours), 9 is an edge max (right pad is -inf)
        want = np.zeros(10, bool)
        want[[1, 3, 5, 6, 9]] = True
        assert np.array_equal(mask, want)

    def test_peak_hold_exact_recursion(self):
        """h[n] = max(|x[n]|, h[n−1]·decay): after an isolated peak P
        the series is exactly P·decay^k."""
        from r4w_tpu.ops.stream_blocks import peak_hold

        decay = 0.9
        x = np.zeros(32, np.float32)
        x[5] = 4.0
        series, final = peak_hold(jnp.asarray(x), decay=decay)
        series = np.asarray(series)
        k = np.arange(32 - 5)
        assert np.allclose(series[5:], 4.0 * decay ** k, rtol=1e-5)
        assert float(final) == pytest.approx(4.0 * decay ** 26,
                                             rel=1e-4)


class TestPilotInsert:
    def test_exact_layout(self):
        from r4w_tpu.ops.mapping import pilot_insert

        data = np.arange(1, 13).astype(np.complex64)
        out = np.asarray(pilot_insert(jnp.asarray(data), -1.0 + 0j, 4))
        want = np.array([-1, 1, 2, 3, 4, -1, 5, 6, 7, 8,
                         -1, 9, 10, 11, 12], np.complex64)
        assert np.array_equal(out, want)


# ------------------------------------------------------------ speech


class TestLpcOnArProcess:
    def test_recovers_ar2_prediction_filter(self):
        """x[n] = a1·x[n−1] + a2·x[n−2] + e[n] ⇒ the LPC prediction
        filter converges to [1, −a1, −a2] (Yule-Walker)."""
        from r4w_tpu.ops.applied import lpc_coefficients

        rng = np.random.default_rng(7)
        a1, a2 = 1.2, -0.6  # stable AR(2)
        n = 1 << 15
        e = rng.standard_normal(n).astype(np.float64)
        x = np.zeros(n)
        for i in range(2, n):
            x[i] = a1 * x[i - 1] + a2 * x[i - 2] + e[i]
        a, g = lpc_coefficients(jnp.asarray(x, jnp.float32), order=2)
        a = np.asarray(a)
        assert a[0] == pytest.approx(1.0, abs=1e-6)
        assert a[1] == pytest.approx(-a1, abs=0.02)
        assert a[2] == pytest.approx(-a2, abs=0.02)
        # residual gain ≈ innovation std (unit here)
        assert float(g) == pytest.approx(1.0, rel=0.05)


class TestPitchDetect:
    def test_a440(self):
        from r4w_tpu.ops.audio import pitch_detect

        fs, f0 = 44100.0, 440.0
        t = np.arange(4096) / fs
        x = (np.sin(2 * np.pi * f0 * t)
             + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
        f, strength = pitch_detect(jnp.asarray(x), fs)
        # autocorrelation lag grid quantizes to fs/round(fs/f0)
        assert float(f) == pytest.approx(fs / round(fs / f0), abs=0.01)
        assert float(strength) > 0.8
