"""Round-4 KA batch L: diversity/MIMO, radar integration, audio
dynamics, cipher, and biomedical truths for thin-coverage catalog
blocks — each checked against an independent law (NIST SP 800-38A
vectors, Alamouti orthogonality, MTI binomial response, exact
pre/de-emphasis inversion, compressor static curve, Pan-Tompkins on a
synthetic rhythm), not against the implementation itself.

Reference roles: aes_stream_cipher.rs, alamouti_codec.rs,
antenna_diversity_combiner.rs, mti_filter.rs, clutter_filter.rs,
coherent_integrator.rs, fm_emphasis.rs, pre_emphasis.rs,
dynamic_range_compressor.rs, chunks_to_symbols.rs,
cross_correlator.rs, carrier_recovery.rs, check_lfsr.rs,
bitwise_ops.rs, electroencephalogram_bci.rs, ecg_qrs_detector.rs,
crest_factor_reduction.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------------------------ cipher


class TestAesCtrNistVectors:
    """NIST SP 800-38A F.5.5 (CTR-AES256.Encrypt) published
    known-answer vectors."""

    KEY = bytes.fromhex("603deb1015ca71be2b73aef0857d7781"
                        "1f352c073b6108d72d9810a30914dff4")
    CTR = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    PT = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                       "ae2d8a571e03ac9c9eb76fac45af8e51")
    CT = bytes.fromhex("601ec313775789a5b7a7f504bbf3d228"
                       "f443e3ca4d62b59aca84e990cacaf5c5")

    def test_sp800_38a_f55(self):
        from r4w_tpu.ops.scramblers import aes_ctr_keystream_xor

        got = aes_ctr_keystream_xor(self.PT, self.KEY, self.CTR)
        assert got == self.CT

    def test_ctr_is_an_involution(self):
        from r4w_tpu.ops.scramblers import aes_ctr_keystream_xor

        data = bytes(range(256)) * 3
        enc = aes_ctr_keystream_xor(data, self.KEY, self.CTR)
        assert enc != data
        assert aes_ctr_keystream_xor(enc, self.KEY, self.CTR) == data


# ----------------------------------------------------- Alamouti / MRC


class TestAlamouti:
    def test_orthogonal_design_and_exact_recovery(self):
        """The 2×2 Alamouti block [[s0, −s1*],[s1, s0*]] is an
        orthogonal design: the two antenna rows are orthogonal over
        each symbol pair, and ML decoding through ANY flat channel
        recovers the symbols exactly (noiseless)."""
        from r4w_tpu.ops.mimo import alamouti_decode, alamouti_encode

        rng = np.random.default_rng(5)
        qpsk = np.exp(1j * (np.pi / 4 + np.pi / 2
                            * rng.integers(0, 4, 16))).astype(np.complex64)
        tx = np.asarray(alamouti_encode(jnp.asarray(qpsk)))  # (2, 16)
        pairs = tx.reshape(2, -1, 2)
        # row orthogonality per pair: s0(−s1*)* + s1(s0*)* … = 0
        inner = np.sum(pairs[0] * np.conj(pairs[1]), axis=-1)
        assert np.max(np.abs(inner)) < 1e-5
        # per-pair transmit energy is preserved: |s0|²+|s1|² each slot
        assert np.allclose(np.sum(np.abs(pairs) ** 2, axis=0),
                           2.0, atol=1e-5)
        h = np.array([0.8 - 0.3j, -0.2 + 1.1j], np.complex64)
        r = h[0] * tx[0] + h[1] * tx[1]
        est = np.asarray(alamouti_decode(jnp.asarray(r), jnp.asarray(h)))
        assert np.max(np.abs(est - qpsk)) < 1e-5

    def test_noise_diversity_scaling(self):
        """After combining, the effective noise variance is
        σ²/(|h0|²+|h1|²) — the array gain law — measurable exactly
        by decoding pure noise."""
        from r4w_tpu.ops.mimo import alamouti_decode

        rng = np.random.default_rng(6)
        h = np.array([1.5 + 0.5j, 0.3 - 0.7j], np.complex64)
        g2 = np.sum(np.abs(h) ** 2)
        n = 1 << 14
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)).astype(np.complex64)
        est = np.asarray(alamouti_decode(jnp.asarray(noise),
                                         jnp.asarray(h)))
        # var(s_hat) = (|h0|²+|h1|²)·σ²/(|h0|²+|h1|²)² = σ²/g2
        got = np.var(est)
        assert got == pytest.approx(2.0 / g2, rel=0.05)


class TestDiversityCombiners:
    def test_combiner_gain_laws(self):
        """Noiseless rx_b = h_b·s: MRC and selection return s exactly
        (unit gain); EGC co-phases then averages, so its gain is the
        MEAN branch magnitude (1/B)·Σ|h_b| — the textbook distinction
        between the three combiners."""
        from r4w_tpu.ops.mimo import (egc_combine, mrc_combine,
                                      selection_combine)

        rng = np.random.default_rng(7)
        s = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        h = np.array([0.3 + 1.2j, -0.9 + 0.1j, 0.5 - 0.5j], np.complex64)
        rx = (h[:, None] * s[None, :]).astype(np.complex64)
        for fn in (mrc_combine, selection_combine):
            got = np.asarray(fn(jnp.asarray(rx), jnp.asarray(h)))
            assert np.max(np.abs(got - s)) < 1e-4, fn.__name__
        egc = np.asarray(egc_combine(jnp.asarray(rx), jnp.asarray(h)))
        g = np.mean(np.abs(h))
        assert np.max(np.abs(egc - g * s)) < 1e-4

    def test_mrc_snr_is_sum_of_branch_snrs(self):
        """MRC's defining law: output SNR = Σ_b SNR_b. With branch
        gains (2, 1) and unit noise, output noise variance must be
        σ²/Σ|h|² = 1/5 of the signal-normalized scale."""
        from r4w_tpu.ops.mimo import mrc_combine

        rng = np.random.default_rng(8)
        h = np.array([2.0, 1.0], np.complex64)
        n = 1 << 14
        noise = (rng.standard_normal((2, n)) + 1j
                 * rng.standard_normal((2, n))).astype(np.complex64)
        out = np.asarray(mrc_combine(jnp.asarray(noise), jnp.asarray(h)))
        assert np.var(out) == pytest.approx(2.0 / 5.0, rel=0.05)


# ------------------------------------------------------ radar slow-time


class TestMtiAndIntegration:
    def test_mti_binomial_response(self):
        """Order-k MTI is (1−z⁻¹)^k on slow time: DC clutter nulls
        EXACTLY; a Nyquist-Doppler target (alternating sign) gains
        2^k exactly."""
        from r4w_tpu.ops.radar import mti_filter

        n_p, n_r = 12, 8
        clutter = np.ones((n_p, n_r), np.complex64) * (2.0 + 1.0j)
        out = np.asarray(mti_filter(jnp.asarray(clutter), order=2))
        assert np.max(np.abs(out)) < 1e-6
        alt = (((-1.0) ** np.arange(n_p))[:, None]
               * np.ones((n_p, n_r))).astype(np.complex64)
        out2 = np.asarray(mti_filter(jnp.asarray(alt), order=2))
        assert np.allclose(np.abs(out2), 4.0, atol=1e-5)

    def test_clutter_notch_preserves_moving_target(self):
        """FFT notch: a pure DC slow-time component is removed
        exactly; a target at a nonzero Doppler bin passes with unit
        gain."""
        from r4w_tpu.ops.radar_adv import clutter_notch

        n_p, n_r, k_dop = 16, 4, 5
        sl = np.arange(n_p)
        target = np.exp(2j * np.pi * k_dop * sl / n_p)[:, None] \
            * np.ones((1, n_r))
        x = (3.0 + target).astype(np.complex64)
        out = np.asarray(clutter_notch(jnp.asarray(x), n_zero_bins=1))
        assert np.max(np.abs(out - target)) < 1e-5

    def test_integration_gain_laws(self):
        """Coherent: N identical pulses sum to N·s exactly (SNR gain
        N); noncoherent sums powers."""
        from r4w_tpu.ops.radar_adv import (coherent_integrate,
                                           noncoherent_integrate)

        rng = np.random.default_rng(9)
        n_p = 10
        s = (rng.standard_normal(32)
             + 1j * rng.standard_normal(32)).astype(np.complex64)
        pulses = np.tile(s, (n_p, 1))
        coh = np.asarray(coherent_integrate(jnp.asarray(pulses)))
        assert np.allclose(coh, n_p * s, atol=1e-4)
        nc = np.asarray(noncoherent_integrate(jnp.asarray(pulses)))
        assert np.allclose(nc, n_p * np.abs(s) ** 2, atol=1e-3)
        # independent noise integrates to N·σ² power while the signal
        # integrates to N²·|s|² — the classic √N SNR split
        noise = (rng.standard_normal((n_p, 1 << 12)) + 1j
                 * rng.standard_normal((n_p, 1 << 12))).astype(np.complex64)
        coh_n = np.asarray(coherent_integrate(jnp.asarray(noise)))
        assert np.var(coh_n) == pytest.approx(n_p * 2.0, rel=0.05)


# --------------------------------------------------------- emphasis


class TestEmphasisInversion:
    def test_de_emphasis_exactly_inverts_pre_emphasis(self):
        """y[n]=x[n]−a·x[n−1] followed by z[n]=y[n]+a·z[n−1] is the
        identity for any a — an exact algebraic inversion, sample by
        sample."""
        from r4w_tpu.ops.filters2 import de_emphasis, pre_emphasis

        rng = np.random.default_rng(10)
        x = rng.standard_normal(512).astype(np.float32)
        for a in (0.5, 0.95):
            y = pre_emphasis(jnp.asarray(x), alpha=a)
            z = np.asarray(de_emphasis(y, alpha=a))
            assert np.max(np.abs(z - x)) < 1e-3, a

    def test_fm_deemphasis_75us_corner(self):
        """Broadcast-FM de-emphasis: single pole at
        f_c = 1/(2πτ) = 2122.1 Hz for τ = 75 µs — a tone there comes
        out 3 dB down; DC passes at unit gain."""
        from r4w_tpu.ops.filters2 import fm_deemphasis

        fs = 480e3
        fc = 1.0 / (2 * np.pi * 75e-6)
        n = 1 << 15
        t = np.arange(n) / fs
        tone = np.cos(2 * np.pi * fc * t).astype(np.float32)
        y = np.asarray(fm_deemphasis(jnp.asarray(tone), fs))
        # steady-state amplitude via projection on the analytic tone
        seg = slice(n // 2, n)
        ref = np.exp(-2j * np.pi * fc * t[seg])
        amp = 2.0 * np.abs(np.mean(y[seg] * ref))
        assert amp == pytest.approx(1.0 / np.sqrt(2.0), rel=0.02)
        dc = np.asarray(fm_deemphasis(jnp.ones(4096, np.float32), fs))
        assert dc[-1] == pytest.approx(1.0, abs=1e-3)


class TestCompressorStaticCurve:
    def test_gain_reduction_follows_ratio(self):
        """Static law: a steady level L dB above threshold T with
        ratio r is attenuated by (L−T)(1−1/r) dB exactly — here
        12 dB over at 4:1 → 9 dB of gain reduction."""
        from r4w_tpu.ops.filters2 import dynamic_range_compressor

        level_db, thr_db, ratio = -8.0, -20.0, 4.0
        amp = 10.0 ** (level_db / 20.0)
        x = np.full(600, amp, np.float32)
        y = np.asarray(dynamic_range_compressor(
            jnp.asarray(x), threshold_db=thr_db, ratio=ratio))
        expect = amp * 10.0 ** (-(level_db - thr_db)
                                * (1.0 - 1.0 / ratio) / 20.0)
        assert y[-1] == pytest.approx(expect, rel=1e-3)
        # below threshold: unity gain
        q = np.full(600, 10.0 ** (-30.0 / 20.0), np.float32)
        yq = np.asarray(dynamic_range_compressor(
            jnp.asarray(q), threshold_db=thr_db, ratio=ratio))
        assert yq[-1] == pytest.approx(q[-1], rel=1e-3)


# --------------------------------------------------- mapping / sync


class TestChunksToSymbols:
    def test_msb_first_grouping(self):
        from r4w_tpu.ops.mapping import chunks_to_symbols

        con = np.array([1, 1j, -1, -1j], np.complex64)
        bits = np.array([0, 0, 0, 1, 1, 0, 1, 1], np.int32)
        got = np.asarray(chunks_to_symbols(jnp.asarray(bits), con, 2))
        assert np.allclose(got, con)  # 00,01,10,11 in order


class TestCrossCorrelator:
    def test_embedded_copy_peaks_at_offset_with_unit_norm(self):
        """a = b placed at offset d (zeros elsewhere): the normalized
        cross-correlation peaks at lag d with value exactly 1
        (Cauchy-Schwarz equality)."""
        from r4w_tpu.ops.sync2 import cross_correlator

        rng = np.random.default_rng(14)
        b = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        d = 100
        a = np.zeros(512, np.complex64)
        a[d:d + 64] = b
        lags, c = cross_correlator(jnp.asarray(a), jnp.asarray(b))
        lags, c = np.asarray(lags), np.asarray(c)
        k = int(np.argmax(np.abs(c)))
        assert lags[k] == d
        assert abs(c[k]) == pytest.approx(1.0, abs=1e-4)


class TestCarrierRecovery:
    def test_bpsk_constant_offset_converges(self):
        """BPSK with a constant carrier phase offset: the 2nd-power
        loop must drive the tracked phase to the offset; corrected
        tail symbols land back on ±1."""
        from r4w_tpu.ops.sync2 import carrier_recovery_mpsk

        rng = np.random.default_rng(15)
        sym = (2.0 * rng.integers(0, 2, 2000) - 1.0).astype(np.complex64)
        phi = 0.3
        rx = (sym * np.exp(1j * phi)).astype(np.complex64)
        corr, phases = carrier_recovery_mpsk(jnp.asarray(rx), order=2,
                                             bw=0.05)
        phases = np.asarray(phases)
        assert abs(float(np.mean(phases[-200:])) - phi) < 0.02
        tail = np.asarray(corr)[-200:]
        err = np.minimum(np.abs(tail - 1.0), np.abs(tail + 1.0))
        assert np.max(err) < 0.05


class TestCheckLfsr:
    def test_prbs7_clean_and_corrupted(self):
        """PRBS-7 (x⁷+x⁶+1, taps 0b1100000): a clean sequence checks
        with ZERO errors; flipped bits raise errors."""
        from r4w_tpu.ops.stream_blocks import check_lfsr

        taps, nbits = 0b1100000, 7
        state = 0b1010101
        bits = []
        for _ in range(500):
            fb = bin(state & taps).count("1") & 1
            bits.append(fb)
            state = ((state << 1) | fb) & ((1 << nbits) - 1)
        bits = np.array(bits, np.int32)
        errors, tested = check_lfsr(jnp.asarray(bits), taps, nbits)
        assert int(errors) == 0 and int(tested) == 500 - nbits
        bad = bits.copy()
        bad[100] ^= 1
        bad[300] ^= 1
        errors2, _ = check_lfsr(jnp.asarray(bad), taps, nbits)
        assert int(errors2) >= 2


class TestBitwiseOp:
    def test_truth_tables_vs_numpy(self):
        from r4w_tpu.ops.stream_blocks import bitwise_op

        rng = np.random.default_rng(16)
        x = rng.integers(0, 256, 64).astype(np.int32)
        y = rng.integers(0, 256, 64).astype(np.int32)
        assert np.array_equal(np.asarray(bitwise_op(x, y, "and")), x & y)
        assert np.array_equal(np.asarray(bitwise_op(x, y, "or")), x | y)
        assert np.array_equal(np.asarray(bitwise_op(x, y, "xor")), x ^ y)
        assert np.array_equal(np.asarray(bitwise_op(x, None, "not")), ~x)
        with pytest.raises(ValueError):
            bitwise_op(x, y, "nand")


# ------------------------------------------------------- biomedical


class TestEegBandPowers:
    def test_alpha_tone_dominates_and_band_edges_bind(self):
        """A 10 Hz tone is alpha ([8,13)); a 13 Hz tone belongs to
        beta ([13,30)) — the half-open band edges are part of the
        published convention."""
        from r4w_tpu.ops.biomedical import eeg_band_powers

        fs, n = 256.0, 2048
        t = np.arange(n) / fs
        p10 = {k: float(v) for k, v in eeg_band_powers(
            jnp.asarray(np.sin(2 * np.pi * 10.0 * t), jnp.float32),
            fs).items()}
        total = sum(p10.values())
        assert p10["alpha"] > 0.97 * total
        # half-open edges: 13.125 Hz (bin-centered; the Hann mainlobe
        # spans ±1 bin with nulls at ±2) is beta; 12.75 Hz is alpha —
        # two bins apart across the published 13 Hz boundary, far
        # enough that each tone's mainlobe stays inside its band
        p_hi = {k: float(v) for k, v in eeg_band_powers(
            jnp.asarray(np.sin(2 * np.pi * 13.125 * t), jnp.float32),
            fs).items()}
        assert p_hi["beta"] > 100.0 * p_hi["alpha"]
        p_lo = {k: float(v) for k, v in eeg_band_powers(
            jnp.asarray(np.sin(2 * np.pi * 12.75 * t), jnp.float32),
            fs).items()}
        assert p_lo["alpha"] > 100.0 * p_lo["beta"]


class TestQrsDetect:
    def test_synthetic_rhythm_count_and_timing(self):
        """Synthetic ECG: narrow R waves every 0.8 s (75 bpm).
        Pan-Tompkins must find exactly those beats within ±80 ms."""
        from r4w_tpu.ops.biomedical import qrs_detect

        fs = 250.0
        dur, rr = 10.0, 0.8
        n = int(dur * fs)
        t = np.arange(n) / fs
        truth = np.arange(0.5, dur - 0.3, rr)
        ecg = np.zeros(n, np.float32)
        for tc in truth:
            ecg += np.exp(-0.5 * ((t - tc) / 0.012) ** 2).astype(
                np.float32)
        rng = np.random.default_rng(17)
        ecg += 0.02 * rng.standard_normal(n).astype(np.float32)
        idx, valid = qrs_detect(jnp.asarray(ecg), fs)
        peaks = np.asarray(idx, np.float64)[np.asarray(valid)] / fs
        assert len(peaks) == len(truth)
        assert np.max(np.abs(peaks - truth)) < 0.08


# ----------------------------------------------------------- CFR


class TestCrestFactorReduction:
    def test_papr_reduced_toward_clip_target(self):
        """Clip-and-filter CFR on an OFDM-like multitone: output PAPR
        must drop below the input's and approach the clip ratio."""
        from r4w_tpu.ops.mapping import crest_factor_reduce

        rng = np.random.default_rng(18)
        n = 2048
        spec = np.zeros(n, np.complex64)
        k = n // 8
        spec[1:k] = np.exp(2j * np.pi * rng.random(k - 1))
        x = np.fft.ifft(spec).astype(np.complex64)

        def papr_db(v):
            p = np.abs(v) ** 2
            return 10 * np.log10(p.max() / p.mean())

        before = papr_db(x)
        y = np.asarray(crest_factor_reduce(jnp.asarray(x),
                                           clip_ratio_db=4.0,
                                           iterations=4))
        after = papr_db(y)
        assert before > 7.0  # multitone really is high-PAPR (7.6 dB)
        assert after < before - 2.0
        # converges near the 4 dB clip target (filter regrowth < 1 dB)
        assert after < 5.0
        # in-band fidelity: correlation with the original stays high
        rho = abs(np.vdot(y, x)) / (np.linalg.norm(y)
                                    * np.linalg.norm(x))
        assert rho > 0.9
