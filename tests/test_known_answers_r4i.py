"""Round-4 KA batch I: companding, single-bin spectral estimation,
DTMF signalling, and multirate identities vs independent truths —
the µ-law closed form typed from ITU-T G.711 / the textbook compander,
scipy.signal.lfilter / np.convolve for the polyphase structures,
numpy's FFT for Goertzel, and the ITU-T Q.23 DTMF tone grid.

Every expected value comes from scipy, numpy, or a published constant
— never from the implementation under test. Reference roles:
companding_codec.rs, goertzel.rs, dtmf.rs, dtmf_detector.rs,
polyphase.rs (decimator :52, interpolator :281, halfband :657),
pfb_channelizer.rs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import scipy.signal  # noqa: E402


# ------------------------------------------------------------ µ-law


class TestMuLawCompanding:
    """Truth: F(x) = sgn(x)·ln(1+µ|x|)/ln(1+µ) — the continuous µ-law
    compander (ITU-T G.711's segment law approximates this curve)."""

    def test_matches_closed_form(self):
        from r4w_tpu.ops.stream_math import mu_law_encode

        x = np.linspace(-1.0, 1.0, 257).astype(np.float32)
        got = np.asarray(mu_law_encode(x))
        want = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_roundtrip_identity(self):
        from r4w_tpu.ops.stream_math import mu_law_decode, mu_law_encode

        rng = np.random.default_rng(7)
        x = rng.uniform(-1.0, 1.0, 512).astype(np.float32)
        back = np.asarray(mu_law_decode(mu_law_encode(x)))
        np.testing.assert_allclose(back, x, atol=2e-5)

    def test_endpoints_and_odd_symmetry(self):
        from r4w_tpu.ops.stream_math import mu_law_encode

        # F(±1) = ±1, F(0) = 0, F(-x) = -F(x) exactly (odd compander).
        x = np.asarray([-1.0, 0.0, 1.0, 0.3, -0.3], np.float32)
        y = np.asarray(mu_law_encode(x))
        assert y[0] == pytest.approx(-1.0, abs=1e-6)
        assert y[1] == 0.0
        assert y[2] == pytest.approx(1.0, abs=1e-6)
        assert y[3] == pytest.approx(-y[4], abs=1e-7)

    def test_small_signal_gain_is_mu_over_log1p_mu(self):
        from r4w_tpu.ops.stream_math import mu_law_encode

        # dF/dx at 0 = µ/ln(1+µ) ≈ 45.99 for µ=255: the compander's
        # published ~16× (24 dB) small-signal SNR advantage over linear
        # quantization comes from this slope.
        eps = 1e-5
        g = float(np.asarray(mu_law_encode(np.float32(eps)))) / eps
        # f32 log1p keeps ~3 significant digits at this operating point
        assert g == pytest.approx(255.0 / np.log1p(255.0), rel=5e-3)


# ---------------------------------------------------------- Goertzel


class TestGoertzel:
    """Truth: Goertzel power of bin k == |numpy DFT bin k|²."""

    @pytest.mark.parametrize("bin_k", [0, 1, 37, 100, 127])
    def test_matches_fft_bin_power(self, bin_k):
        from r4w_tpu.ops.measure import goertzel_power

        rng = np.random.default_rng(bin_k)
        x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)
             ).astype(np.complex64)
        got = float(np.asarray(goertzel_power(x, bin_k)))
        want = float(np.abs(np.fft.fft(x)[bin_k]) ** 2)
        assert got == pytest.approx(want, rel=1e-4)

    def test_pure_tone_concentrates_power(self):
        from r4w_tpu.ops.measure import goertzel_power

        n, k = 256, 19
        x = np.exp(2j * np.pi * k * np.arange(n) / n).astype(np.complex64)
        on = float(np.asarray(goertzel_power(x, k)))
        off = float(np.asarray(goertzel_power(x, k + 3)))
        assert on == pytest.approx(n * n, rel=1e-4)  # |Σ e^0|² = N²
        assert off < 1e-3 * on


# -------------------------------------------------------------- DTMF


class TestDtmf:
    """Truth: the ITU-T Q.23 tone grid (697/770/852/941 ×
    1209/1336/1477/1633 Hz) and detector/generator consistency."""

    def test_all_sixteen_keys_roundtrip(self):
        from r4w_tpu.ops.audio import dtmf_detect, dtmf_generate

        keys = "123A456B789C*0#D"
        audio = dtmf_generate(keys)
        assert dtmf_detect(audio) == keys

    @pytest.mark.parametrize("digit,f_lo,f_hi", [
        ("1", 697.0, 1209.0), ("5", 770.0, 1336.0),
        ("9", 852.0, 1477.0), ("D", 941.0, 1633.0),
        ("0", 941.0, 1336.0), ("#", 941.0, 1477.0),
    ])
    def test_tone_pair_frequencies_match_q23(self, digit, f_lo, f_hi):
        from r4w_tpu.ops.audio import dtmf_generate

        fs = 8000.0
        audio = np.asarray(dtmf_generate(digit, sample_rate=fs,
                                         tone_ms=100.0, gap_ms=0.0))
        spec = np.abs(np.fft.rfft(audio * np.hanning(audio.size)))
        freqs = np.fft.rfftfreq(audio.size, 1.0 / fs)
        # the two largest spectral peaks sit on the published pair
        top2 = freqs[np.argsort(spec)[-2:]]
        assert min(abs(top2 - f_lo)) < 12.0
        assert min(abs(top2 - f_hi)) < 12.0

    def test_repeated_digit_separated_by_gap(self):
        from r4w_tpu.ops.audio import dtmf_detect, dtmf_generate

        assert dtmf_detect(dtmf_generate("77")) == "77"

    def test_silence_detects_nothing(self):
        from r4w_tpu.ops.audio import dtmf_detect

        assert dtmf_detect(np.zeros(8000, np.float32)) == ""


# --------------------------------------------------------- multirate


class TestPolyphaseIdentities:
    """Truths: scipy.signal.lfilter (causal FIR) and np.convolve."""

    def test_decimate_equals_lfilter_then_downsample(self):
        from r4w_tpu.ops.resample import polyphase_decimate

        rng = np.random.default_rng(3)
        x = rng.standard_normal(512).astype(np.float32)
        taps = scipy.signal.firwin(33, 0.22).astype(np.float32)
        got = np.asarray(polyphase_decimate(x, taps, 4))
        want = scipy.signal.lfilter(taps, [1.0], x)[::4]
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_interpolate_equals_zero_stuff_convolve(self):
        from r4w_tpu.ops.resample import polyphase_interpolate

        rng = np.random.default_rng(4)
        x = rng.standard_normal(128).astype(np.float32)
        taps = scipy.signal.firwin(31, 0.18).astype(np.float32)
        factor = 3
        got = np.asarray(polyphase_interpolate(x, taps, factor))
        up = np.zeros(x.size * factor, np.float32)
        up[::factor] = x * factor  # gain-compensated zero-stuffing
        want = np.convolve(up, taps)[: x.size * factor]
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_polyphase_decompose_reassembles_prototype(self):
        from r4w_tpu.ops.resample import polyphase_decompose

        taps = np.arange(1.0, 13.0, dtype=np.float32)  # 12 taps
        bank = polyphase_decompose(taps, 4)  # (4, 3)
        assert bank.shape == (4, 3)
        # phase p holds taps[p::phases] — the defining decomposition
        for p in range(4):
            np.testing.assert_array_equal(bank[p], taps[p::4])

    def test_halfband_structure(self):
        from r4w_tpu.ops.resample import halfband_taps

        t = halfband_taps(31)
        mid = 15
        idx = np.arange(31)
        # defining halfband property: every even-offset tap except the
        # center is exactly zero, and the response is symmetric
        off = t[(idx != mid) & ((idx - mid) % 2 == 0)]
        assert np.all(off == 0.0)
        np.testing.assert_allclose(t, t[::-1], atol=1e-7)
        # H(fs/4) = 0.5 for a halfband lowpass (its -6 dB point)
        w, h = scipy.signal.freqz(t, worN=[np.pi / 2])
        assert abs(h[0]) == pytest.approx(0.5, abs=0.02)

    def test_rational_resample_preserves_tone_frequency(self):
        from r4w_tpu.ops.resample import rational_resample

        n, f = 2048, 0.03  # cycles/sample, well inside the passband
        x = np.sin(2 * np.pi * f * np.arange(n)).astype(np.float32)
        up, down = 3, 2
        y = np.asarray(rational_resample(x, up, down))
        assert y.size == n * up // down
        # frequency in cycles/sample scales by down/up
        spec = np.abs(np.fft.rfft(y[256:-256] * np.hanning(y.size - 512)))
        f_got = np.argmax(spec) / (y.size - 512)
        assert f_got == pytest.approx(f * down / up, abs=2e-4)
        # passband amplitude preserved
        assert np.max(np.abs(y[256:-256])) == pytest.approx(1.0, abs=0.05)


class TestPfbChannelizer:
    """Truth: a complex tone at channel k's center frequency emerges in
    output channel k with (near-)unit magnitude, others stay silent."""

    @pytest.mark.parametrize("k", [0, 1, 5])
    def test_tone_lands_in_its_channel(self, k):
        from r4w_tpu.ops.resample import pfb_channelizer

        m = 8
        n = 4096
        t = np.arange(n)
        x = np.exp(2j * np.pi * (k / m) * t).astype(np.complex64)
        ch = np.asarray(pfb_channelizer(x, m))  # (n_frames, m)
        assert ch.shape[-1] == m
        power = np.mean(np.abs(ch[32:, :]) ** 2, axis=0)
        assert int(np.argmax(power)) == k
        others = np.delete(power, k)
        assert power[k] > 50.0 * np.max(others)
