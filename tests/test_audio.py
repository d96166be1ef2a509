"""Tests for audio/speech fills (audio.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import audio as au


class TestDtmf:
    def test_dtmf_roundtrip(self):
        for digits in ("1234567890", "*#AD", "555"):
            tone = au.dtmf_generate(digits)
            got = au.dtmf_detect(tone)
            assert got == digits


class TestMfcc:
    def test_mfcc_shape_and_sensitivity(self):
        fs = 16_000.0
        t = np.arange(16_000) / fs
        low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        high = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
        m_lo = np.asarray(au.mfcc(jnp.asarray(low), fs))
        m_hi = np.asarray(au.mfcc(jnp.asarray(high), fs))
        assert m_lo.shape[1] == 13
        # different spectral content -> clearly different cepstra
        assert np.abs(m_lo.mean(0) - m_hi.mean(0)).max() > 1.0


class TestPhaseVocoder:
    @pytest.mark.slow
    def test_stretch_preserves_pitch(self):
        fs = 8000.0
        t = np.arange(16_000) / fs
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(au.phase_vocoder(jnp.asarray(x), rate=0.5))
        # ~2x longer
        assert y.shape[0] > 1.7 * x.shape[0]
        seg = y[4000:12000]
        spec = np.abs(np.fft.rfft(seg * np.hanning(seg.shape[0])))
        f = np.fft.rfftfreq(seg.shape[0], 1 / fs)
        assert abs(f[np.argmax(spec)] - 440) < 15


class TestVocoders:
    def test_lpc_whitens_ar_process(self):
        rng = np.random.default_rng(0)
        # AR(2) process
        e = rng.standard_normal(4096)
        x = np.zeros(4096)
        for n in range(2, 4096):
            x[n] = 1.3 * x[n - 1] - 0.6 * x[n - 2] + e[n]
        coeffs, gain = au.lpc_coeffs_frame(x[None, :], order=2)
        # recovered AR coefficients: a = [1, -1.3, 0.6]
        np.testing.assert_allclose(coeffs[0], [1.0, -1.3, 0.6],
                                   atol=0.05)

    @pytest.mark.slow
    def test_melp_roundtrip_preserves_pitch_and_energy(self):
        fs = 8000.0
        t = np.arange(8000) / fs
        # vowel-ish: pulse train through a resonance
        x = (np.sin(2 * np.pi * 120 * t)
             + 0.5 * np.sin(2 * np.pi * 240 * t)).astype(np.float32)
        params = au.melp_analyze(x, fs)
        assert params["voiced"][2]
        assert abs(params["pitch"][2] - 120) < 15
        y = np.asarray(au.melp_synthesize(params))
        assert y.shape[0] == params["lpc"].shape[0] * params["frame"]
        assert np.isfinite(y).all()

    @pytest.mark.slow
    def test_formant_track_finds_resonance(self):
        fs = 8000.0
        rng = np.random.default_rng(1)
        e = rng.standard_normal(8192)
        # resonator at ~700 Hz
        r, w = 0.97, 2 * np.pi * 700 / fs
        x = np.zeros(8192)
        for n in range(2, 8192):
            x[n] = 2 * r * np.cos(w) * x[n - 1] - r * r * x[n - 2] + e[n]
        f = np.asarray(au.formant_track(x.astype(np.float32), fs))
        meds = np.median(f[:, 0])
        assert abs(meds - 700) < 100


class TestPsychoacoustic:
    def test_codec_roundtrip_snr(self):
        fs = 16_000.0
        t = np.arange(8192) / fs
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        q, scale, bits = au.psychoacoustic_encode(jnp.asarray(x), fs)
        y = np.asarray(au.psychoacoustic_decode(q, scale, bits))
        n = min(x.shape[0], y.shape[0]) - 512
        err = y[256:n] - x[256:n]
        snr = 10 * np.log10(np.mean(x[256:n] ** 2)
                            / max(np.mean(err ** 2), 1e-12))
        assert snr > 10.0  # intelligible reconstruction
        assert int(np.asarray(bits).max()) <= 4


class TestRestorePitch:
    def test_voice_restore_improves_snr(self):
        # spectral subtraction needs a noise-only lead-in for the floor
        # estimate — first 2048 samples are noise, speech starts after
        fs = 8000.0
        rng = np.random.default_rng(2)
        t = np.arange(16_000) / fs
        clean = np.sin(2 * np.pi * 500 * t)
        clean[:2048] = 0.0
        noise = 0.3 * rng.standard_normal(t.shape[0])
        noisy = (clean + noise).astype(np.float32)
        rest = np.asarray(au.voice_restore(jnp.asarray(noisy), fs))
        lo, hi = 4000, 14000

        def snr(sig):
            err = sig[lo:hi] - clean[lo:hi]
            return 10 * np.log10(np.mean(clean[lo:hi] ** 2)
                                 / np.mean(err ** 2))

        assert snr(rest) > snr(noisy) + 3.0

    def test_pitch_detect_and_track(self):
        fs = 8000.0
        t = np.arange(8192) / fs
        x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        f0, s = au.pitch_detect(jnp.asarray(x), fs)
        assert abs(float(f0) - 220) < 5 and float(s) > 0.8
        f0s, _ = au.pitch_track(jnp.asarray(x), fs)
        assert abs(np.median(np.asarray(f0s)) - 220) < 5


class TestCancellers:
    def test_echo_canceller_converges(self):
        rng = np.random.default_rng(3)
        far = rng.standard_normal(8000).astype(np.float32)
        # echo path: 3 taps
        echo = 0.8 * far + 0.4 * np.roll(far, 5) + 0.2 * np.roll(far, 11)
        err, w = au.echo_cancel_nlms(jnp.asarray(echo), jnp.asarray(far),
                                     n_taps=16)
        tail = np.asarray(err)[-2000:]
        erle = 10 * np.log10(np.mean(echo[-2000:] ** 2)
                             / max(np.mean(tail ** 2), 1e-12))
        assert erle > 20.0  # >20 dB echo-return-loss enhancement

    def test_feedback_suppressor_kills_howl(self):
        fs = 8000.0
        t = np.arange(8000) / fs
        howl = np.sin(2 * np.pi * 2000 * t).astype(np.float32)
        out = np.asarray(au.feedback_suppress(jnp.asarray(howl),
                                              delay=64))
        assert np.mean(out[-2000:] ** 2) < 0.1 * np.mean(
            howl[-2000:] ** 2)

    def test_channel_vocoder_imposes_envelope(self):
        fs = 8000.0
        rng = np.random.default_rng(4)
        t = np.arange(8192) / fs
        modl = np.sin(2 * np.pi * 300 * t).astype(np.float32)
        carrier = rng.standard_normal(8192).astype(np.float32)
        y = np.asarray(au.channel_vocoder(modl, carrier, fs))
        # output spectrum concentrates near the modulator band
        spec = np.abs(np.fft.rfft(y))
        f = np.fft.rfftfreq(8192, 1 / fs)
        band = spec[(f > 200) & (f < 400)].mean()
        rest = spec[(f > 2000)].mean()
        assert band > 3 * rest
