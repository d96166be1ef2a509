"""Tests for the detector and stream-math block batches (catalog tail,
VERDICT r1 LoC diagnostic item (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import detect, stream_math as sm


def _noise(n, seed=0, scale=1.0):
    k = jax.random.key(seed)
    re, im = np.array(jax.random.normal(k, (2, n)))  # writable host copy
    return (re + 1j * im).astype(np.complex64) * np.float32(
        scale * np.sqrt(0.5))


class TestDetectors:
    def test_energy_detect_burst(self):
        x = np.asarray(_noise(8192, scale=0.1))
        x[2048:3072] += 3.0  # a strong burst
        mask, floor = detect.energy_detect(jnp.asarray(x), frame=256)
        m = np.asarray(mask)
        assert m[8:12].all()        # burst frames flagged
        assert not m[:4].any()      # quiet frames clean

    def test_burst_hysteresis_and_edges(self):
        x = np.asarray(_noise(8192, scale=0.05))
        x[1024:2048] += 2.0
        x[5120:6144] += 2.0
        mask = detect.burst_detect(jnp.asarray(x), frame=64)
        starts, stops = detect.burst_edges(mask)
        assert len(starts) == 2 and len(stops) == 2
        assert abs(starts[0] - 16) <= 1 and abs(stops[0] - 32) <= 1

    def test_zero_crossing_rate(self):
        t = np.arange(4096)
        slow = np.sin(2 * np.pi * 0.01 * t).astype(np.float32)
        fast = np.sin(2 * np.pi * 0.45 * t).astype(np.float32)
        z_slow = float(detect.zero_crossing_rate(jnp.asarray(slow))[0])
        z_fast = float(detect.zero_crossing_rate(jnp.asarray(fast))[0])
        assert z_fast > 10 * z_slow

    def test_voice_activity(self):
        rng = np.random.default_rng(1)
        sig = 0.02 * rng.standard_normal(16384).astype(np.float32)
        t = np.arange(4096)
        sig[4096:8192] += np.sin(2 * np.pi * 0.02 * t).astype(np.float32)
        vad = np.asarray(detect.voice_activity(jnp.asarray(sig), 256))
        assert vad[17:31].all() and not vad[:8].any()

    def test_squelch_gates_noise(self):
        x = np.asarray(_noise(4096, scale=0.05))
        x[1024:2048] += 2.0
        y, gate = detect.squelch(jnp.asarray(x), frame=64)
        y = np.asarray(y)
        assert np.abs(y[:512]).max() == 0.0       # closed
        assert np.abs(y[1200:1800]).max() > 1.0   # open

    def test_sync_word_detect(self):
        word = np.asarray([1, 0, 1, 1, 0, 0, 1, 0], np.int32)
        bits = np.concatenate([np.zeros(37, np.int32), word,
                               np.ones(20, np.int32)])
        def hits(*a, **k):
            idx, valid = detect.sync_word_detect(*a, **k)
            return set(np.asarray(idx)[np.asarray(valid)].tolist())

        assert 37 in hits(bits, word)
        # one bit error still found with tolerance
        bits[40] ^= 1
        assert 37 not in hits(bits, word)
        assert 37 in hits(bits, word, max_errors=1)

    def test_teager_kaiser_tone_energy(self):
        """For a tone A·cos(ωn): ψ = A²·sin²(ω) (constant)."""
        n = np.arange(2048)
        x = 2.0 * np.cos(0.3 * n)
        psi = np.asarray(detect.teager_kaiser(jnp.asarray(
            x.astype(np.float32))))
        assert np.allclose(psi, 4.0 * np.sin(0.3) ** 2, atol=1e-3)

    def test_spectral_kurtosis_flags_impulsive_bin(self):
        x = np.asarray(_noise(65536))
        # impulsive narrowband interferer at bin 40: on in 10% of frames
        frames = x.reshape(-1, 256)
        t = np.arange(256)
        tone = np.exp(2j * np.pi * 40 / 256 * t).astype(np.complex64)
        frames[::10] += 8.0 * tone
        sk = np.asarray(detect.spectral_kurtosis(
            jnp.asarray(frames.reshape(-1)), 256))
        assert sk[40] > 3.0
        assert np.median(sk) < 1.0

    def test_spectrum_sense_and_holes(self):
        n = np.arange(65536)
        x = np.asarray(_noise(65536, scale=0.1))
        x += np.exp(2j * np.pi * 0.1 * n).astype(np.complex64)
        occ, psd_db = detect.spectrum_sense(jnp.asarray(x), nfft=256)
        occ = np.asarray(occ)
        assert occ[round(0.1 * 256)]
        holes = detect.spectrum_holes(occ, min_width=8)
        assert holes and sum(b - a for a, b in holes) > 200

    def test_cusum_changepoint(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(1000).astype(np.float32)
        x[600:] += 3.0
        alarm, gp, gm = detect.cusum_changepoint(jnp.asarray(x))
        assert 600 <= int(alarm) <= 615
        clean = rng.standard_normal(500).astype(np.float32)
        alarm2, _, _ = detect.cusum_changepoint(jnp.asarray(clean),
                                                threshold=30.0)
        assert int(alarm2) == -1


class TestStreamMath:
    def test_mag_phase_roundtrip(self):
        x = _noise(256, 1)
        m, p = sm.complex_to_mag_phase(x)
        back = np.asarray(sm.mag_phase_to_complex(m, p))
        assert np.allclose(back, np.asarray(x), atol=1e-5)

    def test_normalize_and_conjugate(self):
        x = jnp.asarray(_noise(64, 2))
        n = np.asarray(sm.complex_normalize(x))
        assert np.allclose(np.abs(n), 1.0, atol=1e-5)
        assert np.allclose(np.asarray(sm.stream_conjugate(x)),
                           np.asarray(x).conj())

    def test_interleaved_roundtrip(self):
        x = _noise(100, 3)
        il = sm.complex_to_interleaved(x)
        assert il.shape == (200,)
        assert np.allclose(np.asarray(sm.interleaved_to_complex(il)),
                           np.asarray(x), atol=1e-6)

    def test_pack_unpack_bits(self):
        bits = jnp.asarray(np.random.default_rng(0).integers(0, 2, 64))
        words = sm.pack_bits(bits, 8)
        assert np.asarray(sm.unpack_bits(words, 8)).tolist() == \
            np.asarray(bits).tolist()
        # LSB-first convention too
        w = sm.pack_bits(jnp.asarray([1, 0, 0, 0, 0, 0, 0, 0]), 8,
                         msb_first=False)
        assert int(np.asarray(w)[0]) == 1

    def test_threshold_hysteresis(self):
        x = jnp.asarray([0.0, 0.9, 1.1, 0.7, 0.3, 1.2, 0.0],
                        jnp.float32)
        y = np.asarray(sm.threshold_block(x, lo=0.5, hi=1.0))
        assert y.tolist() == [0, 0, 1, 1, 0, 1, 0]

    def test_clipper_preserves_phase(self):
        x = jnp.asarray([3 + 4j, 0.1 + 0.1j], jnp.complex64)
        y = np.asarray(sm.signal_clipper(x, 1.0))
        assert abs(y[0]) == pytest.approx(1.0, rel=1e-5)
        assert np.angle(y[0]) == pytest.approx(np.angle(3 + 4j), rel=1e-5)
        assert y[1] == pytest.approx(0.1 + 0.1j)

    def test_quantizer_snr(self):
        rng = np.random.default_rng(0)
        x = (rng.uniform(-1, 1, 100_000)).astype(np.float32)
        _, r8 = sm.uniform_quantize(jnp.asarray(x), 8)
        err = np.asarray(r8) - x
        snr_db = 10 * np.log10(x.var() / err.var())
        # 6.02 dB/bit rule: 8 bits ~ 48 dB (uniform input hits it)
        assert 46.0 < snr_db < 51.0

    def test_sigma_delta_tracks_mean(self):
        x = jnp.full((4096,), 0.25, jnp.float32)
        bits = np.asarray(sm.sigma_delta_modulate(x))
        duty = bits.mean() * 2 - 1  # ±1 mean
        assert duty == pytest.approx(0.25, abs=0.02)

    def test_mu_law_roundtrip_and_companding_gain(self):
        x = jnp.asarray(np.linspace(-1, 1, 101), jnp.float32)
        y = sm.mu_law_encode(x)
        back = np.asarray(sm.mu_law_decode(y))
        assert np.allclose(back, np.asarray(x), atol=1e-5)
        # small signals are expanded (compression before quantization)
        assert float(sm.mu_law_encode(jnp.asarray(0.01))) > 0.2

    def test_adpcm_roundtrip_snr(self):
        t = np.arange(2000)
        pcm = (8000 * np.sin(2 * np.pi * 0.01 * t)).astype(np.int32)
        nib, _ = sm.adpcm_encode(pcm)
        assert nib.max() <= 15 and nib.min() >= 0
        rec = sm.adpcm_decode(nib)
        err = rec - pcm
        snr = 10 * np.log10(pcm.astype(float).var() / err.astype(float).var())
        assert snr > 20.0  # 4-bit ADPCM on a slow tone

    def test_vco_frequency(self):
        fs = 100_000.0
        ctrl = jnp.full((8192,), 0.5, jnp.float32)
        iq = np.asarray(sm.vco(ctrl, sensitivity_hz_per_unit=2000.0,
                               sample_rate=fs))
        f = np.angle(iq[1:] * iq[:-1].conj()).mean() * fs / (2 * np.pi)
        assert f == pytest.approx(1000.0, rel=1e-3)

    def test_ddc_extracts_channel(self):
        fs = 1_000_000.0
        n = np.arange(65536)
        # channel of interest at +200 kHz, interferer at -300 kHz
        x = (np.exp(2j * np.pi * 200e3 * n / fs)
             + np.exp(2j * np.pi * -300e3 * n / fs)).astype(np.complex64)
        y = np.asarray(sm.digital_down_convert(jnp.asarray(x), 200e3, fs,
                                               decimation=8))
        spec = np.abs(np.fft.fft(y))
        peak = np.argmax(spec)
        # target now at DC; interferer filtered out
        assert peak in (0, 1, len(spec) - 1)
        assert spec.max() > 8 * np.sort(spec)[-len(spec) // 4]

    def test_bin_statistics(self):
        x = jnp.asarray(np.arange(12, dtype=np.float32))
        mn, mx, mean = sm.bin_statistics(x, 3)
        assert np.asarray(mn).tolist() == [0, 4, 8]
        assert np.asarray(mx).tolist() == [3, 7, 11]
        assert np.asarray(mean).tolist() == [1.5, 5.5, 9.5]


def test_burst_shape_reduces_splatter():
    from r4w_tpu.ops.stream_math import burst_shape

    n = 2048
    tone = np.exp(2j * np.pi * 0.1 * np.arange(n)).astype(np.complex64)
    hard = np.abs(np.fft.fft(tone, 8192))
    soft = np.abs(np.fft.fft(np.asarray(burst_shape(jnp.asarray(tone),
                                                    ramp=128)), 8192))
    # out-of-band splatter (far from the tone) drops by >20 dB
    far = np.r_[3000:4000]
    assert soft[far].max() < 0.1 * hard[far].max()
    # envelope: ends ramp to zero, middle untouched
    y = np.asarray(burst_shape(jnp.asarray(tone), ramp=64))
    assert abs(y[0]) < 1e-6 and abs(y[-1]) < 0.05
    assert abs(abs(y[1024]) - 1.0) < 1e-5
