"""Tests for the second-tier filter/rate blocks (filters2.py)."""

import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import filters as flt
from r4w_tpu.ops import filters2 as f2


def _rand(n, seed=0, cplx=True):
    rng = np.random.default_rng(seed)
    if cplx:
        return (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
    return rng.standard_normal(n).astype(np.float32)


class TestBlockConvolution:
    def test_overlap_save_matches_direct_fir(self):
        x = _rand(1000)
        taps = np.asarray(flt.design_lowpass(31, 0.1, 1.0))
        want = np.asarray(flt.fir_apply(taps, jnp.asarray(x)))
        got = np.asarray(f2.overlap_save(jnp.asarray(x), jnp.asarray(taps)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_overlap_add_matches_numpy_convolve(self):
        x = _rand(777, cplx=False)
        h = _rand(32, seed=1, cplx=False)
        want = np.convolve(x, h)
        got = np.asarray(f2.overlap_add(jnp.asarray(x), jnp.asarray(h),
                                        block=128))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_freq_xlating_fft_filter_extracts_channel(self):
        fs = 10_000.0
        t = np.arange(8192) / fs
        # two tones; extract the one at +2 kHz
        x = (np.exp(2j * np.pi * 2000 * t)
             + np.exp(2j * np.pi * -3000 * t)).astype(np.complex64)
        taps = flt.design_lowpass(101, 500.0, fs)
        y = np.asarray(f2.frequency_xlating_fft_filter(
            jnp.asarray(x), jnp.asarray(taps), 2000.0, fs, decim=4))
        spec = np.abs(np.fft.fft(y[64:4096 // 4 + 64]))
        # after translation the wanted tone is at DC
        assert np.argmax(spec) in (0, 1, len(spec) - 1)


class TestMatchedBanks:
    def test_matched_filter_bank_picks_template(self):
        rng = np.random.default_rng(0)
        templates = (rng.standard_normal((4, 64))
                     + 1j * rng.standard_normal((4, 64))).astype(np.complex64)
        x = np.zeros(512, np.complex64)
        x[100:164] = templates[2]
        y = np.asarray(f2.matched_filter_bank(jnp.asarray(x),
                                              jnp.asarray(templates)))
        peaks = np.max(np.abs(y), axis=-1)
        assert np.argmax(peaks) == 2
        assert np.argmax(np.abs(y[2])) == 100  # peak at template start

    def test_rrc_bank_identifies_rolloff(self):
        from r4w_tpu.ops import pulse
        sps = 4
        rng = np.random.default_rng(1)
        syms = (2 * rng.integers(0, 2, 256) - 1).astype(np.float32)
        taps = pulse.root_raised_cosine_taps(sps, 8, 0.35)
        tx = np.asarray(pulse.shape_symbols(jnp.asarray(syms), taps, sps))
        _, idx = f2.rrc_matched_filter_bank(
            jnp.asarray(tx.astype(np.complex64)), sps,
            rolloffs=(0.1, 0.35, 0.9))
        assert int(idx) == 1

    def test_sparse_fir(self):
        x = jnp.asarray(np.arange(10, dtype=np.float32))
        y = np.asarray(f2.sparse_fir_filter(x, [1.0, 0.5], [0, 2]))
        want = np.arange(10) + 0.5 * np.concatenate([[0, 0], np.arange(8)])
        np.testing.assert_allclose(y, want)


class TestInterpolators:
    def test_lagrange_taps_integer_delay(self):
        taps = np.asarray(f2.lagrange_interpolator_taps(3, 0.0))
        # mu=0 -> pure unit delay at the center tap
        assert abs(taps[1] - 1.0) < 1e-6
        assert np.abs(np.delete(taps, 1)).max() < 1e-6

    def test_lagrange_half_sample_on_line(self):
        # a straight line is reproduced exactly by polynomial interp
        x = jnp.asarray(np.arange(32, dtype=np.float32))
        y = np.asarray(f2.lagrange_interpolate(x, 0.5, order=3))
        # causal FIR with total delay mu + (order-1)//2 = 1.5 samples
        assert abs(y[10] - 8.5) < 1e-4

    def test_mmse_interp_delays_tone(self):
        fs = 100.0
        t = np.arange(256) / fs
        x = np.cos(2 * np.pi * 5 * t).astype(np.float32)
        y = np.asarray(f2.mmse_interpolate(jnp.asarray(x), 0.5, n_taps=8))
        # group delay = (n_taps-1)/2 + 0.5 = 4.0 samples
        want = np.cos(2 * np.pi * 5 * (t - 4.0 / fs))
        np.testing.assert_allclose(y[16:200], want[16:200], atol=0.01)

    def test_interpolating_resampler_tone_freq(self):
        fs = 1000.0
        t = np.arange(2048) / fs
        x = np.exp(2j * np.pi * 100 * t).astype(np.complex64)
        y = np.asarray(f2.interpolating_resampler(jnp.asarray(x), 2.0))
        spec = np.abs(np.fft.fft(y[16:16 + 512]))
        # decimated by 2 -> 100 Hz at fs 500 -> bin 102 of 512
        assert abs(np.argmax(spec) - round(100 / 500 * 512)) <= 1

    def test_sample_rate_converter_len(self):
        x = jnp.asarray(_rand(1000))
        y = f2.sample_rate_converter(x, 48_000.0, 24_000.0)
        assert abs(y.shape[0] - 500) <= 8

    def test_duc_places_carrier(self):
        fs_out = 8000.0
        x = jnp.ones(256, jnp.complex64)
        y = np.asarray(f2.digital_up_converter(x, 4, 2000.0, fs_out))
        spec = np.abs(np.fft.fft(y[:1024] * np.hanning(1024)))
        assert abs(np.argmax(spec) - 256) <= 2  # 2 kHz of 8 kHz -> bin 256

    def test_variable_rate_cic_roundtrip_dc(self):
        x = jnp.ones(64, jnp.float32)
        up = np.asarray(f2.variable_rate_cic(x, 4, stages=3, interp=True))
        assert abs(up[40] - 1.0) < 1e-3  # unity DC gain after settle
        dn = np.asarray(f2.variable_rate_cic(jnp.ones(64, jnp.float32), 4,
                                             stages=3))
        assert abs(dn[-1] - 1.0) < 1e-3


class TestSpectral:
    def test_group_delay_equalizer_flat_is_delay(self):
        taps = np.asarray(f2.group_delay_equalizer_taps(
            np.full(16, 0.0), n_taps=31))
        # zero target delay -> near-impulse at the center
        assert np.argmax(np.abs(taps)) == 15

    def test_log_power_fft_finds_tone(self):
        fs = 1024.0
        t = np.arange(4096) / fs
        x = np.exp(2j * np.pi * 128 * t).astype(np.complex64)
        p = np.asarray(f2.log_power_fft(jnp.asarray(x), nfft=1024))
        assert np.argmax(p) == 512 + 128

    def test_oversampled_dft_resolution(self):
        x = np.exp(2j * np.pi * 0.1253 * np.arange(128))
        m = np.asarray(f2.frequency_domain_oversampled_dft(
            jnp.asarray(x.astype(np.complex64)), 128, oversample=8))
        assert abs(np.argmax(m) / 1024 - 0.1253) < 1e-3

    def test_welch_alias_runs(self):
        p = np.asarray(f2.welch_periodogram(jnp.asarray(_rand(4096)),
                                            nfft=256))
        assert p.shape[-1] == 256 and np.isfinite(p).all()

    def test_instantaneous_frequency(self):
        fs = 1000.0
        x = np.exp(2j * np.pi * 123 * np.arange(512) / fs)
        f = np.asarray(f2.instantaneous_frequency(
            jnp.asarray(x.astype(np.complex64)), fs))
        assert abs(np.median(f) - 123) < 1.0


class TestNoise:
    def test_noise_blanker_kills_impulse(self):
        x = _rand(1024, seed=2) * 0.1
        x[500] = 50.0 + 0j
        y = np.asarray(f2.noise_blanker(jnp.asarray(x)))
        assert abs(y[500]) == 0.0
        assert abs(y[100]) > 0.0

    def test_noise_gate(self):
        x = np.concatenate([np.full(300, 0.001), np.full(300, 1.0)])
        y = np.asarray(f2.noise_gate(jnp.asarray(x.astype(np.float32)),
                                     open_db=-20.0))
        assert abs(y[100]) < 1e-4
        assert abs(y[-1]) > 0.5

    def test_noise_shaping_quantizer_pushes_noise_up(self):
        rng = np.random.default_rng(3)
        x = (0.5 * np.sin(2 * np.pi * 0.01 * np.arange(8192))).astype(
            np.float32)
        y = np.asarray(f2.noise_shaping_quantize(jnp.asarray(x), 4))
        err = y - x
        spec = np.abs(np.fft.rfft(err)) ** 2
        low = spec[1:len(spec) // 8].mean()
        high = spec[len(spec) // 2:].mean()
        assert high > 2.0 * low  # shaped noise rises with frequency
        del rng


class TestCompressors:
    def test_compressor_reduces_loud(self):
        x = np.concatenate([np.full(2000, 0.05), np.full(2000, 1.0)])
        y = np.asarray(f2.dynamic_range_compressor(
            jnp.asarray(x.astype(np.float32)), threshold_db=-20.0,
            ratio=4.0))
        assert abs(y[1500] / x[1500] - 1.0) < 0.2   # quiet ~unity
        assert y[3900] < 0.5                        # loud compressed

    def test_multiband_runs(self):
        x = jnp.asarray(_rand(4096, cplx=False))
        y = f2.multiband_compressor(x, 48_000.0)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())


class TestEmphasis:
    def test_pre_de_emphasis_roundtrip(self):
        x = _rand(512, cplx=False)
        y = np.asarray(f2.de_emphasis(f2.pre_emphasis(jnp.asarray(x))))
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_fm_deemphasis_attenuates_highs(self):
        fs = 48_000.0
        hi = np.sin(2 * np.pi * 15_000 * np.arange(4096) / fs)
        lo = np.sin(2 * np.pi * 100 * np.arange(4096) / fs)
        g_hi = float(np.std(np.asarray(f2.fm_deemphasis(
            jnp.asarray(hi.astype(np.float32)), fs))))
        g_lo = float(np.std(np.asarray(f2.fm_deemphasis(
            jnp.asarray(lo.astype(np.float32)), fs))))
        assert g_hi < 0.3 * g_lo


class TestSynthesis:
    def test_filter_synthesis_kinds(self):
        fs = 1.0
        lp = np.asarray(f2.filter_synthesis("lowpass", 63, fs, 0.1))
        bs = np.asarray(f2.filter_synthesis("bandstop", 63, fs, 0.1, 0.2))
        w = np.fft.rfftfreq(1024)
        H_lp = np.abs(np.fft.rfft(lp, 1024))
        H_bs = np.abs(np.fft.rfft(bs, 1024))
        assert H_lp[np.argmin(np.abs(w - 0.05))] > 0.9
        assert H_lp[np.argmin(np.abs(w - 0.3))] < 0.05
        assert H_bs[np.argmin(np.abs(w - 0.15))] < 0.1   # notched
        assert H_bs[np.argmin(np.abs(w - 0.4))] > 0.8    # passes outside
