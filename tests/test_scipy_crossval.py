"""Cross-validation of core DSP ops against scipy.signal — an
independent reference implementation (the closest offline equivalent of
validating against GNU Radio, which is what the reference does in
benches/gnuradio_comparison.rs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sps

from r4w_tpu.ops import filters, measure, pulse, resample

RNG = np.random.default_rng(42)
X = RNG.standard_normal(4096).astype(np.float32)
XC = (RNG.standard_normal(4096)
      + 1j * RNG.standard_normal(4096)).astype(np.complex64)


class TestFiltersVsScipy:
    def test_fir_filter_matches_lfilter(self):
        taps = sps.firwin(63, 0.3)
        ours, _ = filters.fir_filter(taps.astype(np.float32),
                                     jnp.asarray(X))
        ref = sps.lfilter(taps, [1.0], X)
        assert np.abs(np.asarray(ours) - ref).max() < 1e-4

    def test_iir_filter_matches_lfilter(self):
        b, a = sps.butter(4, 0.2)
        ours, _ = filters.iir_filter(b, a, jnp.asarray(X))
        ref = sps.lfilter(b, a, X)
        assert np.abs(np.asarray(ours) - ref).max() < 1e-3

    def test_iir_state_continuity_matches_scipy_zi(self):
        b, a = sps.butter(2, 0.1)
        y1, zf = filters.iir_filter(b, a, jnp.asarray(X[:2048]))
        y2, _ = filters.iir_filter(b, a, jnp.asarray(X[2048:]), zi=zf)
        ref = sps.lfilter(b, a, X)
        ours = np.concatenate([np.asarray(y1), np.asarray(y2)])
        assert np.abs(ours - ref).max() < 1e-3

    def test_design_lowpass_matches_firwin(self):
        ours = np.asarray(filters.design_lowpass(63, 0.2, 1.0,
                                                 window="hamming"))
        ref = sps.firwin(63, 0.4, window="hamming")  # firwin: Nyquist=1
        # same response shape (both unit DC; compare frequency domain)
        w, H_o = sps.freqz(ours, worN=512)
        _, H_r = sps.freqz(ref, worN=512)
        assert np.abs(np.abs(H_o) - np.abs(H_r)).max() < 0.02

    def test_hilbert_against_scipy_analytic(self):
        taps = filters.hilbert_fir_taps(127)
        n = np.arange(2048)
        x = np.cos(2 * np.pi * 0.1 * n).astype(np.float32)
        imag, _ = filters.fir_filter(taps, jnp.asarray(x))
        ref = np.imag(sps.hilbert(x))
        d = 63  # group delay
        got = np.asarray(imag)[d:-d]
        want = ref[: len(got)]
        err = np.abs(got - want)[200:-200].max()
        assert err < 0.02


class TestSpectralVsScipy:
    def test_welch_matches_scipy(self):
        ours = np.asarray(measure.welch_psd(jnp.asarray(XC), nperseg=256,
                                            sample_rate=1.0))
        f_ref, ref = sps.welch(XC, fs=1.0, nperseg=256,
                               noverlap=128, window="hann",
                               return_onesided=False, detrend=False)
        ref_shifted = np.fft.fftshift(ref)
        ours_n = ours / ours.sum()
        ref_n = ref_shifted / ref_shifted.sum()
        assert np.abs(ours_n - ref_n).max() < 0.02 * ref_n.max()

    def test_stft_matches_scipy_frame(self):
        frames = np.asarray(measure.stft(jnp.asarray(XC), nfft=256,
                                         hop=128, window="hann"))
        win = sps.get_window("hann", 256)
        ref0 = np.fft.fft(XC[:256] * win)
        assert np.abs(frames[0] - ref0).max() < 1e-2 * np.abs(ref0).max()

    def test_rrc_matches_commpy_formula(self):
        """Spot-check RRC taps against the closed form at t=0 and
        t=±Ts/(4β) (the removable singularities)."""
        sps_ = 8
        beta = 0.25
        taps = np.asarray(pulse.root_raised_cosine_taps(sps_, 8, beta))
        center = len(taps) // 2
        unnorm = taps / taps[center]
        want_0 = 1.0
        t_sing = int(round(sps_ / (4 * beta)))  # = 8 samples
        expect_sing = ((beta / np.sqrt(2))
                       * ((1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
                          + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta))))
        expect_0 = 1.0 - beta + 4 * beta / np.pi
        ratio = expect_sing / expect_0
        assert unnorm[center] == pytest.approx(want_0)
        assert unnorm[center + t_sing] == pytest.approx(ratio, rel=1e-5)


class TestResampleVsScipy:
    def test_rational_resample_matches_resample_poly(self):
        """On a bandlimited signal the two implementations must agree
        (white noise stresses only the anti-alias filter edges, which
        legitimately differ between designs)."""
        n = np.arange(4096)
        xb = np.sin(2 * np.pi * 0.03 * n).astype(np.float32)
        ours = np.asarray(resample.rational_resample(jnp.asarray(xb),
                                                     up=3, down=2))
        ref = sps.resample_poly(xb, 3, 2)
        m = min(len(ours), len(ref)) - 64
        xc = np.correlate(ours[:m] - ours[:m].mean(),
                          ref[:m] - ref[:m].mean(), "full")
        lag = xc.argmax() - (m - 1)
        a = ours[max(lag, 0):m + min(lag, 0)]
        b = ref[max(-lag, 0):m - max(lag, 0)]
        k = min(len(a), len(b))
        # the two anti-alias prototypes differ slightly (ours windowed
        # sinc, scipy's firwin with its own width), so steady-state
        # agreement lands at ~0.9995 on a tone; gate at 0.999
        corr = np.corrcoef(a[300:k - 300], b[300:k - 300])[0, 1]
        assert corr > 0.999

    def test_decimating_fir_matches_scipy_decimate_shape(self):
        taps = sps.firwin(64, 0.2).astype(np.float32)
        ours, _ = filters.decimating_fir(taps, jnp.asarray(X), 4)
        ref = sps.lfilter(taps, [1.0], X)[::4]
        assert np.abs(np.asarray(ours) - ref).max() < 1e-4


class TestWindowsVsScipy:
    @pytest.mark.parametrize("kind", ["hann", "hamming", "blackman"])
    def test_windows_match(self, kind):
        from r4w_tpu.core.windows import make_window

        ours = np.asarray(make_window(kind, 128))
        ref = sps.get_window(kind, 128, fftbins=True)
        # accept either periodic or symmetric convention
        ref_sym = sps.get_window(kind, 128, fftbins=False)
        err = min(np.abs(ours - ref).max(), np.abs(ours - ref_sym).max())
        assert err < 1e-6
