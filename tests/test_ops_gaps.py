"""Known-answer coverage for ops/ public functions the audit found
untested (VERDICT r1 item 10: every ops/ public function covered)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.core.hostio import cis
from r4w_tpu.ops import (adaptive, detect, equalizers, ew, filters,
                         impairments, kalman, measure, modem, ofdm,
                         pulse, radar, resample, spreading, sync)


def _tone(f, n, fs=1.0):
    ph = 2 * np.pi * f / fs * np.arange(n)
    return np.exp(1j * ph).astype(np.complex64)


class TestFilters:
    def test_savitzky_golay_preserves_polynomials(self):
        taps = np.asarray(adaptive.savitzky_golay_taps(11, 3))
        # a cubic through the window is reproduced exactly at center
        x = np.arange(-5, 6.0)
        poly = 2.0 - x + 0.5 * x**2 + 0.1 * x**3
        assert float(taps @ poly) == pytest.approx(poly[5], rel=1e-6)
        assert float(taps.sum()) == pytest.approx(1.0, rel=1e-6)

    def test_interpolating_fir_gain_and_rate(self):
        x = jnp.asarray(np.ones(64, np.float32))
        taps = filters.design_lowpass(31, 0.4 / 4, 1.0)
        y = np.asarray(filters.interpolating_fir(taps, x, 4))
        assert y.shape[-1] == 64 * 4
        assert y[200] == pytest.approx(1.0, abs=0.05)  # unit DC gain

    def test_freq_xlating_fir_extracts_offset_channel(self):
        fs = 1e6
        x = jnp.asarray(_tone(100e3, 8192, fs) + _tone(-300e3, 8192, fs))
        taps = filters.design_lowpass(63, 50e3, fs)
        y, _, phase = filters.freq_xlating_fir(taps, x, 100e3, fs)
        y = np.asarray(y)[500:]
        f_inst = np.angle(y[1:] * y[:-1].conj()).mean() * fs / (2 * np.pi)
        assert abs(f_inst) < 1e3  # channel moved to DC
        assert phase != 0.0

    def test_moving_rms(self):
        x = jnp.asarray(np.concatenate([np.zeros(50), 3 * np.ones(50)])
                        .astype(np.float32))
        y = np.asarray(filters.moving_rms(x, 10))
        assert y[40] == pytest.approx(0.0, abs=1e-6)
        assert y[-1] == pytest.approx(3.0, rel=1e-5)

    def test_hilbert_taps_quadrature(self):
        taps = np.asarray(filters.hilbert_fir_taps(63))
        # antisymmetric with zero center (type III)
        assert np.allclose(taps, -taps[::-1], atol=1e-7)
        assert abs(taps[31]) < 1e-9
        # shifts a cosine to a sine (90 deg) mid-band
        n = np.arange(512)
        x = np.cos(2 * np.pi * 0.2 * n).astype(np.float32)
        y, _ = filters.fir_filter(taps, jnp.asarray(x))
        d = 31  # group delay
        want = np.sin(2 * np.pi * 0.2 * (n - d))
        got = np.asarray(y)
        assert np.corrcoef(got[100:400], want[100:400])[0, 1] > 0.999

    def test_fractional_delay(self):
        taps = filters.fractional_delay_taps(0.5, 21)
        n = np.arange(256)
        x = np.sin(2 * np.pi * 0.05 * n).astype(np.float32)
        y, _ = filters.fir_filter(taps, jnp.asarray(x))
        d = 10.5  # integer group delay + 0.5 fractional
        want = np.sin(2 * np.pi * 0.05 * (n - d))
        assert np.abs(np.asarray(y)[50:200] - want[50:200]).max() < 1e-2

    def test_highpass_bandpass_responses(self):
        hp = filters.design_highpass(63, 0.2, 1.0)
        bp = filters.design_bandpass(63, 0.1, 0.2, 1.0)
        w = np.fft.rfftfreq(1024)
        H_hp = np.abs(np.fft.rfft(np.asarray(hp), 1024))
        H_bp = np.abs(np.fft.rfft(np.asarray(bp), 1024))
        assert H_hp[0] < 0.01 and H_hp[w > 0.3].min() > 0.9
        assert H_bp[(w > 0.12) & (w < 0.18)].min() > 0.8
        assert H_bp[0] < 0.02 and H_bp[w > 0.3].max() < 0.05


class TestSync:
    def test_pll_track_tone_locks(self):
        fs_frac = 0.01  # tone at 1% of sample rate
        x = jnp.asarray(_tone(fs_frac, 4096))
        out = sync.pll_track_tone(x, loop_bw=0.02)
        freq = np.asarray(out.freq if hasattr(out, "freq") else out[1])
        # locked frequency estimate approaches 2π·0.01 rad/sample
        assert freq[-1] == pytest.approx(2 * np.pi * fs_frac, rel=0.05)

    def _bpsk(self, sps, frac_offset=0.0, n_sym=512, seed=0):
        rng = np.random.default_rng(seed)
        sym = 1.0 - 2.0 * rng.integers(0, 2, n_sym)
        taps = np.asarray(pulse.root_raised_cosine_taps(sps, 8, 0.35))
        up = np.zeros(n_sym * sps)
        up[::sps] = sym
        x = np.convolve(up, taps)
        if frac_offset:
            d = filters.fractional_delay_taps(frac_offset, 21)
            x = np.convolve(x, np.asarray(d))
        return x.astype(np.float32)

    @pytest.mark.parametrize("ted,fn", [
        ("gardner", sync.gardner_ted),
        ("mm", sync.mueller_muller_ted),
        ("earlylate", sync.early_late_gate)])
    def test_ted_zero_at_optimum_nonzero_offset(self, ted, fn):
        sps = 8
        aligned = self._bpsk(sps)[sps * 8:]  # skip filter delay
        off = self._bpsk(sps, frac_offset=3.0)[sps * 8:]
        e_aligned = float(np.mean(np.asarray(fn(jnp.asarray(aligned),
                                                sps))))
        e_off = float(np.mean(np.asarray(fn(jnp.asarray(off), sps))))
        assert abs(e_aligned) < abs(e_off), (ted, e_aligned, e_off)

    def test_access_code_correlate(self):
        code = np.asarray([1, 1, 1, 0, 0, 1, 0, 1], np.int32)
        bits = np.concatenate([np.zeros(20, np.int32), code,
                               np.ones(10, np.int32)])
        c = np.asarray(sync.access_code_correlate(jnp.asarray(bits),
                                                  jnp.asarray(code)))
        assert int(np.argmax(c)) == 20
        assert int(c[20]) == len(code)


class TestMeasure:
    def test_ber_count(self):
        e, t = measure.ber_count(jnp.asarray([0, 1, 1, 0]),
                                 jnp.asarray([0, 1, 0, 0, 1]))
        assert (int(e), int(t)) == (1, 4)

    def test_periodogram_and_stft_peak(self):
        x = jnp.asarray(_tone(0.125, 2048))
        psd = np.asarray(measure.periodogram_psd(x, nfft=512))
        freqs = np.fft.fftshift(np.fft.fftfreq(512))
        assert freqs[np.argmax(psd)] == pytest.approx(0.125, abs=1 / 512)
        frames = np.asarray(measure.stft(x, nfft=256, hop=128))
        assert frames.ndim == 2 and frames.shape[-1] == 256
        k = np.abs(frames[2]).argmax()
        assert k == round(0.125 * 256)

    def test_channel_capacity(self):
        # 20 dB SNR, 1 MHz -> ~6.66 Mbps
        c = float(measure.channel_capacity_awgn(20.0, 1e6))
        assert c == pytest.approx(1e6 * np.log2(101), rel=1e-6)

    def test_eye_diagram_shape(self):
        x = jnp.asarray(np.tile([1.0, 1, -1, -1], 64).astype(np.float32))
        traces = np.asarray(measure.eye_diagram(x, sps=4, n_traces=16))
        assert traces.shape[0] == 16

    def test_signal_power_db(self):
        x = jnp.asarray(2.0 * np.ones(128, np.float32))
        assert float(measure.signal_power_db(x)) == pytest.approx(
            10 * np.log10(4.0), abs=1e-4)


class TestImpairmentsKalman:
    def test_dc_offset_and_rapp(self):
        x = jnp.zeros(16, jnp.complex64)
        y = np.asarray(impairments.dc_offset(x, 0.1, -0.2))
        assert y[0] == pytest.approx(0.1 - 0.2j, abs=1e-6)
        # Rapp: linear for small inputs, saturates at `saturation`
        small = np.asarray(impairments.rapp_pa(
            jnp.asarray([0.01 + 0j], jnp.complex64), 1.0))
        big = np.asarray(impairments.rapp_pa(
            jnp.asarray([100.0 + 0j], jnp.complex64), 1.0))
        assert abs(small[0]) == pytest.approx(0.01, rel=0.01)
        assert abs(big[0]) == pytest.approx(1.0, rel=0.05)

    def test_ukf_step_tracks_nonlinear_measurement(self):
        # state [pos, vel]; measurement = pos^2 (nonlinear)
        fx = lambda x: jnp.asarray([x[0] + 0.1 * x[1], x[1]])
        hx = lambda x: jnp.asarray([x[0] ** 2])
        q = 0.01 * jnp.eye(2)
        r = jnp.asarray([[0.1]])
        x = jnp.asarray([2.0, 1.0])
        cov = 0.01 * jnp.eye(2)  # small prior: sigma spread stays local
        true_pos = 2.0 + 0.1 * 1.0
        x1, cov1 = kalman.ukf_step(fx, hx, q, r, x, cov,
                                   jnp.asarray([true_pos ** 2]))
        assert float(x1[0]) == pytest.approx(true_pos, abs=0.15)
        assert np.all(np.linalg.eigvals(np.asarray(cov1)) > 0)


class TestEqRadarResample:
    def test_dfe_equalize_two_ray(self):
        rng = np.random.default_rng(0)
        sym = (1.0 - 2.0 * rng.integers(0, 2, 4000)).astype(np.complex64)
        chan = np.asarray([1.0, 0.0, 0.45], np.complex64)
        rx = np.convolve(sym, chan)[: len(sym)].astype(np.complex64)
        out = equalizers.dfe_equalize(jnp.asarray(rx), n_ff=7, n_fb=4,
                                      mu=0.01)
        y = np.asarray(out.y if hasattr(out, "y") else out[0])
        tail = y[3000:]
        hard = np.sign(tail.real)
        err = np.mean(hard != np.sign(sym[3000:len(sym)].real))
        assert err < 0.05

    def test_sar_compress_focuses_point_target(self):
        n = np.arange(32)
        rref = np.exp(1j * np.pi * 0.01 * n * n).astype(np.complex64)
        aref = np.exp(1j * np.pi * 0.005 * n * n).astype(np.complex64)
        raw = ew.sar_point_target(64, 128, 40, 20, rref, aref)
        rc = ew.sar_range_compress(jnp.asarray(raw), jnp.asarray(rref))
        img = np.abs(np.asarray(ew.sar_azimuth_compress(
            rc, jnp.asarray(aref))))
        peak = np.unravel_index(img.argmax(), img.shape)
        assert abs(peak[1] - 40) <= 1  # range bin focused

    def test_cfar_2d_detects_target(self):
        rng = np.random.default_rng(1)
        p = rng.exponential(1.0, (64, 64)).astype(np.float32)
        p[30, 40] = 500.0
        det, threshold = radar.cfar_2d(jnp.asarray(p))
        det = np.asarray(det)
        assert det[30, 40]
        assert det.sum() < 20  # few false alarms
        assert np.asarray(threshold).shape == p.shape

    def test_beamformer_gain(self):
        sv = radar.steering_vector(8, 0.5, 30.0)
        snaps = jnp.asarray(np.outer(np.asarray(sv),
                                     _tone(0.1, 64)).astype(np.complex64))
        y = np.asarray(radar.beamform(snaps, sv))
        assert np.abs(y).mean() == pytest.approx(8.0, rel=0.01)

    def test_ambiguity_function_peak_at_origin(self):
        pulse_iq = jnp.asarray(_tone(0.0, 64))
        amb = np.asarray(radar.ambiguity_function(pulse_iq,
                                                  max_doppler_bins=16))
        peak = np.unravel_index(amb.argmax(), amb.shape)
        # zero-Doppler row, zero-lag column hold the maximum
        assert amb[peak] == amb.max()
        assert peak[0] in (amb.shape[0] // 2, 0)

    def test_polyphase_roundtrip_and_halfband(self):
        taps = np.arange(12, dtype=np.float32)
        bank = np.asarray(resample.polyphase_decompose(
            jnp.asarray(taps), 4))
        assert bank.shape == (4, 3)
        assert bank[1].tolist() == [1.0, 5.0, 9.0]
        hb = np.asarray(resample.halfband_taps(31))
        nz = np.nonzero(np.abs(hb) > 1e-9)[0]
        # halfband structure: odd taps vanish (center at 15 nonzero)
        assert all(i % 2 == 0 or i == 15 for i in nz)
        assert 15 in nz
        x = jnp.asarray(np.ones(64, np.float32))
        y = np.asarray(resample.polyphase_interpolate(
            x, jnp.asarray(filters.design_lowpass(32, 0.1, 1.0)), 4))
        assert y.shape[-1] == 64 * 4
        assert y[128] == pytest.approx(1.0, abs=0.05)

    def test_pfb_synthesizer_inverts_channelizer(self):
        fs = 64_000.0
        x = jnp.asarray(_tone(5000.0, 4096, fs))
        chans = resample.pfb_channelizer(x, 8)
        back = np.asarray(resample.pfb_synthesizer(chans))
        assert back.shape[-1] >= 4000
        f = np.angle(back[600:-100][1:]
                     * back[600:-100][:-1].conj()).mean() / (2 * np.pi)
        assert f * fs == pytest.approx(5000.0, abs=200.0)


class TestMiscOps:
    def test_zadoff_chu_cazac(self):
        zc = np.asarray(spreading.zadoff_chu(25, 139))
        assert np.allclose(np.abs(zc), 1.0, atol=1e-5)  # constant amp
        ac = np.abs(np.fft.ifft(np.abs(np.fft.fft(zc)) ** 2))
        assert ac[0] == pytest.approx(139, rel=1e-4)
        assert ac[1:].max() < 1.0  # zero autocorrelation (CAZAC)

    def test_rake_despread_finger(self):
        code = np.asarray(spreading.gold_code(5, 3), np.float32)
        sym = np.asarray([1.0, -1.0, 1.0, 1.0], np.float32)
        tx = (sym[:, None] * code[None, :]).reshape(-1)
        rx = np.concatenate([np.zeros(7, np.float32), tx])
        vals = np.asarray(spreading.rake_despread(
            jnp.asarray(rx.astype(np.complex64)), jnp.asarray(code), 7))
        assert np.sign(vals.real[:4]).tolist() == sym.tolist()

    def test_matched_filter_alignment(self):
        taps = np.asarray(pulse.root_raised_cosine_taps(8, 8, 0.25))
        x = np.zeros(256, np.float32)
        x[100] = 1.0
        shaped = np.convolve(x, taps)[:256]
        y = np.asarray(pulse.matched_filter(jnp.asarray(shaped),
                                            jnp.asarray(taps)))
        # zero-phase: peak lands back on the impulse position
        assert abs(int(np.argmax(np.abs(y))) - 100 - len(taps) // 2) <= \
            len(taps) // 2 + 1

    def test_fbmc_efficiency(self):
        eff = modem.fbmc_spectral_efficiency(64, 4)
        assert 0.5 < eff <= 1.0

    def test_ofdm_training_estimate_and_cpe(self):
        train = jnp.asarray(_tone(0.0, 0))  # placeholder unused
        h_true = (0.8 * np.exp(1j * 0.7)).astype(np.complex64)
        tx_train = np.asarray([1 + 0j, -1 + 0j, 1 + 0j, 1 + 0j],
                              np.complex64)
        rx_train = h_true * tx_train
        h = np.asarray(ofdm.estimate_channel_from_training(
            jnp.asarray(rx_train)[None, :], jnp.asarray(tx_train)))
        assert np.allclose(h, h_true, atol=1e-5)
        # common phase error of a rotated estimate
        rot = np.exp(1j * 0.3).astype(np.complex64)
        cpe = ofdm.common_phase_error(jnp.asarray(h * rot)[None, :],
                                      jnp.asarray(h)[None, :])
        assert float(np.angle(np.asarray(cpe))[0]) == pytest.approx(
            0.3, abs=1e-3)

    def test_detect_helpers(self):
        x = jnp.asarray(np.ones(1024, np.float32) * 2.0)
        e = np.asarray(detect.frame_energy_db(x, 256))
        assert e.shape == (4,)
        assert e[0] == pytest.approx(10 * np.log10(4.0), abs=1e-3)
        word = np.asarray([1, 0, 1, 1], np.int32)
        c = np.asarray(detect.sync_word_correlate(
            jnp.asarray(np.concatenate([word, [0, 0, 0, 0]])), word))
        assert c[0] == 4.0
