"""Round-4 known-answer batch: external ground truths (scipy closed
forms, ITU/IEEE constants, analytic formulas) for block families the
audit showed exercised-but-thin (VERDICT r3 #3 'KA count >= 350').

Every case compares framework output against an INDEPENDENT truth —
scipy.signal, scipy.special closed forms, or published constants —
never against itself.
"""

import numpy as np
import pytest
import scipy.signal as ss
import scipy.special as sp

import jax.numpy as jnp

from r4w_tpu.ops import filters as F
from r4w_tpu.ops import resample as R


# ---------------------------------------------------------------- FIR design


@pytest.mark.parametrize("num_taps", [31, 63, 127])
@pytest.mark.parametrize("cutoff_frac", [0.1, 0.2, 0.35, 0.45])
def test_lowpass_design_matches_scipy_firwin(num_taps, cutoff_frac):
    fs = 48_000.0
    cutoff = cutoff_frac * fs / 2
    ours = np.asarray(F.design_lowpass(num_taps, cutoff, fs))
    ref = ss.firwin(num_taps, cutoff, fs=fs)
    # identical windowed-sinc recipe -> taps agree to float tolerance
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("num_taps,lo,hi", [
    (63, 4000.0, 8000.0), (101, 2000.0, 6000.0), (127, 6000.0, 10000.0),
])
def test_bandpass_design_matches_scipy_firwin(num_taps, lo, hi):
    fs = 48_000.0
    ours = np.asarray(F.design_bandpass(num_taps, lo, hi, fs))
    ref = ss.firwin(num_taps, [lo, hi], fs=fs, pass_zero=False)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("num_taps,cutoff_frac", [
    (63, 0.15), (101, 0.3), (127, 0.4),
])
def test_highpass_design_stopband_and_passband(num_taps, cutoff_frac):
    fs = 2.0  # normalized
    h = np.asarray(F.design_highpass(num_taps, cutoff_frac, fs))
    w, resp = ss.freqz(h, worN=2048, fs=fs)
    mag = np.abs(resp)
    assert mag[w < 0.5 * cutoff_frac].max() < 0.05   # deep stopband
    band = mag[w > min(1.5 * cutoff_frac, 0.95)]
    assert abs(band.mean() - 1.0) < 0.1              # flat passband


# ----------------------------------------------------------------- IIR/filt


@pytest.mark.parametrize("order,wn", [(2, 0.2), (4, 0.3), (3, 0.1)])
def test_iir_filter_matches_scipy_lfilter_butter(order, wn):
    b, a = ss.butter(order, wn)
    x = np.random.default_rng(order).standard_normal(512).astype(
        np.float32)
    ref = ss.lfilter(b, a, x)
    got, _ = F.iir_filter(b, a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


@pytest.mark.parametrize("order,wn", [(2, 0.15), (3, 0.35)])
def test_iir_filter_matches_scipy_cheby1(order, wn):
    b, a = ss.cheby1(order, 1.0, wn)
    x = np.random.default_rng(9).standard_normal(400).astype(np.float32)
    ref = ss.lfilter(b, a, x)
    got, _ = F.iir_filter(b, a, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4)


@pytest.mark.parametrize("k", [8, 32, 96])
def test_fir_apply_matches_numpy_convolve(k):
    rng = np.random.default_rng(k)
    taps = rng.standard_normal(k).astype(np.float32) / k
    x = rng.standard_normal(2048).astype(np.float32)
    got = np.asarray(F.fir_apply(jnp.asarray(taps), jnp.asarray(x)))
    ref = np.convolve(x, taps)[: x.shape[0]]
    # implementation returns the streaming (causal, same-length) form
    assert got.shape[0] == x.shape[0]
    np.testing.assert_allclose(got, ref[: got.shape[0]], atol=2e-4)


# ----------------------------------------------------------------- resample


@pytest.mark.parametrize("up,down", [(2, 1), (3, 2), (5, 4), (1, 2),
                                     (2, 3), (4, 5)])
def test_rational_resample_tone_frequency(up, down):
    """A tone resampled by up/down must land at f0·down/up of the new
    rate — checked against the FFT peak (analytic truth)."""
    n = 4096
    f0 = 0.05  # cycles/sample
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    y = np.asarray(R.rational_resample(jnp.asarray(x), up, down))
    m = y.shape[0]
    k = np.argmax(np.abs(np.fft.fft(y[m // 4:])))
    got = k / (m - m // 4)
    want = f0 * down / up
    assert abs(got - want) < 0.01, (got, want)


@pytest.mark.parametrize("ratio", [0.75, 1.5, 2.5])
def test_arbitrary_resample_tone_frequency(ratio):
    n = 4096
    f0 = 0.04
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    y = np.asarray(R.arbitrary_resample(jnp.asarray(x), ratio))
    m = y.shape[0]
    k = np.argmax(np.abs(np.fft.fft(y[m // 4:])))
    got = k / (m - m // 4)
    assert abs(got - f0 / ratio) < 0.01


# ------------------------------------------------------------- windows/PSD


@pytest.mark.parametrize("win", ["hann", "hamming", "blackman",
                                 "bartlett"])
def test_welch_psd_tone_location_vs_scipy(win):
    from r4w_tpu.ops.measure import welch_psd

    fs, f0, n = 8000.0, 1234.0, 8192
    rng = np.random.default_rng(1)
    x = (np.sin(2 * np.pi * f0 * np.arange(n) / fs)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    f_ref, p_ref = ss.welch(x, fs=fs, nperseg=512, window=win)
    p_ours = np.asarray(welch_psd(jnp.asarray(x), nperseg=512,
                                  window=win, sample_rate=fs))
    # ours is two-sided fftshifted; positive-frequency half starts at
    # the center bin — the tone's bin index matches scipy's onesided
    pos = p_ours[p_ours.shape[-1] // 2:]
    k_ref = int(np.argmax(p_ref))
    k_ours = int(np.argmax(pos))
    assert abs(k_ours - k_ref) <= 1


@pytest.mark.parametrize("n", [64, 128, 256, 512])
def test_hilbert_analytic_magnitude(n):
    """|hilbert(cos)| ≈ 1 (analytic-signal envelope) away from edges —
    scipy cross-check of the envelope path used by bearing blocks."""
    t = np.arange(n)
    x = np.cos(2 * np.pi * 0.1 * t).astype(np.float32)
    ref = np.abs(ss.hilbert(x))
    from r4w_tpu.ops.sensing import _analytic_mask

    spec = np.fft.fft(x) * np.asarray(_analytic_mask(n))
    env = np.abs(np.fft.ifft(spec))
    np.testing.assert_allclose(env[n // 8: -n // 8],
                               ref[n // 8: -n // 8], atol=1e-3)


# --------------------------------------------------------------- BER theory


@pytest.mark.parametrize("ebn0_db", [0.0, 2.0, 4.0, 6.0, 8.0, 10.0])
def test_bpsk_theory_matches_erfc_closed_form(ebn0_db):
    from r4w_tpu.ber import theoretical_ber

    got = float(theoretical_ber("bpsk", jnp.asarray(ebn0_db)))
    want = 0.5 * sp.erfc(np.sqrt(10.0 ** (ebn0_db / 10.0)))
    assert abs(got - want) < 1e-6 * max(want, 1e-9) + 1e-9


@pytest.mark.parametrize("ebn0_db", [4.0, 8.0, 12.0])
def test_16qam_theory_matches_closed_form(ebn0_db):
    from r4w_tpu.ber import theoretical_ber

    got = float(theoretical_ber("16qam", jnp.asarray(ebn0_db)))
    # exact Gray 16-QAM BER (Cho & Yoon closed form, first two terms
    # dominate; tolerance covers the truncation)
    ebn0 = 10.0 ** (ebn0_db / 10.0)
    esn0 = 4.0 * ebn0
    q = lambda x: 0.5 * sp.erfc(x / np.sqrt(2.0))
    p = (3.0 / 4.0) * q(np.sqrt(esn0 / 5.0)) \
        + (1.0 / 2.0) * q(3.0 * np.sqrt(esn0 / 5.0)) \
        - (1.0 / 4.0) * q(5.0 * np.sqrt(esn0 / 5.0))
    want = p / 1.0
    assert abs(got - want) / max(want, 1e-12) < 0.08


@pytest.mark.parametrize("ebn0_db", [6.0, 10.0])
def test_fsk_noncoherent_theory(ebn0_db):
    from r4w_tpu.ber import theoretical_ber

    got = float(theoretical_ber("fsk-noncoherent", jnp.asarray(ebn0_db)))
    want = 0.5 * np.exp(-0.5 * 10.0 ** (ebn0_db / 10.0))
    assert abs(got - want) < 1e-6


# ------------------------------------------------------------ constellations


@pytest.mark.parametrize("m", [2, 4, 8, 16])
def test_psk_constellation_unit_power_and_spacing(m):
    from r4w_tpu.waveforms.linear_mod import psk_constellation

    c = np.asarray(psk_constellation(m))
    assert c.shape[0] == m
    np.testing.assert_allclose(np.abs(c), 1.0, atol=1e-6)
    # nearest-neighbour distance = 2 sin(pi/m) (unit circle geometry)
    d = np.abs(c[:, None] - c[None, :]) + 10.0 * np.eye(m)
    np.testing.assert_allclose(d.min(), 2.0 * np.sin(np.pi / m),
                               atol=1e-5)


@pytest.mark.parametrize("order", [16, 64, 256])
def test_qam_constellation_unit_average_power(order):
    from r4w_tpu.waveforms.linear_mod import qam_constellation

    c = np.asarray(qam_constellation(order))
    assert c.shape[0] == order
    assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-5
    # square QAM: sqrt(order) distinct levels per rail
    levels = np.unique(np.round(np.real(c), 6))
    assert levels.shape[0] == int(np.sqrt(order))


# ------------------------------------------------------------------ CRC


# catalog check values for ASCII "123456789" (reveng/CRC catalogue)
_CRC_CHECKS = {
    "crc8": 0xF4,
    "crc8-maxim": 0xA1,
    "crc32": 0xCBF43926,
}


@pytest.mark.parametrize("name,check", sorted(_CRC_CHECKS.items()))
def test_crc_catalog_check_values(name, check):
    from r4w_tpu.fec.crc import crc_compute

    data = np.frombuffer(b"123456789", np.uint8)
    got = int(np.asarray(crc_compute(jnp.asarray(data), name)))
    assert got == check, (name, hex(got), hex(check))


# ---------------------------------------------------------------- G.711


@pytest.mark.parametrize("x", [0.0, 0.25, -0.5, 1.0])
def test_mu_law_itu_formula(x):
    from r4w_tpu.ops.stream_math import mu_law_decode, mu_law_encode

    mu = 255.0
    got = float(np.asarray(mu_law_encode(jnp.asarray(np.float32(x)))))
    want = np.sign(x) * np.log1p(mu * abs(x)) / np.log1p(mu)
    assert abs(got - want) < 1e-5
    back = float(np.asarray(mu_law_decode(jnp.asarray(
        np.float32(got)))))
    assert abs(back - x) < 1e-5


# -------------------------------------------------------------- DTMF table


@pytest.mark.parametrize("digit,lo,hi", [
    ("1", 697.0, 1209.0), ("5", 770.0, 1336.0),
    ("9", 852.0, 1477.0), ("0", 941.0, 1336.0),
])
def test_dtmf_detects_itu_tone_pairs(digit, lo, hi):
    from r4w_tpu.ops.audio import dtmf_detect

    fs = 8000.0
    t = np.arange(int(0.08 * fs)) / fs
    tone = (np.sin(2 * np.pi * lo * t)
            + np.sin(2 * np.pi * hi * t)).astype(np.float32)
    pad = np.zeros(int(0.05 * fs), np.float32)
    got = dtmf_detect(np.concatenate([tone, pad]), fs)
    assert got == digit, (got, digit)


# ----------------------------------------------------------- FFT identities


@pytest.mark.parametrize("n", [64, 256, 1024])
def test_fft_parseval_and_delta(n):
    from r4w_tpu.core import fftops

    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    spec = np.asarray(fftops.fft(jnp.asarray(x)))
    # Parseval: sum|x|^2 == sum|X|^2 / N
    assert abs(np.sum(np.abs(x) ** 2)
               - np.sum(np.abs(spec) ** 2) / n) < 1e-2
    # delta -> flat spectrum
    d = np.zeros(n, np.complex64)
    d[0] = 1.0
    spec_d = np.asarray(fftops.fft(jnp.asarray(d)))
    np.testing.assert_allclose(np.abs(spec_d), 1.0, atol=1e-5)


# -------------------------------------------------- standard conv test vector


def test_conv_k7_standard_polynomials_first_bits():
    """K=7 (171,133) encoder: the all-ones input's first outputs follow
    directly from the octal polynomials — a hand-computable vector."""
    from r4w_tpu.fec.convolutional import conv_encode

    bits = jnp.asarray(np.ones(8, np.int32))
    coded = np.asarray(conv_encode(bits)).reshape(-1, 2)
    # state starts at 0; with u=1...: c1 = popcount(reg & 0o171)&1
    reg = 0
    want = []
    for _ in range(8):
        reg = ((1 << 6) | (reg >> 1)) & 0x7F
        want.append([bin(reg & 0o171).count("1") & 1,
                     bin(reg & 0o133).count("1") & 1])
    got = coded[:8].tolist()
    want_alt = [w[::-1] for w in want]
    assert got == want or got == want_alt, (got, want)


# ------------------------------------------------------------ moving stats


@pytest.mark.parametrize("length", [4, 16, 64])
def test_moving_average_matches_numpy(length):
    rng = np.random.default_rng(length)
    x = rng.standard_normal(512).astype(np.float32)
    got, _ = F.moving_average(jnp.asarray(x), length)
    got = np.asarray(got)
    ref = np.convolve(x, np.ones(length) / length)[: x.shape[0]]
    np.testing.assert_allclose(got[length:], ref[length:], atol=1e-4)


@pytest.mark.parametrize("length", [3, 9, 15])
def test_median_filter_matches_scipy(length):
    from scipy.signal import medfilt

    rng = np.random.default_rng(length)
    x = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(F.median_filter(jnp.asarray(x), length))
    ref = medfilt(x, length)
    h = length // 2
    np.testing.assert_allclose(got[h:-h], ref[h:-h], atol=1e-6)


# ------------------------------------------------------------ link budget


@pytest.mark.parametrize("d_m,f_hz,want_db", [
    (1_000.0, 1e9, 92.45), (20_200_000.0, 1_575.42e6, 182.5),
    (100.0, 2.4e9, 80.1),
])
def test_fspl_exact_values(d_m, f_hz, want_db):
    """20log10(4πdf/c): textbook values (92.45 dB @ 1 km/1 GHz)."""
    from r4w_tpu.gnss.coordinates import free_space_path_loss_db

    got = float(free_space_path_loss_db(d_m, f_hz))
    assert abs(got - want_db) < 0.2, (got, want_db)


@pytest.mark.parametrize("sigma", [1.0, 10.0, 100.0])
def test_rcs_estimate_inverts_radar_equation_exactly(sigma):
    from r4w_tpu.ops.radar_sonar import rcs_estimate

    pt, g, lam, r = 1000.0, 30.0, 0.03, 10_000.0
    pr = pt * g * g * lam ** 2 * sigma / ((4 * np.pi) ** 3 * r ** 4)
    got = float(rcs_estimate(pr, pt, g, g, lam, r))
    assert abs(got - sigma) / sigma < 1e-6


# -------------------------------------------------------------- geometry


@pytest.mark.parametrize("r,az,el,want", [
    (10.0, 0.0, 0.0, (10.0, 0.0, 0.0)),
    (10.0, 90.0, 0.0, (0.0, 10.0, 0.0)),
    (10.0, 0.0, 90.0, (0.0, 0.0, 10.0)),
])
def test_lidar_point_cloud_axes(r, az, el, want):
    from r4w_tpu.ops.radar_sonar import lidar_point_cloud

    pc = np.asarray(lidar_point_cloud([r], [az], [el]))[0]
    np.testing.assert_allclose(pc, want, atol=1e-5)


# ---------------------------------------------------------------- AGC


@pytest.mark.parametrize("level", [0.5, 2.0])
def test_agc_converges_to_target(level):
    from r4w_tpu.ops.agc import agc

    # decay-up at 0.01/sample reaches the 10x gain within ~2k samples
    x = (0.05 * np.exp(2j * np.pi * 0.01 * np.arange(8192))
         ).astype(np.complex64)
    y = np.asarray(agc(jnp.asarray(x), target_level=level,
                       decay=0.01)[0])
    tail = np.abs(y[-500:])
    assert abs(tail.mean() - level) / level < 0.1


# ------------------------------------------------------------- resamplers


def test_halfband_taps_alternate_zeros():
    from r4w_tpu.ops.resample import halfband_taps

    h = np.asarray(halfband_taps(31))
    center = 15
    odd = [h[i] for i in range(1, 31, 2) if i != center]
    # halfband property: every even-offset tap (except center) is 0
    assert max(abs(np.asarray(odd))) < 1e-6 or \
        max(abs(h[center % 2::2][np.arange(len(h[center % 2::2]))
                != center // 2])) < 1e-6


@pytest.mark.parametrize("factor", [2, 4])
def test_polyphase_decimate_tone(factor):
    from r4w_tpu.ops.resample import polyphase_decimate
    from r4w_tpu.ops.filters import design_lowpass

    n, f0 = 8192, 0.02
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    taps = design_lowpass(64, 0.4 / factor, 1.0)
    y = np.asarray(polyphase_decimate(jnp.asarray(x),
                                      jnp.asarray(taps), factor))
    k = np.argmax(np.abs(np.fft.fft(y[64:])))
    got = k / (y.shape[0] - 64)
    assert abs(got - f0 * factor) < 0.005


@pytest.mark.parametrize("delay", [0.25, 0.5, 1.75])
def test_fractional_delay_phase_slope(delay):
    """Delaying a tone by d samples shifts its phase by −2πf·d."""
    from r4w_tpu.ops.filters import fir_apply, fractional_delay_taps

    f0, n = 0.03, 2048
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    taps = fractional_delay_taps(delay, 31)
    y = np.asarray(fir_apply(jnp.asarray(taps.astype(np.float32)),
                             jnp.asarray(x)))
    # compare phase vs input at mid-signal, remove the integer group
    # delay (taps center at (N-1)/2)
    gd = (31 - 1) / 2.0
    k = n // 2
    dphi = np.angle(y[k] * np.conj(x[k]))
    want = (-2 * np.pi * f0 * (delay + gd) + np.pi) % (2 * np.pi) - np.pi
    err = (dphi - want + np.pi) % (2 * np.pi) - np.pi
    assert abs(err) < 0.05, (dphi, want)


# ---------------------------------------------------------- doppler utils


@pytest.mark.parametrize("dop", [500.0, -1200.0])
def test_doppler_pre_correct_removes_offset(dop):
    from r4w_tpu.ops.radar_sonar import doppler_pre_correct

    fs, n = 48_000.0, 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * dop * t).astype(np.complex64)
    y = np.asarray(doppler_pre_correct(jnp.asarray(x), dop, fs))
    # residual frequency ~ 0: lag-1 autocorrelation phase
    res = np.angle(np.vdot(y[:-1], y[1:])) * fs / (2 * np.pi)
    assert abs(res) < 1.0, res


# ------------------------------------------------------------------- PVT


@pytest.mark.parametrize("seed", [0, 1])
def test_pvt_exact_on_perfect_pseudoranges(seed):
    from r4w_tpu.gnss import pvt
    from r4w_tpu.gnss.coordinates import lla_to_ecef

    rng = np.random.default_rng(seed)
    truth = np.asarray(lla_to_ecef(40.0 + seed, -3.0, 600.0))
    sats = truth + 2.0e7 * rng.standard_normal((6, 3))
    sats /= np.linalg.norm(sats, axis=1, keepdims=True) / 2.656e7
    bias = 1234.5
    rho = np.linalg.norm(sats - truth, axis=1) + bias
    sol = pvt.solve_position(sats, rho)
    assert np.linalg.norm(np.asarray(sol.position_ecef) - truth) < 1e-3
    assert abs(float(sol.clock_bias_m) - bias) < 1e-3


# ------------------------------------------------------------- BER parity


@pytest.mark.parametrize("ebn0_db", [2.0, 6.0, 10.0])
def test_qpsk_theory_equals_bpsk(ebn0_db):
    """Gray QPSK per-bit BER equals BPSK at the same Eb/N0 — a
    textbook identity the tables must respect."""
    from r4w_tpu.ber import theoretical_ber

    b = float(theoretical_ber("bpsk", jnp.asarray(ebn0_db)))
    q = float(theoretical_ber("qpsk", jnp.asarray(ebn0_db)))
    assert abs(b - q) < 1e-9
