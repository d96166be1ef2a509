"""Round-4 KA batch B: independent ground truths for the thin stream /
mapping / detect block tails (VERDICT r3 weak #2: most registry blocks
exercised once, happy-path).

Truth sources per test: exact numpy re-derivations written from the
published block semantics (GR/r4w block contracts), scipy.signal, or
closed-form DSP identities — never the framework's own output.
Reference counterparts cited per docstring (crates/r4w-core/src/...).
"""

import numpy as np
import pytest
import scipy.signal as ss

import jax.numpy as jnp

from r4w_tpu.ops import detect as D
from r4w_tpu.ops import mapping as M
from r4w_tpu.ops import stream_blocks as SB
from r4w_tpu.ops import stream_math as SM


# ------------------------------------------------- stream_blocks exact


def test_sample_and_hold_matches_python_loop():
    """sample_and_hold.rs semantics: hold last sample where ctrl==1."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    ctrl = (rng.random(64) < 0.3).astype(np.int32)
    got = np.asarray(SB.sample_and_hold(x, ctrl))
    held, out = 0.0, []
    seen = False
    for xi, ci in zip(x, ctrl):
        if ci:
            held, seen = xi, True
        out.append(held if seen else 0.0)
    np.testing.assert_allclose(got, np.asarray(out, np.float32))


def test_sample_counter_accumulates():
    x = np.zeros(37, np.float32)
    _, n = SB.sample_counter(x, state=5)
    assert int(n) == 42


def test_keep_m_in_n_slices_every_block():
    x = np.arange(20, dtype=np.float32)
    got = np.asarray(SB.keep_m_in_n(x, m=2, n=5, offset=1))
    ref = np.concatenate([x[i * 5 + 1:i * 5 + 3] for i in range(4)])
    np.testing.assert_array_equal(got, ref)


def test_integrate_and_dump_group_sums():
    x = np.arange(12, dtype=np.float32)
    got = np.asarray(SB.integrate_and_dump(x, 4))
    np.testing.assert_allclose(got, [6.0, 22.0, 38.0])


def test_stretch_is_lower_clamp():
    x = np.asarray([-2.0, -0.5, 0.0, 1.5], np.float32)
    got = np.asarray(SB.stretch(x, -0.5))
    np.testing.assert_allclose(got, [-0.5, -0.5, 0.0, 1.5])


def test_exponentiate_matches_numpy_power():
    x = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    np.testing.assert_allclose(np.asarray(SB.exponentiate(x, 3.0)),
                               x ** 3, rtol=1e-6)
    z = np.asarray([1 + 1j, 2 - 1j], np.complex64)
    np.testing.assert_allclose(np.asarray(SB.exponentiate(z, 2.0)),
                               z ** 2, rtol=1e-5)


def test_short_to_float_roundtrip_exact():
    s = np.asarray([-32768, -1, 0, 1, 16384, 32767], np.int16)
    f = np.asarray(SB.short_to_float(s))
    np.testing.assert_allclose(f, s.astype(np.float32) / 32768.0)
    back = np.asarray(SB.float_to_short(f))
    np.testing.assert_array_equal(back.astype(np.int32), s.astype(np.int32))


def test_float_to_complex_packs_quadratures():
    re = np.asarray([1.0, 2.0], np.float32)
    im = np.asarray([3.0, -4.0], np.float32)
    z = np.asarray(SB.float_to_complex(re, im))
    np.testing.assert_allclose(z, re + 1j * im)
    z0 = np.asarray(SB.float_to_complex(re))
    np.testing.assert_allclose(z0, re + 0j)


def test_vector_insert_period_and_offset():
    x = np.arange(8, dtype=np.float32)
    vec = np.asarray([100.0, 200.0], np.float32)
    got = np.asarray(SB.vector_insert(x, vec, period=4, offset=1))
    ref = np.asarray([0, 100, 200, 1, 2, 3, 4, 100, 200, 5, 6, 7],
                     np.float32)
    np.testing.assert_array_equal(got, ref)


def test_stream_switch_selects_exact_stream():
    a = np.arange(4, dtype=np.float32)
    b = a + 10
    c = a + 20
    np.testing.assert_array_equal(np.asarray(
        SB.stream_switch([a, b, c], 1)), b)


def test_stream_to_streams_roundtrips_interleave():
    x = np.arange(12, dtype=np.float32)
    parts = np.asarray(SB.stream_to_streams(x, 3))
    assert parts.shape == (3, 4)
    np.testing.assert_array_equal(parts[0], [0, 3, 6, 9])
    back = np.asarray(SB.streams_to_stream(list(parts)))
    np.testing.assert_array_equal(back, x)


def test_signal_generator_sweep_instantaneous_frequency():
    """Linear chirp: d(phase)/dt sweeps f0 -> f1 over the block."""
    fs, n = 8000.0, 4096
    z = np.asarray(SB.signal_generator_sweep(n, fs, 100.0, 900.0))
    inst = np.angle(z[1:] * np.conj(z[:-1])) * fs / (2 * np.pi)
    # early samples near f0, late near f1; mid-block near the mean
    assert abs(inst[:64].mean() - 100.0) < 25.0
    assert abs(inst[-64:].mean() - 900.0) < 25.0
    assert abs(inst[n // 2 - 32:n // 2 + 32].mean() - 500.0) < 25.0


def test_rf_mixer_complex_and_real_products():
    fs, n = 1000.0, 1000
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 100.0 * t).astype(np.complex64)
    lo = np.exp(-2j * np.pi * 60.0 * t).astype(np.complex64)
    y = np.asarray(SB.rf_mixer(x, lo, "complex"))
    f = np.fft.fftfreq(n, 1 / fs)
    peak = f[np.argmax(np.abs(np.fft.fft(y)))]
    assert abs(peak - 40.0) < 1.5  # difference product only
    # real mixing makes BOTH sum and difference tones
    yr = np.asarray(SB.rf_mixer(x.real + 0j, np.cos(2 * np.pi * 60 * t)
                                + 0j, "real"))
    mag = np.abs(np.fft.rfft(yr))
    fr = np.fft.rfftfreq(n, 1 / fs)
    i40 = np.argmin(np.abs(fr - 40)); i160 = np.argmin(np.abs(fr - 160))
    assert mag[i40] > 0.3 * mag.max() and mag[i160] > 0.3 * mag.max()


def test_envelope_detector_tracks_am_envelope():
    fs, n = 48000.0, 4800
    t = np.arange(n) / fs
    env_true = 1.0 + 0.5 * np.sin(2 * np.pi * 50.0 * t)
    x = (env_true * np.cos(2 * np.pi * 5000.0 * t)).astype(np.float32)
    env, _ = SB.envelope_detector(x, attack=0.9, release=0.02)
    env = np.asarray(env)
    # after settling, the detector rides the true envelope
    err = np.abs(env[1000:] - env_true[1000:])
    assert np.median(err) < 0.15


# --------------------------------------------------- stream_math exact


def test_uniform_quantize_midrise_levels():
    """Mid-rise: idx = floor((x+FS)/step), recon at cell centers."""
    x = np.asarray([-1.0, -0.26, 0.0, 0.26, 0.9], np.float32)
    idx, recon = SM.uniform_quantize(x, n_bits=2, full_scale=1.0)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 2, 3])
    np.testing.assert_allclose(np.asarray(recon),
                               [-0.75, -0.25, 0.25, 0.25, 0.75])


def test_uniform_quantize_error_bounded_by_half_step():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 512).astype(np.float32)
    for bits in (4, 8):
        _, recon = SM.uniform_quantize(x, bits, 1.0)
        step = 2.0 / (1 << bits)
        assert np.max(np.abs(np.asarray(recon) - x)) <= step / 2 + 1e-6


def test_sigma_delta_running_mean_tracks_dc():
    """1st-order ΣΔ: long-run bit density equals (x+1)/2 for DC in."""
    for dc in (-0.5, 0.0, 0.25, 0.75):
        bits = np.asarray(SM.sigma_delta_modulate(
            np.full(4096, dc, np.float32)))
        density = bits.mean()
        assert abs(density - (dc + 1) / 2) < 0.01, dc


def test_sigma_delta_noise_is_high_pass_shaped():
    """Quantization noise energy must rise with frequency (NTF=1-z^-1)."""
    x = (0.5 * np.sin(2 * np.pi * 4 / 4096 * np.arange(4096))
         ).astype(np.float32)
    y = 2.0 * np.asarray(SM.sigma_delta_modulate(x), np.float64) - 1.0
    err = y - x
    spec = np.abs(np.fft.rfft(err)) ** 2
    lo = spec[1:200].mean()
    hi = spec[-400:].mean()
    assert hi > 10.0 * lo


def test_adpcm_roundtrip_tracks_speechlike_signal():
    """IMA ADPCM: 4-bit stream reconstructs a bandlimited signal with
    small relative error (codec contract, adpcm_codec.rs)."""
    fs = 8000.0
    t = np.arange(2000) / fs
    pcm = (12000 * np.sin(2 * np.pi * 300 * t)
           + 4000 * np.sin(2 * np.pi * 800 * t)).astype(np.int16)
    nibs, _ = SM.adpcm_encode(pcm)
    nibs = np.asarray(nibs)
    assert nibs.min() >= 0 and nibs.max() <= 15
    rec = np.asarray(SM.adpcm_decode(nibs))
    err = rec[200:] - pcm[200:]
    rel = np.sqrt(np.mean(err**2)) / np.sqrt(np.mean(pcm[200:]**2.0))
    assert rel < 0.12


def test_vco_generates_requested_tone():
    """VCO phase = 2π·k·∫c dt: DC control of 0.5 with 100 Hz/unit
    sensitivity at fs=8 kHz -> 50 Hz complex tone."""
    fs, n = 8000.0, 8000
    z = np.asarray(SM.vco(np.full(n, 0.5, np.float32), 100.0, fs))
    f = np.fft.fftfreq(n, 1 / fs)
    peak = f[np.argmax(np.abs(np.fft.fft(z)))]
    assert abs(peak - 50.0) < 1.1


# ------------------------------------------------------- mapping exact


def test_symbol_map_is_exact_table_gather():
    const = np.asarray([1 + 0j, 0 + 1j, -1 + 0j, 0 - 1j], np.complex64)
    idx = np.asarray([3, 0, 2, 2, 1])
    got = np.asarray(M.symbol_map(idx, const))
    np.testing.assert_array_equal(got, const[idx])


def test_symbol_slicer_quadrants():
    x = np.asarray([1 + 1j, -1 + 1j, -1 - 1j, 1 - 1j], np.complex64)
    got = np.asarray(M.symbol_slicer(x, "qpsk"))
    np.testing.assert_array_equal(got, [0, 2, 3, 1])
    xb = np.asarray([0.3 + 9j, -0.3 - 9j], np.complex64)
    np.testing.assert_array_equal(np.asarray(M.symbol_slicer(xb, "bpsk")),
                                  [0, 1])


def test_soft_decision_decode_sign_and_confidence():
    llr = np.asarray([4.0, -4.0, 0.5, -0.5, 0.0], np.float32)
    bits, conf = M.soft_decision_decode(llr)
    np.testing.assert_array_equal(np.asarray(bits), [0, 1, 0, 1, 0])
    conf = np.asarray(conf)
    np.testing.assert_allclose(conf, np.tanh(np.abs(llr) / 2), atol=1e-6)
    assert conf[0] > conf[2] > conf[4]


def test_vector_quantize_nearest_codeword_exact():
    cb = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    x = np.asarray([[0.1, -0.1], [0.9, 0.2], [0.2, 0.8], [0.6, 0.6]],
                   np.float32)
    idx, rec = M.vector_quantize(x, cb)
    d = ((x[:, None, :] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
    np.testing.assert_array_equal(np.asarray(rec), cb[d.argmin(-1)])


def test_multicarrier_waterfill_satisfies_kkt():
    """Water-filling optimality: P_k + N/g_k equals a common water
    level on active carriers; inactive carriers sit above the level;
    total power is met."""
    g = np.asarray([2.0, 1.0, 0.25, 0.05], np.float32)
    p = np.asarray(M.multicarrier_waterfill(g, total_power=4.0,
                                            noise_power=1.0), np.float64)
    assert abs(p.sum() - 4.0) < 1e-3
    lvl = p + 1.0 / g
    active = p > 1e-4
    assert active.sum() >= 2
    lv = lvl[active]
    assert np.ptp(lv) < 5e-3                 # equal water level
    if (~active).any():
        assert (1.0 / g[~active]).min() >= lv.mean() - 5e-3


def test_incoherent_detect_recovers_fsk_symbols():
    """Goertzel-bank MFSK detect: exact symbol recovery on clean 4-FSK
    with orthogonal tone spacing (incoherent_detector.rs)."""
    fs, L = 8000.0, 80         # tone spacing 100 Hz = fs/L (orthogonal)
    freqs = [500.0, 600.0, 700.0, 800.0]
    rng = np.random.default_rng(7)
    syms = rng.integers(0, 4, 50)
    t = np.arange(L) / fs
    x = np.concatenate([np.exp(2j * np.pi * freqs[s] * t) for s in syms]
                       ).astype(np.complex64)
    got, energy = M.incoherent_detect(x, freqs, fs, L)
    np.testing.assert_array_equal(np.asarray(got), syms)
    # orthogonal spacing: off-tone energy is negligible on clean input
    e = np.array(energy)  # writable copy
    on = e[np.arange(len(syms)), syms]
    e[np.arange(len(syms)), syms] = 0.0
    assert (on > 50.0 * e.max(axis=-1)).all()


def test_ssb_usb_spectrum_is_single_sided():
    """Phasing-method SSB: a real tone at f0 maps to a one-sided
    spectral line; the image side is suppressed >20 dB."""
    fs, n = 48000.0, 8192
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    z = np.asarray(M.ssb_modulate(audio, fs, upper=True))
    spec = np.abs(np.fft.fft(z * np.hanning(n)))
    f = np.fft.fftfreq(n, 1 / fs)
    up = spec[np.argmin(np.abs(f - 1000.0))]
    dn = spec[np.argmin(np.abs(f + 1000.0))]
    assert up > 10.0 * dn
    zl = np.asarray(M.ssb_modulate(audio, fs, upper=False))
    spec_l = np.abs(np.fft.fft(zl * np.hanning(n)))
    assert (spec_l[np.argmin(np.abs(f + 1000.0))]
            > 10.0 * spec_l[np.argmin(np.abs(f - 1000.0))])


def test_fm_stereo_decode_separates_channels():
    """Standard MPX (ITU-R BS.450): (L+R)/2 + pilot·sin(θ) +
    (L-R)/2·sin(2θ) — the 38 kHz subcarrier zero-crosses with the
    pilot. Distinct L-only and R-only tones must land in their
    channels."""
    fs = 192000.0
    n = int(fs * 0.06)
    t = np.arange(n) / fs
    left = np.sin(2 * np.pi * 800.0 * t)
    right = np.sin(2 * np.pi * 2200.0 * t)
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    sub = 0.5 * (left - right) * np.sin(2 * np.pi * 38000.0 * t
                                        )  # in-phase 2nd harmonic
    mpx = (0.5 * (left + right) + pilot + sub).astype(np.float32)
    L, R, present = M.fm_stereo_decode(mpx, fs)
    assert bool(present)
    L = np.asarray(L); R = np.asarray(R)
    m = slice(n // 4, 3 * n // 4)

    def tone_power(x, f0):
        win = np.hanning(x.shape[0])
        sp = np.abs(np.fft.rfft(x * win))
        fr = np.fft.rfftfreq(x.shape[0], 1 / fs)
        return sp[np.argmin(np.abs(fr - f0))]

    # 800 Hz dominates L, 2200 Hz dominates R (>=6 dB separation)
    assert tone_power(L[m], 800.0) > 2.0 * tone_power(R[m], 800.0)
    assert tone_power(R[m], 2200.0) > 2.0 * tone_power(L[m], 2200.0)


# -------------------------------------------------------- detect exact


def test_teager_kaiser_constant_for_pure_sine():
    """TK energy of A·cos(Ωn) is the constant A²·sin²(Ω) (Kaiser 1990)."""
    A, omega = 1.7, 0.3
    n = np.arange(512)
    x = (A * np.cos(omega * n)).astype(np.float64)
    psi = np.asarray(D.teager_kaiser(x))
    expect = A * A * np.sin(omega) ** 2
    np.testing.assert_allclose(psi, expect, rtol=1e-4)


def test_teager_kaiser_complex_tone_matches_identity():
    """For z=A·e^{jΩn}: |z|²−Re(z[n−1]·z̄[n+1]) = A²(1−cos2Ω)."""
    A, omega = 0.9, 0.25
    n = np.arange(256)
    z = (A * np.exp(1j * omega * n)).astype(np.complex64)
    psi = np.asarray(D.teager_kaiser(z))
    expect = A * A * (1 - np.cos(2 * omega))
    np.testing.assert_allclose(psi, expect, rtol=1e-3)


def test_spectral_kurtosis_zero_for_gaussian_high_for_bursts():
    """SK of stationary complex Gaussian noise ≈ 0 per bin; an
    impulsive wideband burst drives SK >> 0 (Antoni 2006)."""
    rng = np.random.default_rng(11)
    n = 256 * 64
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64) / np.sqrt(2)
    sk_noise = np.asarray(D.spectral_kurtosis(noise, nfft=256))
    assert abs(np.mean(sk_noise)) < 0.25
    burst = noise.copy()
    burst[5000:5256] += 30.0 * (rng.standard_normal(256)
                                + 1j * rng.standard_normal(256))
    sk_burst = np.asarray(D.spectral_kurtosis(burst, nfft=256))
    assert np.mean(sk_burst) > 5.0


def test_squelch_gates_noise_passes_burst():
    rng = np.random.default_rng(5)
    n = 64 * 40
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x[64 * 10:64 * 20] += 1.0  # strong carrier burst
    y, gate = D.squelch(x.astype(np.complex64), frame=64)
    gate = np.asarray(gate)
    assert gate[12:18].all()          # open mid-burst
    assert not gate[25:].any()        # closed after burst
    y = np.asarray(y)
    assert np.abs(y[64 * 25:]).max() == 0.0


def test_spectrum_sense_flags_only_occupied_band():
    fs, n = 1.0, 512 * 32
    t = np.arange(n)
    rng = np.random.default_rng(2)
    x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         + np.exp(2j * np.pi * 0.25 * t)).astype(np.complex64)
    occ, _ = D.spectrum_sense(x, nfft=512)
    occ = np.asarray(occ)
    k = int(round(0.25 * 512))
    assert occ[k]
    assert occ.sum() <= 8  # narrowband tone: only a few bins flagged


def test_spectrum_holes_reports_contiguous_gaps():
    occ = np.zeros(32, bool)
    occ[0:4] = True
    occ[20:22] = True
    holes = D.spectrum_holes(occ, min_width=4)
    assert (4, 20) in holes and (22, 32) in holes
    assert all(b - a >= 4 for a, b in holes)


def test_voice_activity_marks_voiced_frames():
    fs = 8000.0
    n = 256 * 30
    t = np.arange(n) / fs
    rng = np.random.default_rng(8)
    x = 0.01 * rng.standard_normal(n)
    x[256 * 10:256 * 20] += np.sin(2 * np.pi * 200.0
                                   * t[256 * 10:256 * 20])
    vad = np.asarray(D.voice_activity(x.astype(np.float32)))
    assert vad[12:18].all()
    assert not vad[:8].any() and not vad[22:].any()
