"""Audio & speech processing fills.

Re-designs of dtmf.rs / dtmf_detector.rs, mfcc_extractor.rs,
phase_vocoder.rs, melp_vocoder.rs, psychoacoustic_codec.rs,
speech_formant_tracker.rs, speech_voice_restoration.rs,
music_pitch_detector.rs / music_pitch_tracker.rs,
acoustic_echo_canceller.rs, hearing_aid_feedback_suppressor.rs,
vocoder.rs, mu_law_codec.rs (alias of the companding codec in
stream_math).

Frame-based analysis runs as one batched FFT over all frames; the
adaptive cancellers are NLMS lax.scan recursions.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import REAL_DTYPE

_DTMF_LOW = (697.0, 770.0, 852.0, 941.0)
_DTMF_HIGH = (1209.0, 1336.0, 1477.0, 1633.0)
_DTMF_KEYS = "123A456B789C*0#D"

# ---------------------------------------------------------------- DTMF


def dtmf_generate(digits: str, sample_rate: float = 8000.0,
                  tone_ms: float = 80.0, gap_ms: float = 40.0):
    """DTMF dial string → audio (dtmf.rs)."""
    n_tone = int(sample_rate * tone_ms / 1000.0)
    n_gap = int(sample_rate * gap_ms / 1000.0)
    t = np.arange(n_tone) / sample_rate
    out = []
    for d in digits:
        k = _DTMF_KEYS.index(d)
        f_lo = _DTMF_LOW[k // 4]
        f_hi = _DTMF_HIGH[k % 4]
        tone = 0.5 * (np.sin(2 * np.pi * f_lo * t)
                      + np.sin(2 * np.pi * f_hi * t))
        out.append(tone)
        out.append(np.zeros(n_gap))
    return jnp.asarray(np.concatenate(out).astype(np.float32))


def dtmf_detect(audio, sample_rate: float = 8000.0,
                frame_ms: float = 40.0, threshold: float = 8.0) -> str:
    """DTMF detection via a Goertzel bank over frames
    (dtmf_detector.rs). Returns the dialed string."""
    a = jnp.asarray(audio, REAL_DTYPE)
    n_frame = int(sample_rate * frame_ms / 1000.0)
    n = (a.shape[0] // n_frame) * n_frame
    frames = a[:n].reshape(-1, n_frame)
    t = jnp.arange(n_frame, dtype=REAL_DTYPE) / sample_rate
    freqs = jnp.asarray(_DTMF_LOW + _DTMF_HIGH, REAL_DTYPE)
    basis_c = jnp.cos(2 * np.pi * freqs[:, None] * t[None, :])
    basis_s = jnp.sin(2 * np.pi * freqs[:, None] * t[None, :])
    e = (frames @ basis_c.T) ** 2 + (frames @ basis_s.T) ** 2  # (F, 8)
    e = np.asarray(e)
    total = np.asarray(jnp.mean(frames ** 2, axis=-1)) * n_frame ** 2 / 4
    digits = []
    last = None
    for f in range(e.shape[0]):
        if total[f] < 1e-6:
            last = None
            continue
        lo = int(np.argmax(e[f, :4]))
        hi = int(np.argmax(e[f, 4:]))
        # both tones must dominate the frame energy
        if (e[f, lo] + e[f, 4 + hi]) > threshold * 0.1 * total[f]:
            key = _DTMF_KEYS[lo * 4 + hi]
            if key != last:
                digits.append(key)
            last = key
        else:
            last = None
    return "".join(digits)


# ---------------------------------------------------------------- MFCC


def _mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _imel(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mfcc(audio, sample_rate: float, n_mfcc: int = 13, n_mels: int = 26,
         n_fft: int = 512, hop: int = 256):
    """Mel-frequency cepstral coefficients (mfcc_extractor.rs):
    frame → |FFT|² → mel filterbank → log → DCT-II. One batched FFT."""
    a = jnp.asarray(audio, REAL_DTYPE)
    n_frames = max(1, (a.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = a[idx] * jnp.asarray(np.hanning(n_fft), REAL_DTYPE)
    power = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    # mel filterbank (host-side constants)
    mel_pts = np.linspace(_mel(0.0), _mel(sample_rate / 2), n_mels + 2)
    hz_pts = _imel(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        for k in range(l, c):
            fb[m - 1, k] = (k - l) / max(c - l, 1)
        for k in range(c, r):
            fb[m - 1, k] = (r - k) / max(r - c, 1)
    mel_e = power @ jnp.asarray(fb, REAL_DTYPE).T
    log_e = jnp.log(jnp.maximum(mel_e, 1e-10))
    # DCT-II matrix
    k = np.arange(n_mfcc)[:, None]
    nvec = np.arange(n_mels)[None, :]
    dct = np.cos(np.pi * k * (2 * nvec + 1) / (2 * n_mels)) \
        * np.sqrt(2.0 / n_mels)
    return log_e @ jnp.asarray(dct, REAL_DTYPE).T


# -------------------------------------------------------- phase vocoder


def phase_vocoder(audio, rate: float, n_fft: int = 1024,
                  hop: int = 256):
    """Time-stretch by ``rate`` without pitch change (phase_vocoder.rs):
    STFT, per-bin phase advance re-accumulated at the new hop. All
    frames processed as one batch; the phase accumulation is a cumsum."""
    a = jnp.asarray(audio, REAL_DTYPE)
    win = jnp.asarray(np.hanning(n_fft), REAL_DTYPE)
    n_frames = max(2, (a.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    stft = jnp.fft.rfft(a[idx] * win, axis=-1)          # (F, K)
    # analysis positions for synthesis frames
    out_frames = int(n_frames / rate)
    pos = jnp.arange(out_frames, dtype=REAL_DTYPE) * rate
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0
    i0 = jnp.clip(i0, 0, n_frames - 2)
    mag = (1 - frac)[:, None] * jnp.abs(stft[i0]) \
        + frac[:, None] * jnp.abs(stft[i0 + 1])
    # phase advance between consecutive analysis frames
    omega = 2 * np.pi * jnp.arange(n_fft // 2 + 1,
                                   dtype=REAL_DTYPE) * hop / n_fft
    dphi = jnp.angle(stft[i0 + 1]) - jnp.angle(stft[i0]) - omega[None, :]
    dphi = dphi - 2 * np.pi * jnp.round(dphi / (2 * np.pi))
    inst = omega[None, :] + dphi
    phase = jnp.cumsum(inst, axis=0)
    spec = mag * jnp.exp(lax.complex(jnp.zeros_like(phase), phase))
    frames_out = jnp.fft.irfft(spec, n_fft, axis=-1) * win[None, :]
    out_len = out_frames * hop + n_fft
    out = jnp.zeros((out_len,), REAL_DTYPE)
    oidx = jnp.arange(out_frames)[:, None] * hop \
        + jnp.arange(n_fft)[None, :]
    out = out.at[oidx.reshape(-1)].add(frames_out.reshape(-1))
    return out / (n_fft / (2.0 * hop))


# ------------------------------------------------------------- vocoders


def lpc_coeffs_frame(frames, order: int):
    """Batched LPC via autocorrelation + Levinson-Durbin
    (melp_vocoder.rs analysis). frames: (F, N) → (F, order+1) coeffs
    and (F,) gains."""
    f = jnp.asarray(frames, jnp.float32)
    n = f.shape[-1]
    # all lags for all frames in one FFT autocorrelation
    sp = jnp.fft.rfft(f, 2 * n, axis=-1)
    acf = jnp.fft.irfft(sp * jnp.conj(sp), 2 * n,
                        axis=-1)[:, : order + 1]

    def levinson(r):
        a = jnp.zeros(order + 1, jnp.float32).at[0].set(1.0)
        e = jnp.maximum(r[0], 1e-12)
        for m in range(1, order + 1):  # static order: unrolled
            k = -(a[:m] @ r[m:0:-1]) / e
            # Levinson recursion incl. a_new[m] = k (a[0]·k term)
            a = a.at[: m + 1].set(a[: m + 1] + k * a[m::-1])
            e = e * (1.0 - k * k)
        return a, jnp.sqrt(jnp.maximum(e, 1e-12))

    coeffs, gains = jax.vmap(levinson)(acf)
    # degenerate (silent) frames: identity filter, zero-ish gain
    ok = acf[:, 0] > 0
    coeffs = jnp.where(ok[:, None], coeffs,
                       jnp.zeros_like(coeffs).at[:, 0].set(1.0))
    gains = jnp.where(ok, gains, 0.0)
    return coeffs, gains


def melp_analyze(audio, sample_rate: float = 8000.0, frame: int = 180,
                 order: int = 10):
    """MELP-style analysis (melp_vocoder.rs): per-frame LPC + pitch +
    voicing + gain. Returns a dict of parameter tracks."""
    a = jnp.asarray(audio, jnp.float32)
    n_frames = a.shape[0] // frame
    frames = a[:n_frames * frame].reshape(n_frames, frame)
    coeffs, gains = lpc_coeffs_frame(frames, order)
    # batched pitch: one FFT autocorrelation over all frames, argmax
    # in the 60-400 Hz lag band (was: per-frame Python loop)
    fj = jnp.asarray(frames, jnp.float32)
    fj = fj - jnp.mean(fj, axis=-1, keepdims=True)
    sp = jnp.fft.rfft(fj, 2 * frame, axis=-1)
    ac = jnp.fft.irfft(sp * jnp.conj(sp), 2 * frame, axis=-1)[:, :frame]
    lo, hi = int(sample_rate / 400), int(sample_rate / 60)
    if hi < frame:
        k = lo + jnp.argmax(ac[:, lo:hi], axis=-1)
        ratio = jnp.take_along_axis(ac, k[:, None], axis=-1)[:, 0] \
            / jnp.maximum(ac[:, 0], 1e-9)
        voiced = (ratio > 0.35) & (ac[:, 0] > 1e-9)
        pitch = jnp.where(voiced, sample_rate / k, 0.0)
    else:
        voiced = jnp.zeros(n_frames, bool)
        pitch = jnp.zeros(n_frames, jnp.float32)
    return {"lpc": coeffs, "gain": gains, "pitch": pitch,
            "voiced": voiced, "frame": frame,
            "sample_rate": sample_rate}


def melp_synthesize(params, seed: int = 0):
    """MELP-style synthesis: pulse train (voiced) / noise (unvoiced)
    excitation through the LPC all-pole filter."""
    frame = params["frame"]
    fs = params["sample_rate"]
    lpc = jnp.asarray(params["lpc"], jnp.float32)     # (F, order+1)
    gain = jnp.asarray(params["gain"], jnp.float32)
    pitch = jnp.asarray(params["pitch"], jnp.float32)
    voiced = jnp.asarray(params["voiced"], bool)
    n_frames = lpc.shape[0]
    order = lpc.shape[1] - 1
    # static noise bank (seeded host RNG — design-time randomness)
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(rng.standard_normal(
        (n_frames, frame)).astype(np.float32))
    t = jnp.arange(frame)

    def synth(a, g, p, v, nz):
        period = jnp.clip((fs / jnp.maximum(p, 1.0)).astype(jnp.int32),
                          1, frame)
        pulse = jnp.where(jnp.mod(t, period) == 0,
                          jnp.sqrt(period.astype(jnp.float32)), 0.0)
        exc = jnp.where(v & (p > 0), pulse, nz) * g

        def step(state, x_t):
            y_t = x_t - jnp.dot(a[1:], state)
            return jnp.concatenate([y_t[None], state[:-1]]), y_t

        _, y = jax.lax.scan(step, jnp.zeros(order, jnp.float32), exc)
        return y

    out = jax.vmap(synth)(lpc, gain, pitch, voiced, noise)
    return out.reshape(-1)


def formant_track(audio, sample_rate: float, frame: int = 256,
                  order: int = 12, n_formants: int = 3):
    """Formant frequencies from LPC polynomial roots
    (speech_formant_tracker.rs). Returns (F, n_formants) Hz."""
    a = np.asarray(audio, np.float64)
    n_frames = a.shape[0] // frame
    frames = a[:n_frames * frame].reshape(n_frames, frame) \
        * np.hanning(frame)
    coeffs, _ = lpc_coeffs_frame(frames, order)
    out = np.zeros((n_frames, n_formants))
    for i in range(n_frames):
        roots = np.roots(coeffs[i])
        # keep narrow-bandwidth upper-half-plane poles only
        roots = roots[(np.imag(roots) > 0.01) & (np.abs(roots) > 0.88)]
        freqs = np.sort(np.angle(roots) * sample_rate / (2 * np.pi))
        freqs = freqs[(freqs > 90) & (freqs < sample_rate / 2 - 50)]
        out[i, :min(n_formants, freqs.shape[0])] = \
            freqs[:n_formants]
    return jnp.asarray(out.astype(np.float32))


# -------------------------------------------------------- psychoacoustic


def psychoacoustic_encode(audio, sample_rate: float, n_fft: int = 512,
                          bits_budget: int = 4):
    """Toy transform codec with masking-driven bit allocation
    (psychoacoustic_codec.rs): MDCT-like windowed FFT bands, a
    spreading-function masking threshold, and per-band quantization
    proportional to SMR. Returns (quantized, scale, bits) per frame."""
    a = jnp.asarray(audio, REAL_DTYPE)
    hop = n_fft // 2
    n_frames = max(1, (a.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    win = jnp.asarray(np.sin(np.pi * (np.arange(n_fft) + 0.5) / n_fft),
                      REAL_DTYPE)
    spec = jnp.fft.rfft(a[idx] * win, axis=-1)
    power = jnp.abs(spec) ** 2
    # masking threshold: power convolved with an asymmetric spread
    spread = jnp.asarray(np.concatenate([
        10.0 ** (-np.arange(8)[::-1] * 2.5 / 10),
        10.0 ** (-np.arange(1, 20) * 1.0 / 10)]), REAL_DTYPE)
    thr = jnp.stack([
        jnp.convolve(power[i], spread, mode="same") * 0.05
        for i in range(power.shape[0])])
    smr = power / jnp.maximum(thr, 1e-12)
    bits = jnp.clip(jnp.round(jnp.log2(jnp.maximum(smr, 1.0)) / 2),
                    0, bits_budget).astype(jnp.int32)
    scale = jnp.max(jnp.abs(spec), axis=-1, keepdims=True)
    steps = 2.0 ** bits
    q = jnp.round(spec / jnp.maximum(scale, 1e-12) * steps)
    return q, scale, bits


def psychoacoustic_decode(q, scale, bits, n_fft: int = 512):
    steps = 2.0 ** jnp.asarray(bits)
    spec = q / jnp.maximum(steps, 1.0) * scale
    hop = n_fft // 2
    win = jnp.asarray(np.sin(np.pi * (np.arange(n_fft) + 0.5) / n_fft),
                      REAL_DTYPE)
    frames = jnp.fft.irfft(spec, n_fft, axis=-1) * win[None, :]
    n_frames = frames.shape[0]
    out = jnp.zeros((n_frames * hop + n_fft,), REAL_DTYPE)
    oidx = jnp.arange(n_frames)[:, None] * hop \
        + jnp.arange(n_fft)[None, :]
    out = out.at[oidx.reshape(-1)].add(frames.reshape(-1))
    return out


# ----------------------------------------------------------- restoration


def voice_restore(audio, sample_rate: float, n_fft: int = 512,
                  noise_frames: int = 6, oversubtract: float = 2.0):
    """Spectral-subtraction voice restoration
    (speech_voice_restoration.rs): estimate the noise floor from the
    first frames, subtract with flooring, resynthesize via
    overlap-add."""
    a = jnp.asarray(audio, REAL_DTYPE)
    hop = n_fft // 2
    n_frames = max(1, (a.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    win = jnp.asarray(np.hanning(n_fft), REAL_DTYPE)
    spec = jnp.fft.rfft(a[idx] * win, axis=-1)
    mag = jnp.abs(spec)
    noise = jnp.mean(mag[:noise_frames], axis=0, keepdims=True)
    clean = jnp.maximum(mag - oversubtract * noise, 0.05 * mag)
    ph = jnp.angle(spec)
    out_spec = clean * jnp.exp(lax.complex(jnp.zeros_like(ph), ph))
    frames = jnp.fft.irfft(out_spec, n_fft, axis=-1) * win[None, :]
    out = jnp.zeros((n_frames * hop + n_fft,), REAL_DTYPE)
    oidx = jnp.arange(n_frames)[:, None] * hop \
        + jnp.arange(n_fft)[None, :]
    out = out.at[oidx.reshape(-1)].add(frames.reshape(-1))
    # hann^2 COLA constant at 50% overlap = 0.75
    return out / 0.75


# ------------------------------------------------------------- pitch


def pitch_detect(audio, sample_rate: float, f_lo: float = 60.0,
                 f_hi: float = 1000.0):
    """Autocorrelation pitch of one block (music_pitch_detector.rs)."""
    a = jnp.asarray(audio, REAL_DTYPE)
    a = a - jnp.mean(a)
    n = a.shape[0]
    nfft = 1 << (2 * n - 1).bit_length()
    ps = jnp.abs(jnp.fft.rfft(a, nfft)) ** 2
    ac = jnp.fft.irfft(ps)[:n]
    lo = int(sample_rate / f_hi)
    hi = min(int(sample_rate / f_lo), n - 1)
    k = lo + jnp.argmax(ac[lo:hi])
    strength = ac[k] / jnp.maximum(ac[0], 1e-12)
    return sample_rate / k.astype(REAL_DTYPE), strength


def pitch_track(audio, sample_rate: float, frame: int = 1024,
                hop: int = 512):
    """Frame-by-frame pitch contour (music_pitch_tracker.rs)."""
    a = jnp.asarray(audio, REAL_DTYPE)
    n_frames = max(1, (a.shape[0] - frame) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame)[None, :]
    frames = a[idx]
    f0, strength = jax.vmap(
        lambda fr: pitch_detect(fr, sample_rate))(frames)
    return f0, strength


# --------------------------------------------------------- echo control


def echo_cancel_nlms(mic, ref, n_taps: int = 64, mu: float = 0.5):
    """Acoustic echo canceller (acoustic_echo_canceller.rs): NLMS
    adaptive FIR from the reference (far-end) to the mic signal.
    Returns (error=echo-free, final_weights)."""
    d = jnp.asarray(mic, REAL_DTYPE)
    x = jnp.asarray(ref, REAL_DTYPE)
    xpad = jnp.concatenate([jnp.zeros((n_taps - 1,), REAL_DTYPE), x])
    idx = jnp.arange(d.shape[0])[:, None] + jnp.arange(n_taps)[None, :]
    xmat = xpad[idx][:, ::-1]                     # (N, taps) newest first

    def step(w, inp):
        xv, dn = inp
        y = jnp.dot(w, xv)
        e = dn - y
        norm = jnp.dot(xv, xv) + 1e-6
        w = w + mu * e * xv / norm
        return w, e

    w0 = jnp.zeros((n_taps,), REAL_DTYPE)
    wf, err = lax.scan(step, w0, (xmat, d))
    return err, wf


def feedback_suppress(audio, delay: int = 128, n_taps: int = 32,
                      mu: float = 0.2):
    """Hearing-aid feedback suppressor
    (hearing_aid_feedback_suppressor.rs): NLMS prediction from the
    DELAYED output path; the periodic feedback component is predicted
    and subtracted while speech (less predictable at that lag)
    passes."""
    a = jnp.asarray(audio, REAL_DTYPE)
    ref = jnp.concatenate([jnp.zeros((delay,), REAL_DTYPE), a])[
        :a.shape[0]]
    err, _ = echo_cancel_nlms(a, ref, n_taps, mu)
    return err


def channel_vocoder(modulator, carrier, sample_rate: float,
                    n_bands: int = 12):
    """Classic channel vocoder (vocoder.rs): the modulator's per-band
    envelopes drive the carrier's bands. Bands via one batched FFT
    mask."""
    m = jnp.asarray(modulator, REAL_DTYPE)
    c = jnp.asarray(carrier, REAL_DTYPE)
    n = min(m.shape[0], c.shape[0])
    m, c = m[:n], c[:n]
    mf = jnp.fft.rfft(m)
    cf = jnp.fft.rfft(c)
    k = mf.shape[0]
    edges = np.unique(np.geomspace(4, k - 1, n_bands + 1).astype(int))
    out = jnp.zeros((n,), REAL_DTYPE)
    for i in range(len(edges) - 1):
        mask = jnp.zeros((k,), REAL_DTYPE).at[edges[i]:edges[i + 1]].set(
            1.0)
        m_band = jnp.fft.irfft(mf * mask, n)
        c_band = jnp.fft.irfft(cf * mask, n)
        env = jnp.sqrt(jnp.mean(m_band ** 2) + 1e-12)
        cenv = jnp.sqrt(jnp.mean(c_band ** 2) + 1e-12)
        out = out + c_band * (env / cenv)
    return out


BLOCKS = {
    "dtmf": ("dtmf_generate", "source", "DTMF dial tones (dtmf.rs)",
             ("sample_rate",)),
    "dtmf_detector": ("dtmf_detect", "demodulator",
                      "Goertzel-bank DTMF decode (dtmf_detector.rs)",
                      ("sample_rate",)),
    "mfcc_extractor": ("mfcc", "measurement",
                       "mel-cepstral features (mfcc_extractor.rs)",
                       ("sample_rate", "n_mfcc")),
    "phase_vocoder": ("phase_vocoder", "filter",
                      "STFT time stretch (phase_vocoder.rs)", ("rate",)),
    "melp_vocoder": ("melp_analyze", "fec",
                     "LPC+pitch vocoder analysis (melp_vocoder.rs)",
                     ("sample_rate", "frame")),
    "speech_formant_tracker": ("formant_track", "measurement",
                               "LPC-root formants "
                               "(speech_formant_tracker.rs)",
                               ("sample_rate",)),
    "psychoacoustic_codec": ("psychoacoustic_encode", "fec",
                             "masking-driven transform codec "
                             "(psychoacoustic_codec.rs)",
                             ("sample_rate", "bits_budget")),
    "speech_voice_restoration": ("voice_restore", "filter",
                                 "spectral-subtraction restoration "
                                 "(speech_voice_restoration.rs)",
                                 ("sample_rate",)),
    "music_pitch_detector": ("pitch_detect", "measurement",
                             "autocorrelation pitch "
                             "(music_pitch_detector.rs)",
                             ("sample_rate",)),
    "music_pitch_tracker": ("pitch_track", "measurement",
                            "pitch contour (music_pitch_tracker.rs)",
                            ("sample_rate", "frame")),
    "acoustic_echo_canceller": ("echo_cancel_nlms", "filter",
                                "NLMS echo canceller "
                                "(acoustic_echo_canceller.rs)",
                                ("n_taps", "mu")),
    "hearing_aid_feedback_suppressor": (
        "feedback_suppress", "filter",
        "delayed-NLMS feedback suppression "
        "(hearing_aid_feedback_suppressor.rs)", ("delay",)),
    "vocoder": ("channel_vocoder", "filter",
                "channel vocoder (vocoder.rs)",
                ("sample_rate", "n_bands")),
}
