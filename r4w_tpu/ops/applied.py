"""Applied-DSP blocks: denoising, speech, vibration, localization,
source separation, compressive sensing, modulation classification.

Re-designs of the reference's applied long-tail blocks
(wavelet_denoiser.rs, spectral_subtraction_denoiser.rs,
cepstral_analysis.rs, speech_codec_lpc.rs,
vibration_bearing_fault_detector.rs, trilateration_solver.rs,
blind_source_separation.rs, compressive_sensing.rs,
automatic_modulation_classifier.rs). Batched linear algebra
throughout; small iterative solvers (FastICA, OMP, Levinson-Durbin)
run fixed iteration counts so they stay jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


# ----------------------------------------------------------- denoise


def spectral_subtraction(x, noise_frames: int = 8, nfft: int = 256,
                         oversubtract: float = 1.5, floor: float = 0.05):
    """Magnitude spectral subtraction (spectral_subtraction_denoiser.rs):
    noise PSD from the first frames, half-overlap add."""
    x = jnp.asarray(x, REAL_DTYPE)
    hop = nfft // 2
    n_frames = (x.shape[-1] - nfft) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(nfft)[None, :]
    win = jnp.asarray(np.hanning(nfft), REAL_DTYPE)
    frames = x[idx] * win
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)
    noise = jnp.mean(mag[:noise_frames], axis=0, keepdims=True)
    clean = jnp.maximum(mag - oversubtract * noise, floor * mag)
    out_spec = clean.astype(jnp.complex64) * (
        spec / jnp.maximum(mag, 1e-12))
    frames_out = jnp.fft.irfft(out_spec, n=nfft, axis=-1) * win
    # overlap-add
    out = jnp.zeros(x.shape[-1], REAL_DTYPE)
    out = out.at[idx.reshape(-1)].add(frames_out.reshape(-1))
    norm = jnp.zeros(x.shape[-1], REAL_DTYPE)
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(win * win, (n_frames,)))
    return out / jnp.maximum(norm, 1e-6)


def wavelet_denoise(x, level: int = 4, threshold_scale: float = 3.0):
    """Haar-wavelet soft-threshold denoiser (wavelet_denoiser.rs):
    universal threshold from the finest-detail MAD estimate."""
    x = jnp.asarray(x, REAL_DTYPE)
    n = x.shape[-1]
    n_pad = 1 << int(np.ceil(np.log2(n)))
    a = jnp.pad(x, (0, n_pad - n))
    details = []
    for _ in range(level):
        even, odd = a[..., ::2], a[..., 1::2]
        details.append((even - odd) / np.sqrt(2.0))
        a = (even + odd) / np.sqrt(2.0)
    sigma = jnp.median(jnp.abs(details[0])) / 0.6745
    thr = threshold_scale * sigma

    def soft(d):
        return jnp.sign(d) * jnp.maximum(jnp.abs(d) - thr, 0.0)

    for d in reversed(details):
        d = soft(d)
        up = jnp.zeros(a.shape[-1] * 2, REAL_DTYPE)
        even = (a + d) / np.sqrt(2.0)
        odd = (a - d) / np.sqrt(2.0)
        up = up.at[..., ::2].set(even).at[..., 1::2].set(odd)
        a = up
    return a[..., :n]


# ------------------------------------------------------------ speech


def real_cepstrum(x, nfft: int | None = None):
    """Real cepstrum c = IFFT(log|FFT(x)|) (cepstral_analysis.rs)."""
    x = jnp.asarray(x, REAL_DTYPE)
    nfft = nfft or x.shape[-1]
    spec = jnp.fft.fft(x, n=nfft, axis=-1)
    logmag = jnp.log(jnp.maximum(jnp.abs(spec), 1e-12))
    return jnp.real(jnp.fft.ifft(logmag, axis=-1))


def cepstral_pitch(x, sample_rate: float, fmin: float = 60.0,
                   fmax: float = 400.0):
    """Pitch from the cepstral peak in the voice quefrency range."""
    c = real_cepstrum(x)
    qmin = int(sample_rate / fmax)
    qmax = int(sample_rate / fmin)
    q = jnp.argmax(c[..., qmin:qmax], axis=-1) + qmin
    return sample_rate / q.astype(REAL_DTYPE)


def lpc_coefficients(x, order: int = 12):
    """LPC via Levinson-Durbin (speech_codec_lpc.rs). Returns (a, g):
    prediction filter a (order+1, a[0]=1) and residual gain g."""
    x = np.asarray(x, np.float64)
    r = np.correlate(x, x, "full")[len(x) - 1:len(x) + order] / len(x)
    a = np.zeros(order + 1)
    a[0] = 1.0
    e = r[0] if r[0] > 0 else 1e-12
    for i in range(1, order + 1):
        k = -(np.dot(a[:i], r[i:0:-1])) / e
        a[:i + 1] = a[:i + 1] + k * a[i::-1]
        e *= (1.0 - k * k)
    return a.astype(np.float32), float(np.sqrt(max(e, 1e-12)))


def lpc_analysis_synthesis(x, order: int = 12, frame: int = 240):
    """Frame-wise LPC vocoder loop: analyze → residual → resynthesize.
    Returns the reconstruction (speech_codec_lpc.rs roundtrip)."""
    from scipy.signal import lfilter

    x = np.asarray(x, np.float64)
    out = np.zeros_like(x)
    for start in range(0, len(x) - frame + 1, frame):
        seg = x[start:start + frame]
        a, _ = lpc_coefficients(seg, order)
        resid = lfilter(a, [1.0], seg)      # inverse filter
        out[start:start + frame] = lfilter([1.0], a, resid)  # synth
    return out.astype(np.float32)


# --------------------------------------------------------- vibration


def envelope_spectrum(x, sample_rate: float):
    """Hilbert-envelope spectrum — the bearing-fault workhorse
    (vibration_bearing_fault_detector.rs)."""
    x = jnp.asarray(x, REAL_DTYPE)
    n = x.shape[-1]
    spec = jnp.fft.fft(x)
    h = np.zeros(n)
    h[0] = 1.0
    h[1:(n + 1) // 2] = 2.0
    if n % 2 == 0:
        h[n // 2] = 1.0
    analytic = jnp.fft.ifft(spec * jnp.asarray(h))
    env = jnp.abs(analytic)
    env = env - jnp.mean(env)
    es = jnp.abs(jnp.fft.rfft(env)) / n
    freqs = jnp.asarray(np.fft.rfftfreq(n, 1.0 / sample_rate))
    return freqs, es


def bearing_fault_metric(x, sample_rate: float, fault_hz: float,
                         harmonics: int = 3, tol_hz: float = 2.0):
    """Fault score: envelope-spectrum energy at the fault frequency and
    harmonics vs the local floor."""
    freqs, es = envelope_spectrum(x, sample_rate)
    freqs = np.asarray(freqs)
    es = np.asarray(es)
    floor = np.median(es[freqs > 5.0])
    score = 0.0
    for h in range(1, harmonics + 1):
        mask = np.abs(freqs - h * fault_hz) <= tol_hz
        if mask.any():
            score += es[mask].max() / max(floor, 1e-12)
    return score / harmonics


# ------------------------------------------------------ localization


def trilaterate(anchors: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Least-squares position from anchor ranges
    (trilateration_solver.rs): linearized about anchor 0."""
    a = np.asarray(anchors, np.float64)
    r = np.asarray(ranges, np.float64)
    p0, r0 = a[0], r[0]
    rows = a[1:] - p0
    b = 0.5 * (r0 ** 2 - r[1:] ** 2
               + np.sum((a[1:] - p0) ** 2, axis=1))
    sol, *_ = np.linalg.lstsq(rows, b, rcond=None)
    return (p0 + sol).astype(np.float64)


# ----------------------------------------------- source separation


def fastica_2x2(mixtures, iters: int = 64, seed: int = 0):
    """FastICA for two mixed real sources (blind_source_separation.rs):
    whiten then one rotation found by kurtosis maximization."""
    x = np.asarray(mixtures, np.float64)  # (2, N)
    x = x - x.mean(axis=1, keepdims=True)
    cov = x @ x.T / x.shape[1]
    d, e = np.linalg.eigh(cov)
    white = (e / np.sqrt(np.maximum(d, 1e-12))) @ e.T
    z = white @ x
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(2)
    w /= np.linalg.norm(w)
    for _ in range(iters):
        wz = w @ z
        w_new = (z * wz ** 3).mean(axis=1) - 3.0 * w
        w_new /= np.linalg.norm(w_new)
        if abs(abs(w_new @ w) - 1.0) < 1e-10:
            w = w_new
            break
        w = w_new
    w2 = np.asarray([-w[1], w[0]])
    sources = np.stack([w, w2]) @ z
    return sources, np.stack([w, w2]) @ white


# ------------------------------------------------ compressive sensing


def omp(measurement_matrix, y, sparsity: int):
    """Orthogonal Matching Pursuit (compressive_sensing.rs): recover a
    k-sparse vector from y = A·x."""
    a = np.asarray(measurement_matrix, np.float64)
    y = np.asarray(y, np.float64)
    resid = y.copy()
    support: list[int] = []
    for _ in range(sparsity):
        scores = np.abs(a.T @ resid)
        scores[support] = -1.0
        support.append(int(np.argmax(scores)))
        sub = a[:, support]
        coef, *_ = np.linalg.lstsq(sub, y, rcond=None)
        resid = y - sub @ coef
    x = np.zeros(a.shape[1])
    x[support] = coef
    return x, sorted(support)


# -------------------------------------- modulation classification


def modulation_features(x):
    """Normalized cumulant features |C20|, |C40|, C42 plus envelope
    variance (automatic_modulation_classifier.rs feature set)."""
    z = jnp.asarray(x, IQ_DTYPE)
    z = z / jnp.sqrt(jnp.mean(jnp.abs(z) ** 2))
    c20 = jnp.mean(z * z)
    c21 = jnp.mean(jnp.abs(z) ** 2)
    c40 = jnp.mean(z ** 4) - 3.0 * c20 ** 2
    c42 = jnp.mean(jnp.abs(z) ** 2 * z * z) - 2.0 * c20 * c21
    m80 = jnp.mean(z ** 8)
    env_var = jnp.var(jnp.abs(z))
    return {
        "abs_c20": float(jnp.abs(c20)),
        "abs_c40": float(jnp.abs(c40)),
        "abs_c42": float(jnp.abs(c42)),
        "abs_m80": float(jnp.abs(m80)),
        "env_var": float(env_var),
    }


def classify_modulation(x) -> str:
    """Decision-tree AMC over the cumulant features: distinguishes
    BPSK / QPSK / 8PSK-or-PSK / QAM / FM-FSK-like (constant envelope
    with spread spectrum phase)."""
    f = modulation_features(x)
    if f["abs_c20"] > 0.5:
        return "BPSK"
    if f["env_var"] < 0.05:
        # constant envelope: PSK order via the first nonzero moment
        if f["abs_c40"] > 0.5:
            return "QPSK"
        if f["abs_m80"] > 0.3:
            return "8PSK"
        return "FM/FSK"
    return "QAM"
