"""Applied-DSP blocks: denoising, speech, vibration, localization,
source separation, compressive sensing, modulation classification.

Re-designs of the reference's applied long-tail blocks
(wavelet_denoiser.rs, spectral_subtraction_denoiser.rs,
modulation_classifier.rs, cepstral_analysis.rs, speech_codec_lpc.rs,
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
    prediction filter a (order+1, a[0]=1) and residual gain g.
    jit-safe: the recursion is a static-order unrolled loop of
    full-length masked updates."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    # autocorrelation lags 0..order via zero-padded FFT
    f = jnp.fft.rfft(x, 2 * n)
    ac = jnp.fft.irfft(f * jnp.conj(f), 2 * n)[: order + 1] / n
    a = jnp.zeros(order + 1, jnp.float32).at[0].set(1.0)
    e = jnp.maximum(ac[0], 1e-12)
    for i in range(1, order + 1):  # static order: unrolled
        k = -(a[:i] @ ac[i:0:-1]) / e
        a = a.at[: i + 1].set(a[: i + 1] + k * a[i::-1])
        e = e * (1.0 - k * k)
    return a, jnp.sqrt(jnp.maximum(e, 1e-12))


def _iir_all_pole(a, seg):
    """y[t] = x[t] − Σ a[k]·y[t−k] (scipy lfilter([1], a, x) with
    a[0] = 1) as a lax.scan with the order-K state carried."""
    order = a.shape[0] - 1

    def step(state, x_t):
        y_t = x_t - jnp.dot(a[1:], state)
        state = jnp.concatenate([y_t[None], state[:-1]])
        return state, y_t

    _, y = jax.lax.scan(step, jnp.zeros(order, seg.dtype), seg)
    return y


def lpc_analysis_synthesis(x, order: int = 12, frame: int = 240):
    """Frame-wise LPC vocoder loop: analyze → residual → resynthesize.
    Returns the reconstruction (speech_codec_lpc.rs roundtrip).
    jit-safe: frames batched by vmap, the synthesis IIR as a scan."""
    x = jnp.asarray(x, jnp.float32)
    n_frames = (x.shape[-1] - frame) // frame + 1 if x.shape[-1] >= frame \
        else 0
    if n_frames == 0:
        return jnp.zeros_like(x)
    segs = x[: n_frames * frame].reshape(n_frames, frame)

    def per_frame(seg):
        a, _ = lpc_coefficients(seg, order)
        # inverse (FIR) filter: resid[t] = Σ a[k]·x[t−k]
        resid = jnp.convolve(seg, a, mode="full")[: frame]
        return _iir_all_pole(a, resid)

    out = jax.vmap(per_frame)(segs).reshape(-1)
    return jnp.concatenate(
        [out, jnp.zeros(x.shape[-1] - out.shape[0], x.dtype)])


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
    # frequency grid is static (shape-derived); harmonic masks are
    # static too, so only the spectrum stays traced
    fgrid = np.fft.rfftfreq(jnp.asarray(x).shape[-1], 1.0 / sample_rate)
    floor = jnp.nanmedian(jnp.where(jnp.asarray(fgrid > 5.0), es,
                                    jnp.nan))
    score = jnp.asarray(0.0, es.dtype)
    for h in range(1, harmonics + 1):
        mask = np.abs(fgrid - h * fault_hz) <= tol_hz
        if mask.any():
            score = score + (jnp.max(jnp.where(jnp.asarray(mask), es,
                                               -jnp.inf))
                             / jnp.maximum(floor, 1e-12))
    return score / harmonics


# ------------------------------------------------------ localization


def trilaterate(anchors: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Least-squares position from anchor ranges
    (trilateration_solver.rs): linearized about anchor 0."""
    a = jnp.asarray(anchors, jnp.float32)
    r = jnp.asarray(ranges, jnp.float32)
    p0, r0 = a[0], r[0]
    rows = a[1:] - p0
    b = 0.5 * (r0 ** 2 - r[1:] ** 2
               + jnp.sum((a[1:] - p0) ** 2, axis=1))
    # small fixed-dim LS via regularized normal equations (jit-safe)
    dim = rows.shape[1]
    sol = jnp.linalg.solve(
        rows.T @ rows + 1e-9 * jnp.eye(dim, dtype=rows.dtype),
        rows.T @ b)
    return p0 + sol


# ----------------------------------------------- source separation


def fastica_2x2(mixtures, iters: int = 64, seed: int = 0):
    """FastICA for two mixed real sources (blind_source_separation.rs):
    whiten then one rotation found by kurtosis maximization."""
    x = jnp.asarray(mixtures, jnp.float32)  # (2, N)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    cov = x @ x.T / x.shape[1]
    d, e = jnp.linalg.eigh(cov)
    white = (e / jnp.sqrt(jnp.maximum(d, 1e-12))) @ e.T
    z = white @ x
    rng = np.random.default_rng(seed)  # static init direction
    w0 = rng.standard_normal(2).astype(np.float32)
    w0 /= np.linalg.norm(w0)

    def step(w, _):
        wz = w @ z
        w_new = jnp.mean(z * wz ** 3, axis=1) - 3.0 * w
        return w_new / jnp.linalg.norm(w_new), None

    w, _ = jax.lax.scan(step, jnp.asarray(w0), None, length=iters)
    w2 = jnp.stack([-w[1], w[0]])
    basis = jnp.stack([w, w2])
    return basis @ z, basis @ white


# ------------------------------------------------ compressive sensing


def omp(measurement_matrix, y, sparsity: int):
    """Orthogonal Matching Pursuit (compressive_sensing.rs): recover a
    k-sparse vector from y = A·x."""
    a = jnp.asarray(measurement_matrix, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n = a.shape[1]
    resid = y
    sel = jnp.zeros(n, jnp.float32)  # 1.0 at selected columns
    support = []
    coef_full = jnp.zeros(n, jnp.float32)
    for _ in range(sparsity):  # static sparsity: unrolled greedy
        scores = jnp.abs(a.T @ resid)
        scores = jnp.where(sel > 0, -1.0, scores)
        j = jnp.argmax(scores)
        support.append(j)
        sel = sel.at[j].set(1.0)
        # LS on the selected columns via MASKED normal equations:
        # unselected rows/cols of the Gram are identity with zero rhs,
        # so their coefficients are exactly 0 and the selected block
        # solves A_Sᵀ A_S c = A_Sᵀ y — jit-safe (no fancy indexing).
        am = a * sel[None, :]
        g = am.T @ am + jnp.diag(1.0 - sel)
        coef_full = jnp.linalg.solve(g, am.T @ y)
        resid = y - am @ coef_full
    return coef_full, jnp.sort(jnp.stack(support))


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
