"""Higher-order & cyclostationary spectral-analysis fills.

Re-designs of cyclic_autocorrelation.rs, cyclic_spectral_analysis.rs,
spectral_correlation_analyzer.rs, bispectrum_analyzer.rs,
empirical_mode.rs, prony_method.rs, modal_analysis_prony_extended.rs,
time_frequency_reassignment.rs, entropy_calculator.rs,
power_law_spectrum_estimator.rs, phase_coherence_analyzer.rs,
expectation_maximization.rs, matrix_completion_nuclear.rs,
tensor_hosvd.rs, subspace_tracker.rs, adaptive_eigenvalue_tracker.rs,
spectrogram_anomaly_detector.rs, waterfall_image_enhancer.rs,
time_raster.rs.

Everything frame-based runs as one batched FFT; the iterative solvers
(EMD sifting, EM, SVT) use fixed iteration counts so they stay
jit-compilable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import cis
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# ------------------------------------------------- cyclostationary


def cyclic_autocorrelation(x, alpha_cycles, max_lag: int = 32):
    """Cyclic autocorrelation R_α(τ) = ⟨x(t+τ/2)x*(t-τ/2)e^{-j2παt}⟩
    (cyclic_autocorrelation.rs). alpha in cycles/sample.
    Returns (n_alpha, 2·max_lag+1)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE)
    alphas = jnp.asarray(np.atleast_1d(alpha_cycles), REAL_DTYPE)
    lags = jnp.arange(-max_lag, max_lag + 1)

    def one_lag(tau):
        a = jnp.roll(x, -tau)
        b = jnp.conj(x)
        prod = a * b          # x(t+τ)x*(t) (asymmetric form)
        return jax.vmap(
            lambda al: jnp.mean(prod * cis(-2.0 * np.pi * al * t)))(
                alphas)

    out = jax.vmap(one_lag)(lags)       # (n_lags, n_alpha)
    return out.T


def spectral_correlation(x, n_fft: int = 256, n_alpha: int = 64):
    """FFT-accumulation spectral correlation density estimate
    (spectral_correlation_analyzer.rs / cyclic_spectral_analysis.rs):
    S_α(f) via frame products X(f+α/2)X*(f−α/2) averaged over frames.
    Returns the (n_alpha, n_fft) magnitude surface."""
    x = jnp.asarray(x, IQ_DTYPE)
    hop = n_fft // 2
    n_frames = max(1, (x.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    win = jnp.asarray(np.hanning(n_fft), REAL_DTYPE)
    spec = jnp.fft.fft(x[idx] * win, axis=-1)           # (F, K)
    alphas = jnp.arange(n_alpha)

    def one_alpha(a):
        s1 = jnp.roll(spec, -int(0), axis=-1)
        shifted = jnp.roll(spec, -1 * a, axis=-1)
        return jnp.mean(s1 * jnp.conj(shifted), axis=0)

    scd = jax.vmap(one_alpha)(alphas)
    return jnp.abs(scd)


def bispectrum(x, n_fft: int = 128):
    """Direct (frame-averaged) bispectrum B(f1,f2) =
    ⟨X(f1)X(f2)X*(f1+f2)⟩ (bispectrum_analyzer.rs). Detects quadratic
    phase coupling. Returns the (n_fft//2, n_fft//2) magnitude."""
    x = jnp.asarray(x, REAL_DTYPE)
    n_frames = x.shape[0] // n_fft
    frames = x[:n_frames * n_fft].reshape(n_frames, n_fft)
    spec = jnp.fft.fft(frames * jnp.asarray(np.hanning(n_fft),
                                            REAL_DTYPE), axis=-1)
    k = n_fft // 2
    f1 = jnp.arange(k)
    f2 = jnp.arange(k)
    sum_idx = (f1[:, None] + f2[None, :]) % n_fft
    b = jnp.mean(
        spec[:, f1][:, :, None] * spec[:, f2][:, None, :]
        * jnp.conj(spec[:, sum_idx]), axis=0)
    return jnp.abs(b)


# --------------------------------------------------------------- EMD


def emd(x, n_imfs: int = 4, n_sift: int = 8):
    """Empirical mode decomposition (empirical_mode.rs): cubic-free
    sifting with moving-average envelopes (a monotone, jit-stable
    stand-in for spline envelopes). Returns (n_imfs+1, N): IMFs +
    residue."""
    r = jnp.asarray(x, REAL_DTYPE)
    n = r.shape[0]
    w = max(3, n // 32) | 1
    half = w // 2
    # centered sliding windows with edge replication (scipy
    # maximum_filter1d 'reflect'-adjacent semantics, jit-safe gather)
    win_idx = jnp.clip(jnp.arange(n)[:, None]
                       + jnp.arange(-half, half + 1)[None, :], 0, n - 1)

    imfs = []
    for _ in range(n_imfs):  # static counts: unrolled sifting
        h = r
        for _ in range(n_sift):
            windows = h[win_idx]
            m = 0.5 * (jnp.max(windows, axis=-1)
                       + jnp.min(windows, axis=-1))
            h = h - m
        imfs.append(h)
        r = r - h
    imfs.append(r)
    return jnp.stack(imfs).astype(jnp.float32)


# ------------------------------------------------------------- Prony


def prony(x, order: int):
    """Prony's method (prony_method.rs): fit x[n] = Σ A_k z_k^n.
    Returns (poles z, amplitudes A)."""
    y = np.asarray(x, np.complex128)
    n = y.shape[0]
    # linear prediction: solve the Toeplitz system
    rows = n - order
    a_mat = np.stack([y[i:i + order][::-1] for i in range(rows)])
    b_vec = y[order:order + rows]
    coef, *_ = np.linalg.lstsq(a_mat, b_vec, rcond=None)
    poly = np.concatenate([[1.0], -coef])
    z = np.roots(poly)
    # amplitudes via Vandermonde least squares
    v = np.vander(z, n, increasing=True).T       # (n, order)
    amps, *_ = np.linalg.lstsq(v, y, rcond=None)
    return jnp.asarray(z.astype(np.complex64)), \
        jnp.asarray(amps.astype(np.complex64))


def modal_frequencies(x, sample_rate: float, order: int = 8,
                      min_amp: float = 1e-3):
    """Modal analysis via extended Prony
    (modal_analysis_prony_extended.rs): returns (freq_hz, damping_ratio,
    amplitude) per retained mode."""
    z, a = prony(x, order)
    z = np.asarray(z)
    a = np.asarray(a)
    keep = (np.abs(a) > min_amp) & (np.imag(z) > 0)
    z, a = z[keep], a[keep]
    freq = np.angle(z) * sample_rate / (2 * np.pi)
    sigma = np.log(np.maximum(np.abs(z), 1e-12)) * sample_rate
    wn = np.sqrt((2 * np.pi * freq) ** 2 + sigma ** 2)
    zeta = -sigma / np.maximum(wn, 1e-12)
    order_idx = np.argsort(-np.abs(a))
    return (jnp.asarray(freq[order_idx].astype(np.float32)),
            jnp.asarray(zeta[order_idx].astype(np.float32)),
            jnp.asarray(np.abs(a)[order_idx].astype(np.float32)))


# -------------------------------------------------------- reassignment


def reassigned_spectrogram(x, sample_rate: float, n_fft: int = 256,
                           hop: int = 64):
    """Time-frequency reassignment (time_frequency_reassignment.rs):
    sharpen the spectrogram by relocating energy to the local
    instantaneous frequency — computed with the derivative-window STFT
    ratio, all frames batched."""
    x = jnp.asarray(x, IQ_DTYPE)
    n_frames = max(1, (x.shape[0] - n_fft) // hop + 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    h = np.hanning(n_fft)
    dh = np.gradient(h)
    sh = jnp.fft.fft(x[idx] * jnp.asarray(h, REAL_DTYPE), axis=-1)
    sdh = jnp.fft.fft(x[idx] * jnp.asarray(dh, REAL_DTYPE), axis=-1)
    power = jnp.abs(sh) ** 2
    # instantaneous-frequency correction (bins)
    corr = -jnp.imag(sdh * jnp.conj(sh)) / jnp.maximum(power, 1e-12) \
        * n_fft / (2.0 * np.pi)
    bins = (jnp.arange(n_fft)[None, :] + corr) % n_fft
    out = jnp.zeros_like(power)
    flat_bins = jnp.clip(jnp.round(bins).astype(jnp.int32), 0,
                         n_fft - 1)
    frame_idx = jnp.broadcast_to(
        jnp.arange(n_frames)[:, None], flat_bins.shape)
    out = out.at[frame_idx.reshape(-1),
                 flat_bins.reshape(-1)].add(power.reshape(-1))
    del sample_rate
    return out


# --------------------------------------------------------- statistics


def spectral_entropy(x, n_fft: int = 256):
    """Normalized spectral entropy (entropy_calculator.rs): 1 for
    white noise, →0 for a pure tone."""
    x = jnp.asarray(x)
    n = (x.shape[0] // n_fft) * n_fft
    spec = jnp.mean(jnp.abs(jnp.fft.fft(
        x[:n].reshape(-1, n_fft), axis=-1)) ** 2, axis=0)
    p = spec / jnp.maximum(jnp.sum(spec), 1e-30)
    h = -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-30)))
    return h / np.log(n_fft)


def power_law_fit(x, sample_rate: float = 1.0, n_fft: int = 1024):
    """Log-log PSD slope (power_law_spectrum_estimator.rs): returns
    (exponent β in S(f) ∝ f^−β, intercept)."""
    x = jnp.asarray(x)
    n = (x.shape[0] // n_fft) * n_fft
    spec = jnp.mean(jnp.abs(jnp.fft.rfft(
        x[:n].reshape(-1, n_fft), axis=-1)) ** 2, axis=0)
    f = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)  # static grid
    sel = slice(2, n_fft // 4)
    lf = jnp.asarray(np.log(f[sel]), REAL_DTYPE)
    ls = jnp.log(jnp.maximum(spec[sel], 1e-30))
    # closed-form 1st-order LS fit (replaces polyfit; jit-safe)
    lf_c = lf - jnp.mean(lf)
    slope = jnp.sum(lf_c * ls) / jnp.sum(lf_c * lf_c)
    intercept = jnp.mean(ls) - slope * jnp.mean(lf)
    return -slope, intercept


def phase_locking_value(a, b):
    """Phase coherence between two signals
    (phase_coherence_analyzer.rs): |⟨e^{j(φa−φb)}⟩| ∈ [0, 1]."""
    pa = jnp.angle(jnp.asarray(a, IQ_DTYPE))
    pb = jnp.angle(jnp.asarray(b, IQ_DTYPE))
    return jnp.abs(jnp.mean(cis(pa - pb)))


def em_gmm_1d(x, k: int = 2, n_iter: int = 50, seed: int = 0):
    """1-D Gaussian-mixture EM (expectation_maximization.rs):
    fixed-iteration, fully vectorized. Returns (means, stds, weights)."""
    x = jnp.asarray(x, REAL_DTYPE)
    mu = jnp.quantile(x, jnp.asarray(np.linspace(0.1, 0.9, k),
                                     REAL_DTYPE)).astype(REAL_DTYPE)
    sig = jnp.full((k,), jnp.std(x) / k + 1e-3, REAL_DTYPE)
    w = jnp.full((k,), 1.0 / k)
    del seed

    def step(carry, _):
        mu, sig, w = carry
        d = x[:, None] - mu[None, :]
        logp = -0.5 * (d / sig[None, :]) ** 2 \
            - jnp.log(sig[None, :]) + jnp.log(w[None, :])
        logp = logp - jax.scipy.special.logsumexp(logp, axis=1,
                                                  keepdims=True)
        r = jnp.exp(logp)
        nk = jnp.sum(r, axis=0) + 1e-9
        mu = jnp.sum(r * x[:, None], axis=0) / nk
        sig = jnp.sqrt(jnp.sum(r * (x[:, None] - mu[None, :]) ** 2,
                               axis=0) / nk) + 1e-4
        w = nk / x.shape[0]
        return (mu, sig, w), None

    (mu, sig, w), _ = jax.lax.scan(step, (mu, sig, w), None,
                                   length=n_iter)
    order = jnp.argsort(mu)
    return mu[order], sig[order], w[order]


def matrix_complete_svt(observed, mask, rank: int | None = None,
                        tau: float | None = None, n_iter: int = 100,
                        step: float = 0.5):
    """Matrix completion (matrix_completion_nuclear.rs). observed:
    (M,N) with zeros at missing entries; mask: 1 where observed.

    With `rank` given: hard-impute alternating projection (project to
    the rank-r manifold, re-impose the observed entries) — converges
    to exact recovery when the truth really is rank ≤ r and sampling
    suffices. `tau` and `step` apply ONLY to the soft-threshold
    (rank=None) path and are ignored on the rank-given path (a warning
    is raised if an explicit tau is supplied alongside rank).
    Without `rank`: classic soft-threshold SVT on the dual iterate.
    step defaults to 0.5 — the former 1.2 oscillates and stalls near
    40% error on an easy rank-1/60%-observed instance."""
    y = jnp.asarray(observed, REAL_DTYPE)
    m = jnp.asarray(mask, REAL_DTYPE)
    if rank is not None:
        if tau is not None:
            import warnings

            warnings.warn("matrix_complete_svt: tau/step are ignored "
                          "when rank is given (hard-impute path)",
                          stacklevel=2)
        x = y
        for _ in range(n_iter):
            u, s, vt = jnp.linalg.svd(x, full_matrices=False)
            s = s.at[rank:].set(0.0)
            x = (u * s[None, :]) @ vt
            x = m * y + (1.0 - m) * x
        u, s, vt = jnp.linalg.svd(x, full_matrices=False)
        s = s.at[rank:].set(0.0)
        return (u * s[None, :]) @ vt
    if tau is None:
        tau = 0.2 * jnp.linalg.norm(y)  # stays traced (jit-safe)
    z = jnp.zeros_like(y)
    x = z
    for _ in range(n_iter):
        u, s, vt = jnp.linalg.svd(z, full_matrices=False)
        s = jnp.maximum(s - tau * 0.01, 0.0)
        x = (u * s[None, :]) @ vt
        z = z + step * m * (y - x)
    return x


def hosvd(tensor):
    """Higher-order SVD (tensor_hosvd.rs): returns (core, factors) so
    that tensor ≈ core ×₁U₁ ×₂U₂ ×₃U₃."""
    t = jnp.asarray(tensor, REAL_DTYPE)
    factors = []
    for mode in range(t.ndim):
        unfolded = jnp.moveaxis(t, mode, 0).reshape(t.shape[mode], -1)
        u, _, _ = jnp.linalg.svd(unfolded, full_matrices=False)
        factors.append(u)
    core = t
    for mode, u in enumerate(factors):
        core = jnp.moveaxis(
            jnp.tensordot(u.T, jnp.moveaxis(core, mode, 0), axes=1),
            0, mode)
    return core, factors


def past_subspace_track(x_stream, n_dim: int = 1, beta: float = 0.97):
    """PAST projection-approximation subspace tracker
    (subspace_tracker.rs / adaptive_eigenvalue_tracker.rs): track the
    dominant n_dim-dimensional subspace of a vector stream (T, N)."""
    x = jnp.asarray(x_stream, IQ_DTYPE)
    n = x.shape[1]
    w0 = jnp.eye(n, n_dim, dtype=IQ_DTYPE)
    p0 = jnp.eye(n_dim, dtype=IQ_DTYPE) * 100.0

    def step(carry, xt):
        w, p = carry
        y = w.conj().T @ xt
        h = p @ y
        g = h / (beta + jnp.vdot(y, h).real)
        p = (p - jnp.outer(g, jnp.conj(h))) / beta
        e = xt - w @ y
        w = w + jnp.outer(e, jnp.conj(g))
        return (w, p), jnp.linalg.norm(w, axis=0)

    (w, _), norms = jax.lax.scan(step, (w0, p0), x)
    # orthonormalize the final basis
    q, _ = jnp.linalg.qr(w)
    return q, norms


# ----------------------------------------------------- image-ish tools


def spectrogram_anomaly_score(spec_db, n_train: int = 16):
    """Per-frame anomaly score vs a trained frame statistic
    (spectrogram_anomaly_detector.rs): Mahalanobis-lite distance of
    each frame's band energies from the training mean/std."""
    s = jnp.asarray(spec_db, REAL_DTYPE)
    mu = jnp.mean(s[:n_train], axis=0)
    sd = jnp.std(s[:n_train], axis=0) + 1e-6
    z = (s - mu[None, :]) / sd[None, :]
    return jnp.sqrt(jnp.mean(z * z, axis=-1))


def waterfall_enhance(img, gamma: float = 0.5, clip_pct: float = 99.0):
    """Waterfall display enhancement (waterfall_image_enhancer.rs):
    percentile clip + gamma + per-row median background removal."""
    x = jnp.asarray(img, REAL_DTYPE)
    bg = jnp.median(x, axis=-1, keepdims=True)
    x = jnp.maximum(x - bg, 0.0)
    hi = jnp.percentile(x, clip_pct)
    x = jnp.clip(x / jnp.maximum(hi, 1e-12), 0.0, 1.0)
    return x ** gamma


def time_raster(bits, width: int):
    """Fold a bit/byte stream into a 2-D raster for visual period
    hunting (time_raster.rs)."""
    b = jnp.asarray(bits)
    n = (b.shape[0] // width) * width
    return b[:n].reshape(-1, width)


BLOCKS = {
    "cyclic_autocorrelation": ("cyclic_autocorrelation", "measurement",
                               "R_alpha(tau) surface "
                               "(cyclic_autocorrelation.rs)",
                               ("alpha_cycles", "max_lag")),
    "spectral_correlation_analyzer": (
        "spectral_correlation", "measurement",
        "SCD estimate (spectral_correlation_analyzer.rs)",
        ("n_fft", "n_alpha")),
    "bispectrum_analyzer": ("bispectrum", "measurement",
                            "frame-averaged bispectrum "
                            "(bispectrum_analyzer.rs)", ("n_fft",)),
    "empirical_mode": ("emd", "measurement",
                       "EMD sifting (empirical_mode.rs)",
                       ("n_imfs", "n_sift")),
    "prony_method": ("prony", "measurement",
                     "damped-exponential fit (prony_method.rs)",
                     ("order",)),
    "modal_analysis_prony": ("modal_frequencies", "measurement",
                             "modal freq/damping "
                             "(modal_analysis_prony_extended.rs)",
                             ("sample_rate", "order")),
    "time_frequency_reassignment": (
        "reassigned_spectrogram", "measurement",
        "reassigned STFT (time_frequency_reassignment.rs)",
        ("sample_rate", "n_fft")),
    "entropy_calculator": ("spectral_entropy", "measurement",
                           "normalized spectral entropy "
                           "(entropy_calculator.rs)", ("n_fft",)),
    "power_law_spectrum_estimator": (
        "power_law_fit", "measurement",
        "1/f^beta slope fit (power_law_spectrum_estimator.rs)"),
    "phase_coherence_analyzer": ("phase_locking_value", "measurement",
                                 "phase-locking value "
                                 "(phase_coherence_analyzer.rs)"),
    "expectation_maximization": ("em_gmm_1d", "math",
                                 "1-D GMM EM "
                                 "(expectation_maximization.rs)",
                                 ("k", "n_iter")),
    "matrix_completion_nuclear": ("matrix_complete_svt", "math",
                                  "SVT matrix completion "
                                  "(matrix_completion_nuclear.rs)",
                                  ("rank", "n_iter")),
    "tensor_hosvd": ("hosvd", "math", "higher-order SVD "
                     "(tensor_hosvd.rs)"),
    "subspace_tracker": ("past_subspace_track", "math",
                         "PAST subspace tracking "
                         "(subspace_tracker.rs / "
                         "adaptive_eigenvalue_tracker.rs)",
                         ("n_dim", "beta")),
    "spectrogram_anomaly_detector": (
        "spectrogram_anomaly_score", "measurement",
        "frame anomaly score (spectrogram_anomaly_detector.rs)",
        ("n_train",)),
    "waterfall_image_enhancer": ("waterfall_enhance", "sink",
                                 "clip+gamma+background removal "
                                 "(waterfall_image_enhancer.rs)",
                                 ("gamma", "clip_pct")),
    "time_raster": ("time_raster", "sink",
                    "stream folding raster (time_raster.rs)",
                    ("width",)),
}
