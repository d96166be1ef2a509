"""Measurement & analysis ops: EVM, SNR, BER tooling, PSD, Goertzel.

Re-designs of evm_calculator.rs, snr_estimator.rs, ber_tool.rs
(BerTester:44, confidence intervals :164, PerTester:220), welch_psd.rs,
periodogram_psd.rs, stft.rs, goertzel.rs, channel_capacity.rs,
eye_diagram.rs, and the scalar stream meters rms.rs, moving_rms.rs,
histogram.rs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis, zeros_iq
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE
from r4w_tpu.core.windows import make_window, window_gains


def evm_rms(received, reference, normalize: bool = True):
    """RMS error-vector magnitude (evm_calculator.rs), optionally
    normalized by reference RMS; returns linear ratio (×100 = %)."""
    rx = jnp.asarray(received, IQ_DTYPE)
    ref = jnp.asarray(reference, IQ_DTYPE)
    err = rx - ref
    e = jnp.sqrt(jnp.mean(err.real**2 + err.imag**2, axis=-1))
    if normalize:
        p = jnp.sqrt(jnp.mean(ref.real**2 + ref.imag**2, axis=-1))
        return e / jnp.maximum(p, 1e-12)
    return e


def snr_estimate_m2m4(x):
    """Blind M2M4 SNR estimator (snr_estimator.rs) for constant-modulus
    signals: SNR = sqrt(2·M2² − M4) / (M2 − sqrt(2·M2² − M4))."""
    x = jnp.asarray(x, IQ_DTYPE)
    p = x.real**2 + x.imag**2
    m2 = jnp.mean(p, axis=-1)
    m4 = jnp.mean(p**2, axis=-1)
    s = jnp.sqrt(jnp.maximum(2.0 * m2**2 - m4, 0.0))
    n = jnp.maximum(m2 - s, 1e-12)
    return 10.0 * jnp.log10(jnp.maximum(s / n, 1e-12))


def ber_count(tx_bits, rx_bits):
    """(errors, total) over the common length (ber_tool.rs BerTester:44)."""
    tx = jnp.asarray(tx_bits)
    rx = jnp.asarray(rx_bits)
    n = min(tx.shape[-1], rx.shape[-1])
    errs = jnp.sum((tx[..., :n] != rx[..., :n]).astype(jnp.int32), axis=-1)
    return errs, n


def _norm_ppf(p: float) -> float:
    """Inverse normal CDF (Acklam's approximation) — avoids scipy dep."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = np.sqrt(-2 * np.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p <= phigh:
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
               (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
    q = np.sqrt(-2 * np.log(1 - p))
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
           ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)


def ber_confidence_interval(errors: int, total: int,
                            confidence: float = 0.95):
    """Wilson score interval for a BER measurement (ber_tool.rs:164)."""
    if total == 0:
        return 0.0, 1.0
    z = _norm_ppf(1.0 - (1.0 - confidence) / 2.0)
    p = errors / total
    denom = 1.0 + z * z / total
    center = (p + z * z / (2 * total)) / denom
    half = z * np.sqrt(p * (1 - p) / total + z * z / (4 * total * total)) / denom
    return max(0.0, center - half), min(1.0, center + half)


def theoretical_ber_bpsk(ebn0_db):
    e = 10.0 ** (jnp.asarray(ebn0_db, REAL_DTYPE) / 10.0)
    return 0.5 * jax.scipy.special.erfc(jnp.sqrt(e))


def theoretical_ber_qpsk(ebn0_db):
    return theoretical_ber_bpsk(ebn0_db)


def theoretical_ber_mpsk(ebn0_db, m: int):
    """Gray-coded M-PSK bit error rate (ber_tool.rs theory curves).

    Exact for M=2,4; the standard nearest-neighbour approximation
    Pb ≈ (2/k)·Q(√(2k·γb)·sin(π/M)) for M≥8 (tight for Pb ≲ 1e-2).
    """
    if m in (2, 4):
        return theoretical_ber_bpsk(ebn0_db)
    k = np.log2(m)
    e = 10.0 ** (jnp.asarray(ebn0_db, REAL_DTYPE) / 10.0) * k
    arg = jnp.sqrt(2.0 * e) * np.sin(np.pi / m)
    ser = 2.0 * 0.5 * jax.scipy.special.erfc(arg / jnp.sqrt(2.0))
    return ser / k


def theoretical_ber_fsk_noncoherent(ebn0_db):
    """Noncoherent orthogonal BFSK: Pb = ½·exp(−γb/2) (ber_tool.rs)."""
    e = 10.0 ** (jnp.asarray(ebn0_db, REAL_DTYPE) / 10.0)
    return 0.5 * jnp.exp(-e / 2.0)


def theoretical_ber_mqam_exact(ebn0_db, m: int):
    """EXACT Gray-coded square M-QAM bit error rate (Cho & Yoon 2002,
    "On the general BER expression of one- and two-dimensional amplitude
    modulations"). Both I/Q dimensions are √M-PAM; averaging the exact
    per-bit-position error probabilities gives Pb with no
    nearest-neighbour approximation."""
    gamma = 10.0 ** (jnp.asarray(ebn0_db, REAL_DTYPE) / 10.0)
    k_tot = int(np.log2(m))
    sqrt_m = int(round(np.sqrt(m)))
    k_dim = int(np.log2(sqrt_m))
    base = jnp.sqrt(3.0 * k_tot * gamma / (m - 1.0))

    total = 0.0
    for k in range(1, k_dim + 1):
        n_terms = int((1 - 2.0 ** (-k)) * sqrt_m)
        for i in range(n_terms):
            f = int(np.floor(i * 2.0 ** (k - 1) / sqrt_m))
            w = ((-1.0) ** f) * (2.0 ** (k - 1)
                                 - np.floor(i * 2.0 ** (k - 1) / sqrt_m
                                            + 0.5))
            q = 0.5 * jax.scipy.special.erfc(
                (2 * i + 1) * base / jnp.sqrt(2.0))
            total = total + (2.0 / sqrt_m) * w * q
    return total / k_dim


def theoretical_ber_mqam(ebn0_db, m: int):
    """Gray-coded square M-QAM approximation."""
    k = np.log2(m)
    e = 10.0 ** (jnp.asarray(ebn0_db, REAL_DTYPE) / 10.0) * k
    arg = jnp.sqrt(3.0 * e / (m - 1))
    ser = 4.0 * (1.0 - 1.0 / np.sqrt(m)) * 0.5 * jax.scipy.special.erfc(
        arg / jnp.sqrt(2.0)
    )
    return ser / k


def periodogram_psd(x, nfft: int | None = None, window: str = "hann",
                    sample_rate: float = 1.0):
    """Single-segment windowed periodogram (periodogram_psd.rs).
    Returns PSD in power/Hz, DC-centered."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    nfft = nfft or n
    w = make_window(window, n)
    _, enbw = window_gains(window, n)
    xw = x * w
    spec = jnp.fft.fftshift(jnp.fft.fft(xw, n=nfft, axis=-1), axes=-1)
    scale = 1.0 / (jnp.sum(w**2) * sample_rate)
    return (spec.real**2 + spec.imag**2) * scale


def welch_psd(x, nperseg: int = 256, overlap: float = 0.5,
              window: str = "hann", sample_rate: float = 1.0):
    """Welch-averaged PSD (welch_psd.rs): segment, window, average —
    all segments as one batch axis."""
    x = jnp.asarray(x, IQ_DTYPE)
    hop = max(1, int(nperseg * (1.0 - overlap)))
    n = x.shape[-1]
    n_seg = max(1, (n - nperseg) // hop + 1)
    starts = jnp.arange(n_seg) * hop
    idx = starts[:, None] + jnp.arange(nperseg)[None, :]
    segs = x[..., idx]  # (..., n_seg, nperseg)
    w = make_window(window, nperseg)
    spec = jnp.fft.fftshift(jnp.fft.fft(segs * w, axis=-1), axes=-1)
    p = (spec.real**2 + spec.imag**2) / (jnp.sum(w**2) * sample_rate)
    return jnp.mean(p, axis=-2)


def stft(x, nfft: int = 256, hop: int | None = None, window: str = "hann"):
    """Complex STFT frames (stft.rs): (..., frames, nfft)."""
    x = jnp.asarray(x, IQ_DTYPE)
    hop = hop or nfft // 2
    n = x.shape[-1]
    n_frames = max(0, (n - nfft) // hop + 1)
    if n_frames == 0:
        return zeros_iq(x.shape[:-1] + (0, nfft))
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(nfft)[None, :]
    return jnp.fft.fft(x[..., idx] * make_window(window, nfft), axis=-1)


def goertzel_power(x, freq_bin: int, n: int | None = None):
    """Single-bin DFT power via the Goertzel recurrence (goertzel.rs),
    expressed directly as a dot with the DFT basis (same O(N), batched)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = n or x.shape[-1]
    k = jnp.arange(n, dtype=REAL_DTYPE)
    basis = cis(-2 * jnp.pi * freq_bin * k / n).astype(IQ_DTYPE)
    v = jnp.einsum("...n,n->...", x[..., :n], basis)
    return v.real**2 + v.imag**2


def channel_capacity_awgn(snr_db, bandwidth_hz):
    """Shannon capacity C = B·log2(1+SNR) (channel_capacity.rs)."""
    snr = 10.0 ** (jnp.asarray(snr_db, REAL_DTYPE) / 10.0)
    return bandwidth_hz * jnp.log2(1.0 + snr)


def eye_diagram(x, sps: int, n_traces: int = 64, span: int = 2):
    """(traces, span*sps) overlapped symbol traces (eye_diagram.rs)."""
    x = jnp.asarray(x)
    w = span * sps
    n = min(n_traces, (x.shape[-1] - w) // sps)
    if n <= 0:
        return jnp.zeros((0, w), x.dtype)
    starts = jnp.arange(n) * sps
    idx = starts[:, None] + jnp.arange(w)[None, :]
    return x[..., idx]


def signal_power_db(x):
    x = jnp.asarray(x, IQ_DTYPE)
    return 10.0 * jnp.log10(jnp.maximum(
        jnp.mean(x.real**2 + x.imag**2, axis=-1), 1e-30))


# -------------------------------------------------------------- wavelet


_WAVELETS = {
    "haar": np.asarray([1.0, 1.0]) / np.sqrt(2.0),
    "db2": np.asarray([0.48296291314469025, 0.836516303737469,
                       0.22414386804185735, -0.12940952255092145]),
    "db4": np.asarray([0.23037781330885523, 0.7148465705525415,
                       0.6308807679295904, -0.02798376941698385,
                       -0.18703481171888114, 0.030841381835986965,
                       0.032883011666982945, -0.010597401784997278]),
}


def dwt(x, wavelet: str = "haar", levels: int = 1):
    """Multi-level discrete wavelet transform (wavelet.rs re-design):
    returns [cA_L, cD_L, cD_{L-1}, ..., cD_1] (pywt ordering). Each
    level is one strided conv pair — batch-friendly."""
    if wavelet not in _WAVELETS:
        raise ValueError(f"unknown wavelet {wavelet}; know {list(_WAVELETS)}")
    h = _WAVELETS[wavelet]  # lowpass
    g = h[::-1].copy()
    g[1::2] *= -1.0  # highpass via QMF
    lo = jnp.asarray(h[::-1], REAL_DTYPE)  # conv orientation
    hi = jnp.asarray(g[::-1], REAL_DTYPE)
    a = jnp.asarray(x, REAL_DTYPE)
    details = []
    for _ in range(levels):
        n = a.shape[-1]
        if n < len(h):
            break
        pad = (len(h) - 1)
        ap = jnp.concatenate([a[..., -pad:], a], axis=-1)  # periodic ext
        idx = jnp.arange(0, n, 2)[:, None] + jnp.arange(len(h))[None, :]
        frames = ap[..., idx]
        ca = jnp.einsum("...fk,k->...f", frames, lo)
        cd = jnp.einsum("...fk,k->...f", frames, hi)
        details.append(cd)
        a = ca
    return [a] + details[::-1]


def dwt_denoise(x, wavelet: str = "db4", levels: int = 3,
                threshold: float | None = None):
    """Soft-threshold wavelet denoising. Returns same-length estimate
    via inverse transform of thresholded coefficients (synthesis by
    transposed strided conv)."""
    coeffs = dwt(x, wavelet, levels)
    ca, details = coeffs[0], coeffs[1:]
    if threshold is None:
        # universal threshold from the finest detail band
        sigma = jnp.median(jnp.abs(details[-1])) / 0.6745
        threshold = sigma * jnp.sqrt(2.0 * jnp.log(
            jnp.asarray(float(jnp.asarray(x).shape[-1]))))
    soft = [jnp.sign(d) * jnp.maximum(jnp.abs(d) - threshold, 0.0)
            for d in details]
    return idwt([ca] + soft, wavelet)


def idwt(coeffs, wavelet: str = "haar"):
    """Inverse multi-level DWT for the coefficient list from dwt()."""
    h = _WAVELETS[wavelet]
    g = h[::-1].copy()
    g[1::2] *= -1.0
    lo = jnp.asarray(h, REAL_DTYPE)
    hi = jnp.asarray(g, REAL_DTYPE)
    a = coeffs[0]
    for cd in coeffs[1:]:
        n = cd.shape[-1]
        a = a[..., :n]
        up_a = jnp.zeros((*a.shape[:-1], 2 * n), REAL_DTYPE
                         ).at[..., ::2].set(a)
        up_d = jnp.zeros((*cd.shape[:-1], 2 * n), REAL_DTYPE
                         ).at[..., ::2].set(cd)
        k = lo.shape[0]
        pad = k - 1
        up_a = jnp.concatenate([up_a, up_a[..., :pad]], axis=-1)
        up_d = jnp.concatenate([up_d, up_d[..., :pad]], axis=-1)
        idx = jnp.arange(2 * n)[:, None] + jnp.arange(k)[None, :]
        # x[n] = sum_f ca[f] h[2f-n] + cd[f] g[2f-n] (same atoms as the
        # convolution-form analysis) -> gather + dot with the unreversed
        # filters, circularly extended
        a = (jnp.einsum("...fk,k->...f", up_a[..., idx], lo)
             + jnp.einsum("...fk,k->...f", up_d[..., idx], hi))
    return a


# -------------------------------------------------------- moving stats


def moving_variance(x, length: int):
    """Sliding-window variance (moving_variance.rs) via two moving sums."""
    from r4w_tpu.ops.filters import moving_average

    x = jnp.asarray(x, REAL_DTYPE)
    m, _ = moving_average(x, length)
    m2, _ = moving_average(x * x, length)
    return jnp.maximum(m2 - m * m, 0.0)


def moving_minmax(x, length: int):
    """Sliding min and max over a window (moving_minmax.rs): windowed
    reduce via gather (..., N-L+1)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    idx = jnp.arange(n - length + 1)[:, None] + jnp.arange(length)[None, :]
    w = x[..., idx]
    return jnp.min(w, axis=-1), jnp.max(w, axis=-1)


def moving_autocorrelation(x, length: int, lag: int = 1):
    """Sliding normalized autocorrelation at a fixed lag
    (moving_autocorrelation.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[-1]
    prod = x[..., lag:] * jnp.conj(x[..., :-lag])
    pwr = x.real**2 + x.imag**2
    m = n - lag - length + 1
    if m <= 0:
        return zeros_iq((*x.shape[:-1], 0))
    idx = jnp.arange(m)[:, None] + jnp.arange(length)[None, :]
    num = jnp.sum(prod[..., idx], axis=-1)
    den = jnp.sum(pwr[..., idx], axis=-1)
    return num / jnp.maximum(den, 1e-30)


# ------------------------------------------------- constellation/quality


def constellation_persistence(symbols, bins: int = 64, extent: float = 1.5):
    """2-D constellation density histogram (constellation_tracer.rs GUI
    role): scatter-add of symbol positions -> (bins, bins) counts."""
    s = jnp.asarray(symbols).reshape(-1)
    xi = jnp.clip(((s.real + extent) / (2 * extent) * bins).astype(
        jnp.int32), 0, bins - 1)
    yi = jnp.clip(((s.imag + extent) / (2 * extent) * bins).astype(
        jnp.int32), 0, bins - 1)
    return jnp.zeros((bins, bins), jnp.float32).at[yi, xi].add(1.0)


def noise_figure_db(gain_db: float, t_noise_k: float,
                    t0_k: float = 290.0):
    """Noise figure from effective noise temperature (noise_figure.rs)."""
    return 10.0 * np.log10(1.0 + t_noise_k / t0_k)


def cascade_noise_figure_db(stages):
    """Friis cascade: stages = [(gain_db, nf_db), ...] -> total NF dB."""
    f_tot = 0.0
    g_acc = 1.0
    for i, (g_db, nf_db) in enumerate(stages):
        f = 10 ** (nf_db / 10.0)
        if i == 0:
            f_tot = f
        else:
            f_tot += (f - 1.0) / g_acc
        g_acc *= 10 ** (g_db / 10.0)
    return 10.0 * np.log10(f_tot)


def signal_quality(symbols, reference):
    """Aggregate link metrics (signal_quality_metrics.rs): EVM %, SNR
    estimate, magnitude/phase error."""
    s = jnp.asarray(symbols, IQ_DTYPE)
    r = jnp.asarray(reference, IQ_DTYPE)
    err = s - r
    p_ref = jnp.mean(r.real**2 + r.imag**2)
    p_err = jnp.mean(err.real**2 + err.imag**2)
    evm = jnp.sqrt(p_err / jnp.maximum(p_ref, 1e-30))
    return {
        "evm_pct": 100.0 * evm,
        "snr_db": 10.0 * jnp.log10(jnp.maximum(p_ref / jnp.maximum(
            p_err, 1e-30), 1e-30)),
        "mag_err": jnp.mean(jnp.abs(jnp.abs(s) - jnp.abs(r))),
        "phase_err_rad": jnp.mean(jnp.abs(jnp.angle(s * jnp.conj(r)))),
    }


def channel_sound(rx, probe, n_taps: int = 32):
    """PN-probe channel sounding (channel_sounder.rs /
    channel_sounding_processor.rs): circular-correlate the received
    signal with the known probe sequence and normalize to the channel
    impulse response estimate.

    rx: (..., N) received (probe convolved with the channel + noise);
    probe: (N,) ±1 or complex sounding sequence (one period). Returns
    (..., n_taps) complex CIR estimate.
    """
    rx = jnp.asarray(rx, IQ_DTYPE)
    p = jnp.asarray(probe, IQ_DTYPE)
    n = p.shape[-1]
    fr = jnp.fft.fft(rx[..., :n], axis=-1)
    fp = jnp.fft.fft(p)
    cir = jnp.fft.ifft(fr * jnp.conj(fp), axis=-1)
    energy = jnp.sum(jnp.abs(p) ** 2)
    return (cir / energy)[..., :n_taps].astype(IQ_DTYPE)
