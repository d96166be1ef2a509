"""Biomedical signal-processing fills.

Re-designs of ecg_qrs_detector.rs, bio_ecg_arrhythmia_classifier.rs,
biomedical_signal_processor.rs, electroencephalogram_bci.rs,
electromyography_decomposition.rs, emg_gesture_decoder.rs,
bioacoustic_species_classifier.rs.

The QRS chain is the Pan–Tompkins pipeline expressed as batched
filters; EEG/EMG features are band-power matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import REAL_DTYPE
from r4w_tpu.ops import filters as _filters

# ------------------------------------------------------------- ECG


def qrs_detect(ecg, fs: float, max_peaks: int = 64):
    """Pan–Tompkins QRS detection (ecg_qrs_detector.rs): bandpass
    5–15 Hz → derivative → square → moving-window integrate →
    adaptive-threshold peaks. jit-safe fixed-capacity form (VERDICT
    r4 #6): returns `(r_peaks[K] int32, valid[K])` for
    K = max_peaks, in time order."""
    from r4w_tpu.ops.events import masked_indices, refractory_trigger

    x = jnp.asarray(ecg, REAL_DTYPE)
    bp = _filters.design_bandpass(int(fs // 2) | 1, 5.0, 15.0, fs)
    f = _filters.fir_apply(jnp.asarray(bp, REAL_DTYPE), x)
    d = jnp.concatenate([jnp.zeros((1,), REAL_DTYPE), jnp.diff(f)])
    sq = d * d
    w = int(0.15 * fs)
    kern = jnp.ones((w,), REAL_DTYPE) / w
    integ = jnp.convolve(sq, kern, mode="same")
    thr = 0.4 * jnp.quantile(integ, 0.99)
    refractory = max(1, int(0.25 * fs))
    fires, valid = masked_indices(
        refractory_trigger(integ > thr, refractory), max_peaks)
    pad = jnp.concatenate([integ,
                           jnp.full(refractory + 1, -jnp.inf,
                                    REAL_DTYPE)])
    peaks = fires + jnp.argmax(
        pad[fires[:, None] + jnp.arange(refractory)[None, :]], axis=1)
    # group delay of the bandpass
    delay = (len(np.asarray(bp)) - 1) // 2 + w // 2
    peaks = jnp.maximum(peaks - delay, 0)
    return jnp.where(valid, peaks, 0).astype(jnp.int32), valid


def heart_rate_series(r_peaks, fs: float):
    """Instantaneous heart rate from R-R intervals."""
    rr = np.diff(np.asarray(r_peaks)) / fs
    return jnp.asarray((60.0 / np.maximum(rr, 1e-3)).astype(np.float32))


def arrhythmia_classify(r_peaks, fs: float):
    """Rule-based rhythm classification
    (bio_ecg_arrhythmia_classifier.rs): bradycardia/tachycardia/
    afib-like (high RR variability)/normal."""
    rr = np.diff(np.asarray(r_peaks)) / fs
    if rr.shape[0] < 3:
        return "insufficient"
    hr = 60.0 / rr.mean()
    rmssd = np.sqrt(np.mean(np.diff(rr) ** 2))
    if hr < 50.0:
        return "bradycardia"
    if hr > 110.0:
        return "tachycardia"
    if rmssd / rr.mean() > 0.25:
        return "irregular"
    return "normal"


def ecg_clean(ecg, fs: float, mains_hz: float = 50.0):
    """Baseline-wander + mains removal
    (biomedical_signal_processor.rs): DC-blocking high-pass plus a
    mains notch."""
    x = jnp.asarray(ecg, REAL_DTYPE)
    y, _ = _filters.dc_blocker(x, alpha=1.0 - 2.0 * np.pi * 0.5 / fs)
    # notch: subtract the Goertzel-estimated mains component
    n = y.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE) / fs
    c = jnp.cos(2 * np.pi * mains_hz * t)
    s = jnp.sin(2 * np.pi * mains_hz * t)
    a = 2.0 * jnp.mean(y * c)
    b = 2.0 * jnp.mean(y * s)
    return y - a * c - b * s


# ------------------------------------------------------------- EEG


_EEG_BANDS = {"delta": (0.5, 4.0), "theta": (4.0, 8.0),
              "alpha": (8.0, 13.0), "beta": (13.0, 30.0),
              "gamma": (30.0, 45.0)}


def eeg_band_powers(eeg, fs: float):
    """Canonical EEG band powers (electroencephalogram_bci.rs feature
    stage): one rFFT, masked band sums. Returns dict name→power."""
    x = jnp.asarray(eeg, REAL_DTYPE)
    n = x.shape[0]
    spec = jnp.abs(jnp.fft.rfft(x * jnp.asarray(np.hanning(n),
                                                REAL_DTYPE))) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    out = {}
    for name, (lo, hi) in _EEG_BANDS.items():
        sel = jnp.asarray((freqs >= lo) & (freqs < hi))
        out[name] = jnp.sum(jnp.where(sel, spec, 0.0))
    return out


def bci_alpha_blocking(eeg_eyes_closed, eeg_eyes_open, fs: float):
    """Simple SSVEP/alpha-blocking BCI decision
    (electroencephalogram_bci.rs): the alpha-power ratio between the
    two states."""
    a_c = eeg_band_powers(eeg_eyes_closed, fs)["alpha"]
    a_o = eeg_band_powers(eeg_eyes_open, fs)["alpha"]
    return a_c / jnp.maximum(a_o, 1e-12)


# ------------------------------------------------------------- EMG


def emg_envelope(emg, fs: float, cutoff_hz: float = 6.0):
    """Rectify + lowpass EMG envelope (electromyography_
    decomposition.rs front end)."""
    x = jnp.abs(jnp.asarray(emg, REAL_DTYPE))
    lp = _filters.design_lowpass(int(fs // 4) | 1, cutoff_hz, fs)
    return _filters.fir_apply(jnp.asarray(lp, REAL_DTYPE), x)


def emg_decompose_mu(emg, fs: float, n_units: int = 2,
                     threshold_sigma: float = 4.0,
                     max_peaks: int = 128):
    """Template-free motor-unit firing extraction
    (electromyography_decomposition.rs): peak detection + 2-means
    amplitude clustering into units. jit-safe fixed-capacity form
    (VERDICT r4 #6): returns `(firings[K] int32, unit[K] int32,
    valid[K])` — firing sample indices in time order, each labeled
    with its motor-unit cluster (units ordered by ascending centroid
    amplitude; unit = -1 on masked slots). K = max_peaks."""
    from r4w_tpu.ops.events import masked_indices, refractory_trigger

    x = jnp.asarray(emg, REAL_DTYPE)
    a = jnp.abs(x)
    n = a.shape[0]
    sd = jnp.median(a) * 1.4826
    refractory = max(1, int(0.005 * fs))
    fires, valid = masked_indices(
        refractory_trigger(a > threshold_sigma * sd, refractory),
        max_peaks)
    pad = jnp.concatenate([a, jnp.full(refractory + 1, -jnp.inf,
                                       REAL_DTYPE)])
    ks = fires + jnp.argmax(
        pad[fires[:, None] + jnp.arange(refractory)[None, :]], axis=1)
    amps = a[jnp.minimum(ks, n - 1)]
    # masked 1-D k-means on amplitude, fixed 20 iterations
    amps_q = jnp.where(valid, amps, jnp.nan)
    cents = jnp.nanquantile(amps_q, jnp.linspace(0.2, 0.8, n_units))
    amps_d = jnp.where(valid, amps, jnp.inf)
    for _ in range(20):
        assign = jnp.argmin(jnp.abs(amps_d[:, None] - cents[None, :]),
                            axis=1)
        onehot = (assign[:, None] == jnp.arange(n_units)[None, :]
                  ) & valid[:, None]
        cnt = jnp.sum(onehot, axis=0)
        s = jnp.sum(jnp.where(onehot, amps[:, None], 0.0), axis=0)
        cents = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), cents)
    assign = jnp.argmin(jnp.abs(amps_d[:, None] - cents[None, :]),
                        axis=1)
    return (jnp.where(valid, ks, 0).astype(jnp.int32),
            jnp.where(valid, assign, -1).astype(jnp.int32), valid)


def emg_gesture_features(emg_channels, fs: float):
    """Per-channel RMS + zero-crossing + waveform-length features
    (emg_gesture_decoder.rs). emg_channels: (C, N)."""
    x = jnp.asarray(emg_channels, REAL_DTYPE)
    rms = jnp.sqrt(jnp.mean(x ** 2, axis=-1))
    zc = jnp.mean((x[:, 1:] * x[:, :-1] < 0).astype(REAL_DTYPE),
                  axis=-1)
    wl = jnp.mean(jnp.abs(jnp.diff(x, axis=-1)), axis=-1)
    del fs
    return jnp.concatenate([rms, zc, wl])


def gesture_classify_nn(features, templates: dict):
    """Nearest-template gesture decision (emg_gesture_decoder.rs)."""
    f = np.asarray(features, float)
    best, best_d = None, np.inf
    for name, t in templates.items():
        d = np.linalg.norm(f - np.asarray(t, float))
        if d < best_d:
            best, best_d = name, d
    return best


# -------------------------------------------------------- bioacoustic


def species_features(audio, fs: float):
    """Call features for species classification
    (bioacoustic_species_classifier.rs): peak frequency, bandwidth,
    syllable rate."""
    x = jnp.asarray(audio, REAL_DTYPE)
    n = x.shape[0]
    spec = jnp.abs(jnp.fft.rfft(
        x * jnp.asarray(np.hanning(n), REAL_DTYPE))) ** 2
    f = jnp.asarray(np.fft.rfftfreq(n, 1.0 / fs), REAL_DTYPE)
    pk = f[jnp.argmax(spec)]
    csum = jnp.cumsum(spec) / jnp.maximum(jnp.sum(spec), 1e-12)
    bw = (f[jnp.searchsorted(csum, 0.95)]
          - f[jnp.searchsorted(csum, 0.05)])
    env = jnp.abs(x)
    k = max(1, int(0.01 * fs))
    env = jnp.convolve(env, jnp.ones(k) / k, mode="same")
    thr = 0.3 * jnp.max(env)
    syl = jnp.sum(jnp.diff((env > thr).astype(jnp.int32)) == 1)
    rate = syl / (n / fs)
    return {"peak_hz": pk, "bandwidth_hz": bw,
            "syllable_rate_hz": rate}


BLOCKS = {
    "ecg_qrs_detector": ("qrs_detect", "measurement",
                         "Pan-Tompkins QRS (ecg_qrs_detector.rs)",
                         ("fs",)),
    "ecg_arrhythmia_classifier": ("arrhythmia_classify", "measurement",
                                  "rhythm rules "
                                  "(bio_ecg_arrhythmia_classifier.rs)",
                                  ("fs",)),
    "biomedical_signal_processor": ("ecg_clean", "filter",
                                    "baseline + mains removal "
                                    "(biomedical_signal_processor.rs)",
                                    ("fs", "mains_hz")),
    "eeg_band_powers": ("eeg_band_powers", "measurement",
                        "delta..gamma powers "
                        "(electroencephalogram_bci.rs)", ("fs",)),
    "eeg_bci": ("bci_alpha_blocking", "measurement",
                "alpha-blocking ratio (electroencephalogram_bci.rs)",
                ("fs",)),
    "emg_decomposition": ("emg_decompose_mu", "measurement",
                          "motor-unit firing extraction "
                          "(electromyography_decomposition.rs)",
                          ("fs", "n_units")),
    "emg_gesture_decoder": ("emg_gesture_features", "measurement",
                            "RMS/ZC/WL features + nearest template "
                            "(emg_gesture_decoder.rs)", ("fs",)),
    "bioacoustic_species_classifier": (
        "species_features", "measurement",
        "call features (bioacoustic_species_classifier.rs)", ("fs",)),
}
