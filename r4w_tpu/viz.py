"""Plot gallery (reference gallery/*.png + r4w-gui educational views
re-design: constellation/spectrum/waterfall/eye/BER figures as PNGs).

Styling follows the dataviz method: color is assigned by job —
categorical series use a fixed-order validated palette (I=blue,
Q=orange, ...), magnitude (waterfall/persistence) uses a single-hue
light-to-dark sequential ramp, grids/axes are recessive, text wears
text colors, one axis per chart.
"""

from __future__ import annotations

import os

import numpy as np

# fixed-order categorical palette (validated; light surface)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e6e5e2"
SEQUENTIAL = "Blues"  # one hue, light -> dark


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _style(ax):
    ax.set_facecolor(SURFACE)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(TEXT_2)
    ax.tick_params(colors=TEXT_2, labelsize=8)
    ax.xaxis.label.set_color(TEXT_2)
    ax.yaxis.label.set_color(TEXT_2)
    ax.title.set_color(TEXT)


def _save(fig, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.patch.set_facecolor(SURFACE)
    fig.savefig(path, dpi=110, bbox_inches="tight",
                facecolor=SURFACE)
    import matplotlib.pyplot as plt

    plt.close(fig)


def plot_constellation(symbols, path: str, title: str = "Constellation"):
    """Scatter of IQ decision points (gallery/waveforms constellations)."""
    plt = _mpl()
    s = np.asarray(symbols).reshape(-1)
    fig, ax = plt.subplots(figsize=(4, 4))
    _style(ax)
    ax.scatter(s.real, s.imag, s=14, color=SERIES[0], alpha=0.7,
               edgecolors="none")
    ax.axhline(0, color=GRID, lw=0.8)
    ax.axvline(0, color=GRID, lw=0.8)
    ax.set_title(title)
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    ax.set_aspect("equal")
    _save(fig, path)
    return path


def plot_time(iq, path: str, title: str = "Waveform",
              sample_rate: float | None = None, max_samples: int = 2000):
    """I/Q traces vs time (GUI modulation view)."""
    plt = _mpl()
    x = np.asarray(iq).reshape(-1)[:max_samples]
    t = np.arange(len(x))
    xlabel = "sample"
    if sample_rate:
        t = t / sample_rate * 1e3
        xlabel = "time (ms)"
    fig, ax = plt.subplots(figsize=(7, 2.8))
    _style(ax)
    ax.plot(t, x.real, color=SERIES[0], lw=1.2, label="I")
    if np.iscomplexobj(x):
        ax.plot(t, x.imag, color=SERIES[1], lw=1.2, label="Q")
        leg = ax.legend(loc="upper right", frameon=False, fontsize=8)
        for txt in leg.get_texts():
            txt.set_color(TEXT_2)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    _save(fig, path)
    return path


def plot_spectrum(iq, path: str, sample_rate: float = 1.0,
                  nfft: int = 1024, title: str = "Spectrum"):
    """Welch PSD in dB (analysis/spectrum.rs + gallery spectra)."""
    import jax.numpy as jnp

    from r4w_tpu.ops.measure import welch_psd

    plt = _mpl()
    x = np.asarray(iq).reshape(-1)
    nfft = min(nfft, max(64, len(x) // 2))
    psd = np.asarray(welch_psd(jnp.asarray(x), nperseg=nfft,
                               sample_rate=sample_rate))
    db = 10 * np.log10(np.maximum(psd, 1e-20))
    f = np.fft.fftshift(np.fft.fftfreq(nfft, 1.0 / sample_rate))
    fig, ax = plt.subplots(figsize=(7, 2.8))
    _style(ax)
    ax.plot(f / (1e3 if sample_rate > 1 else 1), db, color=SERIES[0],
            lw=1.2)
    ax.set_title(title)
    ax.set_xlabel("frequency (kHz)" if sample_rate > 1 else
                  "frequency (cycles/sample)")
    ax.set_ylabel("PSD (dB)")
    _save(fig, path)
    return path


def plot_waterfall(iq, path: str, sample_rate: float = 1.0,
                   nfft: int = 256, title: str = "Waterfall"):
    """Spectrogram, single-hue sequential ramp (GUI streaming view)."""
    plt = _mpl()
    x = np.asarray(iq).reshape(-1)
    if len(x) < 2 * nfft:  # short bursts: shrink the FFT, keep >=2 frames
        nfft = max(16, 1 << int(np.log2(max(len(x) // 2, 16))))
        if len(x) < nfft:
            x = np.pad(x, (0, nfft - len(x)))
    hop = nfft // 2
    n_frames = max(1, (len(x) - nfft) // hop + 1)
    frames = np.lib.stride_tricks.sliding_window_view(
        x, nfft)[::hop][:n_frames]
    spec = np.fft.fftshift(np.fft.fft(frames * np.hanning(nfft), axis=-1),
                           axes=-1)
    db = 20 * np.log10(np.maximum(np.abs(spec), 1e-12))
    fig, ax = plt.subplots(figsize=(6, 3.4))
    _style(ax)
    ax.grid(False)
    vmax = float(db.max())
    im = ax.imshow(db, aspect="auto", origin="lower", cmap=SEQUENTIAL,
                   vmin=vmax - 60.0, vmax=vmax,
                   extent=[-sample_rate / 2, sample_rate / 2, 0,
                           n_frames])
    cb = fig.colorbar(im, ax=ax, pad=0.02)
    cb.set_label("dB", color=TEXT_2, fontsize=8)
    cb.ax.tick_params(colors=TEXT_2, labelsize=7)
    ax.set_title(title)
    ax.set_xlabel("frequency")
    ax.set_ylabel("frame")
    _save(fig, path)
    return path


def plot_eye(iq, sps: int, path: str, title: str = "Eye diagram",
             n_traces: int = 80):
    """Overlaid 2-symbol traces (eye_diagram.rs / GUI demod view)."""
    plt = _mpl()
    x = np.asarray(iq).reshape(-1).real
    span = 2 * sps
    n = min(n_traces, (len(x) - span) // sps)
    fig, ax = plt.subplots(figsize=(4.6, 3))
    _style(ax)
    t = np.arange(span) / sps
    for k in range(n):
        ax.plot(t, x[k * sps:k * sps + span], color=SERIES[0], lw=0.8,
                alpha=0.25)
    ax.set_title(title)
    ax.set_xlabel("symbol time")
    _save(fig, path)
    return path


def plot_ber_curves(snrs_db, curves: dict, path: str,
                    title: str = "BER vs SNR"):
    """Semilog BER curves, fixed-order categorical series + direct
    labels (ber_tool.rs / waveform_comparison view)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5.4, 3.6))
    _style(ax)
    for i, (name, ber) in enumerate(curves.items()):
        c = SERIES[i % len(SERIES)]
        ber = np.maximum(np.asarray(ber, float), 1e-7)
        ax.semilogy(snrs_db, ber, color=c, lw=1.6, marker="o", ms=3.5,
                    label=name)
        ax.annotate(name, (snrs_db[-1], ber[-1]), textcoords="offset points",
                    xytext=(4, 0), color=c, fontsize=8)
    ax.set_title(title)
    ax.set_xlabel("SNR (dB)")
    ax.set_ylabel("BER")
    if len(curves) >= 2:
        leg = ax.legend(loc="lower left", frameon=False, fontsize=8)
        for txt in leg.get_texts():
            txt.set_color(TEXT_2)
    _save(fig, path)
    return path


def generate_gallery(outdir: str, names=None, sample_rate: float = 48000.0,
                     payload: bytes = b"r4w"):
    """Regenerate the reference's gallery/ PNG set for our waveforms."""
    from r4w_tpu.core.hostio import to_host
    from r4w_tpu.waveforms import create_waveform, list_waveforms

    made = []
    for name in (names or list_waveforms()):
        wf = create_waveform(name, sample_rate)
        if wf is None:
            continue
        try:
            iq = to_host(wf.modulate(payload))
        except Exception:
            continue
        base = name.lower().replace("/", "-").replace(" ", "_")
        d = os.path.join(outdir, "waveforms")
        made.append(plot_time(iq, os.path.join(d, f"{base}_time.png"),
                              f"{name} waveform", sample_rate))
        made.append(plot_spectrum(iq, os.path.join(
            d, f"{base}_spectrum.png"), sample_rate, title=f"{name} PSD"))
        made.append(plot_waterfall(iq, os.path.join(
            d, f"{base}_waterfall.png"), sample_rate,
            title=f"{name} waterfall"))
    return made


def generate_channel_gallery(outdir: str, sample_rate: float = 48000.0):
    """Channel-impairment figures (gallery/channels)."""
    import jax

    from r4w_tpu.channel import awgn, rayleigh
    from r4w_tpu.core.hostio import to_host
    from r4w_tpu.waveforms import create_waveform

    wf = create_waveform("QPSK", sample_rate)
    tx = wf.modulate(b"gallery-payload")
    made = []
    for label, rx in (
        ("clean", tx),
        ("awgn_10db", awgn(jax.random.key(0), tx, 10.0)),
        ("rayleigh", awgn(jax.random.key(2),
                          rayleigh(jax.random.key(1), tx), 15.0)),
    ):
        iq = to_host(rx)
        d = os.path.join(outdir, "channels")
        made.append(plot_waterfall(iq, os.path.join(
            d, f"qpsk_{label}_waterfall.png"), sample_rate,
            title=f"QPSK {label}"))
        made.append(plot_time(iq, os.path.join(d, f"qpsk_{label}_time.png"),
                              f"QPSK {label}", sample_rate))
    return made
