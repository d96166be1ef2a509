"""PCPS acquisition, batched over PRN × Doppler × code phase.

Re-design of waveform/gnss/acquisition.rs:104-199: the reference loops
Doppler bins per PRN with a serial FFT each. Here the entire
(PRN × Doppler) grid is ONE batched computation:

    mixed[p, d, n]   = x[n]·e^{-j2πf_d t_n}           (outer product)
    CORR[p, d, :]    = IFFT( FFT(mixed) · conj(FFT(code_p)) )

XLA maps the batched FFTs and the broadcast multiply straight onto the
TPU — millions of correlations per call (the 'batched GNSS Mcorr/s'
headline in BASELINE.json).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, next_pow2


class AcquisitionResult(NamedTuple):
    prn: jax.Array  # (P,) PRN ids
    detected: jax.Array  # (P,) bool
    code_phase: jax.Array  # (P,) samples
    doppler_hz: jax.Array  # (P,)
    peak_metric: jax.Array  # (P,) peak/noise-floor
    cn0_estimate: jax.Array  # (P,) dB-Hz (valid where detected)


@dataclasses.dataclass(frozen=True)
class PcpsConfig:
    """Mirror of PcpsAcquisition settings (acquisition.rs:60-95)."""

    doppler_max_hz: float = 5000.0
    doppler_step_hz: float = 500.0
    threshold: float = 2.5
    coherent_periods: int = 1
    # Sub-sample replica phases: a worst-case half-sample code misalignment
    # costs ~3.7 dB on nearest-sampled CBOC at 5 MS/s. Supply codes of
    # shape (P, S, L) — S replicas gathered at sub-sample offsets (see
    # `sampled_code_bank`) — and the grid takes the best sub-phase.
    subsample_phases: int = 4
    # Deviation from acquisition.rs: the noise grid max follows
    # max-of-gamma(K) statistics, so a fixed peak/mean threshold
    # false-alarms on any realistic grid. With auto_threshold the
    # effective threshold is threshold + A(K, N) where
    # A = 1 + 2·sqrt(ln N / K) + 2·ln N / K (Gumbel-ish upper bound).
    auto_threshold: bool = True
    # FFT strategy: "exact" = circular correlation at nfft=L (always
    # correct); "pow2" = two-period linear correlation at
    # nfft=next_pow2(2L) — every lag is a full L-term sum (exact, no
    # wrap) but needs >=2 code periods of input, spends K-1 instead of
    # K non-coherent sums, and inflates the correlation tensor by
    # next_pow2(2L)/L (3.3x at E1C's L=20000 — the big-grid memory
    # limit, not FLOPs, usually binds). Measured on the tunneled v5e
    # both run ~25 ms per 2-PRN x 21-Doppler E1C-scale grid, so "auto"
    # resolves to "exact"; opt into "pow2" on compute-bound hardware
    # with memory headroom and awkward (prime-ish) L.
    fft_mode: str = "auto"

    def noise_max_estimate(self, total_bins: int) -> float:
        """Mean-normalized (1-1/N) quantile of the max of N Gamma(K)
        noise bins, via the Wilson-Hilferty chi-square approximation."""
        k = max(1, self.coherent_periods)
        ln_n = float(np.log(max(total_bins, 2)))
        z = np.sqrt(2.0 * ln_n)  # ~ Phi^-1(1 - 1/N)
        wh = (1.0 - 1.0 / (9.0 * k) + z / (3.0 * np.sqrt(k))) ** 3
        return float(wh)


def doppler_bins(cfg: PcpsConfig) -> np.ndarray:
    n = int(2 * cfg.doppler_max_hz / cfg.doppler_step_hz) + 1
    return (-cfg.doppler_max_hz
            + np.arange(n) * cfg.doppler_step_hz).astype(np.float32)


def pcps_grid(x, codes, sample_rate, cfg: PcpsConfig = PcpsConfig()):
    """Full correlation surface |corr|² of shape (P, D, L).

    x: (N,) complex input; codes: (P, L) ±1 sampled replicas (L samples
    per code period, same rate as x). With cfg.coherent_periods=K and
    N ≥ K·L, K period slices are correlated as one extra batch axis and
    their powers summed (non-coherent integration — robust to residual
    Doppler, unlike coherent summation over long spans).
    """
    codes = jnp.asarray(codes, REAL_DTYPE)
    if codes.ndim == 2:
        codes = codes[:, None, :]  # (P, S=1, L)
    p, s, l = codes.shape
    x = jnp.asarray(x, IQ_DTYPE)
    k = max(1, min(cfg.coherent_periods, x.shape[-1] // l))
    mode = cfg.fft_mode
    if mode == "auto":
        mode = "exact"  # see PcpsConfig.fft_mode: memory binds first
    if mode == "pow2" and k >= 2:
        # Two-period linear correlation: slice i covers samples
        # [i·L, i·L + 2L); c[tau] = sum_m x[iL+tau+m]·code[m] is a full
        # L-term sum for every tau in [0, L) with nfft >= 2L (no wrap
        # because the zero-padded code kills indices >= L). Exact.
        k_slices = k - 1
        nfft = 1 << int(np.ceil(np.log2(2 * l)))
        idx = (jnp.arange(k_slices)[:, None] * l
               + jnp.arange(2 * l)[None, :])
        xs = x[..., : k * l][idx]  # (K-1, 2L)
        t = jnp.arange(2 * l, dtype=REAL_DTYPE) / sample_rate
    else:
        # Exact-length FFT: the code is L-periodic, so circular
        # correlation at period L is the correct operation. (The
        # reference zero-pads to the next power of two,
        # acquisition.rs:64 — harmless for L=1023→1024 but badly
        # aliased for L=20000→32768, killing peaks at lags > nfft-L.)
        k_slices = k
        nfft = l
        xs = x[..., : k * l].reshape(k, l)
        t = jnp.arange(l, dtype=REAL_DTYPE) / sample_rate
    dops = jnp.asarray(doppler_bins(cfg))
    # carrier wipeoff for every Doppler bin at once. Per-slice carrier
    # start phases differ but only add a constant rotation per slice,
    # which |·|² discards.
    carriers = cis(
        -2 * jnp.pi * (dops[:, None] * t[None, :]).astype(REAL_DTYPE)
    ).astype(IQ_DTYPE)
    mixed = xs[:, None, :] * carriers[None, :, :]  # (K', D, W)
    mixed_fft = jnp.fft.fft(mixed, n=nfft, axis=-1)  # (K', D, F)
    code_fft = jnp.conj(
        jnp.fft.fft(codes.astype(IQ_DTYPE), n=nfft, axis=-1)
    )  # (P, S, F)
    corr = jnp.fft.ifft(
        mixed_fft[None, None, :, :, :]
        * code_fft[:, :, None, None, :],
        axis=-1,
    )  # (P, S, K', D, F)
    power = jnp.sum(corr.real**2 + corr.imag**2, axis=2)  # (P, S, D, F)
    power = jnp.max(power, axis=1)  # best sub-phase replica: (P, D, F)
    return power[..., :l]


def acquire(x, codes, prns, sample_rate, cfg: PcpsConfig = PcpsConfig()
            ) -> AcquisitionResult:
    """Batched PCPS for all PRNs at once (acquisition.rs:104 `acquire`)."""
    n_subphases = np.shape(codes)[1] if np.ndim(codes) == 3 else 1
    power = pcps_grid(x, codes, sample_rate, cfg)  # (P, D, L)
    p, d, l = power.shape
    flat = power.reshape(p, -1)
    peak = jnp.max(flat, axis=-1)
    arg = jnp.argmax(flat, axis=-1)
    dop_idx = arg // l
    phase = arg % l
    noise_floor = (jnp.sum(flat, axis=-1) - peak) / (d * l - 1)
    k = max(1, cfg.coherent_periods)
    metric = peak / jnp.maximum(noise_floor, 1e-30)
    eff_threshold = cfg.threshold + (
        cfg.noise_max_estimate(d * l * n_subphases)
        if cfg.auto_threshold else 0.0
    )
    detected = metric > eff_threshold
    code_period = l / sample_rate
    cn0 = 10.0 * jnp.log10(jnp.maximum(metric / code_period, 1e-12))
    dops = jnp.asarray(doppler_bins(cfg))
    return AcquisitionResult(
        prn=jnp.asarray(prns, jnp.int32),
        detected=detected,
        code_phase=phase.astype(REAL_DTYPE),
        doppler_hz=dops[dop_idx],
        peak_metric=metric.astype(REAL_DTYPE),
        cn0_estimate=cn0.astype(REAL_DTYPE),
    )


def acquire_jit(x, codes, prns, sample_rate,
                cfg: PcpsConfig = PcpsConfig()) -> AcquisitionResult:
    fn = jax.jit(
        lambda xx, cc: acquire(xx, cc, prns, sample_rate, cfg),
    )
    return fn(x, codes)


def sampled_code_bank(waveforms, waveform_rate, sample_rate, n_samples,
                      n_subphases: int = 4) -> np.ndarray:
    """(P, S, L) replica bank: each PRN's spread waveform nearest-sampled
    at S sub-sample phase offsets — matching how a delayed signal is
    actually gathered, which a band-limited fractional shift cannot
    (nearest-neighbour sampling of a non-band-limited BOC waveform).

    waveforms: sequence of per-PRN spread chip waveforms (±1-ish arrays at
    waveform_rate, e.g. CBOC sub-chips at 12.276 MHz).
    """
    out = []
    ratio = waveform_rate / sample_rate
    n = np.arange(n_samples)
    for w in waveforms:
        lw = len(w)
        rows = []
        for sp in range(n_subphases):
            idx = np.floor((n + sp / n_subphases) * ratio).astype(np.int64) % lw
            rows.append(w[idx])
        out.append(np.stack(rows))
    return np.stack(out).astype(np.float32)
