"""LoRa synchronization: preamble detection, CFO estimation, frame
alignment (crates/r4w-core/src/sync.rs re-design).

The reference's per-sample preamble state machine (sync.rs:134) becomes
batched correlation: dechirp every candidate symbol window at once and
look for runs of consistent FFT peaks (upchirp preamble), then locate
the 2.25-downchirp SFD. CFO falls out of the preamble peak's fractional
bin; timing from the peak bin itself.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis

from r4w_tpu.core.fftops import find_peak_interpolated
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE
from r4w_tpu.waveforms.lora import chirp as chirp_mod
from r4w_tpu.waveforms.lora.params import LoRaParams


class SyncResult(NamedTuple):
    detected: jax.Array       # bool
    frame_start: jax.Array    # sample index where the preamble begins
    payload_start: jax.Array  # sample index of the first payload symbol
    cfo_hz: jax.Array         # carrier frequency offset estimate
    preamble_peak_bin: jax.Array


def dechirp_windows(params: LoRaParams, samples: jax.Array,
                    stride: int | None = None):
    """|FFT(window·downchirp)|² for every candidate window.

    Returns (power (W, K), starts (W,)).
    """
    n = params.samples_per_symbol
    stride = stride or n // 4
    x = jnp.asarray(samples, IQ_DTYPE)
    n_win = max((x.shape[-1] - n) // stride + 1, 0)
    starts = jnp.arange(n_win) * stride
    idx = starts[:, None] + jnp.arange(n)[None, :]
    wins = x[idx]  # (W, N)
    down = chirp_mod.base_downchirp(params)
    mixed = wins * down
    if params.oversample > 1:
        mixed = mixed[..., :: params.oversample]
    spec = jnp.fft.fft(mixed, axis=-1)
    return spec.real**2 + spec.imag**2, starts


def detect_preamble(params: LoRaParams, samples: jax.Array,
                    min_symbols: int = 4, threshold: float = 8.0
                    ) -> SyncResult:
    """Find the preamble and estimate CFO/timing (sync.rs:134-320).

    Strategy: windows whose dechirped peak dominates the floor AND agree
    on the peak bin for >= min_symbols consecutive symbol periods mark
    the preamble (all preamble upchirps land on the same bin). The
    common bin gives the combined CFO+timing offset; its fractional part
    (quadratic interpolation) gives the fine CFO.
    """
    n = params.samples_per_symbol
    k = params.chips_per_symbol
    stride = n // 4
    power, starts = dechirp_windows(params, samples, stride)
    if power.shape[0] == 0:
        z = jnp.asarray(0)
        return SyncResult(jnp.asarray(False), z, z, jnp.asarray(0.0), z)
    peak = jnp.max(power, axis=-1)
    avg = jnp.mean(power, axis=-1)
    bins = jnp.argmax(power, axis=-1)
    strong = peak > threshold * jnp.maximum(avg, 1e-30)
    # consecutive full-symbol agreement: window i and i+4 (one symbol
    # later at stride N/4) must hit the same bin
    per_sym = 4
    w = power.shape[0]
    runs = jnp.ones(w, bool)
    for m in range(1, min_symbols):
        shifted_ok = jnp.roll(strong, -per_sym * m) & (
            jnp.roll(bins, -per_sym * m) == bins
        )
        runs = runs & shifted_ok
    runs = runs & strong
    detected = jnp.any(runs)
    first = jnp.argmax(runs)  # first window overlapping the preamble
    # refine: the best-aligned window within the next symbol span
    cand = jnp.clip(first + jnp.arange(per_sym), 0, w - 1)
    best = cand[jnp.argmax(peak[cand])]
    w0 = starts[best]
    # signed up-dechirp bin: b_up ≡ f_bins − τ_chips (mod K)
    pre_bin = bins[best]
    b_up = jnp.where(pre_bin > k // 2, pre_bin - k, pre_bin).astype(
        jnp.int32
    )
    # SFD downchirp, dechirped with the UP chirp: b_down ≡ f_bins + τ_chips.
    # SFD begins (preamble_length + 2) symbols after the frame start.
    x = jnp.asarray(samples, IQ_DTYPE)
    sfd_start = jnp.clip(
        w0 + (params.preamble_length + 2) * n, 0,
        jnp.maximum(x.shape[-1] - n, 0),
    )
    sfd_win = jax.lax.dynamic_slice(x, (sfd_start,), (n,))
    up = chirp_mod.base_upchirp(params)
    mixed_sfd = sfd_win * up
    if params.oversample > 1:
        mixed_sfd = mixed_sfd[:: params.oversample]
    spec_sfd = jnp.fft.fft(mixed_sfd)
    pow_sfd = spec_sfd.real**2 + spec_sfd.imag**2
    sfd_bin = jnp.argmax(pow_sfd).astype(jnp.int32)
    b_down = jnp.where(sfd_bin > k // 2, sfd_bin - k, sfd_bin)
    # separate CFO and timing: f = (b_up + b_down)/2, τ = (b_down − b_up)/2
    f_bins = (b_up + b_down) / 2.0
    tau_chips = (b_down - b_up) / 2.0
    # fine CFO from the interpolated preamble peak fraction
    frac_idx, _ = find_peak_interpolated(
        jnp.sqrt(jnp.maximum(power[best], 0.0)).astype(REAL_DTYPE)[None, :]
    )
    frac = frac_idx[0] - jnp.round(frac_idx[0])
    cfo_hz = (f_bins + frac) * (params.bw_hz / k)
    frame_start = (
        w0 + jnp.round(tau_chips).astype(jnp.int32) * params.oversample
    )
    payload_start = frame_start + params.n_preamble_samples()
    return SyncResult(detected, frame_start, payload_start,
                      cfo_hz.astype(REAL_DTYPE), pre_bin)


def synchronize(params: LoRaParams, samples: jax.Array):
    """Full sync: detect preamble, correct CFO, return payload-aligned
    samples (Synchronizer::synchronize, sync.rs:260).

    Host-side convenience (uses concrete sizes); the heavy window
    correlation is the batched jnp path above.
    """
    import numpy as np

    res = detect_preamble(params, samples)
    if not bool(res.detected):
        return None, res
    x = jnp.asarray(samples, IQ_DTYPE)
    n0 = int(res.payload_start)
    if n0 >= x.shape[-1]:
        return None, res
    t = jnp.arange(x.shape[-1] - n0, dtype=REAL_DTYPE) / params.sample_rate
    corrected = x[n0:] * cis(
        -2 * jnp.pi * (float(res.cfo_hz) * t).astype(REAL_DTYPE)
    )
    # trim to whole symbols
    n = params.samples_per_symbol
    s = corrected.shape[-1] // n
    return corrected[: s * n], res
