"""Military frequency-hopping framework waveforms: SINCGARS, HAVEQUICK,
Link-16.

Re-design of waveform/{sincgars,havequick,link16}/ (trait-split pattern,
README.md:84): the classified pieces — TRANSEC keystream, operational
hop algorithms, crypto — live behind a provider protocol with ONLY
simulator implementations here (seeded PRNG hop patterns, clearly
non-operational). The unclassified PHY (hop timing, per-hop FSK/MSK
modulation, frame structure) is real and batched: the whole burst is a
(hops × dwell) grid like FHSS.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis, zeros_iq
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.fhss import FHSS
from r4w_tpu.waveforms.linear_mod import pack_demod_bits


class HopSequenceProvider(Protocol):
    """Seam for the classified hop algorithm (sincgars/traits.rs)."""

    def hop_channels(self, n_hops: int) -> np.ndarray: ...


@dataclasses.dataclass(frozen=True)
class SimulatorHopProvider:
    """NON-OPERATIONAL training-mode hop pattern: seeded PRNG
    (sincgars/simulator.rs equivalent)."""

    num_channels: int
    seed: int = 0x51C

    def hop_channels(self, n_hops: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        return rng.integers(0, self.num_channels, n_hops)


class _FhFramework(FHSS):
    """Shared framework: FHSS PHY with a pluggable hop provider."""

    provider_seed: int = 0x51C

    def _channels_for(self, n_hops: int) -> np.ndarray:
        return SimulatorHopProvider(
            self.num_channels, self.provider_seed
        ).hop_channels(n_hops)


@dataclasses.dataclass(frozen=True)
class Sincgars(_FhFramework):
    """SINCGARS VHF FH (sincgars/, ~2.5k LoC): 2320 channels 30-88 MHz at
    25 kHz spacing, ~100 hops/s, CPFSK data. Simulator TRANSEC only."""

    common: CommonParams = CommonParams(sample_rate=500_000.0)
    num_channels: int = 64  # baseband window of the 2320-channel set
    channel_spacing: float = 25_000.0 / 4  # scaled into the sample band
    hop_rate: float = 100.0
    symbols_per_hop: int = 160
    symbol_rate: float = 16_000.0
    deviation: float = 6500.0
    provider_seed: int = 0x51C

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="SINCGARS",
            full_name="Single Channel Ground and Airborne Radio System",
            description="VHF FH framework — simulator TRANSEC only",
            complexity=5, bits_per_symbol=1,
            characteristics=("Trait-split: hop algorithm pluggable",
                             "~100 hops/s CPFSK",
                             "TRAINING pattern, not operational"),
        )


@dataclasses.dataclass(frozen=True)
class Havequick(_FhFramework):
    """HAVEQUICK UHF FH (havequick/): 7000 channels 225-400 MHz; WOD/TOD
    seeded dwells. Simulator pattern only."""

    common: CommonParams = CommonParams(sample_rate=500_000.0)
    num_channels: int = 64
    channel_spacing: float = 25_000.0 / 4
    hop_rate: float = 200.0
    symbols_per_hop: int = 40
    symbol_rate: float = 16_000.0
    deviation: float = 6500.0
    provider_seed: int = 0x440

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="HAVEQUICK", full_name="HAVEQUICK II UHF AM/FH radio",
            description="UHF FH framework — simulator WOD/TOD only",
            complexity=5, bits_per_symbol=1,
            characteristics=("Word-of-day seeded dwell pattern (stub)",),
        )


@dataclasses.dataclass(frozen=True)
class Link16(Waveform):
    """Link-16 / JTIDS (link16/, ~2.2k LoC): TDMA slots, 51 hop
    frequencies, MSK pulses, RS(31,15) message coding in the reference.

    Simulator build: one slot = sync pulses + data pulses; each 13 µs
    pulse window holds a 6.4 µs 32-chip MSK burst on a hopped carrier.
    """

    common: CommonParams = CommonParams(sample_rate=5_000_000.0)
    num_freqs: int = 51
    spacing: float = 5_000_000.0 / 64  # scaled 3 MHz grid into band
    chips_per_pulse: int = 32
    chip_rate: float = 5_000_000.0
    provider_seed: int = 0x116

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def samples_per_chip(self) -> int:
        return max(int(self.common.sample_rate / self.chip_rate), 1)

    def samples_per_symbol(self) -> int:
        # one pulse (32 chips) carries one data bit via chip-sequence
        # polarity; pulse window = 2x burst (6.4us on, 6.6us off)
        return self.chips_per_pulse * self.samples_per_chip * 2

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="Link-16", full_name="Link-16 / JTIDS tactical data link",
            description="Hopped MSK pulse bursts — simulator pattern only",
            complexity=5, bits_per_symbol=1,
            characteristics=("51-frequency hop set",
                             "32-chip MSK pulses",
                             "TRANSEC/crypto stubbed (simulator)"),
        )

    def _hop_freqs(self, n_pulses: int) -> np.ndarray:
        rng = np.random.default_rng(self.provider_seed)
        ch = rng.integers(0, self.num_freqs, n_pulses)
        return (ch - self.num_freqs / 2.0) * self.spacing

    def _chip_seq(self) -> np.ndarray:
        rng = np.random.default_rng(self.provider_seed ^ 0xC417)
        return rng.choice([-1.0, 1.0], self.chips_per_pulse).astype(
            np.float32
        )

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        n = len(bits)
        spc = self.samples_per_chip
        burst_len = self.chips_per_pulse * spc
        win = self.samples_per_symbol()
        seq = self._chip_seq()
        freqs = self._hop_freqs(n)
        # MSK: phase ramps ±π/2 per chip
        chips = jnp.asarray(seq)[None, :] * (
            1.0 - 2.0 * jnp.asarray(bits)[:, None]
        )  # (N, 32)
        dphi = jnp.repeat(chips, spc, axis=-1) * (np.pi / 2 / spc)
        phase = jnp.cumsum(dphi, axis=-1)
        t = jnp.arange(burst_len, dtype=REAL_DTYPE) / self.common.sample_rate
        carrier = cis(
            2 * jnp.pi
            * (jnp.asarray(freqs, REAL_DTYPE)[:, None] * t[None, :]).astype(
                REAL_DTYPE
            )
        )
        burst = cis(phase.astype(REAL_DTYPE)) * carrier
        out = zeros_iq((n, win))
        out = out.at[:, :burst_len].set(burst.astype(IQ_DTYPE))
        return (self.common.amplitude * out.reshape(-1)).astype(IQ_DTYPE)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        win = self.samples_per_symbol()
        spc = self.samples_per_chip
        burst_len = self.chips_per_pulse * spc
        n = samples.shape[-1] // win
        if n == 0:
            empty = jnp.zeros(0, SYMBOL_DTYPE)
            return DemodResult(bits=empty, symbols=empty)
        pulses = samples[..., : n * win].reshape(*samples.shape[:-1], n, win)
        freqs = self._hop_freqs(n)
        t = jnp.arange(burst_len, dtype=REAL_DTYPE) / self.common.sample_rate
        carrier = cis(
            -2 * jnp.pi
            * (jnp.asarray(freqs, REAL_DTYPE)[:, None] * t[None, :]).astype(
                REAL_DTYPE
            )
        )
        base = pulses[..., :burst_len] * carrier
        # differential MSK decode: the per-sample phase increments follow
        # repeat(±seq, spc)·π/(2·spc); correlate against the known pattern
        d = base[..., 1:] * jnp.conj(base[..., :-1])
        expected = np.repeat(self._chip_seq(), spc)[1:] * (
            np.pi / (2.0 * spc)
        )
        corr = jnp.einsum(
            "...nk,k->...n", jnp.angle(d),
            jnp.asarray(expected, REAL_DTYPE),
        )
        bits = (corr < 0).astype(SYMBOL_DTYPE)
        return DemodResult(bits=pack_demod_bits(bits), symbols=bits)


@register_waveform("SINCGARS")
def _sincgars(sample_rate: float) -> Sincgars:
    return Sincgars(common=CommonParams(sample_rate=max(sample_rate, 5e5)))


@register_waveform("HAVEQUICK", aliases=("HQ",))
def _havequick(sample_rate: float) -> Havequick:
    return Havequick(common=CommonParams(sample_rate=max(sample_rate, 5e5)))


@register_waveform("Link-16", aliases=("TADILJ", "MIDS", "JTIDS"))
def _link16(sample_rate: float) -> Link16:
    return Link16(common=CommonParams(sample_rate=max(sample_rate, 5e6)))
