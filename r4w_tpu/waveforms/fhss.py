"""FHSS waveform (waveform/fhss.rs re-design; the anti-jam variant
— adaptive channel avoidance — re-designs fhss_antijam.rs and the
flat anti_jam.rs excision block).

The hop schedule is a precomputed LFSR-driven channel sequence; the whole
burst is synthesized as one (n_hops, samples_per_hop) array: per-sample
frequency = hop offset + per-symbol modulation deviation, evaluated in a
single vector expression (the reference walks hop→symbol→sample loops,
fhss.rs:288-616).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.ops import spreading
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.linear_mod import pack_demod_bits


@functools.lru_cache(maxsize=None)
def hop_sequence(num_channels: int, seed: int) -> tuple[int, ...]:
    """Pseudo-random hop channel sequence (fhss.rs:155-185): degree-n LFSR,
    n bits per hop, modulo num_channels."""
    degree = max(5, min(10, int(np.ceil(np.log2(num_channels)))))
    poly = spreading.MSEQ_POLY[degree]
    period = (1 << degree) - 1
    bits = spreading.lfsr_bits(degree, poly, seed % (1 << degree) or 1,
                               length=period * degree)
    seq = []
    for i in range(period):
        val = 0
        for b in bits[i * degree : (i + 1) * degree]:
            val = (val << 1) | int(b)
        seq.append(val % num_channels)
    return tuple(seq)


@dataclasses.dataclass(frozen=True)
class FHSS(Waveform):
    common: CommonParams = CommonParams()
    num_channels: int = 50
    channel_spacing: float = 25_000.0
    hop_rate: float = 100.0
    symbols_per_hop: int = 10
    symbol_rate: float = 1000.0
    hop_pattern: str = "pseudorandom"  # pseudorandom | sequential
    modulation: str = "bfsk"  # bfsk only for now (fhss.rs default)
    deviation: float = 5000.0
    seed: int = 0x12345

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return max(int(self.common.sample_rate / self.symbol_rate), 1)

    def samples_per_hop(self) -> int:
        return int(self.common.sample_rate / self.hop_rate)

    @property
    def bits_per_hop(self) -> int:
        return self.symbols_per_hop  # BFSK: 1 bit/symbol

    def processing_gain_db(self) -> float:
        return 10.0 * np.log10(self.num_channels)

    def total_bandwidth(self) -> float:
        return self.num_channels * self.channel_spacing

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="FHSS", full_name="Frequency Hopping Spread Spectrum",
            description="Carrier hops across channels per a PN schedule",
            complexity=4, bits_per_symbol=1,
            characteristics=(
                f"{self.num_channels} channels × {self.channel_spacing/1e3:.0f} kHz",
                f"{self.hop_rate:.0f} hops/s",
            ),
        )

    def _channels_for(self, n_hops: int) -> np.ndarray:
        if self.hop_pattern == "sequential":
            return np.arange(n_hops) % self.num_channels
        seq = np.asarray(hop_sequence(self.num_channels, self.seed))
        return seq[np.arange(n_hops) % len(seq)]

    def _channel_freq(self, channel: np.ndarray) -> np.ndarray:
        # centered around 0 (fhss.rs:281-285)
        return (channel - self.num_channels / 2.0) * self.channel_spacing

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bph = self.bits_per_hop
        n_hops = max(1, -(-bits.size // bph))
        n_data = bits.size
        bits = np.pad(bits, (0, n_hops * bph - n_data))
        bits_h = jnp.asarray(bits).reshape(n_hops, bph)

        sps = self.samples_per_symbol()
        hop_len = self.samples_per_hop()
        freqs = jnp.asarray(
            self._channel_freq(self._channels_for(n_hops)), REAL_DTYPE
        )  # (H,)
        # per-symbol frequency: bit 0 -> +dev, bit 1 -> -dev (fhss.rs:299)
        f_sym = freqs[:, None] + self.deviation * (1.0 - 2.0 * bits_h)  # (H,B)
        f_sample = jnp.repeat(f_sym, sps, axis=-1)  # (H, B*sps)
        used = f_sample.shape[-1]
        t = jnp.arange(used, dtype=REAL_DTYPE) / self.common.sample_rate
        phase = 2.0 * jnp.pi * f_sample * t[None, :]
        burst = self.common.amplitude * cis(phase)
        # silence-pad symbols beyond the data (fhss.rs:608-612) and pad the
        # dwell to samples_per_hop
        sym_idx = jnp.arange(bph * sps) // sps + jnp.arange(n_hops)[:, None] * bph
        active = (sym_idx < n_data).astype(REAL_DTYPE)
        burst = burst * active
        if used < hop_len:
            burst = jnp.pad(burst, ((0, 0), (0, hop_len - used)))
        return burst.reshape(-1).astype(IQ_DTYPE)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        hop_len = self.samples_per_hop()
        sps = self.samples_per_symbol()
        n_hops = samples.shape[-1] // hop_len
        hops = samples[..., : n_hops * hop_len].reshape(
            *samples.shape[:-1], n_hops, hop_len
        )
        used = self.bits_per_hop * sps
        # mix down by the synchronized hop carrier on the SAME time grid the
        # transmitter used (t relative to hop start) — robust even when the
        # default config is intentionally aliased (625 kHz offsets @ 125 kS/s)
        offsets = jnp.asarray(
            self._channel_freq(self._channels_for(n_hops)), REAL_DTYPE
        )
        t = jnp.arange(used, dtype=REAL_DTYPE) / self.common.sample_rate
        carrier = cis(
            -2.0 * jnp.pi * offsets[:, None] * t[None, :]
        ).astype(IQ_DTYPE)
        base = hops[..., :used] * carrier
        chunks = base.reshape(*hops.shape[:-1], self.bits_per_hop, sps)
        # residual per-symbol frequency: +dev -> bit 0, -dev -> bit 1
        d = chunks[..., 1:] * jnp.conj(chunks[..., :-1])
        freq = (
            jnp.angle(jnp.sum(d, axis=-1))
            * self.common.sample_rate / (2.0 * jnp.pi)
        )  # (..., H, B)
        bits = (freq < 0).astype(SYMBOL_DTYPE)
        flat = bits.reshape(*bits.shape[:-2], -1)
        return DemodResult(
            bits=pack_demod_bits(flat),
            symbols=flat,
            metadata={
                "processing_gain_db": self.processing_gain_db(),
                "total_bandwidth": self.total_bandwidth(),
                "hop_rate": self.hop_rate,
                "hops_processed": float(n_hops),
            },
        )

    def hop_schedule(self, n_hops: int) -> np.ndarray:
        """(n_hops,) channel indices — exposed for anti-jam/GUI use."""
        return self._channels_for(n_hops)


@register_waveform("FHSS")
def _fhss(sample_rate: float) -> FHSS:
    return FHSS(common=CommonParams(sample_rate=sample_rate))


@dataclasses.dataclass(frozen=True)
class FhssAntiJam(FHSS):
    """Anti-jam FHSS variant (fhss_antijam.rs:499): hops avoid a set of
    known-jammed channels by remapping onto the clean subset."""

    jammed_channels: tuple[int, ...] = ()

    def _channels_for(self, n_hops: int) -> np.ndarray:
        raw = super()._channels_for(n_hops)
        if not self.jammed_channels:
            return raw
        clean = np.array(
            [c for c in range(self.num_channels)
             if c not in set(self.jammed_channels)]
        )
        if len(clean) == 0:
            raise ValueError("all channels jammed")
        return clean[raw % len(clean)]

    def info(self) -> WaveformInfo:
        base = super().info()
        return WaveformInfo(
            name="FHSS-AntiJam", full_name="Anti-jam FHSS",
            description="FHSS with jammed-channel avoidance",
            complexity=4, bits_per_symbol=1,
            characteristics=base.characteristics + (
                f"{len(self.jammed_channels)} channels excluded",
            ),
        )


@register_waveform("FHSS-AntiJam", aliases=("FHSSANTIJAM",))
def _fhss_antijam(sample_rate: float) -> FhssAntiJam:
    return FhssAntiJam(common=CommonParams(sample_rate=sample_rate))
