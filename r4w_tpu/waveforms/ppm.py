"""PPM + ADS-B pulse waveform (waveform/ppm.rs re-design).

Standard PPM places a quarter-symbol pulse early (bit 1) or late (bit 0);
ADS-B uses 1 µs Manchester-style pulses with the 8 µs Mode-S preamble.
All pulse placement is done with one boolean mask over (S, sps) — no
per-sample loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.linear_mod import pack_demod_bits


@dataclasses.dataclass(frozen=True)
class PPM(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 1000.0
    variant: str = "standard"  # standard | adsb

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        if self.symbol_rate <= 0:
            return 1
        return max(int(self.common.sample_rate / self.symbol_rate), 1)

    def info(self) -> WaveformInfo:
        name = "ADS-B" if self.variant == "adsb" else "PPM"
        return WaveformInfo(
            name=name, full_name="Pulse Position Modulation",
            description="Data in the temporal position of pulses",
            complexity=2, bits_per_symbol=1,
            characteristics=("Non-coherent energy detection",),
        )

    # -- pulse mask construction ------------------------------------------
    def _standard_masks(self):
        sps = self.samples_per_symbol()
        w = sps // 4
        idx = np.arange(sps)
        one = ((idx >= sps // 4) & (idx < sps // 4 + w)).astype(np.float32)
        zero_pos = sps * 3 // 4 - w
        zero = ((idx >= zero_pos) & (idx < zero_pos + w)).astype(np.float32)
        return one, zero

    def _adsb_masks(self):
        sps = self.samples_per_symbol()
        half = sps // 2
        idx = np.arange(sps)
        one = (idx < half).astype(np.float32)  # high-then-low
        zero = (idx >= half).astype(np.float32)  # low-then-high
        return one, zero

    def adsb_preamble(self) -> jax.Array:
        """8 µs Mode-S preamble: 0.5 µs pulses at 0, 1, 3.5, 4.5 µs."""
        sps = self.samples_per_symbol()
        half = sps // 2
        n = sps * 8
        mask = np.zeros(n, np.float32)
        for start_us in (0.0, 1.0, 3.5, 4.5):
            s = int(start_us * sps)
            mask[s : s + half] = 1.0
        return (self.common.amplitude * jnp.asarray(mask)).astype(IQ_DTYPE)

    def modulate(self, data) -> jax.Array:
        bits = jnp.asarray(data_to_bits(data))
        one, zero = (
            self._adsb_masks() if self.variant == "adsb"
            else self._standard_masks()
        )
        one = jnp.asarray(one)
        zero = jnp.asarray(zero)
        b = bits[..., None].astype(REAL_DTYPE)  # (S, 1)
        pulses = b * one + (1.0 - b) * zero  # (S, sps)
        body = (self.common.amplitude * pulses.reshape(*bits.shape[:-1], -1)
                ).astype(IQ_DTYPE)
        if self.variant == "adsb":
            return jnp.concatenate([self.adsb_preamble(), body])
        return body

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        sps = self.samples_per_symbol()
        if self.variant == "adsb":
            n_pre = sps * 8
            if samples.shape[-1] > n_pre and (
                (samples.shape[-1] - n_pre) % sps == 0
            ):
                samples = samples[..., n_pre:]
        s = samples.shape[-1] // sps
        chunks = samples[..., : s * sps].reshape(*samples.shape[:-1], s, sps)
        power = chunks.real**2 + chunks.imag**2
        first = jnp.sum(power[..., : sps // 2], axis=-1)
        second = jnp.sum(power[..., sps // 2 :], axis=-1)
        bits = (first > second).astype(SYMBOL_DTYPE)
        return DemodResult(bits=pack_demod_bits(bits), symbols=bits)


@register_waveform("PPM")
def _ppm(sample_rate: float) -> PPM:
    return PPM(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=1000.0, variant="standard")


@register_waveform("ADS-B", aliases=("ADSB",))
def _adsb(sample_rate: float) -> PPM:
    # 1 Mbit/s: one bit per microsecond (ppm.rs adsb preset)
    return PPM(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=1_000_000.0, variant="adsb")
