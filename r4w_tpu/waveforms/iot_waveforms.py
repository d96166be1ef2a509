"""Zigbee (802.15.4), UWB-IR (802.15.4a), FMCW radar waveforms.

Re-designs of waveform/{zigbee,uwb,fmcw}.rs — batch-first: chip maps and
pulse templates are constant arrays; symbol→samples is gather+reshape.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.ops.coding import bits_to_symbols, symbols_to_bits
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.linear_mod import pack_demod_bits

# ------------------------------------------------------------------ Zigbee

# IEEE 802.15.4 2.4 GHz O-QPSK: symbol 0 chip sequence; symbols 1-7 are
# cyclic left-rotations by 4k chips; 8-15 invert the odd (Q) chips.
_ZB_SEQ0 = np.array(
    [1, 1, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 1,
     0, 1, 0, 1, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 1, 0], np.int8
)


@functools.lru_cache(maxsize=None)
def zigbee_chip_table() -> np.ndarray:
    """(16, 32) chip table (zigbee.rs chip mapping)."""
    table = np.zeros((16, 32), np.int8)
    for s in range(8):
        table[s] = np.roll(_ZB_SEQ0, -4 * s)
    conj = _ZB_SEQ0.copy()
    conj[1::2] ^= 1
    for s in range(8):
        table[8 + s] = np.roll(conj, -4 * s)
    return table


@dataclasses.dataclass(frozen=True)
class Zigbee(Waveform):
    """802.15.4 O-QPSK DSSS: 4-bit symbols → 32 chips, half-sine MSK-like
    shaping with Q offset by half a chip (zigbee.rs)."""

    common: CommonParams = CommonParams(sample_rate=4_000_000.0)
    chip_rate: float = 2_000_000.0

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def samples_per_chip(self) -> int:
        return max(int(self.common.sample_rate / self.chip_rate), 1)

    def samples_per_symbol(self) -> int:
        return 32 * self.samples_per_chip

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="Zigbee", full_name="IEEE 802.15.4 O-QPSK DSSS",
            description="2 Mchip/s O-QPSK with 32-chip PN spreading",
            complexity=4, bits_per_symbol=4,
            characteristics=("16-ary quasi-orthogonal chip map",
                             "Half-sine pulse shaping"),
        )

    def _chip_waveform(self, chips: jax.Array) -> jax.Array:
        """O-QPSK: even chips → I, odd chips → Q delayed half chip, each
        shaped by a half-sine of 2 chip periods."""
        spc = self.samples_per_chip
        c = 1.0 - 2.0 * chips.astype(REAL_DTYPE)  # bit->±1
        even = c[..., 0::2]
        odd = c[..., 1::2]
        half = np.sin(np.pi * np.arange(2 * spc) / (2 * spc)).astype(
            np.float32
        )
        n = c.shape[-1] * spc
        # place each even chip's half-sine at 2k chips, odd at 2k+1
        def lay(vals, offset):
            out = jnp.zeros(vals.shape[:-1] + (n + 2 * spc,), REAL_DTYPE)
            idx = (jnp.arange(vals.shape[-1]) * 2 * spc + offset)
            for j in range(2 * spc):
                out = out.at[..., idx + j].add(vals * half[j])
            return out[..., : n + spc]

        i = lay(even, 0)
        q = lay(odd, spc)
        m = min(i.shape[-1], q.shape[-1])
        return jax.lax.complex(i[..., :m], q[..., :m]).astype(IQ_DTYPE)

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        rem = bits.size % 4
        if rem:
            bits = np.pad(bits, (0, 4 - rem))
        # 802.15.4 maps LSB-first nibbles; we keep MSB-first grouping
        symbols = bits_to_symbols(jnp.asarray(bits), 4)
        chips = jnp.asarray(zigbee_chip_table())[symbols]  # (S, 32)
        return self.common.amplitude * self._chip_waveform(
            chips.reshape(-1)
        )

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        spc = self.samples_per_chip
        n_sym = samples.shape[-1] // self.samples_per_symbol()
        if n_sym == 0:
            empty = jnp.zeros(0, SYMBOL_DTYPE)
            return DemodResult(bits=empty, symbols=empty)
        # chip-rate sampling at half-sine peaks: even chips from I at
        # (2k+0.5)·spc... sample mid-chip
        idx = jnp.arange(n_sym * 32 // 2)
        i_samp = samples.real[..., (idx * 2 * spc + spc)[:n_sym * 16]]
        q_samp = samples.imag[..., jnp.minimum(
            idx * 2 * spc + 2 * spc, samples.shape[-1] - 1
        )[: n_sym * 16]]
        chips = jnp.zeros(samples.shape[:-1] + (n_sym * 32,), REAL_DTYPE)
        chips = chips.at[..., 0::2].set(i_samp)
        chips = chips.at[..., 1::2].set(q_samp)
        rx = chips.reshape(*samples.shape[:-1], n_sym, 32)
        table = 1.0 - 2.0 * jnp.asarray(
            zigbee_chip_table().astype(np.float32)
        )
        corr = jnp.einsum("...sc,kc->...sk", rx, table)
        symbols = jnp.argmax(corr, axis=-1).astype(SYMBOL_DTYPE)
        bits = symbols_to_bits(symbols, 4)
        return DemodResult(bits=pack_demod_bits(bits), symbols=symbols)


# ------------------------------------------------------------------ UWB-IR


@dataclasses.dataclass(frozen=True)
class UwbIr(Waveform):
    """802.15.4a impulse radio: burst-position modulation + BPSK polarity
    (uwb.rs): bit 0 → burst in first half of symbol, bit 1 → second half;
    Gaussian monocycle pulses."""

    common: CommonParams = CommonParams(sample_rate=499_200_000.0)
    symbol_rate: float = 976_562.5  # ~0.9766 Msym/s
    pulses_per_burst: int = 16

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return max(int(self.common.sample_rate / self.symbol_rate), 4)

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="UWB", full_name="IEEE 802.15.4a UWB Impulse Radio",
            description="Burst-position modulated sub-ns pulses",
            complexity=4, bits_per_symbol=1,
            characteristics=("Gaussian monocycles",
                             "Non-coherent energy detection"),
        )

    @functools.cached_property
    def _pulse(self) -> np.ndarray:
        """Gaussian monocycle, ~4 samples wide."""
        n = 8
        t = (np.arange(n) - n / 2) / (n / 5)
        p = -t * np.exp(-t * t / 2)
        return (p / np.max(np.abs(p))).astype(np.float32)

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        sps = self.samples_per_symbol()
        half = sps // 2
        burst_len = self.pulses_per_burst * len(self._pulse)
        burst = np.tile(self._pulse, self.pulses_per_burst)
        out = np.zeros(len(bits) * sps, np.float32)
        starts = np.arange(len(bits)) * sps + np.where(bits, half, 0)
        for i, s in enumerate(starts):
            seg = out[s : s + burst_len]
            seg += burst[: len(seg)]
        return (self.common.amplitude * jnp.asarray(out)).astype(IQ_DTYPE)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        sps = self.samples_per_symbol()
        s = samples.shape[-1] // sps
        if s == 0:
            empty = jnp.zeros(0, SYMBOL_DTYPE)
            return DemodResult(bits=empty, symbols=empty)
        chunks = samples[..., : s * sps].reshape(*samples.shape[:-1], s, sps)
        power = chunks.real**2 + chunks.imag**2
        half = sps // 2
        e0 = jnp.sum(power[..., :half], axis=-1)
        e1 = jnp.sum(power[..., half:], axis=-1)
        bits = (e1 > e0).astype(SYMBOL_DTYPE)
        return DemodResult(bits=pack_demod_bits(bits), symbols=bits)


# ------------------------------------------------------------------- FMCW


@dataclasses.dataclass(frozen=True)
class Fmcw(Waveform):
    """FMCW radar: sawtooth LFM sweeps; 'demodulation' estimates beat
    frequency → range from a loopback-delayed echo (fmcw.rs)."""

    common: CommonParams = CommonParams(sample_rate=1_000_000.0)
    sweep_bandwidth: float = 500_000.0
    sweep_time: float = 0.001
    num_sweeps: int = 4

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return int(self.common.sample_rate * self.sweep_time)

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="FMCW", full_name="Frequency-Modulated Continuous Wave",
            description="Linear chirp sweeps; beat frequency ∝ range",
            complexity=3, bits_per_symbol=0, carries_data=False,
            characteristics=(
                f"range resolution {2.998e8/(2*self.sweep_bandwidth):.0f} m",
            ),
        )

    def sweep(self) -> jax.Array:
        n = self.samples_per_symbol()
        t = jnp.arange(n, dtype=REAL_DTYPE) / self.common.sample_rate
        k = self.sweep_bandwidth / self.sweep_time
        phase = 2.0 * jnp.pi * (
            -self.sweep_bandwidth / 2.0 * t + 0.5 * k * t * t
        )
        return cis(phase.astype(REAL_DTYPE)).astype(IQ_DTYPE)

    def modulate(self, data=None) -> jax.Array:
        s = self.sweep()
        return (self.common.amplitude
                * jnp.tile(s, self.num_sweeps)).astype(IQ_DTYPE)

    def beat_spectrum(self, echo) -> jax.Array:
        """Mix echo against the reference sweep and FFT per sweep."""
        echo = jnp.asarray(echo, IQ_DTYPE)
        n = self.samples_per_symbol()
        k = echo.shape[-1] // n
        ref = self.sweep()
        mixed = echo[..., : k * n].reshape(*echo.shape[:-1], k, n) * jnp.conj(
            ref
        )
        spec = jnp.fft.fft(mixed, axis=-1)
        return jnp.mean(spec.real**2 + spec.imag**2, axis=-2)

    def estimate_range(self, echo) -> float:
        """Beat frequency → range (one-way echo delay assumed 2-way)."""
        power = np.asarray(self.beat_spectrum(echo))
        n = self.samples_per_symbol()
        bin_ = int(np.argmax(power))
        if bin_ > n // 2:
            bin_ -= n
        beat_hz = bin_ * self.common.sample_rate / n
        slope = self.sweep_bandwidth / self.sweep_time
        c = 299_792_458.0
        return abs(beat_hz) * c / (2.0 * slope)

    def demodulate(self, samples) -> DemodResult:
        rng = self.estimate_range(samples)
        return DemodResult(
            bits=jnp.zeros(0, SYMBOL_DTYPE),
            symbols=jnp.zeros(0, SYMBOL_DTYPE),
            metadata={"range_m": float(rng)},
        )


@register_waveform("Zigbee", aliases=("802154",))
def _zigbee(sample_rate: float) -> Zigbee:
    return Zigbee(common=CommonParams(sample_rate=max(sample_rate, 4e6)))


@register_waveform("UWB", aliases=("UWBIR",))
def _uwb(sample_rate: float) -> UwbIr:
    return UwbIr(common=CommonParams(sample_rate=max(sample_rate, 8e6)),
                 symbol_rate=max(sample_rate, 8e6) / 512.0)


@register_waveform("FMCW")
def _fmcw(sample_rate: float) -> Fmcw:
    return Fmcw(common=CommonParams(sample_rate=sample_rate),
                sweep_bandwidth=sample_rate * 0.4)
