"""CW, OOK, ASK, FSK waveforms (cw.rs, ook.rs, ask.rs, fsk.rs re-designs).

Batch-first: the reference's per-sample phase-accumulation loops become
exclusive cumulative sums of per-sample frequency increments (one vector
op), and demodulation reduces whole (S, sps) blocks at once.
"""

from __future__ import annotations

import dataclasses

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


def _phase_accumulate(omega_per_sample: jax.Array) -> jax.Array:
    """Exclusive prefix sum: phase[n] = sum of increments before n."""
    c = jnp.cumsum(omega_per_sample, axis=-1)
    return c - omega_per_sample


def _sps(common: CommonParams, symbol_rate: float) -> int:
    if symbol_rate <= 0:
        return 1
    return max(int(common.sample_rate / symbol_rate), 1)


# --------------------------------------------------------------------------
# CW (cw.rs)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CW(Waveform):
    common: CommonParams = CommonParams()
    frequency: float = 1000.0

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return 1

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="CW", full_name="Continuous Wave", carries_data=False,
            bits_per_symbol=0, complexity=1,
            description="Pure sinusoidal tone at constant frequency",
        )

    def generate(self, duration_s: float) -> jax.Array:
        n = int(self.common.sample_rate * duration_s)
        t = jnp.arange(n, dtype=REAL_DTYPE) / self.common.sample_rate
        ph = (2.0 * jnp.pi * self.frequency * t).astype(REAL_DTYPE)
        return (self.common.amplitude * cis(ph)).astype(IQ_DTYPE)

    def modulate(self, data=None) -> jax.Array:
        # CW carries no data; 1 ms of tone (cw.rs modulate)
        return self.generate(0.001)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        # coarse: interpolated FFT peak (noise-robust, unlike the mean
        # phase-increment estimator whose bias grows as 1/SNR); the
        # 8x zero-pad keeps the quadratic interpolation in its accurate
        # regime (fft_utils.rs:145 find_peak_interpolated role)
        from r4w_tpu.core import fftops

        n = samples.shape[-1]
        nfft = 8 * n
        spec = fftops.power_spectrum(
            jnp.pad(samples, [(0, 0)] * (samples.ndim - 1) + [(0, nfft - n)])
        )
        idx, _ = fftops.find_peak_interpolated(spec)
        freq = jnp.where(idx > nfft / 2, idx - nfft, idx) * (
            self.common.sample_rate / nfft)
        power = jnp.mean(jnp.abs(samples) ** 2, axis=-1)
        return DemodResult(
            bits=jnp.zeros(0, SYMBOL_DTYPE),
            symbols=jnp.zeros(0, SYMBOL_DTYPE),
            metadata={"frequency": float(freq), "power": float(power)},
        )


# --------------------------------------------------------------------------
# OOK (ook.rs)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OOK(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 1000.0
    carrier_freq: float = 1000.0

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return _sps(self.common, self.symbol_rate)

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="OOK", full_name="On-Off Keying",
            description="Binary modulation by switching the carrier on/off",
            complexity=2, bits_per_symbol=1,
            characteristics=("Carrier ON = 1, OFF = 0", "Envelope detection"),
        )

    def modulate(self, data) -> jax.Array:
        bits = jnp.asarray(data_to_bits(data))
        sps = self.samples_per_symbol()
        omega = 2.0 * jnp.pi * self.carrier_freq / self.common.sample_rate
        on = jnp.repeat(bits, sps).astype(REAL_DTYPE)  # gate per sample
        # phase only advances while the carrier is ON (ook.rs:91-110 keeps
        # the stored phase frozen across OFF symbols)
        phase = _phase_accumulate(on * omega)
        return (self.common.amplitude * on * cis(phase)).astype(
            IQ_DTYPE
        )

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        sps = self.samples_per_symbol()
        s = samples.shape[-1] // sps
        if s == 0:  # shorter than one symbol (ook.rs:173-175)
            empty = jnp.zeros(0, SYMBOL_DTYPE)
            return DemodResult(bits=empty, symbols=empty)
        power = jnp.mean(
            jnp.abs(samples[..., : s * sps].reshape(*samples.shape[:-1], s, sps))
            ** 2,
            axis=-1,
        )
        # adaptive threshold: midpoint of min/max symbol power (ook.rs:184-187)
        thresh = (jnp.max(power, -1, keepdims=True)
                  + jnp.min(power, -1, keepdims=True)) / 2.0
        bits = (power > thresh).astype(SYMBOL_DTYPE)
        pmax = jnp.max(power, -1)
        pmin = jnp.maximum(jnp.min(power, -1), 1e-10)
        return DemodResult(
            bits=pack_demod_bits(bits),
            symbols=bits,
            snr_estimate=float(10.0 * jnp.log10(pmax / pmin)),
        )


# --------------------------------------------------------------------------
# ASK (ask.rs)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ASK(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 1000.0
    carrier_freq: float = 1000.0
    num_levels: int = 2
    modulation_index: float = 1.0
    suppress_carrier: bool = False

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def bits_per_symbol(self) -> int:
        return int(np.log2(self.num_levels))

    def samples_per_symbol(self) -> int:
        return _sps(self.common, self.symbol_rate)

    def info(self) -> WaveformInfo:
        name = "ASK" if self.num_levels == 2 else f"{self.num_levels}-ASK"
        return WaveformInfo(
            name=name, full_name="Amplitude Shift Keying",
            description="Data in discrete carrier amplitude levels",
            complexity=2, bits_per_symbol=self.bits_per_symbol,
        )

    def _levels(self) -> np.ndarray:
        """Per-symbol envelope (ask.rs:128-163 symbol_to_amplitude)."""
        m = self.num_levels
        sym = np.arange(m, dtype=np.float64)
        if self.suppress_carrier:
            norm = sym * 2.0 / (m - 1) - 1.0 if m > 2 else np.where(sym == 0, -1.0, 1.0)
            return (norm * self.modulation_index).astype(np.float32)
        if m == 2:
            return np.array(
                [1.0 - self.modulation_index, 1.0 + self.modulation_index],
                np.float32,
            )
        norm = 2.0 * sym / (m - 1) - 1.0
        return (1.0 + self.modulation_index * norm).astype(np.float32)

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bps = self.bits_per_symbol
        rem = bits.size % bps
        if rem:
            bits = np.pad(bits, (0, bps - rem))
        symbols = bits_to_symbols(jnp.asarray(bits), bps)
        env = jnp.asarray(self._levels())[symbols]
        sps = self.samples_per_symbol()
        env_s = jnp.repeat(env, sps, axis=-1)
        n = env_s.shape[-1]
        omega = 2.0 * jnp.pi * self.carrier_freq / self.common.sample_rate
        phase = (omega * jnp.arange(n, dtype=REAL_DTYPE)).astype(REAL_DTYPE)
        return (self.common.amplitude * env_s * cis(phase)).astype(
            IQ_DTYPE
        )

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        sps = self.samples_per_symbol()
        s = samples.shape[-1] // sps
        rms = jnp.sqrt(
            jnp.mean(
                jnp.abs(
                    samples[..., : s * sps].reshape(*samples.shape[:-1], s, sps)
                )
                ** 2,
                axis=-1,
            )
        )
        expected = jnp.asarray(self._levels()) * self.common.amplitude
        err = jnp.abs(rms[..., None] - jnp.abs(expected))
        symbols = jnp.argmin(err, axis=-1).astype(SYMBOL_DTYPE)
        bits = symbols_to_bits(symbols, self.bits_per_symbol)
        return DemodResult(bits=pack_demod_bits(bits), symbols=symbols)


# --------------------------------------------------------------------------
# FSK (fsk.rs)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FSK(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 500.0
    deviation: float = 500.0
    num_levels: int = 2
    continuous_phase: bool = True

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def bits_per_symbol(self) -> int:
        return int(np.log2(self.num_levels))

    def samples_per_symbol(self) -> int:
        return _sps(self.common, self.symbol_rate)

    def info(self) -> WaveformInfo:
        names = {2: ("BFSK", "Binary Frequency Shift Keying"),
                 4: ("4-FSK", "4-Level Frequency Shift Keying")}
        name, full = names.get(self.num_levels, ("M-FSK", "Multi-level FSK"))
        return WaveformInfo(
            name=name, full_name=full,
            description="Data in discrete carrier frequency shifts",
            complexity=2, bits_per_symbol=self.bits_per_symbol,
            characteristics=(f"h = {2*self.deviation/self.symbol_rate:.1f}",
                             "Constant envelope"),
        )

    def _freqs(self) -> np.ndarray:
        """Symbol frequencies in Hz (fsk.rs:122-132)."""
        m = self.num_levels
        sym = np.arange(m, dtype=np.float64)
        if m == 2:
            norm = np.where(sym == 0, -1.0, 1.0)
        else:
            norm = 2.0 * sym / (m - 1) - 1.0
        return (norm * self.deviation).astype(np.float32)

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bps = self.bits_per_symbol
        rem = bits.size % bps
        if rem:
            bits = np.pad(bits, (0, bps - rem))
        symbols = bits_to_symbols(jnp.asarray(bits), bps)
        freqs = jnp.asarray(self._freqs())[symbols]  # Hz per symbol
        sps = self.samples_per_symbol()
        omega = 2.0 * jnp.pi * jnp.repeat(freqs, sps, -1) / self.common.sample_rate
        if self.continuous_phase:
            phase = _phase_accumulate(omega)
        else:
            # phase resets each symbol (fsk.rs:148-152)
            k = jnp.arange(omega.shape[-1]) % sps
            phase = omega * k
        return (self.common.amplitude * cis(phase)).astype(IQ_DTYPE)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        sps = self.samples_per_symbol()
        s = samples.shape[-1] // sps
        chunks = samples[..., : s * sps].reshape(*samples.shape[:-1], s, sps)
        # per-symbol mean instantaneous frequency (fsk.rs:243-257)
        d = chunks[..., 1:] * jnp.conj(chunks[..., :-1])
        freq = (
            jnp.angle(jnp.sum(d, axis=-1))
            * self.common.sample_rate
            / (2.0 * jnp.pi)
        )
        expected = jnp.asarray(self._freqs())
        symbols = jnp.argmin(
            jnp.abs(freq[..., None] - expected), axis=-1
        ).astype(SYMBOL_DTYPE)
        bits = symbols_to_bits(symbols, self.bits_per_symbol)
        return DemodResult(bits=pack_demod_bits(bits), symbols=symbols)


# --------------------------------------------------------------------------
# Factory registrations (waveform/mod.rs:505-530)
# --------------------------------------------------------------------------


@register_waveform("CW")
def _cw(sample_rate: float) -> CW:
    return CW(common=CommonParams(sample_rate=sample_rate), frequency=1000.0)


@register_waveform("OOK")
def _ook(sample_rate: float) -> OOK:
    return OOK(common=CommonParams(sample_rate=sample_rate), symbol_rate=1000.0)


@register_waveform("ASK")
def _ask(sample_rate: float) -> ASK:
    return ASK(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=1000.0, carrier_freq=1000.0, num_levels=2)


@register_waveform("4-ASK", aliases=("4ASK", "PAM4"))
def _ask4(sample_rate: float) -> ASK:
    return ASK(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=1000.0, carrier_freq=1000.0, num_levels=4)


@register_waveform("BFSK", aliases=("FSK",))
def _bfsk(sample_rate: float) -> FSK:
    return FSK(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=500.0, deviation=500.0, num_levels=2)


@register_waveform("4-FSK", aliases=("4FSK",))
def _fsk4(sample_rate: float) -> FSK:
    return FSK(common=CommonParams(sample_rate=sample_rate),
               symbol_rate=500.0, deviation=500.0, num_levels=4)
