"""DSSS waveform (waveform/dsss.rs re-design).

Spreading is an outer product: symbols (S,) × chips (C,) → (S, C) then
oversample-repeat; despreading is a matched inner product along the chip
axis. Both are single batched contractions instead of the reference's
per-chip loops (dsss.rs:308-352).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import to_device
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.ops import spreading
from r4w_tpu.ops.coding import bits_to_symbols, symbols_to_bits
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.linear_mod import pack_demod_bits

# BPSK/QPSK subcarrier maps shared with OFDM (ofdm.rs SubcarrierModulation)
from r4w_tpu.waveforms.ofdm import subcarrier_constellation


@dataclasses.dataclass(frozen=True)
class DSSS(Waveform):
    common: CommonParams = CommonParams()
    pn_type: str = "gold"  # gold | msequence | barker
    pn_degree: int = 7
    code_index: int = 2
    modulation: str = "bpsk"  # bpsk | qpsk
    samples_per_chip: int = 4
    barker_length: int = 13

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def bits_per_symbol(self) -> int:
        return {"bpsk": 1, "qpsk": 2}[self.modulation]

    def pn_sequence(self) -> np.ndarray:
        if self.pn_type == "gold":
            return spreading.gold_code(self.pn_degree, self.code_index)
        if self.pn_type == "msequence":
            return spreading.m_sequence(self.pn_degree)
        if self.pn_type == "barker":
            return spreading.barker_code(self.barker_length)
        raise ValueError(f"unknown pn_type {self.pn_type}")

    @property
    def chips_per_symbol(self) -> int:
        return len(self.pn_sequence())

    def samples_per_symbol(self) -> int:
        return self.chips_per_symbol * self.samples_per_chip

    def processing_gain_db(self) -> float:
        return 10.0 * np.log10(self.chips_per_symbol)

    def chip_rate(self) -> float:
        return self.common.sample_rate / self.samples_per_chip

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="DSSS" if self.modulation == "bpsk" else "DSSS-QPSK",
            full_name="Direct Sequence Spread Spectrum",
            description="Symbols spread by a PN chip sequence (LPD/LPI)",
            complexity=4, bits_per_symbol=self.bits_per_symbol,
            characteristics=(
                f"{self.chips_per_symbol} chips/symbol "
                f"({self.processing_gain_db():.0f} dB processing gain)",
            ),
        )

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bps = self.bits_per_symbol
        rem = bits.size % bps
        if rem:
            bits = np.pad(bits, (0, bps - rem))
        values = bits_to_symbols(jnp.asarray(bits), bps)
        const = to_device(subcarrier_constellation(self.modulation))
        symbols = const[values]  # (S,)
        chips = jnp.asarray(self.pn_sequence().astype(np.float32))
        spread = symbols[..., None] * chips  # (S, C)
        spread = jnp.repeat(spread, self.samples_per_chip, axis=-1)
        return (self.common.amplitude * spread.reshape(-1)).astype(IQ_DTYPE)

    def despread(self, samples) -> jax.Array:
        """(..., S*C*osc) -> (..., S) despread symbol estimates."""
        samples = jnp.asarray(samples, IQ_DTYPE)
        n = self.samples_per_symbol()
        s = samples.shape[-1] // n
        blocks = samples[..., : s * n].reshape(
            *samples.shape[:-1], s, self.chips_per_symbol, self.samples_per_chip
        )
        chips = jnp.asarray(self.pn_sequence().astype(np.float32))
        # matched filter: sum over chips × oversample, normalized
        acc = jnp.einsum("...scv,c->...s", blocks, chips)
        return acc / (self.chips_per_symbol * self.samples_per_chip)

    def demodulate(self, samples) -> DemodResult:
        est = self.despread(samples) / self.common.amplitude
        const = to_device(subcarrier_constellation(self.modulation))
        d = est[..., None] - const
        values = jnp.argmin(d.real**2 + d.imag**2, axis=-1).astype(SYMBOL_DTYPE)
        bits = symbols_to_bits(values, self.bits_per_symbol)
        err = est - const[values]
        evm = jnp.sqrt(jnp.mean(err.real**2 + err.imag**2, axis=-1))
        return DemodResult(
            bits=pack_demod_bits(bits),
            symbols=values,
            snr_estimate=float(-20.0 * jnp.log10(jnp.maximum(jnp.mean(evm), 1e-12))),
            metadata={"chip_rate": self.chip_rate(),
                      "processing_gain_db": self.processing_gain_db()},
        )


@register_waveform("DSSS")
def _dsss(sample_rate: float) -> DSSS:
    return DSSS(common=CommonParams(sample_rate=sample_rate))


@register_waveform("DSSS-QPSK", aliases=("DSSSQPSK",))
def _dsss_qpsk(sample_rate: float) -> DSSS:
    return DSSS(common=CommonParams(sample_rate=sample_rate),
                modulation="qpsk")
