"""PSK waveforms: BPSK / QPSK / 8-PSK (crates/r4w-core/src/waveform/psk.rs).

Batch-first re-design: the per-symbol loops of psk.rs:206-300 become the
shared linear-modulation core (one gather for TX, one distance matrix for
RX).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import CommonParams
from r4w_tpu.waveforms import linear_mod as lm
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)

_NAMES = {2: ("BPSK", "Binary Phase Shift Keying"),
          4: ("QPSK", "Quadrature Phase Shift Keying"),
          8: ("8-PSK", "8-Phase Shift Keying")}


@dataclasses.dataclass(frozen=True)
class PSK(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 1000.0
    num_phases: int = 2

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def bits_per_symbol(self) -> int:
        return int(np.log2(self.num_phases))

    def samples_per_symbol(self) -> int:
        if self.symbol_rate <= 0:
            return 1
        return max(int(self.common.sample_rate / self.symbol_rate), 1)

    def info(self) -> WaveformInfo:
        name, full = _NAMES.get(self.num_phases, ("M-PSK", "Multi-PSK"))
        return WaveformInfo(
            name=name, full_name=full,
            description="Encodes data in the phase of the carrier",
            complexity=2, bits_per_symbol=self.bits_per_symbol,
            characteristics=("Constant envelope", "Gray-coded constellation"),
        )

    def constellation_points(self) -> jax.Array:
        return jnp.asarray(lm.psk_constellation(self.num_phases,
                                                self.common.amplitude))

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bps = self.bits_per_symbol
        rem = bits.size % bps
        if rem:
            bits = np.pad(bits, (0, bps - rem))
        const = lm.psk_constellation(self.num_phases, self.common.amplitude)
        v2i = lm.psk_value_to_index(self.num_phases)
        return lm.linear_modulate(jnp.asarray(bits), const,
                                  jnp.asarray(v2i), bps,
                                  self.samples_per_symbol())

    def demodulate(self, samples) -> DemodResult:
        const = lm.psk_constellation(self.num_phases, self.common.amplitude)
        idx, evm, snr = lm.linear_demodulate_symbols(
            samples, const, self.samples_per_symbol()
        )
        i2v = lm.index_to_value(lm.psk_value_to_index(self.num_phases))
        bits = lm.indices_to_bits(idx, jnp.asarray(i2v), self.bits_per_symbol)
        return DemodResult(
            bits=lm.pack_demod_bits(bits),
            symbols=idx,
            snr_estimate=float(snr),
            metadata={"evm_rms": float(evm)},
        )


@register_waveform("BPSK")
def _bpsk(sample_rate: float) -> PSK:
    return PSK(common=CommonParams(sample_rate=sample_rate), num_phases=2)


@register_waveform("QPSK")
def _qpsk(sample_rate: float) -> PSK:
    return PSK(common=CommonParams(sample_rate=sample_rate), num_phases=4)


@register_waveform("8-PSK", aliases=("8PSK", "PSK8"))
def _8psk(sample_rate: float) -> PSK:
    return PSK(common=CommonParams(sample_rate=sample_rate), num_phases=8)
