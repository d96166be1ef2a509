"""QAM waveforms: 16/64/256-QAM (crates/r4w-core/src/waveform/qam.rs)."""

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


@dataclasses.dataclass(frozen=True)
class QAM(Waveform):
    common: CommonParams = CommonParams()
    symbol_rate: float = 1000.0
    order: int = 16

    @property
    def common_params(self) -> CommonParams:
        return self.common

    @property
    def bits_per_symbol(self) -> int:
        return int(np.log2(self.order))

    def samples_per_symbol(self) -> int:
        if self.symbol_rate <= 0:
            return 1
        return max(int(self.common.sample_rate / self.symbol_rate), 1)

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name=f"{self.order}-QAM",
            full_name=f"{self.order}-point Quadrature Amplitude Modulation",
            description="Joint amplitude+phase modulation on a square grid",
            complexity=3, bits_per_symbol=self.bits_per_symbol,
            characteristics=("Square constellation, unit average power",
                             "2-D Gray coding"),
        )

    def constellation_points(self) -> jax.Array:
        return jnp.asarray(lm.qam_constellation(self.order,
                                                self.common.amplitude))

    def modulate(self, data) -> jax.Array:
        bits = data_to_bits(data)
        bps = self.bits_per_symbol
        rem = bits.size % bps
        if rem:
            bits = np.pad(bits, (0, bps - rem))
        const = lm.qam_constellation(self.order, self.common.amplitude)
        v2i = lm.qam_value_to_index(self.order)
        return lm.linear_modulate(jnp.asarray(bits), const,
                                  jnp.asarray(v2i), bps,
                                  self.samples_per_symbol())

    def demodulate(self, samples) -> DemodResult:
        const = lm.qam_constellation(self.order, self.common.amplitude)
        idx, evm, snr = lm.linear_demodulate_symbols(
            samples, const, self.samples_per_symbol()
        )
        i2v = lm.index_to_value(lm.qam_value_to_index(self.order))
        bits = lm.indices_to_bits(idx, jnp.asarray(i2v), self.bits_per_symbol)
        return DemodResult(
            bits=lm.pack_demod_bits(bits),
            symbols=idx,
            snr_estimate=float(snr),
            metadata={"evm_rms": float(evm)},
        )


@register_waveform("16-QAM", aliases=("16QAM", "QAM16"))
def _qam16(sample_rate: float) -> QAM:
    return QAM(common=CommonParams(sample_rate=sample_rate), order=16)


@register_waveform("64-QAM", aliases=("64QAM", "QAM64"))
def _qam64(sample_rate: float) -> QAM:
    return QAM(common=CommonParams(sample_rate=sample_rate), order=64)


@register_waveform("256-QAM", aliases=("256QAM", "QAM256"))
def _qam256(sample_rate: float) -> QAM:
    return QAM(common=CommonParams(sample_rate=sample_rate), order=256)
