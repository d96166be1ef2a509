"""GNSS waveforms behind the generic Waveform API
(re-designs of waveform/gnss/mod.rs: gnss/gps_l1ca.rs, gnss/gps_l5.rs,
gnss/glonass_l1of.rs, gnss/galileo_e1.rs).

Each data bit spans one code period (BPSK data × spreading code; CBOC
subcarrier for Galileo E1). Demodulation is a batched prompt correlation
per code period — one einsum over (periods × samples).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.gnss import boc, prn
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.linear_mod import pack_demod_bits

CHIP_RATE = 1_023_000.0
GLONASS_CHIP_RATE = 511_000.0
L5_CHIP_RATE = 10_230_000.0


@dataclasses.dataclass(frozen=True)
class GnssWaveform(Waveform):
    common: CommonParams = CommonParams(sample_rate=4_092_000.0)
    system: str = "gps_l1ca"
    prn: int = 1

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def _chip_rate(self) -> float:
        return {"gps_l1ca": CHIP_RATE, "galileo_e1": CHIP_RATE,
                "glonass_l1of": GLONASS_CHIP_RATE,
                "gps_l5": L5_CHIP_RATE}[self.system]

    @functools.cached_property
    def code(self) -> np.ndarray:
        if self.system == "gps_l1ca":
            return prn.gps_ca_code(self.prn).astype(np.float32)
        if self.system == "glonass_l1of":
            return prn.glonass_l1of_code().astype(np.float32)
        if self.system == "gps_l5":
            return prn.gps_l5_code(self.prn).astype(np.float32)
        if self.system == "galileo_e1":
            # E1B data channel chips with CBOC at 12 sub-chips
            chips = prn.galileo_e1_code(self.prn, "B")
            return boc.cboc_spread(chips, 12, pilot=False)
        raise ValueError(self.system)

    def _code_rate(self) -> float:
        """Rate of entries of `self.code` in Hz."""
        if self.system == "galileo_e1":
            return CHIP_RATE * 12
        return self._chip_rate()

    def samples_per_symbol(self) -> int:
        """Samples per code period (= per data bit here)."""
        period = len(self.code) / self._code_rate()
        return int(round(self.common.sample_rate * period))

    def info(self) -> WaveformInfo:
        names = {
            "gps_l1ca": ("GPS-L1CA", "GPS L1 C/A", "BPSK(1) Gold-code DSSS"),
            "gps_l5": ("GPS-L5", "GPS L5", "BPSK(10), 10230-chip codes"),
            "glonass_l1of": ("GLONASS-L1OF", "GLONASS L1OF",
                             "FDMA, 511-chip m-sequence"),
            "galileo_e1": ("Galileo-E1", "Galileo E1 OS",
                           "CBOC(6,1,1/11) on 4092-chip memory codes"),
        }
        n, f, d = names[self.system]
        return WaveformInfo(name=n, full_name=f, description=d, complexity=5,
                            bits_per_symbol=1)

    def _sampled_code(self) -> jax.Array:
        n = self.samples_per_symbol()
        idx = (
            np.arange(n) * self._code_rate() / self.common.sample_rate
        ).astype(np.int64) % len(self.code)
        return jnp.asarray(self.code[idx])

    def modulate(self, data) -> jax.Array:
        bits = jnp.asarray(data_to_bits(data))
        symbols = (1.0 - 2.0 * bits).astype(REAL_DTYPE)  # (B,)
        code = self._sampled_code()  # (N,)
        burst = symbols[:, None] * code[None, :]
        return (self.common.amplitude * burst.reshape(-1)).astype(IQ_DTYPE)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        n = self.samples_per_symbol()
        b = samples.shape[-1] // n
        if b == 0:
            empty = jnp.zeros(0, SYMBOL_DTYPE)
            return DemodResult(bits=empty, symbols=empty)
        code = self._sampled_code()
        periods = samples[..., : b * n].reshape(*samples.shape[:-1], b, n)
        prompt = jnp.einsum("...bn,n->...b", periods, code.astype(IQ_DTYPE))
        bits = (prompt.real < 0).astype(SYMBOL_DTYPE)
        p_pow = prompt.real**2 + prompt.imag**2
        total = jnp.sum(jnp.abs(periods) ** 2, axis=-1) * jnp.sum(code**2)
        snr = 10.0 * jnp.log10(jnp.maximum(
            jnp.mean(p_pow / jnp.maximum(total - p_pow, 1e-12)), 1e-12))
        return DemodResult(
            bits=pack_demod_bits(bits),
            symbols=bits,
            snr_estimate=float(snr),
            metadata={"prn": float(self.prn),
                      "processing_gain_db": float(10 * np.log10(n))},
        )


def _make(system, sample_rate, prn_=1):
    return GnssWaveform(
        common=CommonParams(sample_rate=sample_rate), system=system, prn=prn_
    )


@register_waveform("GPS-L1CA", aliases=("GPSL1", "GPSCA"))
def _gps_l1ca(sample_rate: float) -> GnssWaveform:
    return _make("gps_l1ca", sample_rate)


@register_waveform("GPS-L5")
def _gps_l5(sample_rate: float) -> GnssWaveform:
    return _make("gps_l5", sample_rate)


@register_waveform("GLONASS-L1OF", aliases=("GLONASS",))
def _glonass(sample_rate: float) -> GnssWaveform:
    return _make("glonass_l1of", sample_rate)


@register_waveform("Galileo-E1", aliases=("GALILEO", "GAL"))
def _galileo_e1(sample_rate: float) -> GnssWaveform:
    return _make("galileo_e1", sample_rate)


class GpsL1CaWaveform(GnssWaveform):
    """Dynamic GPS-L1CA-PRN<n> factory names (waveform/mod.rs:591-597)."""

    def __init__(self, sample_rate: float, prn: int):
        super().__init__(
            common=CommonParams(sample_rate=sample_rate),
            system="gps_l1ca", prn=prn,
        )
