"""Emergency distress beacons: ELT/EPIRB/PLB 121.5 MHz + military 243 MHz.

Re-design of waveform/beacon.rs (634 LoC): swept-audio-tone AM — the
audio frequency sweeps downward (e.g. 1600→300 Hz) several times per
second, AM-modulated at high depth. Demod recovers sweep rate and range.
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
    register_waveform,
)


@dataclasses.dataclass(frozen=True)
class Beacon(Waveform):
    common: CommonParams = CommonParams(sample_rate=48_000.0)
    variant: str = "ELT"  # ELT | EPIRB | PLB | MIL243
    sweep_high_hz: float = 1600.0
    sweep_low_hz: float = 300.0
    sweep_rate_hz: float = 3.0  # sweeps per second (2-4 typical)
    modulation_depth: float = 0.9

    @property
    def common_params(self) -> CommonParams:
        return self.common

    def samples_per_symbol(self) -> int:
        return 1

    def info(self) -> WaveformInfo:
        freq = "243 MHz" if self.variant == "MIL243" else "121.5 MHz"
        return WaveformInfo(
            name={"ELT": "ELT-121.5", "EPIRB": "EPIRB-121.5",
                  "PLB": "PLB-121.5", "MIL243": "Beacon-243"}[self.variant],
            full_name=f"{self.variant} emergency distress beacon ({freq})",
            description="Downward swept-tone AM distress signal",
            complexity=1, bits_per_symbol=0, carries_data=False,
            characteristics=(
                f"sweep {self.sweep_high_hz:.0f}→{self.sweep_low_hz:.0f} Hz",
                f"{self.sweep_rate_hz:.0f} sweeps/s, "
                f"{self.modulation_depth*100:.0f}% AM",
            ),
        )

    def generate(self, duration_s: float) -> jax.Array:
        fs = self.common.sample_rate
        n = int(fs * duration_s)
        t = jnp.arange(n, dtype=REAL_DTYPE) / fs
        # sawtooth sweep position in [0,1): high -> low
        pos = jnp.mod(t * self.sweep_rate_hz, 1.0)
        f_audio = self.sweep_high_hz + (self.sweep_low_hz
                                        - self.sweep_high_hz) * pos
        audio_phase = 2.0 * jnp.pi * jnp.cumsum(f_audio) / fs
        audio = jnp.cos(audio_phase.astype(REAL_DTYPE))
        env = self.common.amplitude * (
            1.0 + self.modulation_depth * audio
        ) / (1.0 + self.modulation_depth)
        return env.astype(REAL_DTYPE).astype(IQ_DTYPE)

    def modulate(self, data=None) -> jax.Array:
        # beacons carry no data: 1 s of signal (beacon.rs modulate)
        return self.generate(1.0)

    def demodulate(self, samples) -> DemodResult:
        samples = jnp.asarray(samples, IQ_DTYPE)
        env = jnp.abs(samples)
        env = env - jnp.mean(env)
        # count sweep discontinuities via the envelope's instantaneous
        # audio frequency (zero crossings per short window)
        fs = self.common.sample_rate
        signs = jnp.sign(env)
        crossings = jnp.abs(jnp.diff(signs)) > 0
        win = max(int(fs / 20), 1)  # 50 ms windows
        win_t = win / fs
        n = crossings.shape[-1] // win
        counts = jnp.sum(crossings[: n * win].reshape(n, win), axis=-1)
        # a tone at f makes 2f zero crossings per second
        f_est = counts / (2.0 * win_t)
        swing = float(jnp.max(f_est) - jnp.min(f_est)) if n else 0.0
        return DemodResult(
            bits=jnp.zeros(0, SYMBOL_DTYPE),
            symbols=jnp.zeros(0, SYMBOL_DTYPE),
            metadata={
                "audio_freq_max": float(jnp.max(f_est)) if n else 0.0,
                "audio_freq_min": float(jnp.min(f_est)) if n else 0.0,
                "sweep_detected": float(swing > 200.0),
            },
        )


def _mk(variant, sample_rate, **kw):
    return Beacon(common=CommonParams(sample_rate=max(sample_rate, 48_000.0)),
                  variant=variant, **kw)


@register_waveform("ELT-121.5", aliases=("ELT", "ELT1215"))
def _elt(sample_rate: float) -> Beacon:
    return _mk("ELT", sample_rate)


@register_waveform("EPIRB-121.5", aliases=("EPIRB", "EPIRB1215"))
def _epirb(sample_rate: float) -> Beacon:
    return _mk("EPIRB", sample_rate, sweep_rate_hz=2.5)


@register_waveform("PLB-121.5", aliases=("PLB", "PLB1215"))
def _plb(sample_rate: float) -> Beacon:
    return _mk("PLB", sample_rate, sweep_rate_hz=4.0)


@register_waveform("Beacon-243", aliases=("MILITARY243", "MIL243"))
def _mil243(sample_rate: float) -> Beacon:
    return _mk("MIL243", sample_rate, sweep_rate_hz=3.0)
