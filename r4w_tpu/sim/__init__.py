"""Simulation & HAL layer (crates/r4w-sim re-design).

`SdrDevice` protocol (device.rs:121), `SdrConfig` with regional presets
(device.rs:43), `DeviceCapabilities`, `discover_devices` (device.rs:191),
and the loopback `Simulator` (simulator.rs:42-373) — TX feeds an internal
buffer through the channel model into RX, with signal injection and a
sample clock. A SigMF file driver provides replay 'hardware'
(hal/sigmf.rs equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import numpy as np

from r4w_tpu.observe.logging import get_logger

log = get_logger("sim")


@dataclasses.dataclass
class SdrConfig:
    """Device configuration (device.rs:20-80)."""

    frequency_hz: float = 868.1e6
    sample_rate: float = 125_000.0
    tx_gain_db: float = 30.0
    rx_gain_db: float = 40.0
    bandwidth_hz: float = 125_000.0
    antenna: str = "TX/RX"

    @classmethod
    def eu868(cls) -> "SdrConfig":
        return cls(frequency_hz=868.1e6)

    @classmethod
    def us915(cls) -> "SdrConfig":
        return cls(frequency_hz=915.0e6)


@dataclasses.dataclass(frozen=True)
class DeviceCapabilities:
    name: str
    min_freq_hz: float
    max_freq_hz: float
    max_sample_rate: float
    full_duplex: bool
    tx_capable: bool


@runtime_checkable
class SdrDevice(Protocol):
    """Device protocol (device.rs:121 SdrDevice trait)."""

    def configure(self, config: SdrConfig) -> None: ...
    def transmit(self, samples: np.ndarray) -> int: ...
    def receive(self, num_samples: int) -> np.ndarray: ...
    def capabilities(self) -> DeviceCapabilities: ...


@dataclasses.dataclass
class SimulatorConfig:
    sample_rate: float = 125_000.0
    noise_floor_db: float = -90.0
    channel_model: str = "awgn"
    channel_snr_db: float = 30.0
    loopback_delay_samples: int = 0
    seed: int = 0


class Simulator:
    """Loopback SDR (simulator.rs:42): transmit() → channel → receive(),
    plus inject_signal for scenario composition."""

    def __init__(self, config: SimulatorConfig = SimulatorConfig()):
        self.config = config
        self._buffer = np.zeros(0, np.complex64)
        self._injected = np.zeros(0, np.complex64)
        self._sdr_config = SdrConfig(sample_rate=config.sample_rate)
        self._rng = np.random.default_rng(config.seed)
        self._sample_clock = 0  # samples elapsed (timing.rs SampleClock)

    # -- SdrDevice --------------------------------------------------------
    def configure(self, config: SdrConfig) -> None:
        self._sdr_config = config
        log.debug("simulator configured: %s", config)

    def transmit(self, samples) -> int:
        samples = np.asarray(samples, np.complex64)
        if self.config.loopback_delay_samples:
            samples = np.concatenate([
                np.zeros(self.config.loopback_delay_samples, np.complex64),
                samples,
            ])
        self._buffer = np.concatenate([self._buffer, samples])
        return len(samples)

    def inject_signal(self, samples) -> None:
        """Add an arbitrary signal to the RX path (simulator.rs:141)."""
        samples = np.asarray(samples, np.complex64)
        if len(samples) > len(self._injected):
            pad = np.zeros(len(samples) - len(self._injected), np.complex64)
            self._injected = np.concatenate([self._injected, pad])
        self._injected[: len(samples)] += samples

    def receive(self, num_samples: int) -> np.ndarray:
        """Pull samples through the channel (simulator.rs:226)."""
        import jax

        from r4w_tpu.channel import ChannelConfig, apply_channel

        out = np.zeros(num_samples, np.complex64)
        n_buf = min(len(self._buffer), num_samples)
        out[:n_buf] = self._buffer[:n_buf]
        self._buffer = self._buffer[n_buf:]
        n_inj = min(len(self._injected), num_samples)
        out[:n_inj] += self._injected[:n_inj]
        self._injected = self._injected[n_inj:]
        # channel + thermal noise floor
        has_signal = bool(np.any(out != 0))
        if has_signal:
            cfg = ChannelConfig(
                model=self.config.channel_model,
                snr_db=self.config.channel_snr_db,
                sample_rate=self.config.sample_rate,
            )
            key = jax.random.key(self._rng.integers(0, 2**31))
            out = np.asarray(apply_channel(key, out, cfg))
        else:
            noise_amp = 10.0 ** (self.config.noise_floor_db / 20.0)
            out = (noise_amp / np.sqrt(2) * (
                self._rng.standard_normal(num_samples)
                + 1j * self._rng.standard_normal(num_samples)
            )).astype(np.complex64)
        self._sample_clock += num_samples
        return out

    def capabilities(self) -> DeviceCapabilities:
        return DeviceCapabilities(
            name="simulator", min_freq_hz=0.0, max_freq_hz=6e9,
            max_sample_rate=61.44e6, full_duplex=True, tx_capable=True,
        )

    @property
    def sample_clock(self) -> int:
        return self._sample_clock

    def elapsed_seconds(self) -> float:
        return self._sample_clock / self.config.sample_rate


class SigmfReplayDevice:
    """File-replay 'hardware' (hal/sigmf.rs): receive() streams a SigMF
    recording; transmit() appends to an output recording."""

    def __init__(self, path: str):
        from r4w_tpu.io import sigmf

        self._samples, self._meta = sigmf.read_sigmf(path)
        self._pos = 0
        self._tx: list[np.ndarray] = []

    def configure(self, config: SdrConfig) -> None:
        pass

    def receive(self, num_samples: int) -> np.ndarray:
        out = self._samples[self._pos : self._pos + num_samples]
        self._pos += len(out)
        if len(out) < num_samples:
            out = np.concatenate([
                out, np.zeros(num_samples - len(out), np.complex64)
            ])
        return out

    def transmit(self, samples) -> int:
        self._tx.append(np.asarray(samples, np.complex64))
        return len(samples)

    def save_transmitted(self, path: str):
        from r4w_tpu.io import sigmf

        data = (np.concatenate(self._tx)
                if self._tx else np.zeros(0, np.complex64))
        sigmf.write_sigmf(path, data, self._meta.sample_rate)

    def capabilities(self) -> DeviceCapabilities:
        return DeviceCapabilities(
            name="sigmf-replay", min_freq_hz=0.0, max_freq_hz=6e9,
            max_sample_rate=self._meta.sample_rate, full_duplex=False,
            tx_capable=True,
        )


def discover_devices() -> list[DeviceCapabilities]:
    """Enumerate available 'hardware' (device.rs:191). In this build only
    simulation backends exist; real SDR HALs (UHD/Soapy/RTL) would
    register here."""
    return [Simulator().capabilities()]
