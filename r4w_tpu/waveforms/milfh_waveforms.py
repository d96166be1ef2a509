"""Military frequency-hopping framework waveforms: SINCGARS, HAVEQUICK.

Re-design of waveform/sincgars/mod.rs (types.rs, traits.rs,
framework.rs, simulator.rs, sincgars/builder.rs, sincgars/audio.rs,
data.rs) and waveform/havequick/mod.rs (havequick/builder.rs)
(trait-split pattern,
README.md:84): the classified pieces — TRANSEC keystream, operational
hop algorithms, crypto — live behind a provider protocol with ONLY
simulator implementations here (seeded PRNG hop patterns, clearly
non-operational). The unclassified PHY (hop timing, per-hop FSK/MSK
modulation, frame structure) is real and batched: the whole burst is a
(hops × dwell) grid like FHSS.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis, zeros_iq
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, SYMBOL_DTYPE, CommonParams
from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformInfo,
    data_to_bits,
    register_waveform,
)
from r4w_tpu.waveforms.fhss import FHSS
from r4w_tpu.waveforms.linear_mod import pack_demod_bits


class HopSequenceProvider(Protocol):
    """Seam for the classified hop algorithm (sincgars/traits.rs)."""

    def hop_channels(self, n_hops: int) -> np.ndarray: ...


@dataclasses.dataclass(frozen=True)
class SimulatorHopProvider:
    """NON-OPERATIONAL training-mode hop pattern: seeded PRNG
    (sincgars/simulator.rs equivalent)."""

    num_channels: int
    seed: int = 0x51C

    def hop_channels(self, n_hops: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        return rng.integers(0, self.num_channels, n_hops)


class _FhFramework(FHSS):
    """Shared framework: FHSS PHY with a pluggable hop provider."""

    provider_seed: int = 0x51C

    def _channels_for(self, n_hops: int) -> np.ndarray:
        return SimulatorHopProvider(
            self.num_channels, self.provider_seed
        ).hop_channels(n_hops)


@dataclasses.dataclass(frozen=True)
class Sincgars(_FhFramework):
    """SINCGARS VHF FH (sincgars/, ~2.5k LoC): 2320 channels 30-88 MHz at
    25 kHz spacing, ~100 hops/s, CPFSK data. Simulator TRANSEC only."""

    common: CommonParams = CommonParams(sample_rate=500_000.0)
    num_channels: int = 64  # baseband window of the 2320-channel set
    channel_spacing: float = 25_000.0 / 4  # scaled into the sample band
    hop_rate: float = 100.0
    symbols_per_hop: int = 160
    symbol_rate: float = 16_000.0
    deviation: float = 6500.0
    provider_seed: int = 0x51C

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="SINCGARS",
            full_name="Single Channel Ground and Airborne Radio System",
            description="VHF FH framework — simulator TRANSEC only",
            complexity=5, bits_per_symbol=1,
            characteristics=("Trait-split: hop algorithm pluggable",
                             "~100 hops/s CPFSK",
                             "TRAINING pattern, not operational"),
        )


@dataclasses.dataclass(frozen=True)
class Havequick(_FhFramework):
    """HAVEQUICK UHF FH (havequick/): 7000 channels 225-400 MHz; WOD/TOD
    seeded dwells. Simulator pattern only."""

    common: CommonParams = CommonParams(sample_rate=500_000.0)
    num_channels: int = 64
    channel_spacing: float = 25_000.0 / 4
    hop_rate: float = 200.0
    symbols_per_hop: int = 40
    symbol_rate: float = 16_000.0
    deviation: float = 6500.0
    provider_seed: int = 0x440

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name="HAVEQUICK", full_name="HAVEQUICK II UHF AM/FH radio",
            description="UHF FH framework — simulator WOD/TOD only",
            complexity=5, bits_per_symbol=1,
            characteristics=("Word-of-day seeded dwell pattern (stub)",),
        )


@register_waveform("SINCGARS")
def _sincgars(sample_rate: float) -> Sincgars:
    return Sincgars(common=CommonParams(sample_rate=max(sample_rate, 5e5)))


@register_waveform("HAVEQUICK", aliases=("HQ",))
def _havequick(sample_rate: float) -> Havequick:
    return Havequick(common=CommonParams(sample_rate=max(sample_rate, 5e5)))


# --------------------------------------------- SINCGARS data framing
#
# Re-design of waveform/sincgars/data.rs (402 LoC): the unclassified
# low/medium/high-speed data framing. Frame wire format matches the
# reference (data.rs:152-180): preamble AA AA 7E, 4-bit frame type +
# 12-bit sequence, payload length byte, payload, CRC-16/CCITT with
# 0xFFFF init and 0xFFFF final XOR (data.rs:254-268). Where the
# reference stubs FEC as byte repetition (data.rs:272-284 "Simple
# repetition"), this framer applies the real K=7 rate-1/2
# convolutional code with soft-capable Viterbi decode.

SINCGARS_DATA_MODES: dict[int, int] = {
    # bps -> frame size in bits (data.rs:57-69)
    75: 75, 150: 150, 300: 300, 600: 600, 1200: 1200, 2400: 2400,
    4800: 480, 16000: 1600,
}

SINCGARS_FRAME_PREAMBLE = (0xAA, 0xAA, 0x7E)

FRAME_TYPES = {"data": 0, "ack": 1, "nak": 2, "sync": 3, "eot": 4}
FRAME_TYPE_NAMES = {v: k for k, v in FRAME_TYPES.items()}


@dataclasses.dataclass
class SincgarsDataFrame:
    """One data-mode frame (data.rs:73-99)."""

    sequence: int
    payload: bytes
    frame_type: str = "data"


def _sincgars_crc(payload: bytes) -> int:
    """CRC-16/CCITT, init 0xFFFF, final XOR 0xFFFF (data.rs:254-268)."""
    from r4w_tpu.fec.crc import crc_compute

    if not payload:
        return 0xFFFF  # crc of empty message: init ^ xorout
    arr = np.frombuffer(payload, np.uint8).astype(np.int32)
    return int(np.asarray(crc_compute(jnp.asarray(arr), "crc16-ccitt"))
               ) ^ 0xFFFF


class SincgarsDataFramer:
    """Framer for SINCGARS data modes (data.rs DataFramer)."""

    OVERHEAD_BYTES = 8  # preamble 3 + header 2 + len 1 + crc 2

    def __init__(self, mode_bps: int = 1200, use_fec: bool = True):
        if mode_bps not in SINCGARS_DATA_MODES:
            raise ValueError(f"unknown SINCGARS data mode {mode_bps}")
        self.mode_bps = mode_bps
        self.use_fec = use_fec
        self.sequence = 0

    @property
    def frame_size_bits(self) -> int:
        return SINCGARS_DATA_MODES[self.mode_bps]

    def max_payload_size(self) -> int:
        payload_bits = max(
            self.frame_size_bits - 8 * self.OVERHEAD_BYTES, 8)
        return payload_bits // (16 if self.use_fec else 8)

    def frame_data(self, data: bytes) -> list[SincgarsDataFrame]:
        size = self.max_payload_size()
        frames = []
        for i in range(0, max(len(data), 1), size):
            frames.append(SincgarsDataFrame(
                sequence=self.sequence, payload=bytes(data[i:i + size])))
            self.sequence = (self.sequence + 1) & 0xFFFF
        return frames

    def frame_to_bits(self, frame: SincgarsDataFrame) -> np.ndarray:
        header = ((FRAME_TYPES[frame.frame_type] & 0xF) << 12) | (
            frame.sequence & 0x0FFF)
        wire = bytes(SINCGARS_FRAME_PREAMBLE) + bytes([
            header >> 8, header & 0xFF, len(frame.payload) & 0xFF,
        ]) + frame.payload
        crc = _sincgars_crc(frame.payload)
        wire += bytes([crc >> 8, crc & 0xFF])
        bits = np.unpackbits(np.frombuffer(wire, np.uint8)).astype(np.int32)
        if self.use_fec:
            from r4w_tpu.fec.convolutional import conv_encode

            bits = np.asarray(conv_encode(jnp.asarray(bits), 7,
                                          (0o171, 0o133), terminate=True))
        return bits

    def bits_to_frame(self, bits: np.ndarray) -> SincgarsDataFrame:
        bits = np.asarray(bits, np.int32)
        if self.use_fec:
            from r4w_tpu.fec.convolutional import viterbi_decode

            bits = np.asarray(viterbi_decode(
                jnp.asarray(bits), 7, (0o171, 0o133), terminated=True))
        data = np.packbits(bits.astype(np.uint8)).tobytes()
        if len(data) < self.OVERHEAD_BYTES:
            raise ValueError("frame too short")
        if data[:3] != bytes(SINCGARS_FRAME_PREAMBLE):
            raise ValueError("invalid frame preamble")
        header = (data[3] << 8) | data[4]
        ftype = (header >> 12) & 0xF
        if ftype not in FRAME_TYPE_NAMES:
            raise ValueError(f"invalid frame type {ftype}")
        n = data[5]
        if len(data) < 8 + n:
            raise ValueError("frame too short for payload")
        payload = data[6:6 + n]
        rx_crc = (data[6 + n] << 8) | data[7 + n]
        if rx_crc != _sincgars_crc(payload):
            raise ValueError("CRC mismatch")
        return SincgarsDataFrame(sequence=header & 0x0FFF, payload=payload,
                                 frame_type=FRAME_TYPE_NAMES[ftype])


def sincgars_modulate_data(radio: Sincgars, data: bytes,
                           mode_bps: int = 1200) -> tuple[jax.Array, int]:
    """Frame `data` and modulate through the SINCGARS FH PHY. Returns
    (iq, frame_bits) where frame_bits is the per-frame on-air length."""
    framer = SincgarsDataFramer(mode_bps)
    frames = framer.frame_data(data)
    all_bits = [framer.frame_to_bits(f) for f in frames]
    flen = max(len(b) for b in all_bits)
    padded = np.concatenate(
        [np.pad(b, (0, flen - len(b))) for b in all_bits])
    return radio.modulate(padded.astype(np.int32)), flen


def sincgars_demodulate_data(radio: Sincgars, samples, frame_bits: int,
                             mode_bps: int = 1200
                             ) -> list[SincgarsDataFrame]:
    """Demodulate and deframe; returns the frames that pass CRC."""
    framer = SincgarsDataFramer(mode_bps)
    res = radio.demodulate(samples)
    bits = np.unpackbits(
        np.asarray(res.bits).astype(np.uint8)).astype(np.int32)
    frames = []
    for i in range(0, len(bits) - frame_bits + 1, frame_bits):
        try:
            frames.append(framer.bits_to_frame(bits[i:i + frame_bits]))
        except ValueError:
            continue
    return frames
