"""ARQ / HARQ link-layer recovery (arq_engine.rs, harq_manager.rs
re-designs — SURVEY.md §5.3 failure handling).

Stop-and-wait + selective-repeat ARQ with retransmission budgets, and
HARQ type-II (incremental redundancy) built on the rate-1/2
convolutional code: transmission 1 sends punctured bits, retransmission
sends the complement; the receiver depunctures and soft-combines.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
import numpy as np

from r4w_tpu.fec.convolutional import (
    conv_encode,
    depuncture,
    puncture,
    viterbi_decode,
)


class ArqState(enum.Enum):
    IDLE = "idle"
    WAITING_ACK = "waiting_ack"
    FAILED = "failed"
    DELIVERED = "delivered"


@dataclasses.dataclass
class ArqStats:
    sent: int = 0
    retransmissions: int = 0
    delivered: int = 0
    failed: int = 0


class SelectiveRepeatArq:
    """Selective-repeat ARQ with a window (arq_engine.rs)."""

    def __init__(self, window: int = 8, max_retries: int = 3):
        self.window = window
        self.max_retries = max_retries
        self.tx_queue: dict[int, tuple[bytes, int]] = {}  # seq -> (data, tries)
        self.next_seq = 0
        self.stats = ArqStats()

    def send(self, data: bytes) -> int:
        seq = self.next_seq
        self.next_seq += 1
        self.tx_queue[seq] = (data, 1)
        self.stats.sent += 1
        return seq

    def pending(self) -> list[int]:
        return sorted(self.tx_queue)[: self.window]

    def on_ack(self, seq: int):
        if seq in self.tx_queue:
            del self.tx_queue[seq]
            self.stats.delivered += 1

    def on_nack(self, seq: int) -> bool:
        """Returns True if a retransmission is scheduled."""
        if seq not in self.tx_queue:
            return False
        data, tries = self.tx_queue[seq]
        if tries > self.max_retries:
            del self.tx_queue[seq]
            self.stats.failed += 1
            return False
        self.tx_queue[seq] = (data, tries + 1)
        self.stats.retransmissions += 1
        return True


# HARQ-II puncture patterns: TX1 keeps even coded bits, TX2 the odd ones
_P1 = (1, 0)
_P2 = (0, 1)


class HarqSender:
    """Incremental-redundancy HARQ (harq_manager.rs)."""

    def __init__(self):
        self._coded: dict[int, np.ndarray] = {}
        self.next_seq = 0

    def first_transmission(self, bits: np.ndarray) -> tuple[int, np.ndarray]:
        coded = np.asarray(conv_encode(jnp.asarray(bits)))
        seq = self.next_seq
        self.next_seq += 1
        self._coded[seq] = coded
        return seq, np.asarray(puncture(jnp.asarray(coded), _P1))

    def retransmission(self, seq: int) -> np.ndarray:
        """Complementary redundancy bits for a NACKed block."""
        return np.asarray(puncture(jnp.asarray(self._coded[seq]), _P2))


class HarqReceiver:
    """Soft-combining receiver: buffers LLRs across transmissions."""

    def __init__(self):
        self._llr: dict[int, np.ndarray] = {}
        self._n_info: dict[int, int] = {}

    def receive(self, seq: int, llr_punctured: np.ndarray, n_info: int,
                which: int = 1):
        """Accumulate a transmission (which=1: even bits, 2: odd bits).
        Returns (bits | None, success)."""
        total = (n_info + 6) * 2  # K=7 terminated rate-1/2
        pat = _P1 if which == 1 else _P2
        full = np.asarray(depuncture(
            jnp.asarray(llr_punctured, jnp.float32), pat, total, fill=0.0))
        if seq in self._llr:
            self._llr[seq] = self._llr[seq] + full
        else:
            self._llr[seq] = full
            self._n_info[seq] = n_info
        bits = np.asarray(viterbi_decode(
            jnp.asarray(self._llr[seq]), soft=True))
        return bits


def harq_roundtrip_demo(bits: np.ndarray, noise_std: float, rng
                        ) -> tuple[bool, bool]:
    """(decoded_ok_after_tx1, decoded_ok_after_combining) — used by tests
    to demonstrate the incremental-redundancy gain."""
    tx = HarqSender()
    rx = HarqReceiver()
    seq, p1 = tx.first_transmission(bits)
    llr1 = (1 - 2.0 * p1) + rng.normal(0, noise_std, len(p1))
    got1 = rx.receive(seq, 2 * llr1 / noise_std**2, len(bits), which=1)
    ok1 = np.array_equal(got1, bits)
    p2 = tx.retransmission(seq)
    llr2 = (1 - 2.0 * p2) + rng.normal(0, noise_std, len(p2))
    got2 = rx.receive(seq, 2 * llr2 / noise_std**2, len(bits), which=2)
    ok2 = np.array_equal(got2, bits)
    return ok1, ok2
