"""IQ capture manager with arm/trigger semantics (observe/capture.rs:53
re-design): ring-buffered pre-trigger history + post-trigger length,
written out as SigMF."""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from r4w_tpu.io import sigmf


class CaptureState(enum.Enum):
    IDLE = "idle"
    ARMED = "armed"
    TRIGGERED = "triggered"
    COMPLETE = "complete"


@dataclasses.dataclass
class CaptureConfig:
    pre_trigger_samples: int = 4096
    post_trigger_samples: int = 65536
    sample_rate: float = 1e6
    frequency: float = 0.0
    format: str = "cf32"


class CaptureManager:
    """Feed blocks via `process`; call `arm()` then `trigger()` (or use
    a threshold trigger) and `save(path)` when COMPLETE."""

    def __init__(self, config: CaptureConfig = CaptureConfig()):
        self.config = config
        self.state = CaptureState.IDLE
        self._pre = np.zeros(0, np.complex64)
        self._post: list[np.ndarray] = []
        self._post_count = 0

    def arm(self):
        self.state = CaptureState.ARMED
        self._post = []
        self._post_count = 0

    def trigger(self):
        if self.state == CaptureState.ARMED:
            self.state = CaptureState.TRIGGERED

    def process(self, block, trigger_level: float | None = None):
        """Feed a block; optional amplitude threshold auto-trigger."""
        block = np.asarray(block, np.complex64)
        if self.state == CaptureState.ARMED:
            self._pre = np.concatenate([self._pre, block])[
                -self.config.pre_trigger_samples:
            ]
            if trigger_level is not None and np.any(
                np.abs(block) >= trigger_level
            ):
                idx = int(np.argmax(np.abs(block) >= trigger_level))
                self.state = CaptureState.TRIGGERED
                tail = block[idx:]
                self._post.append(tail)
                self._post_count += len(tail)
        elif self.state == CaptureState.TRIGGERED:
            need = self.config.post_trigger_samples - self._post_count
            take = block[: max(need, 0)]
            self._post.append(take)
            self._post_count += len(take)
        if (self.state == CaptureState.TRIGGERED
                and self._post_count >= self.config.post_trigger_samples):
            self.state = CaptureState.COMPLETE

    def samples(self) -> np.ndarray:
        post = (np.concatenate(self._post)
                if self._post else np.zeros(0, np.complex64))
        return np.concatenate([self._pre, post])

    def save(self, path: str, description: str = "r4w_tpu capture"):
        sigmf.write_sigmf(
            path, self.samples(), self.config.sample_rate,
            self.config.frequency, self.config.format, description,
            annotations=[{
                "core:sample_start": len(self._pre),
                "core:sample_count": self._post_count,
                "core:label": "trigger",
            }],
        )
        self.state = CaptureState.IDLE
