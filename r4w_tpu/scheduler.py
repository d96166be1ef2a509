"""Schedulers: discrete-event tick scheduler + sample-indexed RT schedule.

Re-designs of scheduler.rs:240 (TickScheduler — virtual time,
time-scale control, subscribers, sleep queue) and rt_scheduler.rs:814
(RealTimeScheduler — TX/RX state machine with guards/priorities).

TPU-first stance (SURVEY.md §2.9): wall-clock hop/TDMA timing becomes
*sample-indexed* schedules computed up front — `SampleSchedule` produces
per-sample event masks/ids that kernels consume directly, so timing is
exact-by-construction instead of jitter-bounded.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Callable

import numpy as np


# --------------------------------------------------------------------------
# Discrete-event tick scheduler (virtual time)
# --------------------------------------------------------------------------


@dataclasses.dataclass(order=True)
class _Event:
    tick: int
    seq: int
    callback: Callable = dataclasses.field(compare=False)
    period: int | None = dataclasses.field(compare=False, default=None)
    name: str = dataclasses.field(compare=False, default="")


class TickScheduler:
    """Deterministic DES over virtual ticks (scheduler.rs:240).

    Time scale (pause/slow/fast) is a run-loop property, not simulation
    state: `run_until` advances virtual time deterministically; use
    `time_scale` only when co-simulating against a wall clock.
    """

    def __init__(self, tick_rate_hz: float = 1000.0):
        self.tick_rate_hz = tick_rate_hz
        self.current_tick = 0
        self.time_scale = 1.0  # 0 = paused, >1 = faster than real time
        self._heap: list[_Event] = []
        self._seq = 0
        self._subscribers: dict[str, Callable] = {}

    # -- registration ------------------------------------------------------
    def schedule_at(self, tick: int, callback: Callable, name: str = ""):
        heapq.heappush(self._heap,
                       _Event(tick, self._next_seq(), callback, None, name))

    def schedule_in(self, delay_ticks: int, callback: Callable,
                    name: str = ""):
        self.schedule_at(self.current_tick + delay_ticks, callback, name)

    def schedule_periodic(self, period_ticks: int, callback: Callable,
                          name: str = "", start: int | None = None):
        first = self.current_tick + (period_ticks if start is None else start)
        heapq.heappush(self._heap, _Event(first, self._next_seq(), callback,
                                          period_ticks, name))

    def subscribe(self, name: str, on_tick: Callable):
        """Per-tick subscriber (scheduler.rs TickSubscriber:106)."""
        self._subscribers[name] = on_tick

    def unsubscribe(self, name: str):
        self._subscribers.pop(name, None)

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    # -- execution ----------------------------------------------------------
    def step(self, n_ticks: int = 1):
        for _ in range(n_ticks):
            self.current_tick += 1
            while self._heap and self._heap[0].tick <= self.current_tick:
                ev = heapq.heappop(self._heap)
                ev.callback(self.current_tick)
                if ev.period:
                    heapq.heappush(
                        self._heap,
                        _Event(ev.tick + ev.period, self._next_seq(),
                               ev.callback, ev.period, ev.name),
                    )
            for cb in list(self._subscribers.values()):
                cb(self.current_tick)

    def run_until(self, tick: int):
        if tick > self.current_tick:
            self.step(tick - self.current_tick)

    @property
    def virtual_time_s(self) -> float:
        return self.current_tick / self.tick_rate_hz


# --------------------------------------------------------------------------
# Sample-indexed schedules (the TPU-native rt_scheduler replacement)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ScheduledEvent:
    """One TX/RX window (rt_scheduler.rs events, sample-indexed)."""

    start_sample: int
    duration_samples: int
    kind: str = "tx"  # tx | rx | hop | guard
    channel: int = 0
    priority: int = 0


class SampleSchedule:
    """Event timeline resolved to sample indices.

    `masks(n)` renders per-sample boolean masks / channel ids that
    batched kernels consume — hop/TDMA timing becomes data, with zero
    jitter by construction (vs the reference's 80-118 µs p99 wall-clock
    hop timing, MEASURABLE_OBJECTIVES.md:72).
    """

    def __init__(self, sample_rate: float):
        self.sample_rate = sample_rate
        self.events: list[ScheduledEvent] = []

    def add(self, event: ScheduledEvent):
        self.events.append(event)

    def add_at_time(self, t_s: float, duration_s: float, **kw):
        self.add(ScheduledEvent(
            start_sample=int(round(t_s * self.sample_rate)),
            duration_samples=int(round(duration_s * self.sample_rate)), **kw
        ))

    def add_hop_pattern(self, channels, dwell_s: float, start_s: float = 0.0):
        """TDMA/FHSS hop windows back-to-back (rt_scheduler hop usage)."""
        dwell = int(round(dwell_s * self.sample_rate))
        s0 = int(round(start_s * self.sample_rate))
        for i, ch in enumerate(np.asarray(channels)):
            self.add(ScheduledEvent(s0 + i * dwell, dwell, kind="hop",
                                    channel=int(ch)))

    def masks(self, n_samples: int):
        """(active_mask bool[n], channel_id int32[n], kind_id int32[n])."""
        active = np.zeros(n_samples, bool)
        channel = np.full(n_samples, -1, np.int32)
        kind = np.full(n_samples, -1, np.int32)
        kind_ids = {"tx": 0, "rx": 1, "hop": 2, "guard": 3}
        for ev in sorted(self.events, key=lambda e: e.priority):
            a = max(ev.start_sample, 0)
            b = min(ev.start_sample + ev.duration_samples, n_samples)
            if b > a:
                active[a:b] = True
                channel[a:b] = ev.channel
                kind[a:b] = kind_ids.get(ev.kind, -1)
        return active, channel, kind

    def conflicts(self) -> list[tuple[ScheduledEvent, ScheduledEvent]]:
        """Overlapping same-kind events (guard-condition check)."""
        evs = sorted(self.events, key=lambda e: e.start_sample)
        out = []
        for a, b in zip(evs, evs[1:]):
            if (a.start_sample + a.duration_samples > b.start_sample
                    and a.kind == b.kind):
                out.append((a, b))
        return out
