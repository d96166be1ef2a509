"""RealTimeScheduler depth tests (VERDICT r1 component 6: guard
conditions, priorities, clock sources — rt_scheduler.rs:814)."""

import pytest

from r4w_tpu.scheduler import (
    ClockSource,
    GpsClock,
    MockClock,
    RadioState,
    RadioStateError,
    RealTimeScheduler,
    RtEvent,
    SystemClock,
)


def make(clock=None, **kw):
    clock = clock or MockClock()
    return RealTimeScheduler(clock_source=ClockSource.MOCK, clock=clock,
                             **kw), clock


class TestClocks:
    def test_clock_sources(self):
        assert SystemClock().now_ns() > 0
        gps = GpsClock(offset_ns=1_000_000)
        assert gps.now_ns() - SystemClock().now_ns() >= 900_000
        mock = MockClock(5)
        mock.advance_ns(10)
        assert mock.now_ns() == 15
        mock.set_ns(100)
        assert mock.now_ns() == 100

    def test_source_selection(self):
        for src in (ClockSource.SYSTEM, ClockSource.HPET, ClockSource.TSC):
            s = RealTimeScheduler(clock_source=src)
            assert isinstance(s.clock, SystemClock)
        assert isinstance(
            RealTimeScheduler(clock_source=ClockSource.MOCK).clock,
            MockClock)
        assert isinstance(
            RealTimeScheduler(clock_source=ClockSource.GPS).clock, GpsClock)


class TestRadioState:
    def test_capability_predicates(self):
        assert RadioState.IDLE.can_transmit()
        assert RadioState.RX_TURNAROUND.can_transmit()
        assert not RadioState.RECEIVING.can_transmit()
        assert RadioState.TX_TURNAROUND.can_receive()
        assert not RadioState.TRANSMITTING.can_receive()
        assert RadioState.TX_TURNAROUND.can_hop()
        assert not RadioState.HOPPING.can_hop()

    def test_valid_transitions(self):
        s, _ = make()
        s.transition(RadioState.TRANSMITTING)
        s.transition(RadioState.TX_TURNAROUND)
        s.transition(RadioState.IDLE)
        with pytest.raises(RadioStateError, match="invalid transition"):
            s.transition(RadioState.TX_TURNAROUND)  # idle can't go there

    def test_error_recovery_path(self):
        s, _ = make()
        s.transition(RadioState.ERROR)
        with pytest.raises(RadioStateError):
            s.transition(RadioState.TRANSMITTING)
        s.transition(RadioState.IDLE)
        s.transition(RadioState.TRANSMITTING)

    def test_turnaround_timing_enforced(self):
        s, clk = make(tx_rx_turnaround_ns=1000)
        s.transition(RadioState.TRANSMITTING)
        s.transition(RadioState.TX_TURNAROUND)
        with pytest.raises(RadioStateError, match="turnaround"):
            s.transition(RadioState.RECEIVING)  # too soon
        clk.advance_ns(1000)
        s.transition(RadioState.RECEIVING)  # now legal


class TestEvents:
    def test_priority_order_at_same_deadline(self):
        s, clk = make()
        order = []
        s.schedule(RtEvent(100, lambda: order.append("low"), priority=200))
        s.schedule(RtEvent(100, lambda: order.append("high"), priority=1))
        s.schedule(RtEvent(100, lambda: order.append("mid"), priority=100))
        clk.advance_ns(100)
        assert s.run_pending() == 3
        assert order == ["high", "mid", "low"]

    def test_guard_blocks_until_state_allows(self):
        s, clk = make()
        fired = []
        s.schedule(RtEvent(50, lambda: fired.append(1),
                           guard=lambda st: st.can_transmit()))
        s.transition(RadioState.RECEIVING)  # cannot transmit now
        clk.advance_ns(50)
        assert s.run_pending() == 0
        assert s.stats.guard_blocked == 1
        assert fired == []

    def test_guard_passes_in_right_state(self):
        s, clk = make()
        fired = []
        s.schedule(RtEvent(50, lambda: fired.append(1),
                           guard=lambda st: st.can_transmit()))
        clk.advance_ns(50)
        assert s.run_pending() == 1 and fired == [1]

    def test_repeat_events(self):
        s, clk = make()
        count = []
        s.schedule(RtEvent(10, lambda: count.append(1),
                           repeat_interval_ns=10))
        clk.advance_ns(45)
        s.run_pending()
        # deadlines 10,20,30,40 all due
        assert len(count) == 4
        assert s.pending == 1  # next at 50

    def test_missed_deadline_accounting(self):
        s, clk = make(deadline_tolerance_ns=5)
        s.schedule(RtEvent(10, lambda: None))
        clk.advance_ns(100)  # 90 ns late > 5 ns tolerance
        s.run_pending()
        assert s.stats.missed_deadlines == 1
        assert s.stats.max_lateness_ns == 90
        assert s.stats.executed == 1  # still executed, but counted late

    def test_cancel_by_id_and_source(self):
        s, clk = make()
        fired = []
        e1 = s.schedule(RtEvent(10, lambda: fired.append("a"),
                                source="fhss"))
        s.schedule(RtEvent(10, lambda: fired.append("b"), source="fhss"))
        s.schedule(RtEvent(10, lambda: fired.append("c"), source="tdma"))
        assert s.cancel(e1)
        assert not s.cancel(99999)
        assert s.cancel_from_source("fhss") == 1  # e1 already cancelled
        clk.advance_ns(10)
        s.run_pending()
        assert fired == ["c"]
        assert s.stats.cancelled == 2

    def test_schedule_in_relative(self):
        s, clk = make()
        fired = []
        s.schedule_in(500, lambda: fired.append(1), priority=3)
        clk.advance_ns(499)
        assert s.run_pending() == 0
        clk.advance_ns(1)
        assert s.run_pending() == 1
