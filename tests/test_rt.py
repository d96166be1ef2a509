"""Host RT primitives: pool, latency histogram, RT threads, audit."""

import threading
import time

import numpy as np

from r4w_tpu import rt


def test_buffer_pool_acquire_release():
    pool = rt.BufferPool(2, 1024)
    a = pool.acquire()
    b = pool.acquire()
    assert a is not None and b is not None and pool.available == 0
    assert pool.acquire(timeout=0.05) is None  # exhausted
    pool.release(a)
    c = pool.acquire()
    assert c is a  # reuse, no new allocation


def test_buffer_pool_blocking_handoff():
    pool = rt.BufferPool(1, 64)
    buf = pool.acquire()
    got = []

    def consumer():
        got.append(pool.acquire(timeout=2.0))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    pool.release(buf)
    t.join(3.0)
    assert got and got[0] is buf


def test_latency_histogram_percentiles():
    h = rt.LatencyHistogram()
    for _ in range(990):
        h.record(1e-4)  # 100 us
    for _ in range(10):
        h.record(1e-2)  # 10 ms outliers
    assert h.count == 1000
    assert 0.5e-4 < h.p50 < 2e-4
    assert 0.5e-2 < h.p999 < 2e-2
    s = h.summary()
    assert s["min_s"] <= s["p50_s"] <= s["p999_s"] <= s["max_s"] * 1.2


def test_processing_timer():
    h = rt.LatencyHistogram()
    with rt.ProcessingTimer(h):
        time.sleep(0.01)
    assert h.count == 1
    assert 0.005 < h.p50 < 0.05


def test_rt_stats_throughput():
    s = rt.RtStats()
    s.record_block(48000, 0.001)
    s.record_block(48000, 0.001)
    assert s.samples_processed == 96000
    assert s.throughput_sps() > 0


def test_spawn_rt_thread_runs():
    done = threading.Event()
    t = rt.spawn_rt_thread(done.set, priority=5)
    assert done.wait(2.0)
    t.join(2.0)


def test_native_ring_reexport():
    ring = rt.NativeRingBuffer(1 << 12)
    x = np.arange(100, dtype=np.float32)
    assert ring.write(x) == 100
    out = ring.read(100)
    assert np.array_equal(out, x)


def test_allocation_audit_detects():
    with rt.AllocationAudit() as audit:
        junk = [bytearray(1000) for _ in range(500)]
    assert audit.blocks_delta > 100
    del junk
