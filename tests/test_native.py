"""Native iqcore library: build, conversions, ring buffer, IO fast path."""

import numpy as np
import pytest

from r4w_tpu import native
from r4w_tpu.io import iqformat


def test_native_builds():
    assert native.native_available(), native.build_error()


def test_i16_conversion_accuracy():
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1, 1, 10000)).astype(np.float32)
    back = native.i16_to_f32(native.f32_to_i16(x))
    assert np.max(np.abs(back - x)) < 1.0 / 32000


def test_interleave_roundtrip():
    rng = np.random.default_rng(1)
    re = rng.standard_normal(777).astype(np.float32)
    im = rng.standard_normal(777).astype(np.float32)
    r2, i2 = native.deinterleave(native.interleave(re, im))
    assert np.array_equal(r2, re) and np.array_equal(i2, im)


def test_ring_buffer_spsc_semantics():
    rb = native.NativeRingBuffer(1 << 12)
    rng = np.random.default_rng(2)
    a = rng.standard_normal(1000).astype(np.float32)
    assert rb.write(a) == 1000
    assert rb.readable == 1000
    out = rb.read(600)
    assert np.array_equal(out, a[:600])
    out2 = rb.read(1000)  # only 400 left
    assert np.array_equal(out2, a[600:])
    assert rb.readable == 0


def test_ring_buffer_backpressure():
    rb = native.NativeRingBuffer(64)
    big = np.ones(1000, np.float32)
    w = rb.write(big)
    # bounded by (pow2-rounded) capacity, far below the request
    assert w < 200
    assert rb.readable == w
    assert rb.writable == 0 or rb.writable < 200


def test_ring_complex_api():
    rb = native.NativeRingBuffer(1 << 14)
    x = (np.arange(100) + 1j * np.arange(100)).astype(np.complex64)
    assert rb.write_complex(x) == 100
    got = rb.read_complex(100)
    assert np.allclose(got, x)


def test_iqformat_ci16_native_path_matches_fallback():
    rng = np.random.default_rng(3)
    x = (0.7 * (rng.standard_normal(2048) + 1j * rng.standard_normal(2048))
         ).astype(np.complex64)
    raw = iqformat.encode_samples(x, "ci16")
    back = iqformat.decode_samples(raw, "ci16")
    assert np.max(np.abs(back - np.clip(x.real, -1, 1)
                         - 1j * np.clip(x.imag, -1, 1))) < 2e-4


# ------------------------------------------------ native UDP receiver


def test_native_udp_receiver_roundtrip():
    import time

    from r4w_tpu.native import NativeUdpReceiver, native_available
    from r4w_tpu.net import UdpSink

    if not native_available():
        pytest.skip("no compiler")
    with NativeUdpReceiver(port=0) as rx:
        tx = UdpSink("127.0.0.1", rx.port)
        x = (np.arange(4096) + 1j * np.arange(4096)).astype(
            np.complex64) / 4096
        tx.send(x)
        deadline = time.time() + 3.0
        while rx.available_samples < 4096 and time.time() < deadline:
            time.sleep(0.01)
        got = rx.read(8192)
        assert got.shape == (4096,)
        assert np.abs(got - x).max() == 0.0  # bit-exact through the ring
        assert rx.stats["seq_gaps"] == 0


def test_native_udp_receiver_seq_gap_accounting():
    import socket
    import struct
    import time

    from r4w_tpu.native import NativeUdpReceiver, native_available
    from r4w_tpu.net import encode_packet

    if not native_available():
        pytest.skip("no compiler")
    with NativeUdpReceiver(port=0) as rx:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        x = np.ones(16, np.complex64)
        for seq in (0, 1, 5):  # gap of 3 packets after seq 1
            sock.sendto(encode_packet(seq, x), ("127.0.0.1", rx.port))
        deadline = time.time() + 3.0
        while rx.stats["packets"] < 3 and time.time() < deadline:
            time.sleep(0.01)
        assert rx.stats["packets"] == 3
        assert rx.stats["seq_gaps"] == 1  # one discontinuity observed
        sock.close()


def test_native_udp_receiver_bulk_throughput():
    """Many packets drain through the ring without loss."""
    import time

    from r4w_tpu.native import NativeUdpReceiver, native_available
    from r4w_tpu.net import UdpSink

    if not native_available():
        pytest.skip("no compiler")
    with NativeUdpReceiver(port=0, ring_samples=1 << 18) as rx:
        tx = UdpSink("127.0.0.1", rx.port)
        chunk = np.full(2048, 0.5 + 0.5j, np.complex64)
        n_chunks = 64
        total = 0
        for _ in range(n_chunks):
            tx.send(chunk)
            total += rx.read(1 << 16).size
            time.sleep(0.001)
        deadline = time.time() + 3.0
        while time.time() < deadline and total < n_chunks * 2048:
            total += rx.read(1 << 16).size
            time.sleep(0.01)
        assert total == n_chunks * 2048
        assert rx.stats["overrun_floats"] == 0
