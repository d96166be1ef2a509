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
