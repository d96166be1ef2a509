"""ctypes bindings for the native iqcore runtime (iqcore.cpp).

Builds the shared library on first use (g++, cached next to the
source); every entry point has a pure-numpy fallback so the package
works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "iqcore.cpp")
_SO = os.path.join(_DIR, "libiqcore.so")

_lib = None
_lock = threading.Lock()
_build_error: str | None = None


def _build() -> bool:
    global _build_error
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001
        _build_error = str(e)
        return False


def get_lib():
    """The loaded shared library or None (numpy fallback)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            global _build_error
            _build_error = str(e)
            return None
        # signatures
        i64, u64, f32p = ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(
            ctypes.c_float)
        lib.iqcore_abi_version.restype = ctypes.c_int
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [u64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_write.restype = u64
        lib.ring_write.argtypes = [ctypes.c_void_p, f32p, u64]
        lib.ring_read.restype = u64
        lib.ring_read.argtypes = [ctypes.c_void_p, f32p, u64]
        lib.ring_available_read.restype = u64
        lib.ring_available_read.argtypes = [ctypes.c_void_p]
        lib.ring_available_write.restype = u64
        lib.ring_available_write.argtypes = [ctypes.c_void_p]
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.iq_f32_to_i16.argtypes = [f32p, i16p, i64, ctypes.c_float]
        lib.iq_i16_to_f32.argtypes = [i16p, f32p, i64, ctypes.c_float]
        lib.iq_interleave.argtypes = [f32p, f32p, f32p, i64]
        lib.iq_deinterleave.argtypes = [f32p, f32p, f32p, i64]
        if hasattr(lib, "udprx_create"):
            lib.udprx_create.restype = ctypes.c_void_p
            lib.udprx_create.argtypes = [ctypes.c_int, u64, ctypes.c_int,
                                         ctypes.c_int]
            lib.udprx_destroy.argtypes = [ctypes.c_void_p]
            lib.udprx_port.restype = ctypes.c_int
            lib.udprx_port.argtypes = [ctypes.c_void_p]
            lib.udprx_read.restype = u64
            lib.udprx_read.argtypes = [ctypes.c_void_p, f32p, u64]
            for fn in ("udprx_available", "udprx_packets",
                       "udprx_seq_gaps", "udprx_overruns"):
                getattr(lib, fn).restype = u64
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
        if lib.iqcore_abi_version() < 1:
            _build_error = "abi mismatch"
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def build_error() -> str | None:
    return _build_error


# ---------------------------------------------------------------------
# Format conversion (native when possible, numpy otherwise)
# ---------------------------------------------------------------------


def _as_f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, np.float32)


def f32_to_i16(x: np.ndarray, scale: float = 32767.0) -> np.ndarray:
    lib = get_lib()
    x = _as_f32(x)
    out = np.empty(x.size, np.int16)
    if lib is not None:
        lib.iq_f32_to_i16(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_int64(x.size), ctypes.c_float(scale),
        )
        return out
    return np.clip(np.round(x * scale), -32768, 32767).astype(np.int16)


def i16_to_f32(x: np.ndarray, scale: float = 32767.0) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.size, np.float32)
    if lib is not None:
        lib.iq_i16_to_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(x.size), ctypes.c_float(1.0 / scale),
        )
        return out
    return (x / scale).astype(np.float32)


def interleave(re: np.ndarray, im: np.ndarray) -> np.ndarray:
    lib = get_lib()
    re = _as_f32(re)
    im = _as_f32(im)
    out = np.empty(re.size * 2, np.float32)
    if lib is not None:
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.iq_interleave(re.ctypes.data_as(f32p), im.ctypes.data_as(f32p),
                          out.ctypes.data_as(f32p),
                          ctypes.c_int64(re.size))
        return out
    out[0::2] = re
    out[1::2] = im
    return out


def deinterleave(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    x = _as_f32(x)
    n = x.size // 2
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    if lib is not None:
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.iq_deinterleave(x.ctypes.data_as(f32p),
                            re.ctypes.data_as(f32p),
                            im.ctypes.data_as(f32p), ctypes.c_int64(n))
        return re, im
    return x[0::2].copy(), x[1::2].copy()


# ---------------------------------------------------------------------
# Ring buffer (SPSC, rt/ringbuffer.rs role)
# ---------------------------------------------------------------------


class NativeRingBuffer:
    """Lock-free SPSC ring over float32 (use 2 floats per IQ sample).

    Falls back to a Python deque-of-arrays when native is unavailable.
    """

    def __init__(self, capacity_floats: int):
        self._lib = get_lib()
        self._native = self._lib is not None
        if self._native:
            self._h = self._lib.ring_create(
                ctypes.c_uint64(capacity_floats))
            if not self._h:
                raise MemoryError("ring_create failed")
        else:
            from collections import deque

            self._q = deque()
            self._stored = 0
            self._cap = capacity_floats

    def write(self, arr: np.ndarray) -> int:
        arr = _as_f32(arr)
        if self._native:
            return int(self._lib.ring_write(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_uint64(arr.size)))
        take = min(arr.size, self._cap - self._stored)
        if take:
            self._q.append(arr[:take].copy())
            self._stored += take
        return take

    def read(self, n: int) -> np.ndarray:
        if self._native:
            out = np.empty(n, np.float32)
            got = int(self._lib.ring_read(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_uint64(n)))
            return out[:got]
        parts = []
        need = min(n, self._stored)
        while need > 0 and self._q:
            chunk = self._q.popleft()
            if chunk.size > need:
                parts.append(chunk[:need])
                self._q.appendleft(chunk[need:])
                self._stored -= need
                need = 0
            else:
                parts.append(chunk)
                self._stored -= chunk.size
                need -= chunk.size
        return (np.concatenate(parts) if parts
                else np.zeros(0, np.float32))

    @property
    def readable(self) -> int:
        if self._native:
            return int(self._lib.ring_available_read(self._h))
        return self._stored

    @property
    def writable(self) -> int:
        if self._native:
            return int(self._lib.ring_available_write(self._h))
        return self._cap - self._stored

    def write_complex(self, x: np.ndarray) -> int:
        x = np.asarray(x, np.complex64)
        return self.write(interleave(x.real, x.imag)) // 2

    def read_complex(self, n: int) -> np.ndarray:
        raw = self.read(2 * n)
        m = raw.size // 2
        re, im = deinterleave(raw[: 2 * m])
        return (re + 1j * im).astype(np.complex64)

    def __del__(self):
        if getattr(self, "_native", False) and getattr(self, "_h", None):
            try:
                self._lib.ring_destroy(self._h)
            except Exception:  # noqa: BLE001 - interpreter teardown
                pass


# ---------------------------------------------------------------------
# Native UDP IQ receiver (iqcore.cpp UdpRx): a C++ thread drains the
# socket into the lock-free ring; Python reads decoded complex64 in
# bulk. The hot receive path never touches the interpreter
# (benchmark/receiver.rs role).
# ---------------------------------------------------------------------


class NativeUdpReceiver:
    """Threaded native UDP IQ receiver (loopback bind by default;
    bind_any=True exposes it on all interfaces — see ADVICE r1 on
    open control planes).

    Wire format matches `r4w_tpu.net` ([seq u32 LE][f32 I/Q ...]).
    Raises RuntimeError when the native library is unavailable.
    """

    def __init__(self, port: int = 0, ring_samples: int = 1 << 20,
                 has_header: bool = True, bind_any: bool = False):
        lib = get_lib()
        if lib is None or not hasattr(lib, "udprx_create"):
            raise RuntimeError(
                f"native UDP receiver unavailable: {build_error()}")
        self._lib = lib
        self._h = lib.udprx_create(int(port), int(ring_samples) * 2,
                                   1 if has_header else 0,
                                   1 if bind_any else 0)
        if not self._h:
            raise RuntimeError(f"could not bind UDP port {port}")

    @property
    def port(self) -> int:
        return int(self._lib.udprx_port(self._h))

    @property
    def available_samples(self) -> int:
        return int(self._lib.udprx_available(self._h)) // 2

    def read(self, max_samples: int) -> np.ndarray:
        buf = np.empty(max_samples * 2 + 1, np.float32)
        carry = getattr(self, "_carry", None)
        off = 0
        if carry is not None:
            buf[0] = carry
            off = 1
            self._carry = None
        got = off + int(self._lib.udprx_read(
            self._h,
            buf[off:].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples * 2))
        if got & 1:
            # ring reads are float-granular; an odd count splits an
            # I/Q pair — carry the dangling I to the next read so the
            # stream never misaligns
            self._carry = float(buf[got - 1])
            got -= 1
        inter = buf[:got]
        return (inter[0::2] + 1j * inter[1::2]).astype(np.complex64)

    @property
    def stats(self) -> dict:
        return {
            "packets": int(self._lib.udprx_packets(self._h)),
            "seq_gaps": int(self._lib.udprx_seq_gaps(self._h)),
            "overrun_floats": int(self._lib.udprx_overruns(self._h)),
        }

    def close(self):
        if self._h:
            self._lib.udprx_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - belt and braces
        try:
            self.close()
        except Exception:
            pass
