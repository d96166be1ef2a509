"""ctypes loader + pythonic wrapper for the C API (r4w_capi.cpp).

The C library is the framework's embedded/host seam — the role of the
reference's r4w-ffi crate (crates/r4w-ffi/src/lib.rs): C callers get
complex helpers, FFT, chirp generation, an SPSC ring, and
BPSK/QPSK/LoRa modulate/demodulate without a Python runtime. This
module builds `libr4w.so` on demand (g++, cached beside the source)
and exposes a thin wrapper so the *test suite* can cross-validate the
C implementations against the JAX ones (tests/test_capi.py). End users
of the C API include `r4w_capi.h` and link `libr4w.so` directly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "r4w_capi.cpp")
_HDR = os.path.join(_DIR, "r4w_capi.h")
_SO = os.path.join(_DIR, "libr4w.so")

_lib = None
_lock = threading.Lock()
_build_error: str | None = None

OK = 0
ERR_NULL = 1
ERR_SIZE = 2
ERR_FULL = 3
ERR_EMPTY = 4

WAVEFORM_BPSK = 0
WAVEFORM_QPSK = 1
WAVEFORM_LORA = 2


class Complex(ctypes.Structure):
    _fields_ = [("re", ctypes.c_double), ("im", ctypes.c_double)]


def _build() -> bool:
    global _build_error
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=180,
        )
        return True
    except Exception as e:  # noqa: BLE001
        _build_error = str(e)
        return False


def _sig(lib):
    c_sz, c_dbl = ctypes.c_size_t, ctypes.c_double
    p = ctypes.POINTER
    lib.r4w_version.restype = ctypes.c_char_p
    lib.r4w_abi_version.restype = ctypes.c_int
    lib.r4w_complex_new.restype = Complex
    lib.r4w_complex_new.argtypes = [c_dbl, c_dbl]
    lib.r4w_complex_from_polar.restype = Complex
    lib.r4w_complex_from_polar.argtypes = [c_dbl, c_dbl]
    for f in ("magnitude", "phase", "power"):
        fn = getattr(lib, f"r4w_complex_{f}")
        fn.restype = c_dbl
        fn.argtypes = [Complex]
    for f in ("conj",):
        fn = getattr(lib, f"r4w_complex_{f}")
        fn.restype = Complex
        fn.argtypes = [Complex]
    for f in ("mul", "add"):
        fn = getattr(lib, f"r4w_complex_{f}")
        fn.restype = Complex
        fn.argtypes = [Complex, Complex]
    # FFT
    lib.r4w_fft_new.restype = ctypes.c_void_p
    lib.r4w_fft_new.argtypes = [c_sz]
    lib.r4w_fft_free.argtypes = [ctypes.c_void_p]
    lib.r4w_fft_size.restype = c_sz
    lib.r4w_fft_size.argtypes = [ctypes.c_void_p]
    for f in ("forward", "inverse"):
        fn = getattr(lib, f"r4w_fft_{f}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, p(Complex), c_sz]
    lib.r4w_fft_find_peak.restype = ctypes.c_int
    lib.r4w_fft_find_peak.argtypes = [p(Complex), c_sz, p(c_sz),
                                      p(c_dbl), p(c_dbl)]
    lib.r4w_fft_power_spectrum_db.restype = ctypes.c_int
    lib.r4w_fft_power_spectrum_db.argtypes = [p(Complex), p(c_dbl), c_sz]
    # chirp
    lib.r4w_chirp_new.restype = ctypes.c_void_p
    lib.r4w_chirp_new.argtypes = [ctypes.c_uint8, ctypes.c_uint32, c_sz]
    lib.r4w_chirp_free.argtypes = [ctypes.c_void_p]
    lib.r4w_chirp_samples_per_symbol.restype = c_sz
    lib.r4w_chirp_samples_per_symbol.argtypes = [ctypes.c_void_p]
    lib.r4w_chirp_bandwidth.restype = c_dbl
    lib.r4w_chirp_bandwidth.argtypes = [ctypes.c_void_p]
    for f in ("generate_upchirp", "generate_downchirp"):
        fn = getattr(lib, f"r4w_chirp_{f}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, p(Complex), c_sz]
    lib.r4w_chirp_modulate_symbol.restype = ctypes.c_int
    lib.r4w_chirp_modulate_symbol.argtypes = [ctypes.c_void_p,
                                              ctypes.c_uint16,
                                              p(Complex), c_sz]
    # ring buffer
    lib.r4w_ringbuffer_new.restype = ctypes.c_void_p
    lib.r4w_ringbuffer_new.argtypes = [c_sz]
    lib.r4w_ringbuffer_free.argtypes = [ctypes.c_void_p]
    for f in ("capacity", "len"):
        fn = getattr(lib, f"r4w_ringbuffer_{f}")
        fn.restype = c_sz
        fn.argtypes = [ctypes.c_void_p]
    for f in ("is_empty", "is_full"):
        fn = getattr(lib, f"r4w_ringbuffer_{f}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p]
    lib.r4w_ringbuffer_push.restype = ctypes.c_int
    lib.r4w_ringbuffer_push.argtypes = [ctypes.c_void_p, Complex]
    lib.r4w_ringbuffer_pop.restype = ctypes.c_int
    lib.r4w_ringbuffer_pop.argtypes = [ctypes.c_void_p, p(Complex)]
    lib.r4w_ringbuffer_push_slice.restype = c_sz
    lib.r4w_ringbuffer_push_slice.argtypes = [ctypes.c_void_p,
                                              p(Complex), c_sz]
    lib.r4w_ringbuffer_pop_slice.restype = c_sz
    lib.r4w_ringbuffer_pop_slice.argtypes = [ctypes.c_void_p,
                                             p(Complex), c_sz]
    # signal utils
    lib.r4w_generate_tone.restype = ctypes.c_int
    lib.r4w_generate_tone.argtypes = [c_dbl, c_dbl, p(Complex), c_sz]
    lib.r4w_add_awgn.restype = ctypes.c_int
    lib.r4w_add_awgn.argtypes = [p(Complex), c_sz, c_dbl]
    lib.r4w_frequency_shift.restype = ctypes.c_int
    lib.r4w_frequency_shift.argtypes = [p(Complex), c_sz, c_dbl, c_dbl]
    # waveforms
    lib.r4w_waveform_bpsk_new.restype = ctypes.c_void_p
    lib.r4w_waveform_bpsk_new.argtypes = [c_dbl, c_dbl]
    lib.r4w_waveform_qpsk_new.restype = ctypes.c_void_p
    lib.r4w_waveform_qpsk_new.argtypes = [c_dbl, c_dbl]
    lib.r4w_waveform_lora_new.restype = ctypes.c_void_p
    lib.r4w_waveform_lora_new.argtypes = [ctypes.c_uint8,
                                          ctypes.c_uint32, c_dbl]
    lib.r4w_waveform_free.argtypes = [ctypes.c_void_p]
    lib.r4w_waveform_get_type.restype = ctypes.c_int
    lib.r4w_waveform_get_type.argtypes = [ctypes.c_void_p]
    lib.r4w_waveform_samples_per_symbol.restype = c_sz
    lib.r4w_waveform_samples_per_symbol.argtypes = [ctypes.c_void_p]
    lib.r4w_waveform_name.restype = ctypes.c_char_p
    lib.r4w_waveform_name.argtypes = [ctypes.c_void_p]
    lib.r4w_waveform_modulate_size.restype = c_sz
    lib.r4w_waveform_modulate_size.argtypes = [ctypes.c_void_p, c_sz]
    lib.r4w_waveform_modulate.restype = ctypes.c_int
    lib.r4w_waveform_modulate.argtypes = [
        ctypes.c_void_p, p(ctypes.c_uint8), c_sz, p(Complex), c_sz,
        p(c_sz)]
    lib.r4w_waveform_demodulate.restype = ctypes.c_int
    lib.r4w_waveform_demodulate.argtypes = [
        ctypes.c_void_p, p(Complex), c_sz, p(ctypes.c_uint8), c_sz,
        p(c_sz)]


def get_lib():
    """The loaded C library, or None with `build_error()` set."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < max(os.path.getmtime(_SRC),
                                        os.path.getmtime(_HDR))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            global _build_error
            _build_error = str(e)
            return None
        _sig(lib)
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> str | None:
    return _build_error


# ---------------------------------------------------------------------
# numpy bridging helpers
# ---------------------------------------------------------------------


def _as_c128(x) -> np.ndarray:
    """complex128 C-contiguous copy — layout-compatible with Complex[]."""
    return np.ascontiguousarray(np.asarray(x), np.complex128).copy()


def _cbuf(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(Complex))


def fft_forward(x) -> np.ndarray:
    lib = get_lib()
    buf = _as_c128(x)
    h = lib.r4w_fft_new(buf.size)
    try:
        rc = lib.r4w_fft_forward(h, _cbuf(buf), buf.size)
        if rc != OK:
            raise RuntimeError(f"r4w_fft_forward rc={rc}")
    finally:
        lib.r4w_fft_free(h)
    return buf


def fft_inverse(x) -> np.ndarray:
    lib = get_lib()
    buf = _as_c128(x)
    h = lib.r4w_fft_new(buf.size)
    try:
        rc = lib.r4w_fft_inverse(h, _cbuf(buf), buf.size)
        if rc != OK:
            raise RuntimeError(f"r4w_fft_inverse rc={rc}")
    finally:
        lib.r4w_fft_free(h)
    return buf


class CChirp:
    """RAII wrapper over r4w_chirp_t."""

    def __init__(self, sf: int, bw_hz: int, oversample: int = 1):
        self._lib = get_lib()
        self._h = self._lib.r4w_chirp_new(sf, bw_hz, oversample)
        if not self._h:
            raise ValueError("invalid chirp parameters")

    @property
    def samples_per_symbol(self) -> int:
        return int(self._lib.r4w_chirp_samples_per_symbol(self._h))

    def _gen(self, fn_name: str, *args) -> np.ndarray:
        n = self.samples_per_symbol
        out = np.zeros(n, np.complex128)
        rc = getattr(self._lib, fn_name)(self._h, *args, _cbuf(out), n)
        if rc != OK:
            raise RuntimeError(f"{fn_name} rc={rc}")
        return out

    def upchirp(self) -> np.ndarray:
        return self._gen("r4w_chirp_generate_upchirp")

    def downchirp(self) -> np.ndarray:
        return self._gen("r4w_chirp_generate_downchirp")

    def symbol(self, sym: int) -> np.ndarray:
        return self._gen("r4w_chirp_modulate_symbol", sym)

    def close(self):
        if self._h:
            self._lib.r4w_chirp_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


class CWaveform:
    """RAII wrapper over r4w_waveform_t."""

    def __init__(self, handle, lib):
        if not handle:
            raise ValueError("invalid waveform parameters")
        self._h = handle
        self._lib = lib

    @classmethod
    def bpsk(cls, sample_rate: float, symbol_rate: float) -> "CWaveform":
        lib = get_lib()
        return cls(lib.r4w_waveform_bpsk_new(sample_rate, symbol_rate),
                   lib)

    @classmethod
    def qpsk(cls, sample_rate: float, symbol_rate: float) -> "CWaveform":
        lib = get_lib()
        return cls(lib.r4w_waveform_qpsk_new(sample_rate, symbol_rate),
                   lib)

    @classmethod
    def lora(cls, sf: int, bw_hz: int, sample_rate: float) -> "CWaveform":
        lib = get_lib()
        return cls(lib.r4w_waveform_lora_new(sf, bw_hz, sample_rate),
                   lib)

    @property
    def name(self) -> str:
        return self._lib.r4w_waveform_name(self._h).decode()

    @property
    def samples_per_symbol(self) -> int:
        return int(self._lib.r4w_waveform_samples_per_symbol(self._h))

    def modulate(self, data: bytes) -> np.ndarray:
        raw = np.frombuffer(bytes(data), np.uint8)
        cap = int(self._lib.r4w_waveform_modulate_size(self._h, raw.size))
        out = np.zeros(cap, np.complex128)
        written = ctypes.c_size_t(0)
        rc = self._lib.r4w_waveform_modulate(
            self._h, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw.size, _cbuf(out), cap, ctypes.byref(written))
        if rc != OK:
            raise RuntimeError(f"r4w_waveform_modulate rc={rc}")
        return out[: written.value]

    def demodulate(self, samples) -> bytes:
        buf = _as_c128(samples)
        cap = max(buf.size, 64)
        out = np.zeros(cap, np.uint8)
        written = ctypes.c_size_t(0)
        rc = self._lib.r4w_waveform_demodulate(
            self._h, _cbuf(buf), buf.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            ctypes.byref(written))
        if rc != OK:
            raise RuntimeError(f"r4w_waveform_demodulate rc={rc}")
        return bytes(out[: written.value])

    def close(self):
        if self._h:
            self._lib.r4w_waveform_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass
