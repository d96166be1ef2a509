"""Adapter exposing C-ABI plugin waveforms through the Waveform API.

The native side implements `r4w_tpu/native/r4w_plugin.h`
(plugin/abi.rs re-design); this wrapper moves IQ across the boundary
as interleaved f32 and presents the standard pure modulate/demodulate
surface, so plugin waveforms are indistinguishable from built-ins in
the factory, CLI, and explorer.
"""

from __future__ import annotations

import ctypes
import dataclasses

import jax
import numpy as np

from r4w_tpu.core.hostio import to_device
from r4w_tpu.core.types import CommonParams, SYMBOL_DTYPE
from r4w_tpu.waveforms.base import DemodResult, Waveform, WaveformInfo


@dataclasses.dataclass
class NativePluginWaveform(Waveform):
    """One waveform exported by a loaded C plugin."""

    lib: ctypes.CDLL
    waveform_id: str
    sample_rate: float = 125_000.0

    @property
    def common_params(self) -> CommonParams:
        return CommonParams(sample_rate=self.sample_rate)

    def samples_per_symbol(self) -> int:
        return 1

    def info(self) -> WaveformInfo:
        return WaveformInfo(
            name=self.waveform_id,
            full_name=f"native plugin waveform {self.waveform_id!r}",
            description="loaded from a C-ABI plugin "
                        "(native/r4w_plugin.h)",
            complexity=1, bits_per_symbol=1,
        )

    def modulate(self, data) -> jax.Array:
        payload = np.ascontiguousarray(
            np.frombuffer(bytes(data), np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, np.uint8))
        max_samples = max(payload.size * 8 * 64, 4096)
        buf = np.empty(max_samples * 2, np.float32)
        n = self.lib.r4w_modulate(
            self.waveform_id.encode(), ctypes.c_double(self.sample_rate),
            payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(payload.size),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(max_samples))
        if n < 0:
            raise RuntimeError(
                f"plugin modulate failed for {self.waveform_id!r}")
        inter = buf[: 2 * n]
        iq = (inter[0::2] + 1j * inter[1::2]).astype(np.complex64)
        return to_device(iq)

    def demodulate(self, samples) -> DemodResult:
        x = np.asarray(jax.device_get(samples)).astype(np.complex64)
        inter = np.empty(x.size * 2, np.float32)
        inter[0::2] = x.real
        inter[1::2] = x.imag
        out = np.empty(max(x.size // 8, 16), np.uint8)
        n = self.lib.r4w_demodulate(
            self.waveform_id.encode(), ctypes.c_double(self.sample_rate),
            inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(x.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(out.size))
        if n < 0:
            raise RuntimeError(
                f"plugin demodulate failed for {self.waveform_id!r}")
        import jax.numpy as jnp

        bits = jnp.asarray(out[:n].astype(np.int32))
        return DemodResult(bits=bits,
                           symbols=jnp.zeros(0, SYMBOL_DTYPE))
