"""Convenience one-stop import surface (prelude.rs re-design):
``from r4w_tpu.prelude import *`` brings the common entry points into
scope, mirroring the reference's `use r4w_core::prelude::*` habit."""

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE, DspError  # noqa: F401
from r4w_tpu.core import fftops  # noqa: F401
from r4w_tpu.core.hostio import cis, to_device, to_host  # noqa: F401
from r4w_tpu.waveforms import create_waveform, list_waveforms  # noqa: F401
from r4w_tpu.channel import awgn  # noqa: F401
from r4w_tpu.registry import default_registry  # noqa: F401
from r4w_tpu.ops import filters, pulse, sync, measure  # noqa: F401

__all__ = [
    "IQ_DTYPE", "REAL_DTYPE", "DspError", "fftops", "cis",
    "to_device", "to_host", "create_waveform", "list_waveforms",
    "awgn", "default_registry", "filters", "pulse", "sync", "measure",
]
