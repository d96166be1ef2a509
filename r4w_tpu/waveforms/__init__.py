"""Waveform package: registry-backed factory over all implemented waveforms.

Importing this package registers every waveform module with the factory
(the import list below is the build-out ledger toward the reference's 46
names, waveform/mod.rs:459-489).
"""

from r4w_tpu.waveforms.base import (
    DemodResult,
    Waveform,
    WaveformFactory,
    WaveformInfo,
    create_waveform,
    list_waveforms,
    register_waveform,
)

# Registration imports (order defines WaveformFactory.list() order,
# mirroring the reference list in waveform/mod.rs:459-489).
from r4w_tpu.waveforms import simple_waveforms  # noqa: F401  CW/OOK/ASK/FSK
from r4w_tpu.waveforms import ppm  # noqa: F401  PPM/ADS-B
from r4w_tpu.waveforms import analog  # noqa: F401  AM/FM/NBFM
from r4w_tpu.waveforms import psk  # noqa: F401
from r4w_tpu.waveforms import qam  # noqa: F401
from r4w_tpu.waveforms import ofdm  # noqa: F401
from r4w_tpu.waveforms import dsss  # noqa: F401
from r4w_tpu.waveforms import iot_waveforms  # noqa: F401  Zigbee/UWB/FMCW
from r4w_tpu.waveforms import hf_waveforms  # noqa: F401  ALE/3G-ALE
from r4w_tpu.waveforms import stanag4285  # noqa: F401  STANAG 4285 frames
from r4w_tpu.waveforms import milstd188110  # noqa: F401  110A + autobaud
from r4w_tpu.waveforms import pmr_waveforms  # noqa: F401  P25/TETRA/DMR
from r4w_tpu.waveforms import milfh_waveforms  # noqa: F401  SINCGARS/HQ
from r4w_tpu.waveforms import link16  # noqa: F401  Link-16 TDMA/CCSK/RS
from r4w_tpu.waveforms import beacon  # noqa: F401  emergency beacons
from r4w_tpu.waveforms import fhss  # noqa: F401
from r4w_tpu.waveforms import lora_waveform  # noqa: F401
from r4w_tpu.waveforms import gnss_waveforms  # noqa: F401  GPS/GLONASS/Galileo

__all__ = [
    "DemodResult",
    "Waveform",
    "WaveformFactory",
    "WaveformInfo",
    "create_waveform",
    "list_waveforms",
    "register_waveform",
]
