"""GNSS stack: PRN codes, BOC/CBOC, batched PCPS acquisition, DLL/PLL
tracking, coordinates/orbits/atmosphere, LNAV, scenario engine."""

from r4w_tpu.gnss import boc, coordinates, environment, ephemeris, nav_message, prn
from r4w_tpu.gnss.acquisition import (
    AcquisitionResult,
    PcpsConfig,
    acquire,
    pcps_grid,
)
from r4w_tpu.gnss.scenario import (
    GnssScenario,
    ReceiverConfig,
    SatelliteConfig,
    ScenarioConfig,
    load_scenario_yaml,
)
from r4w_tpu.gnss.tracking import (
    TrackingConfig,
    TrackingState,
    dll_s_curve,
    extract_nav_bits,
    init_state,
    track,
)

__all__ = [
    "boc", "coordinates", "environment", "ephemeris", "nav_message", "prn",
    "AcquisitionResult", "PcpsConfig", "acquire", "pcps_grid",
    "GnssScenario", "ReceiverConfig", "SatelliteConfig", "ScenarioConfig",
    "load_scenario_yaml",
    "TrackingConfig", "TrackingState", "dll_s_curve", "extract_nav_bits",
    "init_state", "track",
]
