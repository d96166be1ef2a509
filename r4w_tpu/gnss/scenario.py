"""Multi-satellite GNSS IQ scenario generator.

Re-design of waveform/gnss/scenario.rs:308-549 + satellite_emitter.rs:
the reference's hot path is a rayon-parallel per-SV per-sample loop with
oversample → LPF → decimate → rotate → accumulate. Here the whole block
is ONE (SV × sample) vectorized jnp expression:

  code phase  φ_c[s, n] = chip_rate·(1 + fd[s,n]/f_carrier)·t[n] − τ[s]·chip_rate
  chips       gather from a per-SV spread-waveform bank (CBOC pre-spread)
  carrier     exp(j2π(fd0[s]·t + ½·fdot[s]·t²))
  composite   Σ_s amp[s]·chip·carrier + CN(0, σ²)

State across blocks is just (t0, PRNG key) — phases are closed-form in
absolute time, so blocks are bit-identical regardless of block size
(unlike the reference's carried NCO state).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE
from r4w_tpu.gnss import boc, prn
from r4w_tpu.gnss.coordinates import LIGHT_SPEED
from r4w_tpu.gnss.environment import KeplerianOrbit

GALILEO_E1_HZ = 1_575_420_000.0
GPS_L1_HZ = 1_575_420_000.0
CHIP_RATE = 1_023_000.0

# sub-chips per chip in the pre-spread waveform bank (12 ⇒ exact BOC(6,1))
SUBCHIP = 12


@dataclasses.dataclass(frozen=True)
class SatelliteConfig:
    """One emitter (scenario_config.rs satellites[] entry)."""

    signal: str = "GalileoE1C"  # GalileoE1C | GalileoE1B | GpsL1Ca | GlonassL1of
    prn: int = 1
    cn0_dbhz: float = 45.0
    doppler_hz: float = 0.0
    range_m: float = 23_000_000.0
    range_rate_mps: float = 0.0
    elevation_deg: float = 45.0
    azimuth_deg: float = 0.0
    plane: int = 0
    slot: int = 0
    tx_power_dbw: float = 15.0
    nav_data: bool = False
    orbital_dynamics: bool = False
    iono_delay_m: float = 0.0
    tropo_delay_m: float = 0.0


@dataclasses.dataclass(frozen=True)
class ReceiverConfig:
    lat_deg: float = 0.0
    lon_deg: float = 0.0
    alt_m: float = 0.0
    elevation_mask_deg: float = 5.0
    noise_figure_db: float = 2.0
    bandwidth_hz: float = 5e6
    antenna: str = "patch"


@dataclasses.dataclass(frozen=True)
class ScenarioConfig:
    satellites: tuple[SatelliteConfig, ...] = ()
    receiver: ReceiverConfig = ReceiverConfig()
    sample_rate: float = 5e6
    duration_s: float = 1.0
    seed: int = 12345
    format: str = "cf32"
    output_path: str = "scenario.iq"


def _spread_waveform(sat: SatelliteConfig) -> np.ndarray:
    """Pre-spread ±(weighted) waveform at SUBCHIP × chip rate."""
    sig = sat.signal.lower()
    if sig.startswith("galileoe1"):
        chips = prn.galileo_e1_code(sat.prn, "B" if sig.endswith("b") else "C")
        return boc.cboc_spread(chips, SUBCHIP, pilot=sig.endswith("c"))
    if sig in ("gpsl1ca", "gps", "gpsca"):
        chips = prn.gps_ca_code(sat.prn)
        return np.repeat(chips.astype(np.float32), SUBCHIP)
    if sig.startswith("glonass"):
        chips = prn.glonass_l1of_code()
        return np.repeat(chips.astype(np.float32), SUBCHIP)
    raise ValueError(f"unknown signal {sat.signal}")


def _doppler_rate(sat: SatelliteConfig) -> float:
    """Doppler drift (Hz/s) from Keplerian geometry when orbital dynamics
    are on (scenario.rs phase-1 geometry)."""
    if not sat.orbital_dynamics:
        return 0.0
    orbit = KeplerianOrbit(
        raan_deg=sat.plane * 120.0,
        mean_anomaly_deg=sat.slot * 45.0,
    )
    # numeric second derivative of range toward an equatorial receiver
    rx = np.array([6_378_137.0, 0.0, 0.0])
    ts = np.array([0.0, 1.0, 2.0])
    pos, _ = orbit.propagate(ts)
    rng = np.linalg.norm(pos - rx, axis=-1)
    rddot = rng[2] - 2 * rng[1] + rng[0]  # m/s²
    return float(-rddot * GALILEO_E1_HZ / LIGHT_SPEED)


class GnssScenario:
    """Block-based IQ generator (GnssScenario, scenario.rs:78-549)."""

    def __init__(self, config: ScenarioConfig):
        self.config = config
        sats = config.satellites
        if not sats:
            raise ValueError("scenario needs at least one satellite")
        # visibility mask
        mask = config.receiver.elevation_mask_deg
        sats = tuple(s for s in sats if s.elevation_deg >= mask)
        self.satellites = sats
        waves = [_spread_waveform(s) for s in sats]
        max_len = max(len(w) for w in waves)
        bank = np.zeros((len(waves), max_len), np.float32)
        lengths = np.zeros(len(waves), np.int64)
        for i, w in enumerate(waves):
            bank[i, : len(w)] = w
            lengths[i] = len(w)
        self._bank = jnp.asarray(bank)
        self._lengths = jnp.asarray(lengths)
        fs = config.sample_rate
        # unit noise power; amplitude from C/N0: C = 10^(cn0/10) / fs
        self._amps = jnp.asarray(
            [np.sqrt(10.0 ** (s.cn0_dbhz / 10.0) / fs) for s in sats],
            REAL_DTYPE,
        )
        self._dop0 = jnp.asarray([s.doppler_hz for s in sats], REAL_DTYPE)
        self._dop_rate = jnp.asarray([_doppler_rate(s) for s in sats],
                                     REAL_DTYPE)
        delays = [
            (s.range_m + s.iono_delay_m + s.tropo_delay_m) / LIGHT_SPEED
            for s in sats
        ]
        # host-side f64 (consumed by _phases_at; never shipped to device)
        self._delay_s = np.asarray(delays, np.float64)
        self._key = jax.random.key(config.seed)
        self._t0 = 0.0
        self._block_fn = self._make_block_fn()

    def _make_block_fn(self):
        """Block kernel taking per-SV phase offsets computed host-side in
        f64 — only within-block time (≤ block/fs seconds) lives in f32,
        so 60+ s scenarios keep sub-chip code alignment (the pure
        closed-form-in-f32 variant loses ~64 sub-chips by t=60 s)."""
        fs = self.config.sample_rate
        bank = self._bank
        lengths = self._lengths.astype(jnp.int32)
        amps = self._amps
        subchip_rate = CHIP_RATE * SUBCHIP

        def block(chips0, dop_eff, theta0, n, key):
            # chips0: (S,) sub-chip phase at block start (0..L)
            # dop_eff: (S,) Doppler at block start (Hz)
            # theta0: (S,) carrier phase at block start (cycles, mod 1)
            tau = jnp.arange(n, dtype=REAL_DTYPE) / fs  # (N,) <= 0.2 s
            code_rate = subchip_rate * (1.0 + dop_eff / GALILEO_E1_HZ)
            sub_pos = chips0[:, None] + code_rate[:, None] * tau[None, :]
            sub_idx = jnp.mod(
                jnp.floor(sub_pos).astype(jnp.int32), lengths[:, None]
            )
            chipsig = jnp.take_along_axis(bank, sub_idx, axis=1)  # (S, N)
            phase = 2.0 * jnp.pi * (
                theta0[:, None] + dop_eff[:, None] * tau[None, :]
            )
            carrier = cis(phase.astype(REAL_DTYPE))
            composite = jnp.sum(amps[:, None] * chipsig * carrier, axis=0)
            k1, k2 = jax.random.split(key)
            noise = (
                jax.lax.complex(jax.random.normal(k1, (n,), REAL_DTYPE),
                                jax.random.normal(k2, (n,), REAL_DTYPE))
            ) * jnp.sqrt(0.5)
            return (composite + noise).astype(IQ_DTYPE)

        return jax.jit(block, static_argnums=(3,))

    def _phases_at(self, t0: float):
        """Host-side f64 closed-form phases at absolute time t0."""
        dop0 = np.asarray(self._dop0, np.float64)
        rate = np.asarray(self._dop_rate, np.float64)
        delay = np.asarray(self._delay_s, np.float64)
        lengths = np.asarray(self._lengths, np.float64)
        subchip_rate = CHIP_RATE * SUBCHIP
        # code phase: ∫ subchip_rate·(1 + fd(t)/fc) dt from -delay to t0
        carrier_cycles = dop0 * t0 + 0.5 * rate * t0 * t0
        code_elapsed = (t0 - delay) + carrier_cycles / GALILEO_E1_HZ
        chips0 = np.mod(code_elapsed * subchip_rate, lengths)
        dop_eff = dop0 + rate * t0
        theta0 = np.mod(carrier_cycles, 1.0)
        return (
            jnp.asarray(chips0, REAL_DTYPE),
            jnp.asarray(dop_eff, REAL_DTYPE),
            jnp.asarray(theta0, REAL_DTYPE),
        )

    def generate_block(self, n_samples: int) -> jax.Array:
        """Next block of composite IQ (advances scenario time + PRNG)."""
        self._key, sub = jax.random.split(self._key)
        chips0, dop_eff, theta0 = self._phases_at(self._t0)
        out = self._block_fn(chips0, dop_eff, theta0, n_samples, sub)
        self._t0 += n_samples / self.config.sample_rate
        return out

    def generate(self, duration_s: float | None = None,
                 block_size: int = 1 << 20) -> np.ndarray:
        dur = duration_s if duration_s is not None else self.config.duration_s
        total = int(dur * self.config.sample_rate)
        parts = []
        remaining = total
        while remaining > 0:
            n = min(block_size, remaining)
            parts.append(np.asarray(self.generate_block(n)))
            remaining -= n
        return np.concatenate(parts)


# --------------------------------------------------------------------------
# YAML config (scenario_config.rs:18-551) — compatible with the reference's
# e1c_*.yaml files, including their `!Tag` antenna syntax.
# --------------------------------------------------------------------------


def _tolerant_yaml_load(text: str):
    import yaml

    class TolerantLoader(yaml.SafeLoader):
        pass

    def unknown(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            d = loader.construct_mapping(node)
            d["type"] = tag_suffix.lstrip("!")
            return d
        if isinstance(node, yaml.SequenceNode):
            return loader.construct_sequence(node)
        return loader.construct_scalar(node)

    TolerantLoader.add_multi_constructor("!", unknown)
    TolerantLoader.add_multi_constructor("tag:", unknown)
    return yaml.load(text, Loader=TolerantLoader)


def load_scenario_yaml(path_or_text: str) -> ScenarioConfig:
    """Parse a reference-format scenario YAML (file path or text)."""
    import os

    looks_like_path = "\n" not in path_or_text and path_or_text.endswith(
        (".yaml", ".yml")
    )
    if looks_like_path and not os.path.exists(path_or_text):
        raise FileNotFoundError(f"scenario config not found: {path_or_text}")
    text = (
        open(path_or_text).read()
        if os.path.exists(path_or_text)
        else path_or_text
    )
    raw = _tolerant_yaml_load(text)
    sats = tuple(
        SatelliteConfig(
            signal=s.get("signal", "GalileoE1C"),
            prn=int(s.get("prn", 1)),
            cn0_dbhz=float(s.get("cn0_dbhz", 45.0)),
            doppler_hz=float(s.get("doppler_hz", 0.0)),
            range_m=float(s.get("range_m", 23e6)),
            range_rate_mps=float(s.get("range_rate_mps", 0.0)),
            elevation_deg=float(s.get("elevation_deg", 45.0)),
            azimuth_deg=float(s.get("azimuth_deg", 0.0)),
            plane=int(s.get("plane", 0)),
            slot=int(s.get("slot", 0)),
            tx_power_dbw=float(s.get("tx_power_dbw", 15.0)),
            nav_data=bool(s.get("nav_data", False)),
            orbital_dynamics=bool(s.get("orbital_dynamics", False)),
            iono_delay_m=float(s.get("iono_delay_m", 0.0)),
            tropo_delay_m=float(s.get("tropo_delay_m", 0.0)),
        )
        for s in raw.get("satellites", [])
    )
    rx_raw = raw.get("receiver", {})
    pos = rx_raw.get("position", {})
    ant = rx_raw.get("antenna", {})
    ant_type = (ant.get("type", "patch") if isinstance(ant, dict)
                else str(ant)).lower()
    receiver = ReceiverConfig(
        lat_deg=float(pos.get("lat_deg", 0.0)),
        lon_deg=float(pos.get("lon_deg", 0.0)),
        alt_m=float(pos.get("alt_m", 0.0)),
        elevation_mask_deg=float(rx_raw.get("elevation_mask_deg", 5.0)),
        noise_figure_db=float(rx_raw.get("noise_figure_db", 2.0)),
        bandwidth_hz=float(rx_raw.get("bandwidth_hz", 5e6)),
        antenna=ant_type,
    )
    out = raw.get("output", {})
    return ScenarioConfig(
        satellites=sats,
        receiver=receiver,
        sample_rate=float(out.get("sample_rate", 5e6)),
        duration_s=float(out.get("duration_s", 1.0)),
        format=str(out.get("format", "cf32")),
        output_path=str(out.get("output_path", "scenario.iq")),
        seed=int(raw.get("seed", 12345)),
    )
