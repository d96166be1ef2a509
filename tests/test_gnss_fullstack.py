"""Full-stack GNSS capstone: geometry → scenario IQ → acquisition →
pseudoranges → PVT position fix.

Build a receiver + satellite geometry, configure the scenario engine
with the TRUE geometric ranges, generate composite IQ, acquire every
PRN's code phase from the signal alone, convert code phases to
pseudoranges (integer milliseconds supplied, as nav framing would),
and solve for position — the recovered fix must land on the configured
receiver location."""

import numpy as np
import pytest

import jax.numpy as jnp

from r4w_tpu.gnss import acquisition, prn as prn_mod, pvt
from r4w_tpu.gnss.coordinates import lla_to_ecef
from r4w_tpu.gnss.scenario import (GnssScenario, ReceiverConfig,
                                   SatelliteConfig, ScenarioConfig)

FS = 2_046_000.0
CHIP_RATE = 1_023_000.0
C = pvt.SPEED_OF_LIGHT


def _geometry(n_sats=6, seed=0):
    truth = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
    rng = np.random.default_rng(seed)
    up = truth / np.linalg.norm(truth)
    east = np.cross([0, 0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    sats = []
    for a, e in zip(rng.uniform(0, 2 * np.pi, n_sats),
                    rng.uniform(np.radians(25), np.radians(80), n_sats)):
        los = (np.cos(e) * (np.sin(a) * east + np.cos(a) * north)
               + np.sin(e) * up)
        b = 2 * truth @ los
        c = truth @ truth - 26_560e3 ** 2
        t = (-b + np.sqrt(b * b - 4 * c)) / 2
        sats.append(truth + t * los)
    return truth, np.asarray(sats)


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@pytest.mark.slow
def test_position_fix_from_generated_signal():
    truth, sat_pos = _geometry()
    ranges = np.linalg.norm(sat_pos - truth, axis=1)
    prns = list(range(1, len(ranges) + 1))

    cfg = ScenarioConfig(
        sample_rate=FS, duration_s=0.01,
        satellites=tuple(
            SatelliteConfig(signal="GpsL1Ca", prn=p, cn0_dbhz=48.0,
                            doppler_hz=0.0, range_m=float(r))
            for p, r in zip(prns, ranges)),
        receiver=ReceiverConfig(lat_deg=45.0, lon_deg=7.0),
        seed=99)
    iq = GnssScenario(cfg).generate(0.01)

    codes = np.stack([np.repeat(prn_mod.gps_ca_code(p), 2)
                      for p in prns]).astype(np.float32)
    acq_cfg = acquisition.PcpsConfig(doppler_max_hz=500.0,
                                     doppler_step_hz=250.0,
                                     coherent_periods=8, threshold=2.0)
    res = acquisition.acquire(jnp.asarray(iq), jnp.asarray(codes), prns,
                              FS, acq_cfg)
    assert bool(np.asarray(res.detected).all()), np.asarray(
        res.peak_metric)

    # The acquisition lag is where chip 0 appears in the capture:
    # (tau/fs − range/c)·chip_rate ≡ 0 mod 1023, i.e. tau encodes the
    # fractional-millisecond part of the transit delay directly.
    phase_samples = np.asarray(res.code_phase, np.float64)
    delay_chips = (phase_samples / 2.0) % 1023.0

    # integer milliseconds from coarse knowledge (nav framing role)
    int_ms = np.floor(ranges / C * 1e3)
    rho = pvt.pseudoranges_from_code_phase(delay_chips, CHIP_RATE,
                                           int_ms)
    # wrap guard: if truth fraction was near 1.0 and measurement
    # wrapped, the solver residuals would show km-level errors;
    # geometry here keeps fractions interior (asserted):
    frac = (ranges / C * 1e3) % 1.0
    assert ((frac > 0.02) & (frac < 0.98)).all()

    sol = pvt.solve_position(sat_pos, rho)
    err = np.linalg.norm(sol.position_ecef - truth)
    # sub-chip code-phase quantization (half-sample ≈ 73 m) over 6 SVs
    assert err < 200.0, (err, sol.residuals_m)
    assert np.abs(sol.residuals_m).max() < 150.0
    # the solved clock bias absorbs the common sampling offset
    assert abs(sol.clock_bias_m) < 300.0
