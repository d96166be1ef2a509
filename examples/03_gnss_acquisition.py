"""GNSS: generate a multi-satellite scenario and acquire every PRN with
the batched PCPS correlator (gnss workshop equivalent).
"""

import numpy as np

import examples_env  # noqa: F401
from r4w_tpu.gnss import GnssScenario, ScenarioConfig, SatelliteConfig
from r4w_tpu.gnss import acquisition, scenario as scen_mod

fs = 4_092_000.0
sats = tuple(
    SatelliteConfig(signal="GalileoE1C", prn=p, cn0_dbhz=45.0, doppler_hz=d)
    for p, d in [(3, 1200.0), (11, -800.0), (25, 2500.0)]
)
gen = GnssScenario(ScenarioConfig(satellites=sats, sample_rate=fs, seed=1))
n_period = int(fs * 4092 / 1.023e6)
block = gen.generate_block(n_period * 5)
print(f"generated {block.shape[0]} samples of 3-SV composite")

prns = [3, 11, 25, 30]
waves = [scen_mod._spread_waveform(SatelliteConfig(signal="GalileoE1C", prn=p))
         for p in prns]
codes = acquisition.sampled_code_bank(
    waves, scen_mod.CHIP_RATE * scen_mod.SUBCHIP, fs, n_period)
cfg = acquisition.PcpsConfig(doppler_max_hz=3000.0, doppler_step_hz=250.0,
                             coherent_periods=5)
res = acquisition.acquire(block, codes, prns, fs, cfg)
for i, p in enumerate(prns):
    print(f"  PRN {p:2d}: detected={bool(res.detected[i])!s:5s} "
          f"doppler={float(res.doppler_hz[i]):+7.0f} Hz "
          f"phase={float(res.code_phase[i]):7.0f} "
          f"metric={float(res.peak_metric[i]):5.1f}")
