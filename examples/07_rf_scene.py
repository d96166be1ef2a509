"""Multi-emitter RF scene: waveform + jammer around a moving receiver.

Run: python examples/07_rf_scene.py
"""

import numpy as np

import examples_env  # noqa: F401
from r4w_tpu.sim.scenario import (NoiseJammerEmitter, SceneConfig,
                                  ScenarioEngine, ToneEmitter, Trajectory)

cfg = SceneConfig(sample_rate=250_000.0, duration_s=0.05)
rx = Trajectory.linear(45.0, 7.0, 100.0, (250.0, 0.0, 0.0))  # eastbound
emitters = [
    ToneEmitter(id="beacon", carrier_hz=1e9, power_dbm=30.0,
                offset_hz=20e3,
                trajectory=Trajectory.static(45.0, 7.05, 0.0)),
    NoiseJammerEmitter(id="jammer", carrier_hz=1e9, power_dbm=20.0,
                       t_on=0.025,
                       trajectory=Trajectory.static(45.0, 6.95, 0.0)),
]
eng = ScenarioEngine(cfg, emitters, rx, reference_power_dbm=-70.0)
for st in eng.emitter_status(0.0):
    print(f"{st.id:8s} range {st.range_m/1000:6.2f} km  "
          f"doppler {st.doppler_hz:+7.1f} Hz  rx {st.received_power_dbm:.1f} dBm")
iq = np.asarray(eng.generate_all())
p_first = (np.abs(iq[: len(iq) // 2]) ** 2).mean()
p_second = (np.abs(iq[len(iq) // 2:]) ** 2).mean()
print(f"\npower before jammer: {10*np.log10(p_first):+.1f} dB, "
      f"after it switches on: {10*np.log10(p_second):+.1f} dB")
