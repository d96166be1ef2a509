"""HAL drivers/attenuator and waveform-spec assets."""

import glob

import numpy as np
import pytest

from r4w_tpu.sim import hal


def test_attenuator_quantization_and_apply():
    att = hal.DigitalAttenuator()
    actual = att.set_attenuation(10.1)
    assert actual == pytest.approx(10.0)
    assert att.total_loss_db == pytest.approx(11.5)  # + insertion loss
    x = np.ones(8, np.complex64)
    y = np.asarray(att.apply(x))
    assert np.allclose(np.abs(y), 10 ** (-11.5 / 20), atol=1e-5)
    with pytest.raises(ValueError):
        att.set_attenuation(-3)
    assert att.set_attenuation(500.0) == att.spec.max_db  # clamped


def test_attenuator_sweep():
    att = hal.DigitalAttenuator()
    vals = att.sweep(0.0, 5.0, 1.0)
    assert len(vals) == 6


def test_driver_registry_lists_and_opens():
    reg = hal.DriverRegistry()
    infos = {i.name: i for i in reg.list_drivers()}
    assert {"uhd", "soapysdr", "rtlsdr", "simulator", "sigmf"} <= set(infos)
    assert infos["simulator"].available
    # hardware drivers report unavailable with a reason (no libs here)
    assert not infos["uhd"].available
    assert infos["uhd"].reason
    sim = reg.open("simulator")
    assert sim is not None


def test_driver_open_errors():
    reg = hal.DriverRegistry()
    with pytest.raises(hal.DeviceNotFound):
        reg.open("uhd")
    with pytest.raises(hal.DeviceNotFound):
        reg.open("does-not-exist")


def test_spec_assets_load_and_validate():
    from r4w_tpu.waveform_spec import WaveformSpec
    from r4w_tpu.waveforms import create_waveform

    files = sorted(glob.glob("specs/*.yaml"))
    assert len(files) >= 5
    for f in files:
        spec = WaveformSpec.load(f)
        assert spec.name and spec.sample_rate > 0
    # constellation parity for the linear-mod specs
    for name, wf_name in (("bpsk", "BPSK"), ("qpsk", "QPSK")):
        spec = WaveformSpec.load(f"specs/{name}.yaml")
        wf = create_waveform(wf_name, spec.sample_rate)
        ok, err = spec.check_constellation(wf)
        assert ok, f"{name}: constellation mismatch {err}"


def test_spec_builds_runnable_waveform():
    from r4w_tpu.waveform_spec import WaveformSpec

    wf = WaveformSpec.load("specs/qpsk.yaml").build_waveform()
    tx = wf.modulate(b"\x5a")
    res = wf.demodulate(tx)
    assert bytes(np.asarray(res.bits[:1]).astype(np.uint8)) == b"\x5a"
