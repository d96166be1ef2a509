"""IO formats, SigMF, config, metrics, capture, simulator, CLI tests."""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from r4w_tpu import config as cfgmod
from r4w_tpu.io import iqformat, sigmf
from r4w_tpu.observe import (
    CaptureConfig,
    CaptureManager,
    CaptureState,
    MetricsRegistry,
)
from r4w_tpu.sim import SdrConfig, Simulator, SimulatorConfig, discover_devices


def _tone(n=1000):
    t = np.arange(n)
    return np.exp(1j * 0.05 * t).astype(np.complex64)


# ------------------------------------------------------------------ io


@pytest.mark.parametrize("fmt,tol", [("cf64", 1e-12), ("cf32", 1e-6),
                                     ("ci16", 1e-4), ("ci8", 1e-2),
                                     ("cu8", 1e-2)])
def test_iq_roundtrip_formats(fmt, tol):
    x = 0.9 * _tone(256)
    raw = iqformat.encode_samples(x, fmt)
    assert len(raw) == 256 * iqformat.bytes_per_sample(fmt)
    back = iqformat.decode_samples(raw, fmt)
    assert np.max(np.abs(back - x)) < tol * 10 + (1.0 / 127 if "8" in fmt
                                                  else 1e-4)


def test_iq_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown IQ format"):
        iqformat.encode_samples(_tone(4), "cf16")


def test_sigmf_roundtrip(tmp_path):
    x = _tone(512)
    p = str(tmp_path / "rec.sigmf-data")
    sigmf.write_sigmf(p, x, 2e6, frequency=868.1e6, description="test")
    back, meta = sigmf.read_sigmf(p)
    assert np.allclose(back, x, atol=1e-6)
    assert meta.sample_rate == 2e6
    assert meta.frequency == 868.1e6
    # meta file is valid JSON with core fields
    with open(str(tmp_path / "rec.sigmf-meta")) as f:
        d = json.load(f)
    assert d["global"]["core:version"]


def test_convert_iq_file(tmp_path):
    x = 0.5 * _tone(1000)
    src = str(tmp_path / "a.iq")
    dst = str(tmp_path / "b.iq")
    iqformat.write_iq_file(src, x, "cf32")
    iqformat.convert_iq_file(src, dst, "cf32", "ci16")
    back = iqformat.read_iq_file(dst, "ci16")
    assert np.max(np.abs(back - x)) < 1e-3


# ---------------------------------------------------------------- config


def test_config_defaults_valid():
    cfg = cfgmod.R4wConfig()
    assert cfg.validate() == []


def test_config_load_profile_and_validate(tmp_path):
    p = tmp_path / "r4w.yaml"
    p.write_text(
        "device:\n  sample_rate: 250000\n"
        "profiles:\n  lab:\n    device:\n      gain_db: 10\n"
    )
    cfg = cfgmod.R4wConfig.load_from(str(p))
    assert cfg.device.sample_rate == 250000
    lab = cfg.with_profile("lab")
    assert lab.device.gain_db == 10
    with pytest.raises(KeyError):
        cfg.with_profile("nope")


def test_config_invalid_detected():
    cfg = cfgmod.R4wConfig()
    cfg.metrics.port = 99999
    assert any("port" in e for e in cfg.validate())


# --------------------------------------------------------------- metrics


def test_metrics_prometheus_output():
    reg = MetricsRegistry()
    reg.counter("r4w_blocks_total", "processed blocks").inc(5)
    reg.gauge("r4w_snr_db").set(12.5)
    h = reg.histogram("r4w_latency_seconds", buckets=(0.001, 0.01, 0.1))
    h.observe(0.005)
    h.observe(0.0005)
    text = reg.to_prometheus()
    assert "r4w_blocks_total 5.0" in text
    assert "r4w_snr_db 12.5" in text
    assert 'r4w_latency_seconds_bucket{le="0.001"} 1' in text
    assert "r4w_latency_seconds_count 2" in text


def test_metrics_http_server():
    import urllib.request

    reg = MetricsRegistry()
    reg.counter("test_hits").inc()
    from r4w_tpu.observe import serve_metrics

    server = serve_metrics(port=0, registry=reg)  # port 0 = ephemeral
    port = server.server_address[1]
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5
        ).read().decode()
        assert "test_hits 1.0" in body
    finally:
        server.shutdown()


# --------------------------------------------------------------- capture


def test_capture_arm_trigger_save(tmp_path):
    cm = CaptureManager(CaptureConfig(pre_trigger_samples=64,
                                      post_trigger_samples=128))
    cm.arm()
    quiet = 0.001 * _tone(100)
    cm.process(quiet, trigger_level=0.5)
    assert cm.state == CaptureState.ARMED
    burst = np.concatenate([0.001 * _tone(50), _tone(100)])
    cm.process(burst.astype(np.complex64), trigger_level=0.5)
    assert cm.state in (CaptureState.TRIGGERED, CaptureState.COMPLETE)
    cm.process(_tone(200), trigger_level=0.5)
    assert cm.state == CaptureState.COMPLETE
    out = str(tmp_path / "cap.sigmf-data")
    cm.save(out)
    x, meta = sigmf.read_sigmf(out)
    assert len(x) >= 128
    assert meta.annotations[0]["core:label"] == "trigger"


# ------------------------------------------------------------- simulator


def test_simulator_loopback_decodes():
    from r4w_tpu.waveforms import create_waveform

    sim = Simulator(SimulatorConfig(channel_snr_db=25.0))
    wf = create_waveform("QPSK", 125_000.0)
    tx = np.asarray(wf.modulate(b"simloop"))
    sim.transmit(tx)
    rx = sim.receive(len(tx))
    res = wf.demodulate(rx)
    assert bytes(np.asarray(res.bits[:7]).astype(np.uint8)) == b"simloop"
    assert sim.sample_clock == len(tx)


def test_simulator_noise_floor_when_idle():
    sim = Simulator(SimulatorConfig(noise_floor_db=-60.0))
    rx = sim.receive(4096)
    p_db = 10 * np.log10(np.mean(np.abs(rx) ** 2))
    assert -63 < p_db < -57


def test_simulator_injection_and_caps():
    sim = Simulator()
    sim.inject_signal(np.ones(100, np.complex64))
    rx = sim.receive(100)
    assert np.mean(np.abs(rx)) > 0.1
    caps = discover_devices()
    assert caps and caps[0].name == "simulator"


def test_sigmf_replay_device(tmp_path):
    p = str(tmp_path / "rec.sigmf-data")
    sigmf.write_sigmf(p, _tone(300), 1e6)
    from r4w_tpu.sim import SigmfReplayDevice

    dev = SigmfReplayDevice(p)
    a = dev.receive(200)
    b = dev.receive(200)  # runs past EOF, zero-padded
    assert len(a) == 200 and len(b) == 200
    assert np.allclose(a, _tone(300)[:200], atol=1e-6)
    assert np.all(b[100:] == 0)


# ------------------------------------------------------------------ cli


def _run_cli(*args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "r4w_tpu", *args],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, **kw,
    )


@pytest.mark.slow
def test_cli_waveform_list():
    r = _run_cli("waveform", "--list")
    assert r.returncode == 0, r.stderr
    assert "BPSK" in r.stdout and "LoRa" in r.stdout


@pytest.mark.slow
def test_cli_tx_rx_roundtrip(tmp_path):
    out = str(tmp_path / "burst.iq")
    r = _run_cli("tx", "-w", "QPSK", "-m", "cli test", "-o", out)
    assert r.returncode == 0, r.stderr
    r2 = _run_cli("rx", "-w", "QPSK", "-i", out)
    assert r2.returncode == 0, r2.stderr
    assert "cli test" in r2.stdout


@pytest.mark.slow
def test_cli_simulate():
    r = _run_cli("simulate", "-w", "BPSK", "--snr", "15", "-m", "ok")
    assert r.returncode == 0, r.stderr
    assert "match:     YES" in r.stdout


@pytest.mark.slow
def test_cli_unknown_waveform_errors():
    r = _run_cli("info", "-w", "NOPE")
    assert r.returncode != 0
    assert "unknown waveform" in r.stderr


def test_cli_ber_gate(capsys):
    import json

    from r4w_tpu.cli import main

    main(["ber-gate", "--scheme", "qpsk", "--points", "5.0",
          "--bits", "100000"])
    out = json.loads(capsys.readouterr().out)
    assert out["pass"] is True
    assert out["gates"][0]["scheme"] == "qpsk"


def test_cli_plugin_load(tmp_path, capsys):
    import subprocess

    from r4w_tpu.cli import main

    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "r4w_tpu", "native")
    so = tmp_path / "libex.so"
    subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-I", src, "-o",
                    str(so), os.path.join(src, "example_plugin.cpp")],
                   check=True, capture_output=True, timeout=120)
    main(["plugin", "load", str(so)])
    out = capsys.readouterr().out
    assert "example-native" in out and "manchester-ook" in out
