"""Pipeline-wizard executor + explorer endpoint tests (VERDICT r2 #4/#9:
pipeline_wizard.rs parity via /api/pipeline, channel suite + GNSS sky
on the explorer)."""

import json
import urllib.request

import numpy as np
import pytest

from r4w_tpu.pipeline import PipelineError, _topo_order, run_pipeline


def test_pipeline_tx_channel_filter_demod():
    nodes = [
        {"id": "tx", "block": "waveform_tx",
         "params": {"name": "QPSK", "hex": "CAFE1234"}},
        {"id": "ch", "block": "awgn_channel", "params": {"snr_db": "16"},
         "inputs": ["tx"]},
        {"id": "flt", "block": "dc_blocker", "inputs": ["ch"]},
        {"id": "rx", "block": "waveform_rx",
         "params": {"name": "QPSK", "hex": "CAFE1234"}, "inputs": ["flt"]},
    ]
    r = run_pipeline(nodes)
    assert r["ok"], r
    assert r["order"] == ["tx", "ch", "flt", "rx"]
    assert r["nodes"]["rx"]["decoded_ok"] is True
    # per-node capture: every IQ stage has previews for the three plots
    for nid in ("tx", "ch", "flt"):
        pv = r["nodes"][nid]["preview"]
        assert pv["kind"] == "iq"
        assert len(pv["time_re"]) == len(pv["time_im"]) > 0
        assert len(pv["psd_db"]) > 0
        assert len(pv["const_re"]) > 0


def test_pipeline_dag_fanout_and_error_isolation():
    nodes = [
        {"id": "a", "block": "waveform_tx", "params": {"name": "BPSK"}},
        {"id": "bad", "block": "no_such_block", "inputs": ["a"]},
        {"id": "down", "block": "dc_blocker", "inputs": ["bad"]},
        {"id": "psd", "block": "welch_psd", "params": {"nperseg": 64},
         "inputs": ["a"]},
    ]
    r = run_pipeline(nodes)
    assert not r["ok"]
    assert "unknown block" in r["nodes"]["bad"]["error"]
    assert "unavailable" in r["nodes"]["down"]["error"]
    assert "error" not in r["nodes"]["psd"]  # sibling branch unaffected


def test_pipeline_sample_rate_injection():
    """Blocks with a required sample_rate arg get the pipeline default."""
    nodes = [
        {"id": "tx", "block": "waveform_tx", "params": {"name": "QPSK"}},
        {"id": "ch", "block": "tdl_channel",
         "params": {"profile": "EPA", "doppler_hz": 30}, "inputs": ["tx"]},
    ]
    r = run_pipeline(nodes)
    assert r["ok"], r["nodes"]["ch"].get("error")


def test_pipeline_cycle_and_dup_rejected():
    with pytest.raises(PipelineError, match="cycle"):
        _topo_order([{"id": "a", "inputs": ["b"]},
                     {"id": "b", "inputs": ["a"]}])
    with pytest.raises(PipelineError, match="duplicate"):
        _topo_order([{"id": "a"}, {"id": "a"}])


# ------------------------------------------------------------ explorer


@pytest.fixture(scope="module")
def server():
    from r4w_tpu.explorer import serve

    httpd = serve(port=0, background=True)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return json.loads(r.read())


def _post(url, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_explorer_page_has_three_views(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        page = r.read().decode()
    for marker in ("pipeline wizard", "gnss sky", "api/pipeline",
                   "awgn_cfo", "tdl_awgn", "jakes"):
        assert marker in page, marker


@pytest.mark.slow
def test_explorer_demo_channel_suite(server):
    """The nine-model channel suite is reachable from /api/demo
    (VERDICT r2 weak #8: explorer had only none|awgn)."""
    for chan in ("none", "awgn", "awgn_cfo", "multipath", "rayleigh",
                 "rician", "tdl_awgn", "jakes"):
        out = _get(f"{server}/api/demo?name=QPSK&hex=CAFE&channel={chan}"
                   "&snr=25&cfo_hz=5&doppler_hz=3&rician_k=12")
        assert "error" not in out, (chan, out.get("error"))
        assert out["metrics"]["channel"] == chan


def test_explorer_pipeline_endpoint(server):
    spec = {"nodes": [
        {"id": "tx", "block": "waveform_tx",
         "params": {"name": "BPSK", "hex": "AB"}},
        {"id": "rx", "block": "waveform_rx",
         "params": {"name": "BPSK", "hex": "AB"}, "inputs": ["tx"]}]}
    out = _post(server + "/api/pipeline", json.dumps(spec).encode())
    assert out["ok"] and out["nodes"]["rx"]["decoded_ok"] is True


def test_explorer_gnss_sky(server):
    out = _get(server + "/api/gnss_sky?preset=e1c_8prn&t=30")
    assert len(out["sats"]) == 8
    s = out["sats"][0]
    for k in ("prn", "elevation_deg", "azimuth_deg", "cn0_dbhz",
              "doppler_hz"):
        assert k in s
    # gps preset too
    out2 = _get(server + "/api/gnss_sky?preset=gps_l1ca_6sv&t=0")
    assert len(out2["sats"]) == 6
    assert all(x["signal"] == "gpsl1ca" for x in out2["sats"])


def test_explorer_gnss_sky_yaml_post(server):
    yaml_text = """
satellites:
  - prn: 5
    signal: galileoe1c
    cn0_dbhz: 40.0
    elevation_deg: 50.0
    azimuth_deg: 123.0
    doppler_hz: 900.0
sample_rate: 5000000.0
duration_s: 1.0
"""
    out = _post(server + "/api/gnss_sky?t=0", yaml_text.encode())
    assert len(out["sats"]) == 1
    assert out["sats"][0]["azimuth_deg"] == pytest.approx(123.0)


def test_preview_handles_tiny_and_real_arrays():
    from r4w_tpu.pipeline import _preview

    p = _preview(np.zeros(3, np.float32))
    assert p["kind"] == "real" and "psd_db" in p
    assert _preview(np.float32(4.0))["kind"] == "scalar"
    assert _preview(np.zeros(0))["kind"] == "empty"
