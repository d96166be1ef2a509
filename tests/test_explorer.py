"""Explorer dashboard tests (the §2.7 GUI role, VERDICT r1 item 5 of
"What's missing"): server endpoints, demo pipeline, and UI delivery."""

import json
import urllib.request

import pytest

from r4w_tpu import explorer


@pytest.fixture(scope="module")
def server():
    httpd = explorer.serve(port=0, background=True)  # ephemeral port
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index_page(server):
    status, ctype, body = _get(server + "/")
    assert status == 200 and "text/html" in ctype
    assert b"r4w-tpu explorer" in body
    assert b"/api/demo" in body


def test_waveform_list(server):
    status, ctype, body = _get(server + "/api/waveforms")
    assert status == 200 and "application/json" in ctype
    names = json.loads(body)
    assert "BPSK" in names and "LoRa" in names and len(names) >= 46


def test_demo_endpoint_roundtrip(server):
    status, _, body = _get(
        server + "/api/demo?name=QPSK&hex=CAFE&channel=awgn&snr=15")
    assert status == 200
    out = json.loads(body)
    assert out["metrics"]["decoded_ok"] is True
    assert out["metrics"]["decoded_hex"] == "cafe"
    for k in ("time", "spectrum", "constellation", "waterfall"):
        assert len(out["plots"][k]) > 1000  # real base64 PNGs
    assert out["stages"]  # pipeline introspection present


def test_demo_unknown_waveform(server):
    _, _, body = _get(server + "/api/demo?name=NOPE")
    assert "unknown waveform" in json.loads(body)["error"]


def test_demo_bad_hex(server):
    _, _, body = _get(server + "/api/demo?name=BPSK&hex=ZZ")
    assert "bad hex" in json.loads(body)["error"]


def test_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/api/nothing")
    assert e.value.code == 404


def test_run_demo_direct():
    out = explorer.run_demo("BPSK", "A7", channel="none")
    assert out["metrics"]["decoded_ok"] is True
    assert out["metrics"]["samples_per_symbol"] >= 1


def test_blocks_endpoint(server):
    status, ctype, body = _get(server + "/api/blocks?q=golay")
    assert status == 200 and "application/json" in ctype
    blocks = json.loads(body)
    assert any(b["name"] == "golay_correlator" for b in blocks)
    status, _, body = _get(server + "/api/blocks")
    assert len(json.loads(body)) >= 500
