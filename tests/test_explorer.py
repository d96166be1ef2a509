"""Explorer dashboard tests (the §2.7 GUI role, VERDICT r1 item 5 of
"What's missing"): server endpoints, demo pipeline, and UI delivery."""

import json
import urllib.request

import pytest

from r4w_tpu import explorer

pytestmark = pytest.mark.slow  # heavy integration lane


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


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_live_stream_loopback(server):
    """Streaming waterfall end-to-end: start → UDP test burst →
    incremental rows → stop (views/streaming/ + remote_lab.rs role)."""
    import time

    start = _post(server + "/api/stream/start",
                  {"fs": 250000.0, "fft": 128})
    assert start["port"] > 0 and start["fft"] == 128
    try:
        tx = _post(server + "/api/stream/tx",
                   {"name": "QPSK", "hex": "CAFE1234", "snr": 15,
                    "reps": 64})
        assert tx.get("packets", 0) >= 1, tx
        rows, stats = [], {}
        for _ in range(40):  # poll up to 10 s for the pump thread
            out = json.loads(_get(
                server + "/api/stream/rows?since=0")[2])
            rows, stats = out.get("rows", []), out.get("stats", {})
            if rows:
                break
            time.sleep(0.25)
        assert rows, f"no waterfall rows arrived: {stats}"
        assert len(rows[0]) == 128  # one dB value per FFT bin
        assert all(isinstance(v, float) for v in rows[0])
        assert stats["packets"] >= 1 and stats["samples"] > 0
        # incremental tailing: asking from `next` returns nothing new
        # (or only rows produced since)
        nxt = out["next"]
        again = json.loads(_get(
            server + f"/api/stream/rows?since={nxt}")[2])
        assert again["next"] >= nxt
    finally:
        stop = _post(server + "/api/stream/stop", {})
        assert stop["stopped"] is True


def test_stream_rows_without_start(server):
    out = json.loads(_get(server + "/api/stream/rows?since=0")[2])
    assert "error" in out


def test_remote_lab_agent_to_waterfall(server):
    """Remote-lab loop (views/remote_lab.rs role): an agent serves the
    JSON/TCP protocol, the explorer relays commands to it, and a
    start_tx with target='stream' lands the agent's transmission in
    the live waterfall."""
    import time

    from r4w_tpu.agent import AgentServer

    agent = AgentServer(port=0)
    agent.serve_in_thread()
    try:
        a = {"agent_host": "127.0.0.1", "agent_port": agent.port}
        pong = _post(server + "/api/remote", {**a, "command": "ping"})
        assert pong["response"] == "pong"
        # without a stream, target='stream' is a clean error
        err = _post(server + "/api/remote",
                    {**a, "command": "start_tx", "target": "stream"})
        assert err["response"] == "error"
        start = _post(server + "/api/stream/start",
                      {"fs": 125000.0, "fft": 128})
        assert start["port"] > 0
        try:
            tx = _post(server + "/api/remote",
                       {**a, "command": "start_tx", "target": "stream",
                        "waveform": "QPSK", "message": "remote lab",
                        "repeat": True, "pps": 10})
            assert tx["response"] == "ok", tx
            rows = []
            for _ in range(60):  # up to 15 s: jit warm + pump
                out = json.loads(_get(
                    server + "/api/stream/rows?since=0")[2])
                rows = out.get("rows", [])
                if rows:
                    break
                time.sleep(0.25)
            stop = _post(server + "/api/remote",
                         {**a, "command": "stop_tx"})
            assert stop["response"] == "ok"
            assert rows, f"agent TX never reached the waterfall: {out}"
        finally:
            _post(server + "/api/stream/stop", {})
    finally:
        agent._running = False
