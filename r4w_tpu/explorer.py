"""Interactive waveform explorer — a minimal web dashboard.

Stands in for the reference's 45k-LoC egui/WASM `WaveformExplorer`
(crates/r4w-gui/src/app.rs:231) at its educational core: pick a
waveform, set payload/SNR/channel, and see the modulation pipeline —
constellation, time-domain IQ, spectrum, waterfall, and the staged
TX/RX introspection — live in a browser. Pure stdlib HTTP + JSON +
inline HTML/JS; plots are matplotlib PNGs served as base64.

Endpoints:
  GET /                    — the single-page UI
  GET /api/waveforms       — JSON list of factory names
  GET /api/demo?name=..&snr=..&hex=..&channel=..
                           — run modulate→channel→demodulate, return
                             metrics + base64 PNG plots + stage names

Run: `r4w-tpu explore --port 8080` or
     `python -m r4w_tpu.explorer --port 8080`.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>r4w-tpu explorer</title><style>
body{font-family:system-ui,sans-serif;margin:0;background:#11151c;color:#e6e6e6}
header{padding:12px 20px;background:#1a2230;font-size:18px}
main{display:flex;gap:16px;padding:16px}
#controls{min-width:260px;background:#1a2230;padding:16px;border-radius:8px}
label{display:block;margin:10px 0 4px;font-size:13px;color:#9fb3c8}
select,input{width:100%;padding:6px;background:#0d1117;color:#e6e6e6;
border:1px solid #30363d;border-radius:4px}
button{margin-top:14px;width:100%;padding:8px;background:#2f6feb;
color:white;border:none;border-radius:6px;cursor:pointer}
#plots{flex:1;display:grid;grid-template-columns:1fr 1fr;gap:12px}
#plots img{width:100%;background:#fff;border-radius:6px}
#metrics{grid-column:1/3;background:#1a2230;padding:12px;
border-radius:8px;font-family:monospace;white-space:pre-wrap}
</style></head><body>
<header>r4w-tpu waveform explorer</header>
<main>
 <div id=controls>
  <label>Waveform</label><select id=wf></select>
  <label>Payload (hex)</label><input id=hex value=A71B3CD2>
  <label>Channel</label>
  <select id=chan><option>none</option><option>awgn</option></select>
  <label>SNR (dB)</label><input id=snr type=number value=15>
  <button onclick=run()>Run</button>
 </div>
 <div id=plots>
  <img id=time><img id=spectrum><img id=constellation><img id=waterfall>
  <div id=metrics>pick a waveform and press Run</div>
 </div>
</main>
<script>
async function init(){
 const names=await (await fetch('/api/waveforms')).json();
 const sel=document.getElementById('wf');
 for(const n of names){const o=document.createElement('option');
  o.textContent=n;sel.appendChild(o);}
}
async function run(){
 const q=new URLSearchParams({name:wf.value,hex:hex.value,
  channel:chan.value,snr:snr.value});
 document.getElementById('metrics').textContent='running…';
 const r=await (await fetch('/api/demo?'+q)).json();
 if(r.error){document.getElementById('metrics').textContent=r.error;return;}
 for(const k of ['time','spectrum','constellation','waterfall'])
  if(r.plots[k]) document.getElementById(k).src='data:image/png;base64,'+r.plots[k];
 document.getElementById('metrics').textContent=JSON.stringify(r.metrics,null,1)
  +'\\n\\nstages: '+r.stages.join(' → ');
}
init();
</script></body></html>"""


def _png_b64(plot_fn, *args, **kw) -> str:
    """Render a viz plot to an in-memory PNG, base64-encoded."""
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        plot_fn(*args, path=f.name, **kw)
        f.seek(0)
        return base64.b64encode(f.read()).decode()


def run_demo(name: str, hex_payload: str = "A71B3CD2",
             channel: str = "none", snr_db: float = 15.0) -> dict:
    """One explorer round: modulate → channel → demodulate → plots."""
    import jax

    from r4w_tpu import viz
    from r4w_tpu.channel import awgn
    from r4w_tpu.waveforms import create_waveform

    wf = create_waveform(name)
    if wf is None:
        return {"error": f"unknown waveform {name!r}"}
    try:
        payload = bytes.fromhex(hex_payload) if hex_payload else b""
    except ValueError:
        return {"error": f"bad hex payload {hex_payload!r}"}

    tx = wf.modulate(payload)
    rx = awgn(jax.random.key(0), tx, float(snr_db)) \
        if channel == "awgn" else tx
    res = wf.demodulate(rx)

    got = np.asarray(res.bits)[: len(payload)]
    match = got.tolist() == list(payload) if len(payload) else None
    fs = wf.common_params.sample_rate
    rx_np = np.asarray(jax.device_get(rx))
    sps = max(wf.samples_per_symbol(), 1)
    sym = rx_np[: (len(rx_np) // sps) * sps].reshape(-1, sps).mean(axis=1)

    plots = {
        "time": _png_b64(viz.plot_time, rx_np[:2048],
                         title=f"{name} — time domain"),
        "spectrum": _png_b64(viz.plot_spectrum, rx_np, sample_rate=fs,
                             title=f"{name} — spectrum"),
        "constellation": _png_b64(viz.plot_constellation, sym[:2000],
                                  title=f"{name} — symbol space"),
        "waterfall": _png_b64(viz.plot_waterfall, rx_np, sample_rate=fs,
                              title=f"{name} — waterfall"),
    }
    stages = [s for s, _ in wf.get_modulation_stages(payload)] \
        if len(payload) else ["modulated IQ"]
    metrics = {
        "samples": int(len(rx_np)),
        "sample_rate": fs,
        "samples_per_symbol": sps,
        "decoded_ok": match,
        "decoded_hex": bytes(got.astype(np.uint8)).hex() if len(got) else "",
        "snr_estimate_db": res.snr_estimate,
        **{k: v for k, v in res.metadata.items()
           if isinstance(v, (int, float, str, bool))},
    }
    return {"metrics": metrics, "plots": plots, "stages": stages}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/":
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if parsed.path == "/api/waveforms":
            from r4w_tpu.waveforms import list_waveforms

            self._json(list_waveforms())
            return
        if parsed.path == "/api/blocks":
            from r4w_tpu.registry import default_registry

            q = urllib.parse.parse_qs(parsed.query)
            query = q.get("q", [""])[0].lower()
            blocks = default_registry().list()
            if query:
                blocks = [b for b in blocks
                          if query in b.name.lower()
                          or query in b.description.lower()]
            self._json([{"name": b.name, "category": b.category.value,
                         "description": b.description,
                         "params": list(b.params)} for b in blocks])
            return
        if parsed.path == "/api/demo":
            q = urllib.parse.parse_qs(parsed.query)
            try:
                out = run_demo(
                    name=q.get("name", ["BPSK"])[0],
                    hex_payload=q.get("hex", ["A71B3CD2"])[0],
                    channel=q.get("channel", ["none"])[0],
                    snr_db=float(q.get("snr", ["15"])[0]))
            except Exception as e:  # surface, don't kill the server
                out = {"error": f"{type(e).__name__}: {e}"}
            self._json(out)
            return
        self._json({"error": "not found"}, 404)


def serve(host: str = "127.0.0.1", port: int = 8080,
          background: bool = False) -> ThreadingHTTPServer:
    """Start the explorer server (localhost by default — see
    ADVICE r1 on open binds)."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    print(f"r4w-tpu explorer on http://{host}:{port}/")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return httpd


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="r4w-tpu waveform explorer")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    serve(args.host, args.port)


if __name__ == "__main__":
    main()
