"""Block-graph pipeline executor — the engine behind the explorer's
pipeline wizard and the CLI `pipeline` command.

Re-designs the reference GUI's pipeline builder
(crates/r4w-gui/src/views/pipeline_wizard.rs: drag-drop block graphs
with per-block simulate) on top of the 523-block registry: a pipeline
is a JSON-serializable DAG of nodes, each naming a registry block (or
one of the waveform pseudo-blocks) plus parameters; execution runs the
graph topologically, adapts each block's call signature by inspection,
and captures a per-node output summary (shape/power plus downsampled
time/spectrum/constellation previews) so a UI can show every stage.

Node spec (dict):
  {"id": "n1", "block": "awgn_channel", "params": {"snr_db": 10},
   "inputs": ["n0"]}

Pseudo-blocks (beyond the registry):
  waveform_tx   params: name (factory waveform), hex (payload)
  waveform_rx   params: name — demodulates, reports decoded bits
"""

from __future__ import annotations

import inspect
from typing import Any

import numpy as np


class PipelineError(ValueError):
    pass


def _coerce(value: Any) -> Any:
    """JSON/UI params arrive as strings — coerce numerics, keep lists."""
    if isinstance(value, str):
        v = value.strip()
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            pass
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
        return value
    if isinstance(value, list):
        return [_coerce(v) for v in value]
    return value


def _topo_order(nodes: list[dict]) -> list[dict]:
    by_id = {n["id"]: n for n in nodes}
    if len(by_id) != len(nodes):
        raise PipelineError("duplicate node ids")
    state: dict[str, int] = {}
    order: list[dict] = []

    def visit(nid: str):
        st = state.get(nid, 0)
        if st == 1:
            raise PipelineError(f"cycle through node {nid!r}")
        if st == 2:
            return
        state[nid] = 1
        node = by_id.get(nid)
        if node is None:
            raise PipelineError(f"unknown input node {nid!r}")
        for dep in node.get("inputs", []):
            visit(dep)
        state[nid] = 2
        order.append(node)

    for n in nodes:
        visit(n["id"])
    return order


def _preview(x: np.ndarray, max_pts: int = 512) -> dict:
    """Downsampled plots-as-data for the browser (no matplotlib)."""
    x = np.asarray(x)
    if x.ndim == 0:
        return {"kind": "scalar", "value": float(np.real(x))}
    flat = x.reshape(-1)
    is_complex = np.iscomplexobj(flat)
    n = len(flat)
    if n == 0:
        return {"kind": "empty"}
    step = max(1, n // max_pts)
    t = flat[::step][:max_pts]
    out: dict[str, Any] = {
        "kind": "iq" if is_complex else "real",
        "n": int(n),
        "time_re": np.real(t).astype(float).round(5).tolist(),
    }
    if is_complex:
        out["time_im"] = np.imag(t).astype(float).round(5).tolist()
        # constellation scatter (subsampled)
        c = flat[:: max(1, n // 500)][:500]
        out["const_re"] = np.real(c).astype(float).round(5).tolist()
        out["const_im"] = np.imag(c).astype(float).round(5).tolist()
    # power spectrum, 256 bins
    nfft = min(4096, 1 << int(np.ceil(np.log2(max(n, 16)))))
    seg = flat[:nfft]
    win = np.hanning(len(seg))
    spec = np.fft.fftshift(np.fft.fft(seg * win, nfft))
    psd = 20.0 * np.log10(np.abs(spec) + 1e-12)
    bins = np.array_split(psd, min(256, len(psd)))
    out["psd_db"] = [float(round(b.max(), 2)) for b in bins if b.size]
    return out


def _call_block(fn, inputs: list, params: dict, key,
                sample_rate: float = 48000.0):
    """Adapt a registry block's signature: optional leading PRNG key,
    positional stream inputs, params matched to named arguments. A
    required `sample_rate`/`fs` argument not supplied by the node is
    filled from the pipeline-level default."""
    sig = inspect.signature(fn)
    names = list(sig.parameters)
    args: list = []
    if names and names[0] == "key":
        args.append(key)
        names = names[1:]
    args.extend(inputs)
    has_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                     for p in sig.parameters.values())
    kwargs = {k: _coerce(v) for k, v in params.items()
              if has_var_kw or k in names}
    consumed = names[: len(inputs)]
    for k in ("sample_rate", "fs"):
        p = sig.parameters.get(k)
        if (p is not None and k not in kwargs and k not in consumed
                and p.default is inspect.Parameter.empty
                and p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD,
                               inspect.Parameter.KEYWORD_ONLY)):
            kwargs[k] = float(sample_rate)
    return fn(*args, **kwargs)


def _run_waveform_tx(params: dict):
    from r4w_tpu.core.hostio import to_host
    from r4w_tpu.waveforms import create_waveform

    name = params.get("name", "BPSK")
    wf = create_waveform(str(name),
                         float(_coerce(params.get("sample_rate", 48000.0))))
    if wf is None:
        raise PipelineError(f"unknown waveform {name!r}")
    payload = bytes.fromhex(str(params.get("hex", "A71B3CD2")))
    return to_host(wf.modulate(payload)), {
        "samples_per_symbol": wf.samples_per_symbol()}


def _run_waveform_rx(x, params: dict):
    from r4w_tpu.core.hostio import to_device
    from r4w_tpu.waveforms import create_waveform

    name = params.get("name", "BPSK")
    wf = create_waveform(str(name),
                         float(_coerce(params.get("sample_rate", 48000.0))))
    if wf is None:
        raise PipelineError(f"unknown waveform {name!r}")
    res = wf.demodulate(to_device(np.asarray(x)))
    data = np.asarray(res.bits).astype(np.uint8)  # byte values per element
    info = {"decoded_hex": bytes(data).hex()[:64],
            "snr_estimate_db": res.snr_estimate}
    want = params.get("hex")
    if want:
        ref = np.frombuffer(bytes.fromhex(str(want)), np.uint8)
        got = data[: len(ref)]
        info["decoded_ok"] = bool(len(got) == len(ref)
                                  and (got == ref).all())
    return data.astype(np.int32), info


def run_pipeline(nodes: list[dict], seed: int = 0,
                 previews: bool = True,
                 sample_rate: float = 48000.0) -> dict:
    """Execute a block graph. Returns {"nodes": {id: {summary...}},
    "order": [...], "ok": bool}. Per-node failures are recorded, not
    raised; downstream nodes missing their input are skipped."""
    import jax

    from r4w_tpu.registry import default_registry

    reg = default_registry()
    order = _topo_order(list(nodes))
    outputs: dict[str, Any] = {}
    report: dict[str, Any] = {}
    ok = True
    for i, node in enumerate(order):
        nid = node["id"]
        block = str(node.get("block", ""))
        params = dict(node.get("params", {}) or {})
        entry: dict[str, Any] = {"block": block}
        try:
            ins = []
            for dep in node.get("inputs", []):
                if dep not in outputs:
                    raise PipelineError(f"input {dep!r} unavailable")
                ins.append(outputs[dep])
            key = jax.random.key(seed * 7919 + i)
            extra: dict[str, Any] = {}
            if block == "waveform_tx":
                out, extra = _run_waveform_tx(params)
            elif block == "waveform_rx":
                if not ins:
                    raise PipelineError("waveform_rx needs an input")
                out, extra = _run_waveform_rx(ins[0], params)
            else:
                info = reg.get(block)
                if info is None:
                    raise PipelineError(f"unknown block {block!r}")
                fn = info.factory()
                result = _call_block(fn, ins, params, key,
                                     sample_rate=sample_rate)
                out = result
                if isinstance(result, tuple):
                    out = result[0]
                    for j, part in enumerate(result[1:], 1):
                        arr = np.asarray(part)
                        if arr.size == 1:
                            extra[f"aux{j}"] = float(np.real(arr.item()))
            out_np = np.asarray(jax.device_get(out))
            outputs[nid] = out_np
            entry["shape"] = list(out_np.shape)
            entry["dtype"] = str(out_np.dtype)
            if out_np.size:
                entry["power_db"] = float(round(
                    10 * np.log10(float(np.mean(
                        np.abs(out_np.astype(np.complex128)) ** 2)) + 1e-30),
                    2))
            entry.update(extra)
            if previews:
                entry["preview"] = _preview(out_np)
        except Exception as e:  # noqa: BLE001 — per-node reporting
            ok = False
            entry["error"] = f"{type(e).__name__}: {e}"[:200]
        report[nid] = entry
    return {"ok": ok, "order": [n["id"] for n in order], "nodes": report}
