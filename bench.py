"""Benchmark suite on one chip (mirrors the reference's criterion
benches, crates/r4w-core/benches/).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
the headline metric stays FFT-1024 throughput vs the reference's
published 371 Msamples/s (README.md:92, MEASURABLE_OBJECTIVES.md:27).
The line is COMPACT by contract (< HEADLINE_MAX_BYTES = 1400 B,
enforced by _shrink_to_fit and tests/test_bench_capture.py): the r4
record was lost because the full suite was inlined into this line
(~2.5 KB) and the driver keeps only a 2000-char stdout tail.
`extra.msps` carries integer throughput digests, `extra.gates` the
acceptance headline numbers (E1C 8/8, PVT error, LoRa sweep, device
sweep); the FULL suite — per-bench wall times, `vs_gnuradio` ratios
against the reference's hardcoded GNU Radio baselines
(benches/gnuradio_comparison.rs:41-66), waterfall tables — is written
only to docs/bench_records/last_run.json.

Capture robustness (the round-2 AND round-3 lessons — both rounds lost
their official record to capture failures, not to missing performance):
ALL device work runs in ONE persistent child process driven over a line
protocol by this parent, and the round-4 orchestration guarantees a
parseable record under any tunnel state:
  1. a ONE-OP canary (<=2 bounded attempts, 240 s then 360 s) decides TPU vs
     degraded up front — no walking every bench through its own
     watchdog when the tunnel is hard-down (the r3 failure: 2x1500 s
     burned before any JSON could be emitted);
  2. a GLOBAL deadline (env R4W_BENCH_DEADLINE_S, default 1140 s)
     derates every per-bench watchdog; benches that no longer fit are
     skipped loudly, slowest first;
  3. results flush incrementally to docs/bench_records/last_run.json
     and SIGTERM/SIGINT/atexit print the headline JSON with whatever
     completed — even a driver kill leaves a parsed record;
  4. the slow acceptance runs (e1c_gate, e1c_tracking, gps_pvt_fix,
     device_sweep) are cacheable: fresh TPU passes update
     docs/bench_records/acceptance_cache.json, and when the deadline
     can't fit a fresh run the age-stamped cached result is reported,
     marked "cached" (CPU results never enter the cache).
There is NO silent CPU fallback: if the TPU never answers, the headline
is emitted with `"degraded": true` and `vs_baseline: null` so the
driver cannot record a CPU number as a TPU result (CPU numbers, clearly
labeled and time-boxed, go under extra.cpu_fallback).

axon-backend constraints (see .claude/skills/verify/SKILL.md):
complex64 must not cross jit/host boundaries and block_until_ready is
not a true sync — so each benchmark is ONE jit containing a fori_loop
with a serial data dependency, synced by device_get of a float32
scalar.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FFT1024_MSPS = 371.0

# GNU Radio baselines from gnuradio_comparison.rs:41-66 (Msamples/s)
GR_BASELINES = {
    "fft1024": 50.0, "fft4096": 12.0, "fir32": 80.0, "fir128": 25.0,
    "rotator": 100.0, "cmul": 200.0, "bpsk_mod": 20.0,
}


# --------------------------------------------------------------------
# Individual benchmarks (run inside the child process). Each returns a
# dict; throughput benches report {"Msps": ...}.
# --------------------------------------------------------------------

def _timed_scalar(fn, *args):
    """Run fn twice (compile+warm, then timed); fn must return f32 scalar.

    Host numpy args are transferred to the device ONCE before timing:
    the axon tunnel moves host data at ~20 MB/s, so re-ingesting a
    large working set per call (e.g. the 67 MB Viterbi soft-bit block)
    measures the tunnel, not the kernel — the r2 bench recorded
    2 Msps for a decode that actually sustains ~225 Msps on-device."""
    import jax
    import numpy as np

    # (complex arrays stay on the jit-argument path: eager complex
    # device_put is unimplemented on some TPU transfer layers)
    args = [jax.device_put(a)
            if isinstance(a, np.ndarray) and not np.iscomplexobj(a)
            else a for a in args]
    s = jax.device_get(fn(*args))  # compile + warm; syncs transfers too
    assert np.isfinite(s), "benchmark produced non-finite output"
    # best-of-3: single timed runs through the tunnel carry multi-x
    # jitter (measured 160-430 Msps spread on an identical workload)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = jax.device_get(fn(*args))
        dt = min(dt, time.perf_counter() - t0)
    assert np.isfinite(s)
    return dt


def bench_fft1024():
    # batch sized to keep the chained loop resident in VMEM: the tunnel
    # device is HBM-bandwidth-throttled (~6 GB/s), so a 134 MB working
    # set runs at ~0.1 Gsps while a 2 MB one sustains ~12 Gsps. batch
    # 384 x 8192 chained iterations measured best (r4 sweep; 256x16384
    # from the 2026-08-16 sweep was within 4%).
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    n = 1024
    batch = 384
    iters = 8192
    rng = np.random.default_rng(0)
    re = rng.standard_normal((batch, n), dtype=np.float32)
    im = rng.standard_normal((batch, n), dtype=np.float32)
    scale = np.float32(1.0 / np.sqrt(n))  # unitary: chained FFTs stay bounded

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            return jnp.fft.fft(v, axis=-1) * scale

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return {"Msps": round(batch * n * iters / dt / 1e6, 1)}


def _bench_fft(n: int, batch: int, iters: int, seed: int):
    """Shared chained-FFT throughput core; working set stays
    VMEM-resident (same sizing rationale as bench_fft1024)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(seed)
    re = rng.standard_normal((batch, n), dtype=np.float32)
    im = rng.standard_normal((batch, n), dtype=np.float32)
    scale = np.float32(1.0 / np.sqrt(n))

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            return jnp.fft.fft(v, axis=-1) * scale

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return {"Msps": round(batch * n * iters / dt / 1e6, 1)}


def bench_fft256():
    """FFT-256 (reference publishes 645 Msps, MEASURABLE_OBJECTIVES:26).

    Batch 4096 per r4 shape sweep: 17.5 Gsps vs 13.0 at batch 1024 —
    small transforms need wide batches to fill the VPU lanes."""
    return _bench_fft(256, 4096, 8192, 7)


def bench_fft2048():
    """FFT-2048 (reference publishes 179 Msps, README.md:94)."""
    return _bench_fft(2048, 128, 8192, 8)


def bench_fft4096():
    """FFT-4096 (gnuradio_comparison baseline 12 Msps, README 330 Msps).

    Batch 256 per r4 shape sweep: 11.1 Gsps vs 7.5 at batch 64 — the
    'capacity-limited' regime in PERFORMANCE.md's roofline was really
    under-batching; 256×4096 (8 MB live) still fits VMEM and closes
    most of the gap to the FFT-1024 rate."""
    return _bench_fft(4096, 256, 4096, 1)


def bench_udp_rx():
    """Loopback UDP IQ ingest through the native C++ receiver thread +
    lock-free ring (benchmark/receiver.rs role, §3.4 distributed path).
    Pure host-side: measures the wire→ring→numpy path, no device."""
    import threading
    import numpy as np

    from r4w_tpu.net import UdpSink

    try:
        from r4w_tpu.native import NativeUdpReceiver

        rx = NativeUdpReceiver(port=0, ring_samples=1 << 22)
        path = "native"
    except Exception:  # noqa: BLE001 — fall back to the Python source
        from r4w_tpu.net import UdpConfig, UdpSource

        rx = None
        src = UdpSource(UdpConfig(host="127.0.0.1", port=0,
                                  timeout_s=0.1))
        path = "python"

    port = rx.port if rx is not None else src.port
    chunk_len = 8000
    chunk = (np.exp(2j * np.pi * 0.01 * np.arange(chunk_len))
             .astype(np.complex64))
    # ONE sink for all ladder trials: a fresh sink restarts its
    # sequence counter at 0, which the receiver counts as a gap and
    # pollutes the recorded seq_gaps of later trials
    sink = UdpSink("127.0.0.1", port)

    def trial(rate_msps: float, secs: float = 2.0):
        """Paced sender at rate_msps (the reference's benchmark paces
        at the waveform sample rate); returns (got, sent, elapsed)."""
        n_chunks = int(rate_msps * 1e6 * secs / chunk_len)
        period = chunk_len / (rate_msps * 1e6)
        done = {"flag": False}

        def sender():
            t_next = time.perf_counter()
            for _ in range(n_chunks):
                sink.send(chunk)
                t_next += period
                delay = t_next - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
            done["flag"] = True

        th = threading.Thread(target=sender, daemon=True)
        t0 = time.perf_counter()
        th.start()
        got, idle_until = 0, None
        while time.perf_counter() < t0 + secs + 10.0:
            batch = (rx.read(1 << 16) if rx is not None
                     else src.recv_batch(64))
            got += len(batch)
            if done["flag"] and len(batch) == 0:
                # linger briefly: data may still be in flight
                idle_until = idle_until or time.perf_counter() + 0.3
                if time.perf_counter() > idle_until:
                    break
            else:
                idle_until = None
        return got, n_chunks * chunk_len, time.perf_counter() - t0

    # descending rate ladder: report the highest rate sustained with
    # >= 99% delivery (packet pacing is the reference's methodology)
    def gaps():
        return int(rx.stats["seq_gaps"] if rx is not None
                   else src.packets_dropped)

    result = None
    for rate in (200.0, 100.0, 50.0, 25.0, 12.0, 6.0):
        g0 = gaps()
        got, total, dt = trial(rate)
        pct = 100.0 * got / total
        result = {"Msps": round(got / dt / 1e6, 1), "path": path,
                  "offered_msps": rate,
                  "received_pct": round(pct, 1),
                  "seq_gaps": gaps() - g0}
        if pct >= 99.0:
            break
    sink.close()
    if rx is not None:
        rx.close()
    else:
        src.close()
    return result


def bench_e1c_gate():
    """Galileo E1C 8-PRN C/N0-34 acceptance (BASELINE north star):
    generate the reference's orbital scenario for 200 ms and re-acquire
    every PRN with the production PCPS + sub-sample-slewed alignment
    refine; two absent PRNs as false-alarm control (tools/e1c_gate.py)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.e1c_gate import main as gate_main

    out = gate_main(periods=50)
    if out.get("skipped"):
        return {"skipped": out["skipped"]}
    return {
        "acquired": f"{out['value']}/{out['of']}",
        "false_alarms": out["false_alarms"],
        "worst_present_metric": min(
            r["metric"] for r in out["per_prn"] if r["present"]),
        "best_absent_metric": max(
            r["metric"] for r in out["per_prn"] if not r["present"]),
        "gen_s": out["gen_s"],
        "acquire_s": out["acquire_s"],
    }


def bench_gps_pvt_fix():
    """GPS L1 C/A IQ→PVT end-to-end fix, decoded-ephemeris mode
    (VERDICT r4 #2): scenario with real LNAV → acquisition → DLL/PLL
    tracking → frame sync → SF1-3 clock+ephemeris decode → transmit
    times from decoded TOW (no supplied milliseconds) → solved
    position (tools/gps_pvt_fix.py; gate err < 50 m, 6/6 decoded)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.gps_pvt_fix import main as pvt_main

    out = pvt_main()
    return {"error_m": out["value"], "pass": out["pass"],
            "mode": out.get("mode", "decoded_ephemeris"),
            "acquired": f"{out['acquired']}/{out['of']}",
            "decoded": f"{out.get('decoded', '?')}/{out['of']}",
            "clock_bias_m": out["clock_bias_m"],
            "gen_s": out["gen_s"], "acquire_s": out["acquire_s"],
            "track_s": out.get("track_s", 0.0)}


def bench_dual_pvt():
    """Dual-constellation GPS+Galileo joint IQ→PVT (r5 flagship): one
    scenario carries 5 GPS L1 C/A + 5 Galileo E1B SVs; both front ends
    run on the same samples, decode LNAV SF1-3 and I/NAV words 1-5,
    and the joint solve carries an inter-system clock-bias state
    (tools/dual_pvt.py; gate err < 60 m, 10/10 decoded)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.dual_pvt import main as dual_main

    out = dual_main()
    return {"error_m": out["value"], "pass": out["pass"],
            "mode": out["mode"],
            "acquired": f"{out['acquired']}/{out['of']}",
            "decoded": f"{out['decoded']}/{out['of']}",
            "gps_only_m": (out.get("gps_only") or {}).get("error_m"),
            "galileo_only_m": (out.get("galileo_only")
                               or {}).get("error_m"),
            "isb_m": (out.get("joint") or {}).get("isb_m"),
            "speed_mps": (out.get("velocity") or {}).get("speed_mps"),
            "gen_s": out["gen_s"], "acquire_s": out["acquire_s"],
            "track_s": out["track_s"]}


def bench_glonass_track():
    """GLONASS L1OF FDMA acceptance (r5, third constellation): 6 SVs
    on k·562.5 kHz channels sharing ONE 511-chip m-sequence at the
    true 0.511 Mchip/s — exact integer-phase mixdown → PCPS per
    channel → production Costas DLL/PLL → 20 ms PRBS nav-bit recovery
    (tools/glonass_track.py; gate 6/6 channels, bit match ≥ 0.98)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.glonass_track import main as glo_main

    out = glo_main()
    worst = (min((c["bit_match"] for c in out["per_ch"]), default=0.0)
             if out["per_ch"] else 0.0)
    return {"tracked": f"{out['value']}/{out['of']}",
            "pass": out["pass"], "cn0_dbhz": out["cn0_dbhz"],
            "worst_bit_match": worst,
            "max_dop_err_hz": max((abs(c["dop_err_hz"])
                                   for c in out["per_ch"]), default=None),
            "gen_s": out["gen_s"], "acquire_s": out["acquire_s"],
            "track_s": out["track_s"]}


def bench_e1c_tracking():
    """Galileo E1C acquisition→tracking handoff: 8 DLL/PLL channels
    seeded from the PCPS states hold lock across the C/N0-34 scenario
    (tools/e1c_tracking.py; gate >= 6/8 tracked, C/N0 within 6 dB)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.e1c_tracking import main as trk_main

    out = trk_main(periods=50)
    if out.get("skipped"):
        return {"skipped": out["skipped"]}
    res = {"tracked": f"{out['value']}/{out['of']}",
           "acquired": out["acquired"],
           "cn0_mean_dbhz": out["cn0_mean_dbhz"],
           "gen_s": out["gen_s"], "acquire_s": out["acquire_s"],
           "track_s": out["track_s"]}
    e1b = out.get("e1b")
    if isinstance(e1b, dict) and "svs_pages_ok" in e1b:
        res["e1b_pages_ok"] = f"{e1b['svs_pages_ok']}/{e1b['of']}"
        res["e1b_pass"] = e1b["pass"]
    elif isinstance(e1b, dict):
        res["e1b_error"] = e1b.get("error", "?")[:80]
    return res


def bench_lora_sf7_demod():
    """Chained chirp-synthesize → dechirp-FFT-argmax demod loop."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.waveforms import lora
    from r4w_tpu.waveforms.lora import chirp as chirp_mod

    p = lora.LoRaParams(sf=7)
    # small working set (VMEM-resident) + long chained loop; synthesis
    # uses the one-hot-matmul chirp identity (symbol_chirps method=auto)
    # instead of the modular gather — ~100x on this device
    lanes, n_sym, iters = 8, 512, 512
    rng = np.random.default_rng(2)
    syms0 = rng.integers(0, 128, (lanes, n_sym)).astype(np.int32)

    @jax.jit
    def run(syms):
        def body(i, s):
            iq = chirp_mod.symbol_chirps(p, s).reshape(lanes, -1)
            out, _, _ = lora.demodulate_symbols(p, iq)
            return out

        s = lax.fori_loop(0, iters, body, syms)
        return jnp.sum(s).astype(jnp.float32)

    dt = _timed_scalar(run, syms0)
    sps = lanes * n_sym * p.samples_per_symbol * iters / dt
    return {"Msps": round(sps / 1e6, 1)}


def bench_fir(n_taps: int):
    """Production FIR path (ops.filters lowers dense 1-D TPU streams to
    the shift-add MAC form — measured 3x the Pallas roll-MAC and ~25x
    lax.conv; gnuradio_comparison FIR32 80 M / FIR128 25 M)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.ops import filters as F

    # 2^16 keeps the chained stream VMEM-resident — the tunnel device
    # is HBM-throttled (~6 GB/s), same sizing rationale as bench_fft1024
    n, iters = 1 << 16, 2048
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n, dtype=np.float32)
    taps = jnp.asarray(rng.standard_normal(n_taps, np.float32) / n_taps)

    @jax.jit
    def run(x):
        def body(i, v):
            return F.fir_apply(taps, v) * 0.999

        v = lax.fori_loop(0, iters, body, x)
        return jnp.sum(v * v)

    dt = _timed_scalar(run, x)
    return {"Msps": round(n * iters / dt / 1e6, 1)}


def bench_rotator():
    """Complex oscillator mix (gnuradio_comparison rotator 100 M).
    XLA iota+cis+mul measured faster than the Pallas NCO (975 vs 748
    Msps, r2) — this is the production form."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.core.hostio import cis

    # iters sized so one timed run lasts >= 0.25 s at the DEMONSTRATED
    # ceiling (17.5 Gsps, r5) — the first r5 bump (16384) was sized for
    # the r4 floor and fell back to a 61 ms dispatch-lottery run once
    # the kernel itself got fast (PERFORMANCE.md variance note)
    n, iters = 1 << 16, 131072
    rng = np.random.default_rng(3)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)

    @jax.jit
    def run(re, im):
        v = lax.complex(re, im)

        def body(i, v):
            ph = 0.001 * (jnp.arange(n, dtype=jnp.float32) + i)
            return v * cis(ph)

        v = lax.fori_loop(0, iters, body, v)
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im)
    return {"Msps": round(n * iters / dt / 1e6, 1)}


def bench_cmul():
    """Elementwise complex multiply (gnuradio_comparison cmul 200 M)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    # the chained dependent multiply measures VPU fp32 ALU throughput
    # once the loop is long enough to amortize loop-control overhead:
    # 201 Gsps ≈ 1.2 TFLOP/s at iters=262144 (r5 rehearsal) — sized up
    # again so one run lasts ~0.35 s at that demonstrated peak
    n, iters = 1 << 16, 1 << 20
    rng = np.random.default_rng(4)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)
    cr = rng.standard_normal(n, dtype=np.float32) * 0.01
    ci = rng.standard_normal(n, dtype=np.float32) * 0.01

    @jax.jit
    def run(re, im, cr, ci):
        v = lax.complex(re, im)
        c = lax.complex(cr, ci)
        norm = jnp.asarray(1.0, jnp.float32)

        def body(i, carry):
            v, norm = carry
            v = v * c * (1.0 + 1e-6 * norm)  # serial dependency
            return v, norm

        v, _ = lax.fori_loop(0, iters, body, (v, norm))
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im, cr, ci)
    return {"Msps": round(n * iters / dt / 1e6, 1)}


def bench_bpsk_mod():
    """BPSK modulation bits->IQ (gnuradio_comparison BPSK mod 20 M)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.core.hostio import to_device
    from r4w_tpu.waveforms.linear_mod import (
        linear_modulate, psk_constellation, psk_value_to_index)

    # 2^20-bit blocks amortize the per-iteration loop latency that
    # dominated at 2^16 (253 -> ~1200 Msps measured)
    n_bits, iters = 1 << 20, 16384  # ~0.45 s/run at the 37 Gsps peak
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, n_bits).astype(np.int32)
    con = to_device(psk_constellation(2))  # complex-safe transfer
    v2i = jnp.asarray(psk_value_to_index(2))

    # NB: complex arrays must be jit ARGUMENTS, not closure constants —
    # constant-embedding materializes them via a host complex copy,
    # which the axon runtime lacks.
    @jax.jit
    def run(bits, con):
        def body(i, b):
            iq = linear_modulate(b, con, v2i, 1, sps=1)
            return jnp.abs(
                (iq.real < 0).astype(jnp.int32) - (1 - b)
            )  # decisions feed next iter (serial dep)

        b = lax.fori_loop(0, iters, body, bits)
        return jnp.sum(b).astype(jnp.float32)

    dt = _timed_scalar(run, bits, con)
    return {"Msps": round(n_bits * iters / dt / 1e6, 1)}


def bench_viterbi():
    """K=7 rate-1/2 soft Viterbi decode throughput (info Mbit/s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.fec.convolutional import conv_encode, viterbi_decode, \
        viterbi_decode_mxu

    n_info, lanes = 2048, 4096
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, (lanes, n_info)).astype(np.int32)
    coded = np.asarray(conv_encode(jnp.asarray(bits)))
    soft = (1.0 - 2.0 * coded).astype(np.float32)

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")

    @jax.jit
    def run(soft):
        # Pallas VMEM-resident ACS on TPU (bit-exact vs the XLA scan,
        # tests/test_fec.py); interpret-mode Pallas is too slow for a
        # CPU benchmark so the scan path benches elsewhere
        dec = (viterbi_decode_mxu(soft, soft=True) if on_tpu
               else viterbi_decode(soft, soft=True))
        return jnp.sum(dec).astype(jnp.float32)

    dt = _timed_scalar(run, soft)
    return {"Msps": round(lanes * n_info / dt / 1e6, 1)}


def bench_pcps():
    """GPS C/A PCPS acquisition correlator throughput via the production
    acquisition.pcps_grid path (Mcorr/s = PRNs x Doppler x phases / s)."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.core.hostio import to_device
    from r4w_tpu.gnss import acquisition, prn

    fs = 2_046_000.0
    n_prn = 8
    codes = np.stack([
        np.repeat(prn.gps_ca_code(p + 1), 2).astype(np.float32)
        for p in range(n_prn)
    ])  # (P, 2046) at 2 samples/chip
    cfg = acquisition.PcpsConfig(doppler_max_hz=5000.0,
                                 doppler_step_hz=250.0,
                                 coherent_periods=2)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(4092) + 1j * rng.standard_normal(4092)
         ).astype(np.complex64)
    xd = to_device(x)
    codes_d = jnp.asarray(codes)

    iters = 16

    @jax.jit
    def run(xd):
        def body(i, carry):
            x, acc = carry
            grid = acquisition.pcps_grid(x, codes_d, fs, cfg)
            s = jnp.sum(grid)
            return x * (1.0 + 1e-12 * s), acc + s

        _, acc = lax.fori_loop(0, iters, body,
                               (xd, jnp.asarray(0.0, jnp.float32)))
        return acc.astype(jnp.float32)

    dt = _timed_scalar(run, xd)
    n_dopp = int(2 * cfg.doppler_max_hz / cfg.doppler_step_hz) + 1
    cells = iters * n_prn * n_dopp * 2046
    return {"Msps": round(cells / dt / 1e6, 1)}


def bench_channel():
    """AWGN channel apply throughput (channel.rs:667).

    Headline Msps uses the default threefry key (the production
    default — counter-based, splittable, reproducible across
    backends); the same channel code is ALSO timed with an RBG key
    (jax.random.key(impl="rbg"), hardware RNG lowering) because the
    bench is PRNG-issue-bound (~16x the ALU per sample of a cmul —
    PERFORMANCE.md envelope note): the key impl is the caller's
    choice on the identical awgn() path."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.channel import awgn

    n, iters = 1 << 18, 16384  # ~0.3 s/run at the 14 Gsps rbg peak
    rng = np.random.default_rng(8)
    re = rng.standard_normal(n, dtype=np.float32)
    im = rng.standard_normal(n, dtype=np.float32)

    @jax.jit
    def run(re, im, key):
        v = lax.complex(re, im)

        def body(i, carry):
            v, key = carry
            key, sub = jax.random.split(key)
            # renormalize the 1.01x per-iteration power growth (20 dB
            # SNR noise adds 1% power): 1.01^16384 overflows f32; one
            # extra multiply is noise next to the per-sample threefry
            v = awgn(sub, v, 20.0) * np.float32(1.0 / np.sqrt(1.01))
            return v, key

        v, _ = lax.fori_loop(0, iters, body, (v, key))
        return jnp.sum(v.real**2 + v.imag**2)

    dt = _timed_scalar(run, re, im, jax.random.key(0))
    out = {"Msps": round(n * iters / dt / 1e6, 1)}
    try:
        dt2 = _timed_scalar(run, re, im, jax.random.key(0, impl="rbg"))
        out["Msps_rbg"] = round(n * iters / dt2 / 1e6, 1)
    except Exception as e:  # noqa: BLE001 — rbg is an optional extra
        out["rbg_error"] = f"{type(e).__name__}"[:40]
    return out


def bench_lora_sweep():
    """Full LoRa SF7-SF12 Monte-Carlo BER sweep — the BASELINE.json
    acceptance target (<60 s compute on one chip). Returns compute
    seconds (excluding compile) and per-SF waterfall SNRs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.waveforms import lora

    snrs = jnp.asarray(np.arange(-26.0, -2.0, 2.0), jnp.float32)  # 12 pts
    n_payload = 16
    waterfalls = {}
    compute_s = 0.0
    for sf in range(7, 13):
        p = lora.LoRaParams(sf=sf)
        lanes = max(4, 512 >> (sf - 7))
        payload = jnp.arange(n_payload) % p.chips_per_symbol
        keys = jax.random.split(jax.random.key(sf), lanes)

        @jax.jit
        def grid(keys, snrs, p=p, payload=payload):
            f = lambda k, s: lora.loopback_ber(p, payload, k, s)
            return jax.vmap(lambda k: jax.vmap(lambda s: f(k, s))(snrs)
                            )(keys).mean(0)

        ber = jax.device_get(grid(keys, snrs))  # compile + run
        t0 = time.perf_counter()
        ber = jax.device_get(grid(keys, snrs))  # warm run
        compute_s += time.perf_counter() - t0
        ber = np.asarray(ber)
        waterfalls[f"sf{sf}"] = (
            float(snrs[int(np.argmax(ber < 0.01))])
            if np.any(ber < 0.01) else None)
    return {"compute_s": round(compute_s, 2), "target_s": 60.0,
            "pass": compute_s < 60.0, "waterfall_snr_db": waterfalls}


def bench_pcps_gcorr():
    """Big-grid PCPS throughput — the BASELINE.json 'GNSS Mcorr/s' north
    star (50-slot code bank x 41 Doppler x 1023 lags, power-of-two FFT
    via the two-period trick). The bank holds the 32 distinct GPS C/A
    codes with 18 slots repeated (C/A defines only PRN 1-32) — FLOP
    count and throughput are unaffected by the repetition. Grid shape
    from the r4 TPU sweep (tools/pcps_sweep.py): 50x41x1024 reached
    2.89 Gcorr/s vs 1.56 at the old 8x41x256 — wider PRN banks fill
    the batch FFT, and longer chained loops amortize dispatch."""
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from r4w_tpu.gnss import prn

    fs = 1.023e6
    n = 1023
    prns = [1 + (p % 32) for p in range(50)]
    n_dopp = 41
    iters = 1024
    codes = np.stack([np.asarray(prn.gps_ca_code(p))
                      for p in prns]).astype(np.float32)
    codesj = jnp.asarray(codes)
    nfft = 4096
    rng = np.random.default_rng(0)
    re = rng.standard_normal((2 * n,), dtype=np.float32)
    im = rng.standard_normal((2 * n,), dtype=np.float32)
    dops = jnp.arange(n_dopp, dtype=jnp.float32) * 250.0 - 5000.0
    t = jnp.arange(2 * n, dtype=jnp.float32) / fs

    @jax.jit
    def run(re, im):
        x0 = lax.complex(re, im)
        ang = -2.0 * np.pi * dops[:, None] * t[None, :]
        carriers = lax.complex(jnp.cos(ang), jnp.sin(ang))  # (D, N)
        code_fft = jnp.conj(jnp.fft.fft(codesj.astype(jnp.complex64),
                                        nfft, axis=-1))  # (K, NF)

        def body(i, x):
            mixed = x[None, :] * carriers
            mf = jnp.fft.fft(mixed, nfft, axis=-1)
            surf = jnp.fft.ifft(mf[None] * code_fft[:, None, :],
                                axis=-1)[..., :n]
            pw = surf.real**2 + surf.imag**2
            peak = jnp.max(pw)
            # non-degenerate serial dependency: 0.0*peak could be
            # algebraically eliminated, dead-coding the whole loop body
            return x * (1.0 + 1e-12 * peak)

        x = lax.fori_loop(0, iters, body, x0)
        return jnp.sum(x.real**2 + x.imag**2)

    dt = _timed_scalar(run, re, im)
    cells = len(prns) * n_dopp * n * iters
    return {"Gcorr_s": round(cells / dt / 1e9, 2),
            "grid": (f"{len(prns)}-slot bank (32 distinct C/A) x "
                     f"{n_dopp} Doppler x {n} lags")}


def bench_device_sweep(budget_s: float = 900.0):
    """On-device waveform sweep: modulate -> host -> demodulate for every
    factory waveform, time-budgeted (truncates honestly rather than
    blowing the watchdog; BASELINE.json '50/50 on-device' north star).
    R4W_SWEEP_BUDGET_S overrides the budget — the alternation scheme
    uses it to run a fresh-but-truncated sweep in whatever global
    budget remains."""
    from r4w_tpu.core.hostio import to_device, to_host
    from r4w_tpu.waveforms import create_waveform, list_waveforms

    env = os.environ.get("R4W_SWEEP_BUDGET_S")
    if env:
        budget_s = float(env)
    names = sorted(list_waveforms())
    t0 = time.perf_counter()
    ok, failures, done = 0, [], 0
    for name in names:
        if time.perf_counter() - t0 > budget_s:
            break
        done += 1
        try:
            wf = create_waveform(name, 48000.0)
            iq = to_host(wf.modulate(b"device-sweep"))
            wf.demodulate(to_device(iq))
            ok += 1
        except Exception as e:
            failures.append(f"{name}: {type(e).__name__}"[:60])
    return {"ok": ok, "attempted": done, "total": len(names),
            "truncated": done < len(names),
            "failures": failures[:10],
            "elapsed_s": round(time.perf_counter() - t0, 1)}


def bench_canary():
    """One-op tunnel liveness probe: a single 128x128 jit through the
    device, synced by device_get. Pays tunnel init; proves nothing
    about throughput — exists so the orchestrator can decide TPU vs
    degraded-CPU in <=2 bounded attempts instead of walking every
    bench through its own watchdog (the r3 failure mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = np.ones((128, 128), np.float32)
    s = float(jax.device_get(jax.jit(lambda a: jnp.sum(a * a))(x)))
    assert s == 128 * 128
    return {"ok": True}


BENCHES = {
    "canary": bench_canary,
    "fft1024": bench_fft1024,
    "fft256": bench_fft256,
    "fft2048": bench_fft2048,
    "fft4096": bench_fft4096,
    "fir32": lambda: bench_fir(32),
    "fir128": lambda: bench_fir(128),
    "rotator": bench_rotator,
    "cmul": bench_cmul,
    "bpsk_mod": bench_bpsk_mod,
    "viterbi_info_bits": bench_viterbi,
    "pcps_corr": bench_pcps,
    "channel_awgn": bench_channel,
    "lora_sf7_demod": bench_lora_sf7_demod,
    "udp_rx": bench_udp_rx,
    "lora_sweep": bench_lora_sweep,
    "pcps_gcorr": bench_pcps_gcorr,
    "e1c_gate": bench_e1c_gate,
    "gps_pvt_fix": bench_gps_pvt_fix,
    "dual_pvt": bench_dual_pvt,
    "glonass_track": bench_glonass_track,
    "e1c_tracking": bench_e1c_tracking,
    "device_sweep": bench_device_sweep,
}


# --------------------------------------------------------------------
# Child process: line protocol — read a bench name on stdin, run it,
# print ONE JSON line {"bench", "device", ...result} on stdout.
# --------------------------------------------------------------------

def child_main():
    import jax

    if "--platform=cpu" in sys.argv:
        # NB: the JAX_PLATFORMS env var does NOT override the ambient
        # axon platform in this environment; programmatic config does.
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("R4W_NO_COMPILE_CACHE") != "1":
        # Persistent compilation cache (verified to work through the
        # axon TPU tunnel: cross-process recompile 0.88 s -> 0.07 s).
        # The suite is compile-dominated (lora_sweep: 0.27 s compute vs
        # 81 s wall; device_sweep: 50 waveform graphs), so a cache
        # populated by any prior full run collapses the wall cost and
        # frees the global deadline for fresh acceptance runs.
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            continue
        name = parts[0]
        if name == "quit":
            break
        # optional KEY=VALUE tokens ride the request line into the
        # child's environment (e.g. R4W_SWEEP_BUDGET_S for the
        # alternation scheme's fresh-but-truncated device sweep)
        for tok in parts[1:]:
            if "=" in tok:
                k, v = tok.split("=", 1)
                os.environ[k] = v
        t0 = time.perf_counter()
        try:
            res = dict(BENCHES[name]())
        except Exception as e:  # noqa: BLE001 — report, don't die
            res = {"error": f"{type(e).__name__}: {e}"[:160]}
        res["bench"] = name
        res["device"] = str(jax.devices()[0])
        res["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(res), flush=True)


# --------------------------------------------------------------------
# Parent process: orchestrate the child with watchdogs + retries.
# --------------------------------------------------------------------

class _Child:
    def __init__(self, platform=None):
        import queue
        import subprocess
        import threading

        cmd = [sys.executable, os.path.abspath(__file__), "--child"]
        if platform:
            cmd.append(f"--platform={platform}")
        self.proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)
        self.q = queue.Queue()

        def reader():
            for ln in self.proc.stdout:
                self.q.put(ln)
            self.q.put(None)

        threading.Thread(target=reader, daemon=True).start()

    def run(self, name: str, timeout_s: float, extra: str = ""):
        """Returns result dict or None on hang/death. `extra` carries
        optional KEY=VALUE tokens to the child's environment."""
        import queue

        try:
            self.proc.stdin.write(
                (f"{name} {extra}" if extra else name) + "\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            return None
        deadline = time.time() + timeout_s
        while True:
            try:
                ln = self.q.get(timeout=max(0.1, deadline - time.time()))
            except queue.Empty:
                return None
            if ln is None:
                return None
            try:
                res = json.loads(ln)
                if isinstance(res, dict) and res.get("bench") == name:
                    return res
            except json.JSONDecodeError:
                continue  # stray warning line

    def kill(self):
        try:
            self.proc.kill()
            self.proc.wait(timeout=10)
        except Exception:
            pass


# --------------------------------------------------------------------
# Orchestration v2 (round-4 redesign — the r2/r3 records were lost to
# unbounded watchdog arithmetic, so capture is now deadline-driven):
#   1. ONE bounded canary decides TPU vs degraded in <= CANARY_CAP +
#      1.5 x CANARY_CAP (the retry escalates: slow tunnel != dead tunnel).
#   2. A global wall-clock deadline (env R4W_BENCH_DEADLINE_S, default
#      1140 s) derates every per-bench watchdog; benches that no longer
#      fit are skipped loudly, slowest-first.
#   3. Results flush incrementally to docs/bench_records/last_run.json
#      and a SIGTERM/SIGINT/atexit handler prints the headline JSON
#      with whatever completed — a driver kill still leaves a record.
#   4. The slow acceptance runs (e1c_gate, device_sweep, ...) are
#      cacheable: a fresh pass updates docs/bench_records/
#      acceptance_cache.json; when the deadline can't fit a fresh run,
#      the age-stamped cached result is reported (marked "cached").
# --------------------------------------------------------------------

# nominal per-bench watchdogs (s), assuming a warmed healthy tunnel
BUDGETS = {
    "lora_sweep": 300.0,       # measured 69 s warm
    "device_sweep": 900.0,     # measured 720 s healthy
    "lora_sf7_demod": 240.0,
    "viterbi_info_bits": 480.0,  # pallas AOT warmup ~150 s + transfers
    "e1c_gate": 600.0,         # gen ~250 s + acquire ~65 s + margin
    "gps_pvt_fix": 600.0,
    "dual_pvt": 700.0,         # measured 254 gen + 120 acq + 90 trk
    "glonass_track": 420.0,
    "e1c_tracking": 600.0,
    "udp_rx": 180.0,
}
DEFAULT_BUDGET = 240.0
TUNNEL_INIT_ALLOWANCE = 300.0  # canary pays init; first real bench gets this
CANARY_CAP = 240.0             # per attempt; two attempts max
EMIT_RESERVE = 30.0            # always keep this much for the final emit
DEADLINE_S = float(os.environ.get("R4W_BENCH_DEADLINE_S", "1140"))

# expected fresh cost (s) of the cacheable acceptance runs — used to
# decide fresh-vs-cached against the remaining global budget
CACHEABLE = {
    "e1c_gate": 450.0,
    "device_sweep": 780.0,
    # decoded-ephemeris mode (r5): gen 25-90 s (device-resident) +
    # acquire ~55-75 s + track ~37 s + host decode, measured on TPU
    "gps_pvt_fix": 260.0,
    # dual-constellation joint fix: 10-SV scenario gen 254 s + both
    # front ends (acquire 120 s + track 90 s), measured on TPU r5
    "dual_pvt": 500.0,
    # GLONASS FDMA 6-channel track: measured r5 on TPU — gen 183 s +
    # acquire 109 s + track 12 s + host bit search
    "glonass_track": 340.0,
    # marginal after e1c_gate in the same child (shared capture memo);
    # still budgeted for the child-restarted worst case. r5 adds the
    # E1B I/NAV phase (own 4.35 s dual-component capture + long
    # dual-channel pass) — skippable via R4W_E1B=0 if budget-pressed
    "e1c_tracking": 600.0,
}
_HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_PATH = os.path.join(_HERE, "docs", "bench_records",
                          "acceptance_cache.json")
# R4W_BENCH_RECORD_PATH lets test/CI runs flush their partial record
# elsewhere, so exercising the capture flow never clobbers the last
# real TPU record under docs/bench_records/.
PARTIAL_PATH = os.environ.get(
    "R4W_BENCH_RECORD_PATH",
    os.path.join(_HERE, "docs", "bench_records", "last_run.json"))


class _Run:
    """Mutable capture state shared with the signal/atexit emitters."""

    def __init__(self):
        self.t_end = time.time() + DEADLINE_S
        self.results = {}
        self.device_seen = None
        self.tunnel_dead = False
        self.cpu_results = {}
        self.emitted = False

    def remaining(self):
        return self.t_end - time.time() - EMIT_RESERVE


RUN = _Run()


def _load_cache():
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_cache(name, res):
    try:
        if "TPU" not in str(res.get("device", "")):
            return  # never let CPU runs pollute the acceptance cache
        cache = _load_cache()
        cache[name] = {"result": {k: v for k, v in res.items()
                                  if k not in ("bench",)},
                       "recorded_unix": round(time.time(), 1)}
        os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except Exception as e:  # cache is best-effort, never fatal
        print(f"# cache store failed: {e}", file=sys.stderr, flush=True)


def _flush_partial():
    try:
        results = {}
        for name, res in RUN.results.items():
            entry = {k: v for k, v in res.items() if k != "bench"}
            if "Msps" in entry and name in GR_BASELINES:
                entry["vs_gnuradio"] = round(
                    entry["Msps"] / GR_BASELINES[name], 1)
            results[name] = entry
        os.makedirs(os.path.dirname(PARTIAL_PATH), exist_ok=True)
        with open(PARTIAL_PATH, "w") as f:
            json.dump({"results": results, "device": RUN.device_seen,
                       "cpu_fallback": RUN.cpu_results,
                       "tunnel_dead": RUN.tunnel_dead}, f, indent=1)
    except Exception:
        pass


HEADLINE_MAX_BYTES = 1400  # hard ceiling; driver tail window is 2000


def _gates_summary():
    """Compact acceptance-gate digest for the headline (numbers only —
    the full per-bench records live in docs/bench_records/last_run.json)."""
    r = RUN.results
    g = {}

    def has(name):
        res = r.get(name)
        return res if isinstance(res, dict) and "error" not in res else None

    e1c = has("e1c_gate")
    if e1c and "acquired" in e1c:
        g["e1c_acq"] = e1c["acquired"]
    trk = has("e1c_tracking")
    if trk and "tracked" in trk:
        g["e1c_trk"] = trk["tracked"]
        if "e1b_pages_ok" in trk:
            g["e1b"] = trk["e1b_pages_ok"]
    pvt = has("gps_pvt_fix")
    if pvt and "error_m" in pvt:
        g["pvt_err_m"] = pvt["error_m"]
        if pvt.get("mode"):
            g["pvt_mode"] = pvt["mode"]
    dual = has("dual_pvt")
    if dual and "error_m" in dual:
        g["dual_pvt_m"] = dual["error_m"]
    glo = has("glonass_track")
    if glo and "tracked" in glo:
        g["glo"] = glo["tracked"]
    lora = has("lora_sweep")
    if lora and "compute_s" in lora:
        g["lora_sweep_s"] = lora["compute_s"]
    sweep = has("device_sweep")
    if sweep and "ok" in sweep:
        if sweep.get("truncated"):
            # budget-truncated fresh run: n/attempted, not n/total —
            # "35/50" would read as 15 failures when 15 simply did
            # not fit the remaining global budget
            g["sweep"] = (f"{sweep['ok']}/{sweep['attempted']}"
                          f" (of {sweep['total']}, budget-truncated)")
            fc = sweep.get("full_cache")
            if fc:
                g["sweep_full"] = (f"{fc['ok']}/{fc['total']}"
                                   f"@{fc['age_h']}h")
        else:
            g["sweep"] = f"{sweep['ok']}/{sweep['total']}"
        if sweep.get("cached"):
            g["sweep_cached_h"] = sweep.get("cache_age_h")
    gcorr = has("pcps_gcorr")
    if gcorr and "Gcorr_s" in gcorr:
        g["pcps_gcorr"] = gcorr["Gcorr_s"]
    return g


def _shrink_to_fit(out):
    """Guarantee the emitted line fits the driver's tail window: drop
    the least-essential extra keys until the serialized form fits.
    The metric/value/unit/vs_baseline core is never touched."""
    for victim in ("msps", "gates", "errors", "cpu_msps", "reason"):
        if len(json.dumps(out)) <= HEADLINE_MAX_BYTES:
            break
        out.get("extra", {}).pop(victim, None)
    return out


def _build_headline():
    """Compact headline — the r4 record was lost because the full suite
    was inlined here (~2.5 KB) and the driver keeps only a 2000-char
    stdout tail. The full suite now lives ONLY in last_run.json; this
    line carries the metric plus integer throughput digests and the
    acceptance-gate summary, hard-capped at HEADLINE_MAX_BYTES."""
    fft = RUN.results.get("fft1024", {})
    tpu_ok = ("Msps" in fft and "TPU" in (fft.get("device") or ""))

    # integer Msps digest of every throughput bench (full-precision
    # values + wall times + vs_gnuradio stay in the partial record)
    msps = {n: int(round(res["Msps"]))
            for n, res in RUN.results.items()
            if isinstance(res, dict) and "Msps" in res and n != "fft1024"}
    errors = sorted(n for n, res in RUN.results.items()
                    if isinstance(res, dict) and "error" in res)[:8]

    if tpu_ok:
        out = {
            "metric": "fft1024_throughput",
            "value": fft["Msps"],
            "unit": "Msamples/s",
            "vs_baseline": round(fft["Msps"] / BASELINE_FFT1024_MSPS, 2),
            "extra": {
                "device": fft["device"],
                "msps": msps,
                "gates": _gates_summary(),
                "record": os.path.relpath(PARTIAL_PATH, _HERE),
            },
        }
        if errors:
            out["extra"]["errors"] = errors
        return _shrink_to_fit(out), True
    # TPU never answered (or fft1024 never completed): LOUD degraded
    # record — never a CPU number in the headline (round-2 lesson).
    out = {
        "metric": "fft1024_throughput",
        "value": None,
        "unit": "Msamples/s",
        "vs_baseline": None,
        "degraded": True,
        "extra": {
            "reason": ("TPU tunnel unresponsive (canary failed twice)"
                       if RUN.tunnel_dead else
                       "fft1024 did not complete before the deadline"),
            "msps": msps,
            "cpu_msps": {
                n: int(round(r["Msps"]))
                for n, r in RUN.cpu_results.items() if "Msps" in r},
            "record": os.path.relpath(PARTIAL_PATH, _HERE),
        },
    }
    if errors:
        out["extra"]["errors"] = errors
    return _shrink_to_fit(out), False


def _emit_final():
    """Idempotent: print the headline JSON line exactly once."""
    if RUN.emitted:
        return 1
    RUN.emitted = True
    out, tpu_ok = _build_headline()
    _flush_partial()
    print(json.dumps(out), flush=True)
    return 0 if tpu_ok else 1


def _signal_emit(signum, frame):  # noqa: ARG001 — signal signature
    print(f"# signal {signum}: emitting partial record",
          file=sys.stderr, flush=True)
    rc = _emit_final()
    os._exit(rc)


class _Orchestrator:
    def __init__(self, platform=None):
        self.platform = platform
        self.child = None
        self.spawns = 0
        self.warmed = False

    def _ensure_child(self):
        if self.child is None:
            self.child = _Child(self.platform)
            self.spawns += 1
            self.warmed = False

    def _restart_child(self, backoff_s):
        if self.child is not None:
            self.child.kill()
            self.child = None
        time.sleep(min(backoff_s, max(0.0, RUN.remaining())))
        self._ensure_child()

    def run_one(self, name, budget, retries=1, escalate=1.0,
                extra: str = "", restart_on_retry=True):
        """Run one bench with the given watchdog; None on hang.

        escalate > 1 grows the watchdog per retry (the canary uses
        1.5×: tunnel init has been measured anywhere from 83 s to
        526 s, and a slow-but-alive tunnel must not be misread as
        dead — a false "degraded" verdict forfeits the round's TPU
        record, which is far worse than spending 120 extra seconds).

        restart_on_retry=False keeps the SAME child across attempts:
        a canary timeout almost always means the tunnel is still
        initializing, and killing the child restarts that init from
        zero — with the observed 526 s worst-case init, a restart
        guarantees the second attempt also times out and the round is
        falsely declared degraded. Waiting on the live child instead
        tolerates init up to the SUM of the attempt windows."""
        self._ensure_child()
        for attempt in range(retries + 1):
            res = self.child.run(name, budget, extra=extra)
            if res is not None:
                self.warmed = True
                return res
            print(f"# bench {name} hung (> {budget:.0f}s)"
                  + ("" if restart_on_retry else ", keeping child"),
                  file=sys.stderr, flush=True)
            if attempt < retries:
                budget *= escalate
                if RUN.remaining() < budget:
                    budget = max(30.0, RUN.remaining())
                    if budget <= 30.0:
                        break
                if restart_on_retry:
                    self._restart_child(15.0 * self.spawns)
        return None

    def close(self):
        if self.child is not None:
            try:
                self.child.run("quit", 1.0)
            except Exception:
                pass
            self.child.kill()
            self.child = None


def _record(name, res):
    RUN.results[name] = res
    if isinstance(res, dict) and res.get("device"):
        RUN.device_seen = res["device"]
    shown = {k: v for k, v in res.items() if k != "bench"}
    print(f"# {name}: {json.dumps(shown)}", file=sys.stderr, flush=True)
    _flush_partial()


def run_suite(order):
    """Canary-gated, deadline-derated capture on the ambient device."""
    # test hook: R4W_BENCH_PLATFORM=cpu exercises the full orchestration
    # without the TPU tunnel (headline stays degraded — device != TPU)
    orch = _Orchestrator(os.environ.get("R4W_BENCH_PLATFORM") or None)

    # Phase 1: tunnel canary — two bounded attempts (the second 1.5×
    # longer: a cold tunnel has taken >240 s to first answer while
    # still healthy — observed r4), then verdict.
    cap = min(CANARY_CAP, max(45.0, RUN.remaining()))
    res = orch.run_one("canary", cap, retries=1, escalate=1.5,
                       restart_on_retry=False)
    if res is None or "error" in res:
        RUN.tunnel_dead = True
        _record("canary", res or {"error": "watchdog timeout"})
        orch.close()
        return
    _record("canary", res)

    # Phase 2: the suite, slow cacheable tail last, each bench derated
    # against the global deadline.
    cache = _load_cache()

    # Alternation (VERDICT r4 #7): one cacheable acceptance gets the
    # round's FRESH slot — the unit with the oldest cache runs first
    # in the tail (while global budget remains), the others ride their
    # caches with an explicit alternation note. The e1c pair moves as
    # one unit (tracking shares the gate's memoized capture).
    def _age(n):
        e = cache.get(n)
        return (time.time() - e["recorded_unix"]) if e else float("inf")

    units = [["gps_pvt_fix"], ["dual_pvt"], ["glonass_track"],
             ["e1c_gate", "e1c_tracking"], ["device_sweep"]]
    tail = [n for u in units for n in u]
    priority = None
    if all(n in order for n in tail):
        units.sort(key=lambda u: -min(_age(n) for n in u))
        order = [n for n in order if n not in tail] + [
            n for u in units for n in u]
        priority = units[0][0]
        print(f"# alternation: fresh slot this round -> {units[0]}",
              file=sys.stderr, flush=True)

    first_real = True
    for name in order:
        remaining = RUN.remaining()
        nominal = BUDGETS.get(name, DEFAULT_BUDGET)
        if first_real:
            nominal += TUNNEL_INIT_ALLOWANCE  # canary init can be partial
        # the priority device_sweep may run fresh-but-truncated: the
        # bench self-truncates to the budget it is given (honest n/50
        # with truncated:true beats a day-old 50/50 cache)
        extra = ""
        fresh_truncated = (name == "device_sweep" and name == priority
                           and remaining >= 270.0)
        if fresh_truncated:
            extra = ("R4W_SWEEP_BUDGET_S="
                     f"{max(60.0, remaining - 90.0):.0f}")
        if name in CACHEABLE and not fresh_truncated \
                and (remaining < CACHEABLE[name] or remaining < nominal):
            entry = cache.get(name)
            if entry:
                res = dict(entry["result"])
                res["cached"] = True
                res["cache_age_h"] = round(
                    (time.time() - entry["recorded_unix"]) / 3600.0, 1)
                if name == priority:
                    # the fresh slot went to THIS unit but the global
                    # budget ran out before its turn — say so instead
                    # of a self-contradictory "fresh slot" note on a
                    # cached entry (the r5-session record's confusion)
                    res["alternation"] = (
                        f"fresh slot forfeited: {remaining:.0f}s left "
                        f"< {270 if name == 'device_sweep' else nominal:.0f}s needed")
                elif priority is not None:
                    res["alternation"] = (
                        f"fresh slot this round: {priority}")
                _record(name, res)
            else:
                _record(name, {"error": "skipped (global deadline, "
                                        "no cached record)"})
            continue
        if remaining < min(nominal, 60.0):
            _record(name, {"error": "skipped (global deadline)"})
            continue
        budget = min(nominal, remaining)
        res = orch.run_one(name, budget,
                           retries=1 if RUN.remaining() > budget else 0,
                           extra=extra)
        if res is None:
            _record(name, {"error": "watchdog timeout"})
            # a hang mid-suite: if nothing has answered since, treat
            # the tunnel as wedged and stop burning the deadline
            if RUN.remaining() < 120.0:
                for rest in order[order.index(name) + 1:]:
                    _record(rest, {"error": "skipped (global deadline)"})
                break
            continue
        first_real = False
        if name == "device_sweep" and res.get("truncated") \
                and cache.get(name):
            # fresh-but-truncated witness: keep the last full 50/50
            # evidence visible alongside it rather than replacing it
            ent = cache[name]
            full = ent["result"]
            res["full_cache"] = {
                "ok": full.get("ok"), "total": full.get("total"),
                "age_h": round(
                    (time.time() - ent["recorded_unix"]) / 3600.0, 1)}
        _record(name, res)
        if name in CACHEABLE and "error" not in res \
                and not res.get("truncated"):
            # budget-truncated sweeps are honest fresh witnesses for
            # THIS record but must not replace a full 50/50 cache
            _store_cache(name, res)
    orch.close()


def run_cpu_fallback():
    """Time-boxed CPU numbers for the degraded record (clearly labeled,
    never comparable to the TPU baseline)."""
    orch = _Orchestrator(platform="cpu")
    for name in ("fft1024", "fft4096", "fir32", "cmul"):
        budget = min(150.0, RUN.remaining())
        if budget < 30.0:
            break
        res = orch.run_one(name, budget, retries=0)
        if res is not None:
            RUN.cpu_results[name] = res
            _flush_partial()
    orch.close()


ORDER = [
    "fft1024", "fft256", "fft2048", "fft4096", "fir32", "fir128",
    "rotator", "cmul",
    "bpsk_mod", "pcps_corr", "channel_awgn", "lora_sf7_demod",
    "udp_rx", "pcps_gcorr", "lora_sweep", "viterbi_info_bits",
    # cacheable acceptance tail (slowest last); e1c_tracking AFTER
    # e1c_gate — both share one memoized scenario capture per child
    # (tools/e1c_common.py), so tracking costs ~10 s marginal
    "gps_pvt_fix", "dual_pvt", "glonass_track", "e1c_gate",
    "e1c_tracking", "device_sweep",
]


def main():
    import atexit
    import signal

    signal.signal(signal.SIGTERM, _signal_emit)
    signal.signal(signal.SIGINT, _signal_emit)
    atexit.register(_emit_final)

    quick = "--quick" in sys.argv
    order = ORDER[:3] if quick else ORDER
    run_suite(order)

    fft = RUN.results.get("fft1024", {})
    tpu_ok = ("Msps" in fft and "TPU" in (fft.get("device") or ""))
    if not tpu_ok:
        run_cpu_fallback()
    return _emit_final()


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
    else:
        raise SystemExit(main())
