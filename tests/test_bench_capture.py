"""Bench-capture robustness (VERDICT r3 #1: the driver record must
parse in BOTH tunnel states, including a driver kill mid-run)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def test_headline_builder_degraded_and_ok():
    sys.path.insert(0, ROOT)
    import bench

    run = bench._Run()
    bench.RUN = run
    out, tpu_ok = bench._build_headline()
    assert out["metric"] == "fft1024_throughput"
    assert out["degraded"] and out["vs_baseline"] is None
    assert not tpu_ok
    run.results["fft1024"] = {"Msps": 11000.0, "device": "TPU v5 lite0"}
    out, tpu_ok = bench._build_headline()
    assert tpu_ok and out["value"] == 11000.0
    assert abs(out["vs_baseline"] - 11000.0 / 371.0) < 0.1


def _full_suite_results():
    """A synthetic RUN state mirroring the r4 driver capture — every
    bench present, values at r4 magnitude (BENCH_r04.json tail)."""
    dev = "TPU v5 lite0"
    return {
        "canary": {"ok": True, "device": dev, "wall_s": 83.0},
        "fft1024": {"Msps": 12464.3, "device": dev, "wall_s": 2.1},
        "fft256": {"Msps": 17510.9, "device": dev, "wall_s": 2.0},
        "fft2048": {"Msps": 10921.2, "device": dev, "wall_s": 2.2},
        "fft4096": {"Msps": 11005.7, "device": dev, "wall_s": 5.8},
        "fir32": {"Msps": 3952.9, "device": dev, "wall_s": 1.1},
        "fir128": {"Msps": 2326.5, "device": dev, "wall_s": 1.5},
        "rotator": {"Msps": 3264.7, "device": dev, "wall_s": 1.0},
        "cmul": {"Msps": 10281.4, "device": dev, "wall_s": 1.1},
        "bpsk_mod": {"Msps": 502.8, "device": dev, "wall_s": 2.4},
        "pcps_corr": {"Msps": 156.4, "device": dev, "wall_s": 6.1},
        "channel_awgn": {"Msps": 653.5, "device": dev, "wall_s": 2.3},
        "lora_sf7_demod": {"Msps": 6575.6, "device": dev, "wall_s": 2.1},
        "udp_rx": {"Msps": 43.4, "path": "native", "offered_msps": 50.0,
                   "received_pct": 100.0, "seq_gaps": 0, "device": dev,
                   "wall_s": 7.9},
        "pcps_gcorr": {"Gcorr_s": 2.94,
                       "grid": "50 PRN x 41 Doppler x 1023 lags",
                       "device": dev, "wall_s": 8.3},
        "lora_sweep": {"compute_s": 0.27, "target_s": 60.0, "pass": True,
                       "waterfall_snr_db": {"sf7": -8.0, "sf8": -12.0,
                                            "sf9": -14.0, "sf10": -16.0,
                                            "sf11": -20.0, "sf12": -22.0},
                       "device": dev, "wall_s": 87.1},
        "viterbi_info_bits": {"Msps": 232.3, "device": dev, "wall_s": 80.5},
        "gps_pvt_fix": {"error_m": 31.7, "pass": True, "acquired": "6/6",
                        "mode": "decoded_ephemeris", "clock_bias_m": 10.5,
                        "gen_s": 4.2, "acquire_s": 47.6, "device": dev,
                        "wall_s": 51.9},
        "dual_pvt": {"error_m": 23.1, "pass": True, "acquired": "10/10",
                     "decoded": "10/10",
                     "mode": "decoded_ephemeris_joint",
                     "gps_only_m": 52.5, "galileo_only_m": 38.1,
                     "isb_m": 126.2, "gen_s": 254.4, "acquire_s": 120.0,
                     "track_s": 89.7, "device": dev, "wall_s": 470.0,
                     "cached": True, "cache_age_h": 3.0},
        "e1c_gate": {"acquired": "8/8", "false_alarms": 0,
                     "worst_present_metric": 4.07,
                     "best_absent_metric": 1.74, "gen_s": 7.7,
                     "acquire_s": 64.9, "device": dev, "wall_s": 83.3},
        "e1c_tracking": {"tracked": "8/8", "acquired": 8,
                         "cn0_mean_dbhz": 29.7, "gen_s": 7.7,
                         "acquire_s": 64.9, "track_s": 110.5,
                         "device": dev, "wall_s": 110.5},
        "device_sweep": {"attempted": 50, "device": dev,
                         "elapsed_s": 847.8, "failures": [], "ok": 50,
                         "total": 50, "truncated": False, "wall_s": 847.8,
                         "cached": True, "cache_age_h": 12.5},
    }


def test_headline_fits_driver_tail_window_full_suite():
    """VERDICT r4 #1: the r4 record parsed as null because the headline
    line (~2.5 KB) overflowed the driver's 2000-char stdout tail. The
    full-suite headline must now stay well inside that window, in BOTH
    tunnel states, and still carry the acceptance gates."""
    sys.path.insert(0, ROOT)
    import bench

    run = bench._Run()
    bench.RUN = run
    run.results.update(_full_suite_results())
    out, tpu_ok = bench._build_headline()
    line = json.dumps(out)
    assert tpu_ok
    assert len(line) < 1500, f"headline {len(line)}B overflows tail window"
    assert out["value"] == 12464.3
    gates = out["extra"]["gates"]
    assert gates["e1c_acq"] == "8/8" and gates["e1c_trk"] == "8/8"
    assert gates["pvt_err_m"] == 31.7 and gates["sweep"] == "50/50"
    assert gates["dual_pvt_m"] == 23.1
    assert out["extra"]["msps"]["cmul"] == 10281
    assert out["extra"]["record"] == "docs/bench_records/last_run.json"

    # degraded record (no fft1024 on TPU) must also fit and stay loud
    run2 = bench._Run()
    bench.RUN = run2
    run2.results.update(_full_suite_results())
    del run2.results["fft1024"]
    run2.cpu_results = {"fft1024": {"Msps": 301.0, "device": "cpu"},
                        "cmul": {"Msps": 410.0, "device": "cpu"}}
    out, tpu_ok = bench._build_headline()
    line = json.dumps(out)
    assert not tpu_ok and out["degraded"] is True
    assert len(line) < 1500, f"degraded headline {len(line)}B overflows"
    assert out["extra"]["cpu_msps"]["fft1024"] == 301


def test_headline_shrink_guard_never_overflows():
    """Even a pathological suite (many error entries, long device name)
    must serialize under the hard cap — _shrink_to_fit drops extras."""
    sys.path.insert(0, ROOT)
    import bench

    run = bench._Run()
    bench.RUN = run
    run.results["fft1024"] = {"Msps": 12464.3,
                              "device": "TPU v5 lite0 " + "x" * 120}
    for i in range(40):
        run.results[f"synthetic_bench_with_a_long_name_{i:02d}"] = {
            "Msps": 1234.5, "device": "TPU v5 lite0"}
        run.results[f"erroring_bench_with_a_long_name_{i:02d}"] = {
            "error": "Boom: " + "y" * 120}
    out, _ = bench._build_headline()
    assert len(json.dumps(out)) <= bench.HEADLINE_MAX_BYTES


@pytest.mark.slow
def test_sigterm_mid_run_still_emits_parseable_record():
    """Simulate the r3 failure mode: the driver SIGTERMs bench.py
    mid-run. The process must still print one parseable headline JSON
    line (the signal handler emits with whatever completed)."""
    env = dict(os.environ)
    env["R4W_BENCH_PLATFORM"] = "cpu"
    env["R4W_BENCH_DEADLINE_S"] = "600"
    # never clobber the real TPU record with this CPU exercise
    env["R4W_BENCH_RECORD_PATH"] = os.path.join(
        ROOT, "docs", "bench_records", "test_run.json")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--quick"],
        cwd=ROOT, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    time.sleep(20)  # canary + part of fft1024, nowhere near done
    proc.send_signal(signal.SIGTERM)
    try:
        out, _ = proc.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        raise AssertionError("bench.py did not exit after SIGTERM")
    rec = _last_json_line(out)
    assert rec is not None, out[-500:]
    assert rec["metric"] == "fft1024_throughput"
    # CPU platform → degraded headline, never a fake TPU number
    assert rec.get("degraded") is True
    assert rec["vs_baseline"] is None
