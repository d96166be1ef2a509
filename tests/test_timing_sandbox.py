"""Clocks/timestamps and the execution sandbox."""

import os
import time

import numpy as np
import pytest

from r4w_tpu import sandbox as sb
from r4w_tpu import timing as tm

pytestmark = pytest.mark.slow  # heavy integration lane


# --------------------------------------------------------------- timing


def test_timestamp_exact_arithmetic():
    a = tm.Timestamp.from_seconds(1.5)
    b = tm.Timestamp.from_seconds(0.75)
    assert (a + b).to_seconds() == pytest.approx(2.25, abs=1e-12)
    assert (a - b).to_seconds() == pytest.approx(0.75, abs=1e-12)
    # a million accumulations of 1 us lose nothing
    t = tm.Timestamp(0, 0)
    step = tm.Timestamp.from_seconds(1e-6)
    for _ in range(1000):
        t = t + step
    assert t.to_seconds() == pytest.approx(1e-3, abs=1e-12)


def test_timestamp_sample_conversion():
    t = tm.Timestamp.from_samples(48_000_000, 48e6)
    assert t.secs == 1 and t.picos == 0
    assert t.to_samples(48e6) == 48_000_000


def test_sample_clock():
    c = tm.SampleClock(1e6)
    c.advance(500_000)
    assert c.elapsed_seconds() == pytest.approx(0.5)
    assert c.timestamp().to_seconds() == pytest.approx(0.5)
    target = tm.Timestamp.from_seconds(0.75)
    assert c.samples_until(target) == 250_000
    with pytest.raises(ValueError):
        tm.SampleClock(0.0)


def test_wall_clock_pause_and_scale():
    c = tm.WallClock(scale=100.0)  # 100x fast
    time.sleep(0.02)
    fast = c.now()
    assert fast > 1.0  # 0.02 s * 100
    c.pause()
    frozen = c.now()
    time.sleep(0.01)
    assert c.now() == frozen
    c.resume()
    time.sleep(0.005)
    assert c.now() > frozen


def test_hardware_clock_drift():
    c = tm.HardwareClock(1e6, drift_ppm=10.0, seed=1)
    c.advance(10_000_000)  # 10 s
    # 10 ppm over 10 s = 100 us accumulated offset
    assert c.offset() == pytest.approx(100e-6, rel=1e-3)
    assert c.true_time() == pytest.approx(10.0)


# -------------------------------------------------------------- sandbox


def test_available_levels():
    levels = sb.available_levels()
    assert sb.IsolationLevel.L1_LANGUAGE in levels
    assert sb.IsolationLevel.L2_PROCESS in levels
    assert sb.IsolationLevel.L3_RESOURCE in levels  # linux image


def test_l1_exception_containment():
    box = sb.Sandbox(sb.IsolationLevel.L1_LANGUAGE)
    ok = box.run(lambda: 21 * 2)
    assert ok.ok and ok.value == 42
    bad = box.run(lambda: 1 / 0)
    assert not bad.ok and "ZeroDivisionError" in bad.error


def _crash_hard():
    os._exit(139)  # simulated segfault


def _hog_memory():
    return len(bytearray(1 << 31))  # 2 GB


def _loop_forever():
    while True:
        pass


def test_l2_survives_child_crash():
    box = sb.Sandbox(sb.IsolationLevel.L2_PROCESS, timeout_s=15)
    res = box.run(_crash_hard)
    assert not res.ok
    assert res.exit_code == 139
    # the sandbox itself is fine afterwards
    assert box.run(sum, [1, 2, 3]).value == 6


def test_l3_memory_limit():
    box = sb.Sandbox(sb.IsolationLevel.L3_RESOURCE, timeout_s=20,
                     memory_limit_mb=256)
    res = box.run(_hog_memory)
    assert not res.ok


def test_l3_timeout():
    box = sb.Sandbox(sb.IsolationLevel.L3_RESOURCE, timeout_s=2)
    res = box.run(_loop_forever)
    assert not res.ok and res.error == "timeout"


def _try_socket():
    import socket

    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.close()
        return "socket-allowed"
    except OSError as e:
        return f"socket-denied:{e.errno}"


def _my_affinity():
    import os as _os

    return sorted(_os.sched_getaffinity(0))


def test_l3_seccomp_denies_network():
    """L3 installs a real seccomp-BPF denylist: socket() must fail with
    EPERM inside the sandbox but still work in this process."""
    import errno
    import platform

    if platform.machine() != "x86_64":
        pytest.skip("seccomp denylist table is x86_64")
    assert _try_socket() == "socket-allowed"  # control
    box = sb.Sandbox(sb.IsolationLevel.L3_SECCOMP, timeout_s=15)
    res = box.run(_try_socket)
    assert res.ok
    assert "seccomp-bpf" in res.isolation
    assert res.value == f"socket-denied:{errno.EPERM}"


def test_l2_namespace_attempt_recorded():
    box = sb.Sandbox(sb.IsolationLevel.L2_NAMESPACES, timeout_s=15)
    res = box.run(lambda: 1)
    assert res.ok and "process" in res.isolation
    # namespaces may or may not be grantable on this kernel; if granted
    # the tags record it — either way the probe ran without error


def test_l7_cpu_pinning():
    if len(os.sched_getaffinity(0)) < 2:
        pytest.skip("needs >=2 CPUs")
    box = sb.Sandbox(sb.IsolationLevel.L7_HARDWARE, timeout_s=15)
    res = box.run(_my_affinity)
    assert res.ok
    assert "cpu-pinned" in res.isolation
    assert len(res.value) == 1  # dedicated CPU


def test_l8_air_gap_policy():
    if sb._has_default_route():
        with pytest.raises(sb.SandboxUnavailable, match="default route"):
            sb.Sandbox(sb.IsolationLevel.L8_AIR_GAP)
    else:
        box = sb.Sandbox(sb.IsolationLevel.L8_AIR_GAP)
        assert box.run(lambda: "offline").value == "offline"


def test_container_level_availability_matches_probe():
    if sb._container_runtime() is None:
        with pytest.raises(sb.SandboxUnavailable):
            sb.Sandbox(sb.IsolationLevel.L4_CONTAINER)
    else:
        box = sb.Sandbox(sb.IsolationLevel.L4_CONTAINER)
        with pytest.raises(sb.SandboxUnavailable, match="run_command"):
            box.run(lambda: 1)


def test_vm_levels_probe():
    # no microVM/VM runtimes in this image: constructor must refuse
    for level in (sb.IsolationLevel.L5_MICROVM, sb.IsolationLevel.L6_FULL_VM):
        runtime = (sb._microvm_runtime()
                   if level == sb.IsolationLevel.L5_MICROVM
                   else sb._vm_runtime())
        if runtime is None:
            with pytest.raises(sb.SandboxUnavailable):
                sb.Sandbox(level)


def test_describe_ladder():
    for level in range(1, 9):
        text = sb.Sandbox.describe(sb.IsolationLevel(level))
        assert text
    assert "seccomp" in sb.Sandbox.describe(sb.IsolationLevel.L3_SECCOMP)
    assert "air gap" in sb.Sandbox.describe(sb.IsolationLevel.L8_AIR_GAP)


def test_run_command_process_level():
    box = sb.Sandbox(sb.IsolationLevel.L2_NAMESPACES, timeout_s=15)
    res = box.run_command(["echo", "hello"])
    assert res.ok and res.value.strip() == "hello"
