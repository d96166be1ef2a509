"""Execution sandbox (crates/r4w-sandbox re-design, ~4.9k LoC:
`Sandbox` + `IsolationLevel` L1-L8, levels/mod.rs:19).

The reference stack: L1 Rust memory safety, L2 process isolation,
L3 resource limits, L4 namespaces, L5 seccomp, L6 container, L7 VM,
L8 WASM. Here the portable levels (L1-L3) are fully functional —
exception containment, subprocess isolation, and rlimit enforcement —
while L4+ report unavailable unless the host provides the facilities
(unprivileged kernels usually don't; the TPU compute path never runs
untrusted code in-process anyway, plugins are data-plane-only).
"""

from __future__ import annotations

import dataclasses
import enum
import multiprocessing as mp
import os
import traceback
from typing import Any, Callable


class IsolationLevel(enum.IntEnum):
    """levels/mod.rs:19 ladder."""

    L1_LANGUAGE = 1    # in-process, exception containment
    L2_PROCESS = 2     # separate process, crash isolation
    L3_RESOURCE = 3    # + CPU/memory rlimits + timeout
    L4_NAMESPACE = 4   # unshared namespaces (needs privileges)
    L5_SECCOMP = 5     # syscall filter
    L6_CONTAINER = 6   # container runtime
    L7_VM = 7          # virtual machine
    L8_WASM = 8        # wasm runtime


@dataclasses.dataclass
class SandboxResult:
    ok: bool
    value: Any = None
    error: str | None = None
    exit_code: int | None = None


class SandboxUnavailable(RuntimeError):
    pass


def available_levels() -> list[IsolationLevel]:
    """Levels this host can actually enforce."""
    levels = [IsolationLevel.L1_LANGUAGE, IsolationLevel.L2_PROCESS]
    try:
        import resource  # noqa: F401

        levels.append(IsolationLevel.L3_RESOURCE)
    except ImportError:
        pass
    if os.path.exists("/proc/self/ns/user") and hasattr(os, "unshare"):
        # presence of the API, not a guarantee of permission
        try:
            levels.append(IsolationLevel.L4_NAMESPACE)
        except Exception:
            pass
    return levels


def _child(fn, args, kwargs, q, memory_limit_mb, cpu_limit_s):
    try:
        if memory_limit_mb or cpu_limit_s:
            import resource

            if memory_limit_mb:
                lim = memory_limit_mb * 1024 * 1024
                resource.setrlimit(resource.RLIMIT_AS, (lim, lim))
            if cpu_limit_s:
                resource.setrlimit(resource.RLIMIT_CPU,
                                   (cpu_limit_s, cpu_limit_s))
        q.put(("ok", fn(*args, **kwargs)))
    except MemoryError:
        q.put(("err", "MemoryError: resource limit exceeded"))
    except BaseException:  # noqa: BLE001 - report, child exits anyway
        q.put(("err", traceback.format_exc(limit=3)))


class Sandbox:
    """Run a callable under an isolation level (levels/sandbox.rs:83)."""

    def __init__(self, level: IsolationLevel = IsolationLevel.L2_PROCESS,
                 timeout_s: float = 30.0, memory_limit_mb: int | None = None,
                 cpu_limit_s: int | None = None):
        if level >= IsolationLevel.L4_NAMESPACE:
            raise SandboxUnavailable(
                f"{level.name} needs host facilities (namespaces/seccomp/"
                "container/VM/wasm runtime) not available here; "
                f"max portable level is L3_RESOURCE")
        self.level = level
        self.timeout_s = timeout_s
        self.memory_limit_mb = memory_limit_mb
        self.cpu_limit_s = cpu_limit_s

    def run(self, fn: Callable, *args, **kwargs) -> SandboxResult:
        if self.level == IsolationLevel.L1_LANGUAGE:
            try:
                return SandboxResult(True, fn(*args, **kwargs))
            except BaseException as e:  # noqa: BLE001
                return SandboxResult(False, error=f"{type(e).__name__}: {e}")
        ctx = mp.get_context("fork")
        q = ctx.Queue()
        mem = (self.memory_limit_mb
               if self.level >= IsolationLevel.L3_RESOURCE else None)
        cpu = (self.cpu_limit_s
               if self.level >= IsolationLevel.L3_RESOURCE else None)
        proc = ctx.Process(target=_child,
                           args=(fn, args, kwargs, q, mem, cpu))
        proc.start()
        proc.join(self.timeout_s)
        if proc.is_alive():
            proc.terminate()
            proc.join(5.0)
            return SandboxResult(False, error="timeout",
                                 exit_code=proc.exitcode)
        if not q.empty():
            tag, payload = q.get()
            if tag == "ok":
                return SandboxResult(True, payload,
                                     exit_code=proc.exitcode)
            return SandboxResult(False, error=payload,
                                 exit_code=proc.exitcode)
        # child died without reporting (segfault, rlimit SIGKILL...)
        return SandboxResult(False, error="child died silently",
                             exit_code=proc.exitcode)
