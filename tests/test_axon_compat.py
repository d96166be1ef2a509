"""Guard: no eager complex-scalar constructs in device code.

Python complex literals in eager jnp arithmetic (`1j * x`,
`jnp.exp(1j*x)`) force a complex64 host->device scalar transfer, which
is unimplemented on some TPU runtimes (ARCHITECTURE.md §7). Library
code must use core.hostio.cis / jax.lax.complex instead. This test
scans the source so the constraint survives refactors.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "r4w_tpu"

CPLX_LIT = re.compile(r"(?<![\w.])-?\d+\.?\d*j\b")


def _flag(src: str):
    out = []
    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        s = line.strip()
        if s.startswith("#") or s.startswith('"""') or "Equivalent" in s:
            continue
        has_lit = bool(CPLX_LIT.search(line))
        if not has_lit:
            continue
        ctx = " ".join(lines[max(0, i - 3):i + 2])
        # numpy host math is fine; device (jnp) arithmetic is not
        if "jnp.exp(" in ctx or ("jnp." in line and ("1j *" in line
                                                     or "2j *" in line)):
            out.append(f"{i}: {s}")
    return out


def test_no_eager_complex_scalars():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for hit in _flag(path.read_text()):
            offenders.append(f"{rel}:{hit}")
    assert not offenders, (
        "eager complex-scalar constructs (use core.hostio.cis or "
        "jax.lax.complex):\n" + "\n".join(offenders))
