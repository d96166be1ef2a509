"""Every examples/ script executes end-to-end (docs-as-tests, same
pattern as the notebook/workshop runners)."""

import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy integration lane

EX_DIR = pathlib.Path(__file__).resolve().parents[1] / "examples"
SCRIPTS = sorted(p for p in EX_DIR.glob("*.py")
                 if p.name[0].isdigit())


def test_examples_exist():
    assert len(SCRIPTS) >= 8


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.stem)
def test_example_runs(script):
    if "multichip" in script.name:
        pytest.skip("runs its own subprocess mesh; covered by dryrun")
    r = subprocess.run([sys.executable, script.name],
                       cwd=EX_DIR, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
