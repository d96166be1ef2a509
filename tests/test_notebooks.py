"""Tutorial notebooks execute end-to-end (docs-as-tests, SURVEY §4)."""

import contextlib
import io
import json
import pathlib

import pytest

pytestmark = pytest.mark.slow  # heavy integration lane

NB_DIR = pathlib.Path(__file__).resolve().parents[1] / "notebooks"


@pytest.mark.parametrize("path", sorted(NB_DIR.glob("*.ipynb")),
                         ids=lambda p: p.stem)
def test_notebook_runs(path):
    cells = json.load(open(path))["cells"]
    src = "\n".join("".join(c["source"]) for c in cells
                    if c["cell_type"] == "code")
    with contextlib.redirect_stdout(io.StringIO()):
        exec(compile(src, path.name, "exec"), {})
