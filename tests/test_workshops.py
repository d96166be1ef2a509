"""Workshop code blocks execute (docs-as-tests, SURVEY §4 pattern):
every self-contained ```python block in docs/workshops/ must run."""

import pathlib
import re

import pytest

pytestmark = pytest.mark.slow  # heavy integration lane

WS_DIR = pathlib.Path(__file__).resolve().parents[1] / "docs" / "workshops"

_BLOCK = re.compile(r"```python\n(.*?)```", re.S)


def _python_blocks(path: pathlib.Path) -> list[str]:
    return _BLOCK.findall(path.read_text())


def test_eleven_workshops_exist():
    assert len(sorted(WS_DIR.glob("*.md"))) >= 11


@pytest.mark.parametrize("path", sorted(WS_DIR.glob("*.md")),
                         ids=lambda p: p.stem)
def test_workshop_snippets_run(path):
    """Execute the workshop's python blocks in one namespace (blocks
    build on each other within a lab)."""
    blocks = _python_blocks(path)
    if not blocks:
        pytest.skip("no python blocks")
    ns: dict = {}
    import jax

    jax.config.update("jax_platforms", "cpu")
    for i, src in enumerate(blocks):
        if "..." in src or "# open http" in src:
            continue  # illustrative fragment
        try:
            exec(compile(src, f"{path.name}:block{i}", "exec"), ns)
        except Exception as e:  # pragma: no cover - report location
            raise AssertionError(
                f"{path.name} block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{src}") from e
