"""Known-answer truth counter (VERDICT r4 #9).

The "N independent-truth KA test functions" headline in README.md /
COVERAGE.md is pinned to this script instead of prose: it counts
`def test_*` functions in tests/test_known_answers*.py (the KA
batches a→t — every one asserts against an external truth: scipy
crossvals, published-standard constants, closed-form laws), and
separately the parametrize-expanded collected-case estimate.

Prints one JSON line; tests/test_known_answers.py asserts the count
never drops below the documented floor.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEF = re.compile(r"^\s*def (test_\w+)", re.M)
# meta-tests about the count itself are not KA truths
_EXCLUDE = {"test_count_meets_documented_floor"}


def count() -> dict:
    files = sorted(glob.glob(
        os.path.join(ROOT, "tests", "test_known_answers*.py")))
    n_defs = 0
    per_file = {}
    for f in files:
        text = open(f).read()
        n = len([t for t in _DEF.findall(text) if t not in _EXCLUDE])
        per_file[os.path.basename(f)] = n
        n_defs += n
    return {"ka_test_functions": n_defs, "files": len(files),
            "per_file": per_file}


def main() -> int:
    out = count()
    if "--per-file" not in sys.argv:
        out.pop("per_file", None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
