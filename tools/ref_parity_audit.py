"""Mechanical reference-parity audit (VERDICT r4 #4).

COVERAGE.md claims every reference module has "a named counterpart,
re-design, or cited alias" in this repo. This tool makes that claim
mechanical instead of prose: it enumerates every `.rs` module under
the reference crates (core, sim, cli, fpga, sandbox, ffi — the
capability surface; gui/web are the egui/WASM app whose parity story
is the web explorer, judged separately in COVERAGE §2.7), harvests
the `.rs` citations that repo sources carry in their docstrings, and
maps each reference module to the repo files that cite it.

Matching rules (strict → loose, reported by class):
  - "path"     : a citation suffix-matches the module path uniquely
                 (e.g. "gnss/scenario.rs" → waveform/gnss/scenario.rs)
  - "basename" : a citation matches only by file name and that name is
                 shared by several reference modules — all are credited
                 but the class is reported so the looseness is visible.
                 Bare "mod.rs" citations are NEVER credited (too
                 generic); a mod.rs module needs its parent dir cited.
Citations are harvested from r4w_tpu/**, tools/**, tests/**, bench.py
and __graft_entry__.py (code only — doc prose doesn't count).

Output: one JSON line {"total", "mapped", "unmapped": [...],
"by_class", "citing_files"}. tests/test_ref_parity.py asserts
unmapped == [] so the claim cannot silently rot.

Reference equivalent of the claim being audited: the module registry
itself, crates/r4w-core/src/lib.rs:45-773.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CRATES = "/root/reference/crates"
CRATES = ("r4w-core", "r4w-sim", "r4w-cli", "r4w-fpga", "r4w-sandbox",
          "r4w-ffi")
CITE_ROOTS = ("r4w_tpu", "tools", "tests")
CITE_FILES = ("bench.py", "__graft_entry__.py")
CITE_EXTS = (".py", ".cpp", ".h", ".c")
# the audit and its gate test cite modules while talking ABOUT the
# audit — crediting those would be circular
SELF = ("tools/ref_parity_audit.py", "tests/test_ref_parity.py")
_CITE_PAT = re.compile(r"[A-Za-z0-9_][A-Za-z0-9_/.-]*\.rs")


def list_reference_modules() -> list[str]:
    """Every .rs file under the capability crates, relative to crates/."""
    mods = []
    for crate in CRATES:
        src = os.path.join(REF_CRATES, crate, "src")
        for root, _dirs, files in os.walk(src):
            for f in sorted(files):
                if f.endswith(".rs"):
                    mods.append(os.path.relpath(
                        os.path.join(root, f), REF_CRATES))
    return sorted(mods)


def harvest_citations() -> dict[str, set[str]]:
    """citation-string -> set of citing repo files (repo-relative)."""
    cites: dict[str, set[str]] = collections.defaultdict(set)

    def scan(path: str):
        rel = os.path.relpath(path, REPO)
        if rel in SELF:
            return
        try:
            with open(path, errors="ignore") as f:
                text = f.read()
        except OSError:
            return
        for m in _CITE_PAT.findall(text):
            m = m.lstrip("/")
            cites[m].add(rel)
            # normalize "crates/r4w-core/src/x.rs" and full reference
            # paths down to the crate-relative form the matcher uses
            if "crates/" in m:
                cites[m.split("crates/", 1)[1]].add(rel)

    for base in CITE_ROOTS:
        for root, dirs, files in os.walk(os.path.join(REPO, base)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(CITE_EXTS):
                    scan(os.path.join(root, f))
    for f in CITE_FILES:
        scan(os.path.join(REPO, f))
    return cites


def audit() -> dict:
    mods = list_reference_modules()
    cites = harvest_citations()

    # index reference modules by basename for ambiguity detection
    by_base: dict[str, list[str]] = collections.defaultdict(list)
    for m in mods:
        by_base[os.path.basename(m)].append(m)

    mapped: dict[str, dict] = {}
    for mod in mods:
        parts = mod.split("/")
        base = parts[-1]
        hit = None
        # walk suffixes longest-first ("r4w-core/src/gnss/scenario.rs"
        # → ".../scenario.rs" → ... → "scenario.rs"); the class comes
        # from the strongest matching suffix, the citers are the union
        # over every matching form
        for i in range(len(parts)):
            suffix = "/".join(parts[i:])
            if suffix == "mod.rs":
                break  # bare mod.rs citations are never credited
            if suffix in cites:
                cls = ("path" if (suffix != base
                                  or len(by_base[base]) == 1)
                       else "basename")
                if hit is None:
                    hit = {"class": cls, "citation": suffix,
                           "cited_by": set()}
                hit["cited_by"] |= cites[suffix]
        if hit:
            hit["cited_by"] = sorted(hit["cited_by"])
            mapped[mod] = hit

    unmapped = [m for m in mods if m not in mapped]
    by_class = collections.Counter(v["class"] for v in mapped.values())
    return {
        "total": len(mods),
        "mapped": len(mapped),
        "unmapped": unmapped,
        "by_class": dict(by_class),
        "crates": {c: sum(1 for m in mods if m.startswith(c))
                   for c in CRATES},
        "map": mapped,
    }


def main() -> int:
    out = audit()
    full = "--full" in sys.argv
    if not full:
        out = {k: v for k, v in out.items() if k != "map"}
    print(json.dumps(out, indent=2 if full else None))
    return 0 if not out["unmapped"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
