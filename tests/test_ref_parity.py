"""Mechanical reference-parity audit gate (VERDICT r4 #4).

COVERAGE.md's completeness claim — every reference module has a named
counterpart, re-design, or cited alias — is asserted here so it can't
silently rot: tools/ref_parity_audit.py enumerates every .rs module
under the capability crates (core/sim/cli/fpga/sandbox/ffi,
crates/r4w-core/src/lib.rs:45-773 is the module registry) and maps
each to the repo files whose docstrings cite it.
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools import ref_parity_audit as audit_mod  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(audit_mod.REF_CRATES),
    reason="reference checkout not present")


@pytest.fixture(scope="module")
def audit():
    return audit_mod.audit()


def test_every_reference_module_mapped(audit):
    assert audit["total"] > 800, "reference enumeration looks truncated"
    assert audit["unmapped"] == [], (
        f"{len(audit['unmapped'])} reference modules have no citing "
        f"counterpart: {audit['unmapped'][:10]}")


def test_path_citations_dominate(audit):
    """Most mappings must be path-qualified (strong form); loose
    basename-only credits stay a small, visible minority."""
    by_class = audit["by_class"]
    assert by_class.get("path", 0) > 20 * by_class.get("basename", 0)


def test_mapping_cites_real_repo_files(audit):
    """Spot-check structure: every mapping entry names extant repo
    files, and the flagship modules map where COVERAGE.md says."""
    m = audit["map"]
    for mod, entry in list(m.items())[::97]:  # sampled sweep
        for f in entry["cited_by"]:
            assert os.path.exists(os.path.join(ROOT, f)), (mod, f)
    scen = m["r4w-core/src/waveform/gnss/scenario.rs"]
    assert any("gnss/scenario.py" in f for f in scen["cited_by"])
    trk = m["r4w-core/src/waveform/gnss/tracking.rs"]
    assert any("gnss/tracking.py" in f for f in trk["cited_by"])
