#!/usr/bin/env python
"""One-off extraction of the Galileo E1B/E1C primary-code constant
tables (Galileo OS SIS ICD v2.1 §5.1.3 standards data; bit-packed 4092
chips per PRN, 50 PRNs) from the reference's galileo_e1_codes.rs into
r4w_tpu/gnss/data/galileo_e1_codes.npz.

These are published standards constants (the same tables ship in the
public GNSS-matlab repo) — porting the data is required for signal
compatibility with real Galileo E1; no code is copied.
"""

import pathlib
import re
import sys

import numpy as np

REF = pathlib.Path("/root/reference/crates/r4w-core/src/waveform/gnss/"
                   "galileo_e1_codes.rs")
OUT = pathlib.Path(__file__).resolve().parents[1] / "r4w_tpu" / "gnss" \
    / "data" / "galileo_e1_codes.npz"


def extract(text: str, name: str) -> np.ndarray:
    m = re.search(rf"pub const {name}\s*:\s*\[\[u8; 512\]; 50\]\s*=\s*\[",
                  text)
    assert m, f"{name} not found"
    start = m.end()
    # capture until the matching closing of the outer array: scan for the
    # next 'pub const' or EOF, then trim trailing brackets
    nxt = text.find("pub const", start)
    body = text[start:nxt if nxt > 0 else len(text)]
    vals = [int(h, 16) for h in re.findall(r"0x([0-9A-Fa-f]{2})", body)]
    assert len(vals) == 50 * 512, f"{name}: got {len(vals)} bytes"
    return np.asarray(vals, np.uint8).reshape(50, 512)


def main():
    text = REF.read_text()
    e1b = extract(text, "E1B_PACKED")
    e1c = extract(text, "E1C_PACKED")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, e1b_packed=e1b, e1c_packed=e1c)
    # sanity: unpack PRN1 E1B and check balance is near zero
    bits = np.unpackbits(e1b[0])[:4092]
    chips = 1 - 2 * bits.astype(np.int32)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes); "
          f"PRN1 E1B balance={chips.sum()}, first8={chips[:8].tolist()}")


if __name__ == "__main__":
    sys.exit(main())
