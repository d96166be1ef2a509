"""GPS LNAV navigation message (waveform/gnss/nav_message.rs re-design).

Subframe generation/parsing: 300-bit subframes of ten 30-bit words with
the (24,6) Hamming-style GPS parity algorithm (IS-GPS-200 §20.3.5).
"""

from __future__ import annotations

import numpy as np

PREAMBLE = np.array([1, 0, 0, 0, 1, 0, 1, 1], np.int32)

# parity bit equations: which of d1..d24 each parity bit XORs (IS-GPS-200)
_PARITY_TAPS = [
    [1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23],
    [2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24],
    [1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22],
    [2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23],
    [1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24],
    [3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24],
]


def word_parity(data24: np.ndarray, d29: int, d30: int) -> np.ndarray:
    """6 parity bits for a 30-bit word given previous word's D29*, D30*."""
    d = np.asarray(data24, np.int32)
    # data bits are complemented if D30* == 1
    dd = d ^ d30
    par = np.zeros(6, np.int32)
    prev = [d29, d30, d29, d30, d30, d29]
    for i, taps in enumerate(_PARITY_TAPS):
        p = prev[i]
        for t in taps:
            p ^= dd[t - 1]
        par[i] = p
    return np.concatenate([dd, par])


def build_subframe(subframe_id: int, tow_count: int, week: int = 0,
                   payload_bits: np.ndarray | None = None) -> np.ndarray:
    """Assemble one 300-bit LNAV subframe (TLM + HOW + 8 data words)."""
    rng_bits = (payload_bits if payload_bits is not None
                else np.zeros(8 * 24, np.int32))
    words = []
    d29, d30 = 0, 0
    # TLM word: preamble + 14-bit message + 2 reserved
    tlm = np.zeros(24, np.int32)
    tlm[:8] = PREAMBLE
    w = word_parity(tlm, d29, d30)
    words.append(w); d29, d30 = w[28], w[29]
    # HOW: 17-bit TOW + flags + 3-bit subframe id
    how = np.zeros(24, np.int32)
    tow_bits = [(tow_count >> (16 - i)) & 1 for i in range(17)]
    how[:17] = tow_bits
    sid = [(subframe_id >> (2 - i)) & 1 for i in range(3)]
    how[19:22] = sid
    w = word_parity(how, d29, d30)
    words.append(w); d29, d30 = w[28], w[29]
    for i in range(8):
        data = rng_bits[i * 24 : (i + 1) * 24]
        w = word_parity(data, d29, d30)
        words.append(w); d29, d30 = w[28], w[29]
    return np.concatenate(words)


def check_parity(word30: np.ndarray, d29: int, d30: int) -> bool:
    """Verify the parity of a received 30-bit word."""
    w = np.asarray(word30, np.int32)
    data = w[:24] ^ d30  # undo complement
    expect = word_parity(data ^ d30 if False else w[:24] ^ d30 ^ d30, d29, d30)
    # recompute from the raw (possibly complemented) data bits:
    raw = w[:24]
    # word_parity complements internally given d30; feed the
    # un-complemented data: data_bits = raw ^ d30
    redo = word_parity(raw ^ d30, d29, d30)
    return bool(np.array_equal(redo, w))


def parse_subframe(bits300: np.ndarray):
    """Extract (subframe_id, tow_count, parity_ok_per_word)."""
    b = np.asarray(bits300, np.int32).reshape(10, 30)
    ok = np.zeros(10, bool)
    d29, d30 = 0, 0
    for i in range(10):
        ok[i] = check_parity(b[i], d29, d30)
        d29, d30 = b[i, 28], b[i, 29]
    # HOW decode (word 2)
    how_data = b[1, :24] ^ b[0, 29]
    tow = 0
    for i in range(17):
        tow = (tow << 1) | int(how_data[i])
    sid = (int(how_data[19]) << 2) | (int(how_data[20]) << 1) | int(how_data[21])
    return sid, tow, ok
