"""Known-answer vectors for the scrambler/whitener family.

Pins the lax.scan re-implementations of pn_scrambler.rs /
linear_congruential_whitener.rs / glfsr_source.rs /
additive_scrambler.rs / cyclic_redundancy_check_parallel.rs to
independent straight-line reference implementations written here (the
reference's inline #[cfg(test)] pattern, SURVEY §4) and to published
check values where they exist.
"""

import numpy as np
import pytest

from r4w_tpu.ops import scramblers as sc

# (taps, seed, nbits) grid: ITU V.35-style x^20 register, a short x^7,
# CCITT-ish x^9, and a 4-bit toy register
_PN_GRID = [
    (0b1100000, 0x7F, 7),
    (0x110, 0x1FF, 9),
    (0x9, 0x5, 4),
    (0x80004, 0xABCDE, 20),
]


def _pn_reference(bits, taps, seed, nbits, feed_output):
    """Independent bit-serial model of the self-synchronizing LFSR."""
    mask = (1 << nbits) - 1
    state = seed & mask
    out = []
    for bit in bits:
        fb = bin(state & taps).count("1") & 1
        o = int(bit) ^ fb
        out.append(o)
        shift_in = o if feed_output else int(bit)
        state = ((state << 1) | shift_in) & mask
    return np.array(out, np.int64)


@pytest.mark.parametrize("taps,seed,nbits", _PN_GRID)
def test_pn_scramble_matches_bit_serial_reference(taps, seed, nbits):
    rng = np.random.default_rng(taps)
    bits = rng.integers(0, 2, 257)
    got = np.asarray(sc.pn_scramble(bits, taps, seed, nbits))
    want = _pn_reference(bits, taps, seed, nbits, feed_output=True)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("taps,seed,nbits", _PN_GRID)
def test_pn_descramble_matches_bit_serial_reference(taps, seed, nbits):
    rng = np.random.default_rng(taps + 1)
    line = rng.integers(0, 2, 257)
    got = np.asarray(sc.pn_descramble(line, taps, seed, nbits))
    want = _pn_reference(line, taps, seed, nbits, feed_output=False)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("taps,seed,nbits", _PN_GRID)
def test_pn_roundtrip_identity(taps, seed, nbits):
    rng = np.random.default_rng(nbits)
    bits = rng.integers(0, 2, 300)
    line = sc.pn_scramble(bits, taps, seed, nbits)
    back = np.asarray(sc.pn_descramble(line, taps, seed, nbits))
    np.testing.assert_array_equal(back, bits)


def test_pn_descrambler_self_synchronizes():
    """The multiplicative descrambler recovers after nbits bits even
    from the WRONG seed — the defining property of the topology
    (pn_scrambler.rs docs)."""
    taps, seed, nbits = 0b1100000, 0x7F, 7
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200)
    line = sc.pn_scramble(bits, taps, seed, nbits)
    back = np.asarray(sc.pn_descramble(line, taps, 0, nbits))  # seed 0
    np.testing.assert_array_equal(back[nbits:], bits[nbits:])


# First 8 keystream bytes of the Numerical-Recipes LCG whitener with
# the default seed 0x12345678 — computed once from the definition
# state = (1664525*state + 1013904223) mod 2^64, byte = bits 24..31.
_LCG_KS_DEFAULT = [0x75, 0xCD, 0x25, 0x4B, 0x84, 0xE2, 0xEA, 0xF2]


def _lcg_reference(n, seed=0x12345678):
    state = seed
    out = []
    for _ in range(n):
        state = (1664525 * state + 1013904223) & ((1 << 64) - 1)
        out.append((state >> 24) & 0xFF)
    return out


def test_lcg_keystream_reference_model():
    assert _lcg_reference(8) == _LCG_KS_DEFAULT


def test_lcg_whiten_first_bytes_pinned():
    got = np.asarray(sc.lcg_whiten(np.zeros(8, np.int64)))
    np.testing.assert_array_equal(got, _LCG_KS_DEFAULT)


def test_lcg_whiten_self_inverse():
    data = np.arange(64) % 256
    once = np.asarray(sc.lcg_whiten(data))
    twice = np.asarray(sc.lcg_whiten(once))
    np.testing.assert_array_equal(twice, data)
    assert not np.array_equal(once, data)


@pytest.mark.parametrize("nbits,taps", [(3, 0b110), (4, 0b1100),
                                        (5, 0b10100), (7, 0b1100000)])
def test_glfsr_is_maximal_length(nbits, taps):
    """Galois LFSR with a primitive polynomial: period 2^n - 1, balance
    2^(n-1) ones (m-sequence properties, glfsr_source.rs)."""
    n = (1 << nbits) - 1
    seq = np.asarray(sc.glfsr_source(taps, 1, nbits, 2 * n))
    assert seq[:n].sum() == 1 << (nbits - 1)
    np.testing.assert_array_equal(seq[:n], seq[n:2 * n])  # periodic
    # no shorter period divides n for these primitive polys
    for d in range(1, n):
        if n % d == 0 and d < n:
            assert not np.array_equal(seq[:d], seq[d:2 * d]) or d == n


def test_additive_scrambler_self_inverse_and_keystream():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 128)
    taps, seed, nbits = 0b1100000, 0x7F, 7
    line = np.asarray(sc.additive_scramble(bits, taps, seed, nbits))
    back = np.asarray(sc.additive_scramble(line, taps, seed, nbits))
    np.testing.assert_array_equal(back, bits)
    # keystream = scramble of all-zeros; data-independent (synchronous)
    ks = np.asarray(sc.additive_scramble(np.zeros(128, np.int64),
                                         taps, seed, nbits))
    np.testing.assert_array_equal(np.asarray(
        sc.additive_scramble(bits, taps, seed, nbits)), bits ^ ks)


def test_crc16_x25_parallel_check_value():
    """CRC-16/X.25 of b'123456789' is 0x906E (CRC catalogue check
    value), through the batched table walk."""
    frame = np.frombuffer(b"123456789", np.uint8)
    got = np.asarray(sc.crc16_parallel(frame[None, :].astype(np.int32)))
    assert got.shape == (1,)
    assert int(got[0]) == 0x906E


def test_crc16_parallel_batch_lockstep():
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (8, 32)).astype(np.int32)
    batch = np.asarray(sc.crc16_parallel(frames))
    singles = [int(np.asarray(sc.crc16_parallel(f[None]))[0])
               for f in frames]
    np.testing.assert_array_equal(batch, singles)


def test_covert_timing_roundtrip_and_gap_values():
    bits = np.array([0, 1, 1, 0, 1, 0, 0, 1])
    ev = np.asarray(sc.covert_timing_encode(bits, 100, 30))
    gaps = np.diff(np.concatenate([[0], ev]))
    np.testing.assert_array_equal(gaps, 100 + 30 * bits)
    back = np.asarray(sc.covert_timing_decode(ev, 100, 30))
    np.testing.assert_array_equal(back, bits)


def test_gold_code_generator_alias_properties():
    code = np.asarray(sc.gold_code_generator(5, 2))
    assert code.shape[0] == 31
    assert set(np.unique(code)) <= {-1, 1}  # bipolar chips
    n = np.asarray(sc.gold_code_generator(5, 2, n=100))
    assert n.shape[0] == 100
    np.testing.assert_array_equal(n[:31], code)  # tiled


def test_pn_wide_register_host_fallback():
    """Registers >= 32 bits use the arbitrary-width host loop (the
    scan carry is uint32) — same contract either path."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 120)
    taps, seed, nbits = 0x100000057, 0x1234567890, 33
    line = np.asarray(sc.pn_scramble(bits, taps, seed, nbits))
    want = _pn_reference(bits, taps, seed, nbits, feed_output=True)
    np.testing.assert_array_equal(line, want)
    back = np.asarray(sc.pn_descramble(line, taps, seed, nbits))
    np.testing.assert_array_equal(back, bits)
