"""Known-answer tests for the LoRa coding chain ops.

Mirrors the reference's inline test style (coding.rs, whitening.rs tests):
Gray tables, Hamming codewords, whitening periodicity, interleaver
roundtrip.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from r4w_tpu.ops import coding


def test_gray_roundtrip():
    x = jnp.arange(4096)
    g = coding.gray_encode(x)
    assert np.array_equal(np.asarray(coding.gray_decode(g)), np.asarray(x))
    # adjacent Gray codes differ in exactly one bit
    g_np = np.asarray(g)
    diffs = g_np[1:] ^ g_np[:-1]
    assert np.all(np.vectorize(lambda v: bin(v).count("1"))(diffs) == 1)


def test_gray_known_values():
    # g = n ^ (n >> 1): 0,1,3,2,6,7,5,4 for n=0..7
    got = np.asarray(coding.gray_encode(jnp.arange(8)))
    assert got.tolist() == [0, 1, 3, 2, 6, 7, 5, 4]


def test_hamming_encode_known_answer():
    # CR4/8 parity rows: p0=[1,0,1,1] p1=[1,1,1,0] p2=[1,1,0,1] p3=[0,1,1,1]
    # data bits (MSB first): d=[1,0,1,1]
    # p0 = d0^d2^d3 = 1 ; p1 = d0^d1^d2 = 0 ; p2 = d0^d1^d3 = 0
    # p3 = d1^d2^d3 = 0 -> codeword = 0b1011 | 1<<4 = 27
    cw = int(coding.hamming_encode(jnp.array([0b1011]), 4)[0])
    assert cw == 27


def test_hamming_roundtrip_all_rates():
    nibbles = jnp.arange(16)
    for cr in (1, 2, 3, 4):
        cw = coding.hamming_encode(nibbles, cr)
        dec = coding.hamming_decode(cw, cr)
        assert np.array_equal(np.asarray(dec), np.asarray(nibbles)), cr


def test_hamming_corrects_any_single_bit_error():
    """CR4/7 and CR4/8 have d_min=3 → every 1-bit flip is corrected."""
    nibbles = jnp.arange(16)
    for cr in (3, 4):
        cw = np.asarray(coding.hamming_encode(nibbles, cr))
        for bit in range(4 + cr):
            corrupted = cw ^ (1 << bit)
            dec = coding.hamming_decode(jnp.asarray(corrupted), cr)
            assert np.array_equal(np.asarray(dec), np.arange(16)), (cr, bit)


def test_whitening_self_inverse_and_nontrivial():
    data = jnp.arange(64) % 256
    w = coding.whiten(data)
    assert not np.array_equal(np.asarray(w), np.asarray(data))
    assert np.array_equal(np.asarray(coding.dewhiten(w)), np.asarray(data))


def test_whitening_first_byte():
    # LFSR starts at 0xFF; first 8 output bits are the MSBs as it shifts.
    seq = np.asarray(coding.whitening_sequence(1))
    assert seq[0] == 0xFF  # state stays all-ones until feedback deviates? compute:
    # state=0xFF: fb = parity(0xFF & 0x3A) = parity(0x3A)=popcount(0b111010)=4 -> 0
    # msb=1, state=0xFE ... first byte collects 8 MSBs.
    # Recompute independently:
    state = 0xFF
    byte = 0
    for i in range(8):
        fb = bin(state & 0x3A).count("1") & 1
        byte |= ((state >> 7) & 1) << (7 - i)
        state = ((state << 1) | fb) & 0xFF
    assert seq[0] == byte


@pytest.mark.slow
def test_interleaver_roundtrip():
    rng = np.random.default_rng(0)
    for sf in (7, 9, 12):
        for cr in (1, 2, 3, 4):
            n_bits = 4 + cr
            cws = rng.integers(0, 1 << n_bits, size=(3, sf))
            syms = coding.interleave(jnp.asarray(cws), sf, cr)
            assert syms.shape == (3, n_bits)
            assert int(jnp.max(syms)) < (1 << sf)
            back = coding.deinterleave(syms, sf, cr)
            assert np.array_equal(np.asarray(back), cws)


def test_interleaver_matches_reference_formula():
    # symbols[(i+j) % n_bits] bit i == codeword[i] bit j (coding.rs:261-281)
    sf, cr = 7, 1
    n_bits = 4 + cr
    rng = np.random.default_rng(1)
    cws = rng.integers(0, 1 << n_bits, size=sf)
    syms = np.asarray(coding.interleave(jnp.asarray(cws), sf, cr))
    for i in range(sf):
        for j in range(n_bits):
            expected = (cws[i] >> j) & 1
            got = (syms[(i + j) % n_bits] >> i) & 1
            assert got == expected


def test_pack_unpack_helpers():
    data = jnp.asarray([0xAB, 0xCD, 0x01])
    nib = coding.bytes_to_nibbles(data)
    assert np.asarray(nib).tolist() == [0xA, 0xB, 0xC, 0xD, 0x0, 0x1]
    assert np.array_equal(np.asarray(coding.nibbles_to_bytes(nib)),
                          np.asarray(data))
    bits = coding.bytes_to_bits(data)
    assert bits.shape == (24,)
    assert np.array_equal(np.asarray(coding.bits_to_bytes(bits)),
                          np.asarray(data))
    syms = coding.bits_to_symbols(bits, 4)
    assert np.array_equal(np.asarray(coding.symbols_to_bits(syms, 4)),
                          np.asarray(bits))
