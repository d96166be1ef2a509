"""Round-4 KA batch H: algebraic identities of the FEC stack —
defining properties provable independently of the implementation:
LDPC syndrome-zero and G·Hᵀ=0, extended-Golay self-duality and
doubly-even weights, the published d_free = 10 of the (171,133) K=7
convolutional code, polar rows equal to the Kronecker kernel built
with numpy, Reed-Solomon generator roots at α^i, RS burst correction
to exactly t symbols, and the GF(2)-affine property of table-driven
CRCs.

Reference roles: ldpc_codec.rs, golay_code.rs, convolutional_encoder.rs,
polar_code.rs, reed_solomon.rs, crc.rs.
"""

import numpy as np
import pytest

import jax.numpy as jnp


class TestLdpcAlgebra:
    def test_generator_orthogonal_to_parity(self):
        """G·Hᵀ = 0 (mod 2) — the defining generator/parity relation."""
        from r4w_tpu.fec.ldpc import make_regular_ldpc

        h, g, k, _cols = make_regular_ldpc(n=96, dv=3, dc=6, seed=1)
        prod = (np.asarray(g) @ np.asarray(h).T) % 2
        assert prod.max() == 0

    def test_every_codeword_has_zero_syndrome(self):
        from r4w_tpu.fec.ldpc import ldpc_encode, make_regular_ldpc

        hg = make_regular_ldpc(n=96, dv=3, dc=6, seed=1)
        h, g, k = hg[0], hg[1], hg[2]
        rng = np.random.default_rng(3)
        msgs = rng.integers(0, 2, (50, k))
        c = np.asarray(ldpc_encode(jnp.asarray(msgs), hg))
        syn = (c @ np.asarray(h).T) % 2
        assert syn.max() == 0


class TestGolayAlgebra:
    def _gen(self):
        from r4w_tpu.fec.block import _GOLAY_B

        return np.concatenate(
            [np.eye(12, dtype=np.int64), np.asarray(_GOLAY_B, np.int64)],
            axis=1)

    def test_extended_golay_is_self_dual(self):
        """G·Gᵀ = 0 mod 2: the (24,12) extended Golay code equals its
        own dual — a published structural property."""
        g = self._gen()
        assert ((g @ g.T) % 2).max() == 0

    def test_codeword_weights_doubly_even(self):
        """Every extended-Golay codeword weight is divisible by 4
        (the code is doubly even; weights ∈ {0,8,12,16,24})."""
        from r4w_tpu.fec.block import golay_encode

        rng = np.random.default_rng(5)
        data = rng.integers(0, 2, (300, 12))
        cw = np.asarray(golay_encode(jnp.asarray(data)))
        w = cw.sum(axis=1)
        assert np.all(w % 4 == 0)
        assert set(np.unique(w)) <= {0, 8, 12, 16, 24}


class TestConvFreeDistance:
    @pytest.mark.slow
    def test_k7_171_133_free_distance_is_10(self):
        """The NASA-standard (171,133) K=7 rate-1/2 code has
        d_free = 10 (published constant) — verified by exhaustive
        search over terminated messages up to 8 info bits."""
        from r4w_tpu.fec.convolutional import conv_encode

        best = 10 ** 9
        for msg_len in range(1, 9):
            msgs = ((np.arange(1, 2 ** msg_len)[:, None]
                     >> np.arange(msg_len)[None, :]) & 1)
            coded = np.asarray(conv_encode(jnp.asarray(msgs),
                                           constraint=7,
                                           polys=(0o171, 0o133),
                                           terminate=True))
            best = min(best, int(coded.sum(axis=1).min()))
        assert best == 10


class TestPolarKernel:
    @pytest.mark.parametrize("n", [8, 16, 32])
    def test_rows_match_numpy_kronecker_kernel(self, n):
        """Encoding a single set info bit must reproduce the matching
        row of F^{⊗log2 n}, F = [[1,0],[1,1]], built here with
        np.kron."""
        from r4w_tpu.fec.polar import frozen_mask, polar_encode

        k = n // 2
        mask = frozen_mask(n, k)
        info_pos = np.nonzero(~mask)[0]
        f = np.array([[1, 0], [1, 1]], np.int64)
        kern = np.array([[1]], np.int64)
        for _ in range(int(np.log2(n))):
            kern = np.kron(kern, f)
        for j in range(k):
            bits = np.zeros(k, np.int64)
            bits[j] = 1
            cw = np.asarray(polar_encode(jnp.asarray(bits), n, k))
            np.testing.assert_array_equal(cw, kern[info_pos[j]] % 2)

    @pytest.mark.slow
    def test_linearity_over_gf2(self):
        from r4w_tpu.fec.polar import polar_encode

        rng = np.random.default_rng(7)
        n, k = 64, 32
        a = rng.integers(0, 2, k)
        b = rng.integers(0, 2, k)
        ca = np.asarray(polar_encode(jnp.asarray(a), n, k))
        cb = np.asarray(polar_encode(jnp.asarray(b), n, k))
        cab = np.asarray(polar_encode(jnp.asarray(a ^ b), n, k))
        np.testing.assert_array_equal(cab, ca ^ cb)


class TestReedSolomonAlgebra:
    def test_generator_polynomial_roots_at_alpha_powers(self):
        """g(α^(fcr+i)) = 0 for i = 0..n−k−1 — the defining roots of
        the RS generator polynomial."""
        from r4w_tpu.fec.galois import GF, ReedSolomon

        rs = ReedSolomon(n=255, k=223, fcr=1)
        gf = GF(8)
        for i in range(255 - 223):
            x = gf.exp[(1 + i) % 255]
            assert int(rs.gf.poly_eval(rs.gen, x)) == 0, i

    def test_codeword_evaluates_to_zero_at_roots(self):
        """Every RS codeword, viewed as a polynomial, vanishes at the
        generator's roots (c(α^i) = 0) — checked on random messages."""
        from r4w_tpu.fec.galois import GF, ReedSolomon

        rs = ReedSolomon(n=15, k=9, fcr=1, m=4)
        gf = GF(4)
        rng = np.random.default_rng(9)
        for _ in range(10):
            msg = rng.integers(0, 16, 9)
            cw = np.asarray(rs.encode(msg)).reshape(-1)
            for i in range(6):
                x = gf.exp[(1 + i) % 15]
                assert int(gf.poly_eval(cw.tolist(), x)) == 0

    def test_corrects_burst_of_exactly_t_symbols(self):
        from r4w_tpu.fec.galois import ReedSolomon

        rs = ReedSolomon(n=15, k=9, fcr=1, m=4)
        rng = np.random.default_rng(11)
        msg = rng.integers(0, 16, 9)
        cw = np.asarray(rs.encode(msg)).reshape(-1).copy()
        # t = 3 CONSECUTIVE symbol errors (burst)
        cw[4:7] ^= np.array([5, 9, 12])
        dec, n_err = rs.decode(cw)
        assert n_err == 3
        np.testing.assert_array_equal(np.asarray(dec).reshape(-1)[:9],
                                      msg)


class TestCrcAffine:
    @pytest.mark.parametrize("name", ["crc32", "crc16-ccitt"])
    def test_gf2_affine_property(self, name):
        """Table CRCs are affine over GF(2):
        crc(a⊕b) = crc(a) ⊕ crc(b) ⊕ crc(0) for equal-length
        messages — follows from the LFSR linearity."""
        from r4w_tpu.fec.crc import crc_compute

        rng = np.random.default_rng(13)
        a = rng.integers(0, 256, 32, dtype=np.uint8)
        b = rng.integers(0, 256, 32, dtype=np.uint8)
        z = np.zeros(32, np.uint8)
        ca = int(crc_compute(jnp.asarray(a.astype(np.int32)), name))
        cb = int(crc_compute(jnp.asarray(b.astype(np.int32)), name))
        cz = int(crc_compute(jnp.asarray(z.astype(np.int32)), name))
        cab = int(crc_compute(jnp.asarray((a ^ b).astype(np.int32)),
                              name))
        assert cab == ca ^ cb ^ cz


class TestPunctureRates:
    def test_dvb_rate_two_thirds_pattern(self):
        """Rate-1/2 mother code + pattern [1,1,0,1] → exactly 3 coded
        bits per 2 info bits (the DVB-S 2/3 puncturing)."""
        from r4w_tpu.fec.convolutional import conv_encode, puncture

        n_info = 100
        bits = np.ones(n_info, np.int32)
        coded = conv_encode(jnp.asarray(bits), terminate=False)
        assert coded.shape[-1] == 2 * n_info
        p = np.asarray(puncture(coded, np.array([1, 1, 0, 1])))
        assert p.shape[-1] == 2 * n_info * 3 // 4
        assert p.shape[-1] * 2 == 3 * n_info
