"""MIMO/diversity/link-adaptation + soft-output decoding tests
(catalog tail batch III)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.fec.convolutional import conv_encode, map_decode
from r4w_tpu.ops import mimo

pytestmark = pytest.mark.slow  # heavy integration lane


def _qpsk(rng, n):
    pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
    return pts[rng.integers(0, 4, n)].astype(np.complex64)


class TestAlamouti:
    def test_encode_structure(self):
        s = jnp.asarray([1 + 0j, 0 + 1j], jnp.complex64)
        tx = np.asarray(mimo.alamouti_encode(s))
        assert tx.shape == (2, 2)
        # antenna0: [s0, -s1*]; antenna1: [s1, s0*]
        assert tx[0, 0] == 1 + 0j and tx[0, 1] == -np.conj(0 + 1j)
        assert tx[1, 0] == 0 + 1j and tx[1, 1] == np.conj(1 + 0j)

    def test_decode_through_fading(self):
        rng = np.random.default_rng(0)
        s = _qpsk(rng, 512)
        tx = np.asarray(mimo.alamouti_encode(jnp.asarray(s)))
        h = (rng.standard_normal(2) + 1j * rng.standard_normal(2)
             ).astype(np.complex64) * np.float32(np.sqrt(0.5))
        rx = h[0] * tx[0] + h[1] * tx[1]
        rx += 0.05 * (rng.standard_normal(512)
                      + 1j * rng.standard_normal(512)).astype(np.complex64)
        est = np.asarray(mimo.alamouti_decode(jnp.asarray(rx),
                                              jnp.asarray(h)))
        assert np.abs(est - s).max() < 0.5  # all decisions correct
        hard = np.angle(est)
        assert (np.round((hard - np.pi / 4) / (np.pi / 2)) % 4
                == np.round((np.angle(s) - np.pi / 4) / (np.pi / 2)) % 4
                ).all()

    def test_diversity_gain(self):
        """Alamouti with a dead antenna still decodes via the other."""
        s = jnp.asarray(_qpsk(np.random.default_rng(1), 64))
        tx = mimo.alamouti_encode(s)
        h = jnp.asarray([0.0 + 0j, 1.0 + 0j], jnp.complex64)  # h0 dead
        rx = h[0] * tx[0] + h[1] * tx[1]
        est = np.asarray(mimo.alamouti_decode(rx, h))
        assert np.abs(est - np.asarray(s)).max() < 1e-5


class TestCombining:
    def test_mrc_beats_selection_snr(self):
        rng = np.random.default_rng(2)
        n, branches = 4096, 4
        s = _qpsk(rng, n)
        h = (rng.standard_normal(branches)
             + 1j * rng.standard_normal(branches)) * np.sqrt(0.5)
        noise = (rng.standard_normal((branches, n))
                 + 1j * rng.standard_normal((branches, n))) * np.sqrt(0.05)
        rx = h[:, None] * s[None, :] + noise

        def snr(est):
            err = est - s
            return 10 * np.log10(1.0 / err.var())

        snr_mrc = snr(np.asarray(mimo.mrc_combine(jnp.asarray(rx),
                                                  jnp.asarray(h))))
        snr_sel = snr(np.asarray(mimo.selection_combine(jnp.asarray(rx),
                                                        jnp.asarray(h))))
        snr_egc = snr(np.asarray(mimo.egc_combine(jnp.asarray(rx),
                                                  jnp.asarray(h))))
        assert snr_mrc > snr_sel
        assert snr_mrc >= snr_egc - 0.5


class TestSic:
    def test_two_user_separation(self):
        rng = np.random.default_rng(3)
        pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
        i0, i1 = rng.integers(0, 4, (2, 2048))
        gains = np.asarray([1.0, 0.35])
        rx = gains[0] * pts[i0] + gains[1] * pts[i1]
        rx = rx + 0.03 * (rng.standard_normal(2048)
                          + 1j * rng.standard_normal(2048))
        out = np.asarray(mimo.sic_decode(jnp.asarray(rx, jnp.complex64),
                                         jnp.asarray(pts, jnp.complex64),
                                         jnp.asarray(gains, jnp.float32)))
        assert (out[0] == i0).mean() > 0.995
        assert (out[1] == i1).mean() > 0.98


class TestWaterfilling:
    def test_total_power_and_kkt(self):
        g = np.asarray([1.0, 0.8, 0.4, 0.1])
        p = np.asarray(mimo.waterfilling(g, total_power=4.0,
                                         noise_power=1.0))
        # f32 device arithmetic (the allocator is jit/vmap-safe now)
        assert p.sum() == pytest.approx(4.0, rel=1e-5)
        # water level equal on active channels: p_i + N/g_i² constant
        level = p + 1.0 / g**2
        active = p > 0
        assert np.ptp(level[active]) < 1e-4
        # weak channels get less (or zero) power
        assert p[0] > p[2] and p[3] <= p[2]

    def test_deep_fade_gets_nothing(self):
        p = np.asarray(mimo.waterfilling([1.0, 1e-6], total_power=1.0))
        assert p[1] == 0.0 and p[0] == pytest.approx(1.0, rel=1e-6)


class TestAdaptiveModcod:
    def test_hysteresis_ladder(self):
        amc = mimo.AdaptiveModcod(up_margin_db=1.0)
        assert amc.update(1.0).name == "BPSK-1/2"
        assert amc.update(10.5).name == "16QAM-1/2"   # steps up past 9+1
        assert amc.update(9.5).name == "16QAM-1/2"    # holds (hysteresis)
        assert amc.update(8.5).name == "QPSK-3/4"     # drops below 9
        assert amc.update(25.0).name == "64QAM-5/6"   # top of ladder


class TestUwbRanging:
    def test_two_way_ranging(self):
        d = 150.0
        tof = d / 299_792_458.0
        t_reply = 1e-3
        t_round = 2 * tof + t_reply
        assert mimo.twr_range(t_round, t_reply) == pytest.approx(d, rel=1e-9)

    def test_leading_edge_beats_argmax_in_nlos(self):
        cir = np.zeros(256, np.complex64)
        cir[40] = 0.4          # direct path (attenuated)
        cir[55] = 1.0          # stronger late reflection
        toa = float(mimo.leading_edge_toa(jnp.asarray(cir), 1e9))
        assert toa == pytest.approx(40e-9, abs=1e-10)


class TestMapDecode:
    def test_matches_clean_payload_and_llr_signs(self):
        rng = np.random.default_rng(4)
        bits = rng.integers(0, 2, 256).astype(np.int32)
        coded = conv_encode(jnp.asarray(bits))
        soft = 1.0 - 2.0 * np.asarray(coded).astype(np.float32)
        llr, hard = map_decode(jnp.asarray(soft))
        assert np.asarray(hard).tolist() == bits.tolist()
        # LLR sign convention: positive where bit 0
        assert ((np.asarray(llr) > 0) == (bits == 0)).all()

    def test_soft_outputs_grade_confidence(self):
        """Bits hit by channel noise must get smaller |LLR| than clean
        bits — the property SOVA/MAP adds over Viterbi."""
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, 512).astype(np.int32)
        coded = np.asarray(conv_encode(jnp.asarray(bits)))
        soft = 1.0 - 2.0 * coded.astype(np.float32)
        soft += 0.8 * rng.standard_normal(len(soft)).astype(np.float32)
        llr, hard = map_decode(jnp.asarray(soft))
        llr = np.asarray(llr)
        errors = np.asarray(hard) != bits
        if errors.any():
            assert np.abs(llr[errors]).mean() < np.abs(llr[~errors]).mean()
        # and decoding still mostly correct
        assert errors.mean() < 0.05


def test_waterfilling_zero_power_allocates_nothing():
    p = np.asarray(mimo.waterfilling([1.0, 0.5, 0.1], total_power=0.0))
    np.testing.assert_array_equal(p, 0.0)
    assert np.all(np.isfinite(p))
