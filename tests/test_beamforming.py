"""Tests for MIMO/array fills (beamforming.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.ops import beamforming as bf
from r4w_tpu.ops import mapping as mp


def _chan(nr, nt, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal((nr, nt))
             + 1j * rng.standard_normal((nr, nt)))
            / np.sqrt(2)).astype(np.complex64)


class TestMimoDetect:
    def test_zf_and_mmse_recover_clean(self):
        h = _chan(4, 2)
        rng = np.random.default_rng(1)
        table = mp.constellation_table("qpsk")
        idx = rng.integers(0, 4, (100, 2))
        x = np.asarray(table)[idx]
        y = x @ h.T
        for det in (bf.mimo_detect_zf(jnp.asarray(y), jnp.asarray(h)),
                    bf.mimo_detect_mmse(jnp.asarray(y), jnp.asarray(h),
                                        1e-4)):
            got = np.asarray(mp.symbol_demap(det.reshape(-1), table))
            np.testing.assert_array_equal(got, idx.reshape(-1))

    def test_ml_beats_zf_in_noise(self):
        h = _chan(2, 2, seed=3)
        rng = np.random.default_rng(4)
        table = mp.constellation_table("qpsk")
        idx = rng.integers(0, 4, (400, 2))
        x = np.asarray(table)[idx]
        noise = 0.35 * (rng.standard_normal((400, 2))
                        + 1j * rng.standard_normal((400, 2)))
        y = x @ h.T + noise
        combos, _ = bf.mimo_detect_ml(jnp.asarray(y.astype(np.complex64)),
                                      jnp.asarray(h), table)
        ml_err = np.mean(np.asarray(combos) != idx)
        zf = bf.mimo_detect_zf(jnp.asarray(y.astype(np.complex64)),
                               jnp.asarray(h))
        zf_idx = np.asarray(mp.symbol_demap(zf.reshape(-1),
                                            table)).reshape(-1, 2)
        zf_err = np.mean(zf_idx != idx)
        assert ml_err <= zf_err
        assert ml_err < 0.2

    def test_svd_precoding_diagonalizes(self):
        h = _chan(3, 3, seed=5)
        f, wh, s = bf.mimo_precode_svd(jnp.asarray(h))
        eff = np.asarray(wh) @ h @ np.asarray(f)
        off = eff - np.diag(np.diag(eff))
        assert np.abs(off).max() < 1e-4
        np.testing.assert_allclose(np.abs(np.diag(eff)), np.asarray(s),
                                   atol=1e-4)

    def test_spatial_multiplex_power(self):
        s = bf.spatial_multiplex([jnp.ones(8), jnp.ones(8)])
        assert abs(float(jnp.sum(jnp.abs(s) ** 2)) - 8.0) < 1e-4


class TestOstbc:
    def test_ostbc34_roundtrip_flat_channel(self):
        rng = np.random.default_rng(6)
        table = mp.constellation_table("qpsk")
        idx = rng.integers(0, 4, 30)
        syms = np.asarray(table)[idx]
        blocks = np.asarray(bf.ostbc34_encode(jnp.asarray(syms)))
        h = ((rng.standard_normal(4) + 1j * rng.standard_normal(4))
             / np.sqrt(2)).astype(np.complex64)
        rx = np.einsum("bsa,a->bs", blocks, h)
        got = bf.ostbc34_decode(jnp.asarray(rx), jnp.asarray(h))
        got_idx = np.asarray(mp.symbol_demap(got, table))
        np.testing.assert_array_equal(got_idx, idx)


class TestNoma:
    def test_noma_sic_roundtrip(self):
        rng = np.random.default_rng(7)
        table = mp.constellation_table("qpsk")
        near = rng.integers(0, 4, 500)
        far = rng.integers(0, 4, 500)
        y = bf.noma_superpose(jnp.asarray(np.asarray(table)[near]),
                              jnp.asarray(np.asarray(table)[far]),
                              p_near=0.1)
        noise = 0.02 * (rng.standard_normal(500)
                        + 1j * rng.standard_normal(500))
        got_near, got_far = bf.noma_decode_near(
            jnp.asarray(np.asarray(y) + noise), table, p_near=0.1)
        assert np.mean(np.asarray(got_far) == far) > 0.99
        assert np.mean(np.asarray(got_near) == near) > 0.99


class TestArrays:
    @pytest.mark.slow
    def test_null_steering_pattern(self):
        w = bf.null_steer_weights(8, 0.0, [30.0])
        resp = np.asarray(bf.array_response(8, np.arange(-90, 91, 1.0)))
        pat = np.abs(resp.conj() @ np.asarray(w))
        look = pat[90]      # 0 deg
        null = pat[120]     # 30 deg
        assert null < 0.02 * look

    def test_gsc_removes_interferer(self):
        rng = np.random.default_rng(8)
        n, t = 8, 4000
        sig = np.exp(2j * np.pi * 0.01 * np.arange(t))
        interf = np.exp(2j * np.pi * 0.013 * np.arange(t) + 1j * 0.7)
        a_sig = np.asarray(bf.array_response(8, 0.0))[0]
        a_int = np.asarray(bf.array_response(8, 40.0))[0]
        x = (np.outer(a_sig, sig) + 3.0 * np.outer(a_int, interf)
             + 0.01 * (rng.standard_normal((n, t))
                       + 1j * rng.standard_normal((n, t))))
        out = np.asarray(bf.gsc_cancel(jnp.asarray(
            x.astype(np.complex64)), 0.0))
        # after adaptation the interferer line should be suppressed
        tail = out[-1024:]
        spec = np.abs(np.fft.fft(tail))
        k_sig = round(0.01 * 1024)
        k_int = round(0.013 * 1024)
        assert spec[k_sig] > 3 * spec[k_int]

    def test_si_canceller_erle(self):
        rng = np.random.default_rng(9)
        tx = (rng.standard_normal(6000)
              + 1j * rng.standard_normal(6000)).astype(np.complex64)
        si = 0.9 * tx + 0.3 * np.roll(tx, 3)
        err, _ = bf.self_interference_cancel(jnp.asarray(si),
                                             jnp.asarray(tx), n_taps=8)
        tail = np.asarray(err)[-2000:]
        erle = 10 * np.log10(np.mean(np.abs(si[-2000:]) ** 2)
                             / max(np.mean(np.abs(tail) ** 2), 1e-12))
        assert erle > 25.0


class TestMmwaveRis:
    def test_beam_search_finds_direction(self):
        true_deg = 25.0
        h = np.asarray(bf.array_response(16, true_deg))[0]
        k, gains, ang = bf.mmwave_beam_search(jnp.asarray(h),
                                              codebook_bits=5)
        assert abs(float(ang) - true_deg) < 7.0

    def test_beam_steering_quantization(self):
        ph = np.asarray(bf.beam_steering_phases(8, 20.0, quant_bits=2))
        steps = np.unique(np.round(ph / (np.pi / 2)))
        assert np.allclose(ph, np.round(ph / (np.pi / 2)) * np.pi / 2,
                           atol=1e-6)

    def test_ris_cophasing_gain(self):
        rng = np.random.default_rng(10)
        h1 = (rng.standard_normal(64)
              + 1j * rng.standard_normal(64)) / np.sqrt(2)
        h2 = (rng.standard_normal(64)
              + 1j * rng.standard_normal(64)) / np.sqrt(2)
        phases, gain = bf.ris_phase_config(jnp.asarray(h1),
                                           jnp.asarray(h2), quant_bits=3)
        random_gain = abs(np.sum(h1 * h2))
        assert float(gain) > 4 * random_gain

    def test_oam_mode_orthogonality(self):
        m1 = np.asarray(bf.oam_beam(16, 1))
        m2 = np.asarray(bf.oam_beam(16, 3))
        assert abs(np.vdot(m1, m2)) < 1e-6
        assert abs(np.vdot(m1, m1) - 1.0) < 1e-6

    def test_ultrasound_focus_and_das(self):
        d = np.asarray(bf.ultrasound_focus_delays(8, 1e-3, 20e-3))
        assert d[0] == d[-1] and d[0] > d[len(d) // 2]
        x = np.zeros((4, 64), np.float32)
        for i, dd in enumerate([0, 1, 2, 3]):
            x[i, 10 + dd] = 1.0
        y = np.asarray(bf.delay_and_sum(jnp.asarray(x), [0, 1, 2, 3]))
        assert abs(y[10] - 1.0) < 1e-6  # coherent sum at aligned tap
