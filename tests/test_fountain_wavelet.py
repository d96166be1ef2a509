"""Fountain/LT codes, rate matching, wavelets, moving stats, quality."""

import numpy as np
import jax.numpy as jnp
import pytest

from r4w_tpu.fec import fountain as fc
from r4w_tpu.ops import measure as ms


# ------------------------------------------------------------- fountain


def test_robust_soliton_is_distribution():
    p = fc.robust_soliton(100)
    assert abs(p.sum() - 1.0) < 1e-12
    assert np.all(p >= 0)
    assert p[1] > 0  # degree-1 symbols exist (decoding can start)


def test_lt_roundtrip_with_overhead():
    rng = np.random.default_rng(0)
    k, n = 32, 48  # 50% overhead
    data = rng.integers(0, 2, (k, 64)).astype(np.uint8)
    enc = np.asarray(fc.lt_encode(data, n, seed=5))
    g = fc.lt_generator(k, n, seed=5)
    dec, ok = fc.lt_decode(enc, g, k)
    assert ok
    assert np.array_equal(dec, data)


def test_lt_roundtrip_with_erasures():
    rng = np.random.default_rng(1)
    k, n = 24, 48
    data = rng.integers(0, 2, (k, 16)).astype(np.uint8)
    enc = np.asarray(fc.lt_encode(data, n, seed=9))
    g = fc.lt_generator(k, n, seed=9)
    # erase a third of the packets (fountain property: any enough subset)
    keep = rng.permutation(n)[:36]
    dec, ok = fc.lt_decode(enc[keep], g[keep], k)
    assert ok
    assert np.array_equal(dec, data)


def test_lt_decode_fails_gracefully_when_underdetermined():
    rng = np.random.default_rng(2)
    k = 16
    data = rng.integers(0, 2, (k, 8)).astype(np.uint8)
    enc = np.asarray(fc.lt_encode(data, 10, seed=3))  # fewer than k
    g = fc.lt_generator(k, 10, seed=3)
    _, ok = fc.lt_decode(enc, g, k)
    assert not ok


def test_raptor_encode_shapes():
    data = np.random.default_rng(3).integers(0, 2, (20, 8)).astype(
        np.uint8)
    enc, ki = fc.raptor_encode(data, 40, seed=1)
    assert enc.shape == (40, 8)
    assert ki == 24  # 20 + 4 precode parities


def test_rate_match_puncture_and_repeat():
    bits = jnp.arange(10) % 2
    out, _ = fc.rate_match(bits, 6)
    assert out.shape[-1] == 6
    out2, _ = fc.rate_match(bits, 25)
    assert out2.shape[-1] == 25
    # repeats wrap the circular buffer
    assert np.array_equal(np.asarray(out2[:10]), np.asarray(bits))


def test_rate_dematch_soft_combines_repeats():
    llr = np.ones(30, np.float32)  # 3 copies of 10 bits
    comb = np.asarray(fc.rate_dematch(llr, 10))
    assert np.allclose(comb, 3.0)  # energy accumulates


# -------------------------------------------------------------- wavelet


def test_dwt_haar_known_answer():
    x = np.asarray([4.0, 2.0, 6.0, 8.0], np.float32)
    ca, cd = ms.dwt(x, "haar", 1)
    # orthonormal transform preserves energy exactly
    e_in = np.sum(x**2)
    e_out = float(jnp.sum(ca**2) + jnp.sum(cd**2))
    assert abs(e_in - e_out) < 1e-3


@pytest.mark.slow
def test_dwt_idwt_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(128).astype(np.float32)
    for w in ("haar", "db2", "db4"):
        coeffs = ms.dwt(x, w, levels=3)
        rec = np.asarray(ms.idwt(coeffs, w))
        assert np.max(np.abs(rec - x)) < 1e-4, w


def test_dwt_denoise_improves_mse():
    rng = np.random.default_rng(5)
    t = np.linspace(0, 1, 512)
    clean = np.sin(2 * np.pi * 4 * t) + (t > 0.5)
    noisy = (clean + 0.3 * rng.standard_normal(512)).astype(np.float32)
    den = np.asarray(ms.dwt_denoise(noisy, "db4", levels=3))
    assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2) / 2


def test_dwt_unknown_wavelet():
    with pytest.raises(ValueError):
        ms.dwt(np.ones(8, np.float32), "sym9")


# ----------------------------------------------------------- moving stats


def test_moving_variance():
    x = np.concatenate([np.zeros(100), np.random.default_rng(6)
                        .standard_normal(100)]).astype(np.float32)
    v = np.asarray(ms.moving_variance(x, 32))
    assert v[50] < 1e-6
    assert v[-1] > 0.3


def test_moving_minmax():
    x = np.asarray([1.0, 5.0, 2.0, 8.0, 3.0], np.float32)
    mn, mx = ms.moving_minmax(x, 3)
    assert np.array_equal(np.asarray(mn), [1.0, 2.0, 2.0])
    assert np.array_equal(np.asarray(mx), [5.0, 8.0, 8.0])


def test_moving_autocorrelation_tone_vs_noise():
    n = 2000
    tone = np.exp(2j * np.pi * 0.01 * np.arange(n)).astype(np.complex64)
    rng = np.random.default_rng(7)
    noise = ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
             / np.sqrt(2)).astype(np.complex64)
    ac_t = np.abs(np.asarray(ms.moving_autocorrelation(tone, 256)))
    ac_n = np.abs(np.asarray(ms.moving_autocorrelation(noise, 256)))
    assert ac_t.mean() > 0.95
    assert ac_n.mean() < 0.2


# --------------------------------------------------------------- quality


def test_constellation_persistence():
    syms = np.asarray([1 + 1j, -1 - 1j] * 500, np.complex64)
    h = np.asarray(ms.constellation_persistence(syms, bins=32))
    assert h.sum() == 1000
    assert (h > 0).sum() == 2  # exactly two hot cells


def test_friis_cascade():
    # LNA 20 dB gain / 1 dB NF followed by lossy mixer 10 dB NF:
    # cascade NF stays near the LNA's
    nf = ms.cascade_noise_figure_db([(20.0, 1.0), (-7.0, 10.0)])
    assert 1.0 < nf < 1.6
    assert abs(ms.noise_figure_db(0.0, 290.0) - 3.0103) < 1e-3


def test_signal_quality_metrics():
    ref = np.asarray([1 + 0j, 0 + 1j, -1 + 0j], np.complex64)
    noisy = ref * np.exp(1j * 0.05) * 1.02
    q = ms.signal_quality(noisy, ref)
    assert float(q["evm_pct"]) < 8.0
    assert float(q["snr_db"]) > 20.0
    assert abs(float(q["phase_err_rad"]) - 0.05) < 5e-3
