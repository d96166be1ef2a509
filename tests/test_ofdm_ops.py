"""Known-answer tests for OFDM channel-estimation/equalization ops
(ops/ofdm.py — re-design of ofdm_channel_est.rs /
ofdm_frame_equalizer.rs / ofdm_pilot_interpolator.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import ofdm as ofdm_ops
from r4w_tpu.ops.ofdm import PilotPattern


def test_pilot_pattern_uniform():
    pat = PilotPattern.uniform(12, 4)
    assert pat.positions == (0, 4, 8)
    assert pat.num_pilots == 3 and pat.num_data == 9
    assert pat.data_positions.tolist() == [1, 2, 3, 5, 6, 7, 9, 10, 11]


def test_pilot_pattern_edges():
    pat = PilotPattern.edges_and_uniform(52, 4)
    assert pat.positions[0] == 0 and pat.positions[-1] == 51
    assert pat.num_pilots == 4


def test_interp_operator_exact_at_pilots_linear_between():
    w = ofdm_ops._interp_operator((0, 4, 8), 9)
    h_p = np.array([1.0, 3.0, 5.0], np.float32)
    h = w @ h_p
    assert np.allclose(h, [1, 1.5, 2, 2.5, 3, 3.5, 4, 4.5, 5])


def test_interp_operator_extrapolates_constant():
    w = ofdm_ops._interp_operator((2, 4), 7)
    h = w @ np.array([10.0, 20.0], np.float32)
    assert np.allclose(h, [10, 10, 10, 15, 20, 20, 20])


def test_estimate_pilot_ls_known_channel():
    pat = PilotPattern((0, 3), (1 + 0j, 1j), 4)
    h_true = np.array([2 + 0j, 0, 0, 0.5j], np.complex64)
    tx = np.zeros((1, 4), np.complex64)
    tx[0, 0], tx[0, 3] = 1.0, 1j
    rx = tx * h_true
    ls = np.asarray(ofdm_ops.estimate_pilot_ls(jnp.asarray(rx), pat))
    assert np.allclose(ls[0], [2.0, 0.5j], atol=1e-6)


def test_equalize_zf_inverts_channel():
    h = jnp.asarray([0.5 + 0.5j, 2.0 - 1.0j], jnp.complex64)
    x = jnp.asarray([1 + 1j, -1 + 0.5j], jnp.complex64)
    eq = ofdm_ops.equalize_zf(x * h, h)
    assert np.allclose(np.asarray(eq), np.asarray(x), atol=1e-5)


def test_equalize_mmse_approaches_zf_at_low_noise():
    h = jnp.asarray([1.0 - 0.3j], jnp.complex64)
    x = jnp.asarray([0.7 + 0.2j], jnp.complex64)
    eq = ofdm_ops.equalize_mmse(x * h, h, 1e-9)
    assert np.allclose(np.asarray(eq), np.asarray(x), atol=1e-4)


def test_estimate_channel_flat_with_cpe():
    """A flat channel with per-symbol phase rotation: the packet estimate
    recovers the flat gain, cpe recovers the rotations."""
    pat = PilotPattern.uniform(8, 2)  # pilots at 0,2,4,6
    gain = 0.8 * np.exp(1j * 0.4)
    phases = np.array([0.0, 0.3, -0.2], np.float64)
    rng = np.random.default_rng(0)
    tx = np.ones((3, 8), np.complex64)
    rx = (tx * gain * np.exp(1j * phases)[:, None]).astype(np.complex64)
    h_occ, cpe = ofdm_ops.estimate_channel(jnp.asarray(rx), pat)
    assert np.allclose(np.abs(np.asarray(h_occ)), 0.8, atol=1e-3)
    rel = np.angle(np.asarray(cpe) * np.conj(np.asarray(cpe)[0]))
    assert np.allclose(rel, phases - phases[0], atol=1e-3)
    del rng


def test_equalize_packet_two_ray_qpsk():
    """End-to-end op test: known training symbol + pilots, static two-ray
    channel applied in the frequency domain, QPSK data recovered."""
    n_occ, n_sym = 52, 6
    pat = PilotPattern.edges_and_uniform(n_occ, 4)
    train = ofdm_ops.training_sequence(n_occ)
    rng = np.random.default_rng(1)
    qpsk = ((rng.integers(0, 2, (n_sym, n_occ)) * 2 - 1)
            + 1j * (rng.integers(0, 2, (n_sym, n_occ)) * 2 - 1)) / np.sqrt(2)
    data_tx = qpsk.astype(np.complex64)
    data_tx[:, list(pat.positions)] = np.asarray(pat.values, np.complex64)
    tx = np.concatenate([train[None, :], data_tx], axis=0)
    # frequency-domain two-ray channel across the occupied band
    k = np.arange(n_occ)
    h = (1.0 + 0.6 * np.exp(-2j * np.pi * 3 * k / 64)).astype(np.complex64)
    rx = tx * h
    data, h_est, _cpe = ofdm_ops.equalize_packet(
        jnp.asarray(rx), pat, train, 1, method="zf")
    want = data_tx[:, pat.data_positions]
    assert np.allclose(np.asarray(h_est), h, atol=1e-4)
    assert np.allclose(np.asarray(data), want, atol=1e-3)


def test_equalize_packet_noise_var_estimate_finite():
    n_occ = 16
    pat = PilotPattern.edges_and_uniform(n_occ, 4)
    train = ofdm_ops.training_sequence(n_occ)
    key = jax.random.key(0)
    rx = jnp.concatenate(
        [jnp.asarray(train)[None, :],
         jnp.ones((4, n_occ), jnp.complex64)], axis=0)
    rx = rx + 0.05 * jax.random.normal(key, rx.shape, jnp.float32)
    data, h, cpe = ofdm_ops.equalize_packet(rx, pat, train, 1)
    assert np.all(np.isfinite(np.asarray(data).view(np.float32)))


def test_channel_magnitude_db():
    h = jnp.asarray([1.0, 10.0, 0.1], jnp.complex64)
    db = np.asarray(ofdm_ops.channel_magnitude_db(h))
    assert np.allclose(db, [0.0, 20.0, -20.0], atol=1e-4)
