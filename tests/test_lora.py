"""LoRa chain tests: chirp properties, symbol demod, full roundtrips, BER.

Replicates the reference test strategy (SURVEY.md §4): roundtrip
decision-identity, known-answer chirp structure, statistical BER at SNR.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import lora
from r4w_tpu.waveforms.lora import chirp as chirp_mod


def test_params_derived():
    p = lora.LoRaParams(sf=7, bw_hz=125_000, cr=1)
    assert p.chips_per_symbol == 128
    assert p.samples_per_symbol == 128
    assert abs(p.symbol_duration - 0.001024) < 1e-9
    rate = p.bit_rate()
    assert 5000 < rate < 6000  # params.rs test_bit_rate


def test_base_chirp_unit_modulus_and_conjugate():
    p = lora.LoRaParams(sf=7)
    up = np.asarray(chirp_mod.base_upchirp(p))
    down = np.asarray(chirp_mod.base_downchirp(p))
    assert np.allclose(np.abs(up), 1.0, atol=1e-5)
    # downchirp is the conjugate of the upchirp
    assert np.allclose(down, np.conj(up), atol=1e-5)


def test_dechirped_symbol_is_pure_tone():
    """up(symbol s) * downchirp -> FFT peak exactly at bin s."""
    p = lora.LoRaParams(sf=7)
    symbols = jnp.arange(0, 128, 7)
    chirps = chirp_mod.symbol_chirps(p, symbols)
    got, _, _ = lora.demodulate_symbols(p, chirps.reshape(-1))
    assert np.array_equal(np.asarray(got), np.asarray(symbols))


@pytest.mark.parametrize("sf", [7, 9, 12])
@pytest.mark.parametrize("cr", [1, 4])
def test_roundtrip_clean(sf, cr):
    p = lora.LoRaParams(sf=sf, cr=cr)
    payload = jnp.asarray([0xAB, 0xCD, 0xEF, 0x12, 0x34])
    tx = lora.modulate(p, payload, include_preamble=False)
    result = lora.demodulate(p, tx)
    assert np.array_equal(np.asarray(result.payload[:5]), np.asarray(payload))


def test_roundtrip_with_preamble_via_waveform_api():
    from r4w_tpu.waveforms import create_waveform

    wf = create_waveform("LoRa-SF7", 125_000.0)
    payload = [0xDE, 0xAD, 0xBE, 0xEF]
    tx = wf.modulate(bytes(payload))
    result = wf.demodulate(tx)
    assert np.asarray(result.bits[:4]).tolist() == payload


def test_symbols_match_encode_decode():
    p = lora.LoRaParams(sf=8, cr=2)
    payload = jnp.arange(16)
    syms = lora.encode_symbols(p, payload)
    back = lora.decode_symbols(p, syms)
    assert np.array_equal(np.asarray(back[: payload.shape[0]]),
                          np.asarray(payload))


def test_oversampled_roundtrip():
    p = lora.LoRaParams(sf=7, oversample=4)
    payload = jnp.asarray([1, 2, 3])
    tx = lora.modulate(p, payload, include_preamble=False)
    result = lora.demodulate(p, tx)
    assert np.array_equal(np.asarray(result.payload[:3]), np.asarray(payload))


def test_roundtrip_at_moderate_snr():
    """Decision-identity at SNR above the SF7 threshold (-7.5 dB)."""
    p = lora.LoRaParams(sf=7)
    payload = jnp.asarray([0x55] * 8)
    tx = lora.modulate(p, payload, include_preamble=False)
    rx = awgn(jax.random.key(0), tx, snr_db=0.0)
    result = lora.demodulate(p, rx)
    assert np.array_equal(np.asarray(result.payload[:8]), np.asarray(payload))


@pytest.mark.slow
def test_ber_improves_with_snr():
    p = lora.LoRaParams(sf=7)
    payload = jnp.asarray(np.random.default_rng(0).integers(0, 256, 16))
    keys = jax.random.split(jax.random.key(42), 8)
    ber_fn = jax.vmap(lambda k, s: lora.loopback_ber(p, payload, k, s),
                      in_axes=(0, None))
    ber_low = float(jnp.mean(ber_fn(keys, -18.0)))
    ber_high = float(jnp.mean(ber_fn(keys, 0.0)))
    assert ber_high == 0.0
    assert ber_low > 0.05


def test_snr_estimate_reasonable():
    p = lora.LoRaParams(sf=7)
    payload = jnp.asarray([7] * 4)
    tx = lora.modulate(p, payload, include_preamble=False)
    result = lora.demodulate(p, tx)
    # clean dechirp: peak/avg ~ K = 128 -> ~21 dB
    assert float(jnp.mean(result.snr_db)) > 15.0


def test_preamble_length():
    p = lora.LoRaParams(sf=7)
    pre = chirp_mod.preamble(p)
    n = p.samples_per_symbol
    assert pre.shape[0] == (8 + 2) * n + 2 * n + n // 4
    assert p.n_preamble_samples() == pre.shape[0]
