"""Noisy-channel acceptance for the ENTIRE 50-waveform fleet (VERDICT r1
item 5): every waveform must survive AWGN at a per-waveform SNR chosen
a few dB above its measured threshold — digital waveforms must decode
bit-exact; analog/radar/beacon waveforms must meet their functional
metric (audio fidelity, range accuracy, sweep detection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import create_waveform, list_waveforms

pytestmark = pytest.mark.slow  # heavy integration lane

DATA = bytes([0xA7, 0x1B, 0x3C, 0xD2])
KEY = jax.random.key(3)

# name -> (snr_db, sample_rate or None for default). SNRs sit 2-5 dB
# above the measured single-seed threshold (tools: SNR calibration
# sweep, r2) so the gate is meaningful but not flaky.
DIGITAL_SNR: dict[str, tuple[float, float | None]] = {
    "OOK": (0.0, None),
    "ASK": (8.0, None),
    "4-ASK": (18.0, None),
    "BFSK": (12.0, None),
    "4-FSK": (18.0, None),
    "PPM": (0.0, None),
    "ADS-B": (8.0, 8_000_000.0),
    "BPSK": (-6.0, None),
    "QPSK": (-6.0, None),
    "8-PSK": (0.0, None),
    "16-QAM": (0.0, None),
    "64-QAM": (8.0, None),
    "256-QAM": (10.0, None),
    "OFDM": (12.0, None),
    "DSSS": (-8.0, None),
    "DSSS-QPSK": (-8.0, None),
    "Zigbee": (-2.0, None),
    "UWB": (-6.0, None),
    "ALE": (-5.0, None),
    "3G-ALE": (-5.0, None),
    "STANAG-4285": (0.0, None),
    "MIL-STD-188-110": (0.0, None),
    "P25": (12.0, None),
    "P25-Phase2": (5.0, None),
    "TETRA": (5.0, None),
    "TETRA-DMO": (5.0, None),
    "DMR": (12.0, None),
    "DMR-Tier3": (12.0, None),
    "DMR-Direct": (12.0, None),
    "FHSS": (5.0, None),
    "FHSS-AntiJam": (5.0, None),
    "SINCGARS": (5.0, None),
    "HAVEQUICK": (8.0, None),
    "Link-16": (-6.0, None),
    "LoRa": (-8.0, None),
    "LoRa-SF7": (-8.0, None),
    "LoRa-SF12": (-8.0, None),
    "GPS-L1CA": (-6.0, None),
    "GPS-L5": (-6.0, None),
    "GLONASS-L1OF": (-6.0, None),
    "Galileo-E1": (-6.0, None),
}

# waveforms asserted through functional metrics instead of bit equality
FUNCTIONAL = {"CW", "AM-Broadcast", "FM-Broadcast", "NBFM", "FMCW",
              "ELT-121.5", "EPIRB-121.5", "PLB-121.5", "Beacon-243"}


def test_noisy_matrix_covers_all_waveforms():
    """Every factory name is covered by either the digital SNR matrix or
    a functional test below — no waveform escapes noisy acceptance."""
    covered = set(DIGITAL_SNR) | FUNCTIONAL
    assert covered == set(list_waveforms())


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
@pytest.mark.parametrize("name", sorted(DIGITAL_SNR))
def test_digital_roundtrip_noisy(name):
    snr, rate = DIGITAL_SNR[name]
    wf = create_waveform(name, rate) if rate else create_waveform(name)
    tx = wf.modulate(DATA)
    res = wf.demodulate(awgn(KEY, tx, snr))
    got = np.asarray(res.bits)[: len(DATA)].tolist()
    assert got == list(DATA), f"{name} @ {snr} dB"


def test_cw_noisy_frequency():
    wf = create_waveform("CW")
    rx = awgn(KEY, wf.modulate(b""), 10.0)
    res = wf.demodulate(rx)
    assert abs(res.metadata["frequency"] - 1000.0) < 10.0


@pytest.mark.parametrize("name,snr,tol", [("AM-Broadcast", 30.0, 6.0),
                                          ("FM-Broadcast", 30.0, 4.0),
                                          ("NBFM", 35.0, 10.0)])
def test_analog_noisy_fidelity(name, snr, tol):
    """Analog demod recovers the message bytes within a small mean
    absolute error (allowing group-delay truncation at the edges)."""
    wf = create_waveform(name)
    rx = awgn(KEY, wf.modulate(DATA), snr)
    got = np.asarray(wf.demodulate(rx).bits).astype(np.float64)
    ref = np.asarray(list(DATA), np.float64)
    best = np.inf
    # alignment slack on both sides for filter group-delay transients
    for goff in range(2):
        for roff in range(3):
            n = min(len(got) - goff, len(ref) - roff)
            if n >= 2:
                best = min(best, np.mean(np.abs(
                    got[goff:goff + n] - ref[roff:roff + n])))
    assert best < tol, f"{name}: mean |err| {best:.2f}"


def test_fmcw_noisy_range():
    wf = create_waveform("FMCW", 1_000_000.0)
    tx = np.asarray(wf.modulate())
    delay = int(round(2 * 1500.0 / 299_792_458.0 * wf.common.sample_rate))
    echo = np.concatenate([np.zeros(delay, np.complex64),
                           tx[: len(tx) - delay]])
    echo = awgn(KEY, jnp.asarray(echo), 0.0)
    res_m = 299_792_458.0 / (2 * wf.sweep_bandwidth)
    assert abs(wf.estimate_range(echo) - 1500.0) < 2 * res_m


@pytest.mark.parametrize("name", ["ELT-121.5", "EPIRB-121.5",
                                  "PLB-121.5", "Beacon-243"])
def test_beacon_noisy_sweep_detection(name):
    wf = create_waveform(name)
    rx = awgn(KEY, wf.modulate(DATA), 10.0)
    res = wf.demodulate(rx)
    assert res.metadata["sweep_detected"] == 1.0
    assert res.metadata["audio_freq_max"] > res.metadata["audio_freq_min"]
