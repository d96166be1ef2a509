"""GLONASS L1OF physical-layer scenario tests: true 0.511 Mchip/s
chip rate and exact-integer FDMA carrier offsets.

Reference: the reference's GLONASS waveform runs the 511-chip
m-sequence at its ICD rate (crates/r4w-core/src/waveform/gnss/
glonass_l1of.rs); its scenario engine never modeled FDMA. Here the
scenario synthesizes per-signal chip rates and k·562.5 kHz channel
offsets with integer phase arithmetic (f32 cannot carry ~1e7 cycles
of offset·t), so one capture can hold a physically-correct mixed
GPS+GLONASS constellation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.gnss import prn, scenario

FS = 6_132_000.0  # 12 samples per GLONASS chip; 562.5 kHz grid-exact


def _sat(k: int = 0, **kw):
    return scenario.SatelliteConfig(
        signal="GlonassL1of", prn=1, cn0_dbhz=kw.pop("cn0", 51.0),
        range_m=21_000_000.0, carrier_offset_hz=k * 562_500.0,
        elevation_deg=60.0, **kw)


def _zero_noise_block(gen, n):
    """composite_block on the scenario's own inputs, noise off."""
    banks = gen.sv_banks()
    args, key = gen.block_inputs(n)
    return scenario.composite_block(
        *banks, *args, jnp.asarray(0.0, jnp.float32), key,
        n=n, fs=gen.config.sample_rate,
        fdma_den=gen._fdma_den)


def test_glonass_chip_rate_is_511_kcps():
    """Code period must be 1 ms = 6132 samples at 12 spc (the r4
    scenario ran GLONASS at 1.023 Mcps — half the true period)."""
    cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.01,
                                  satellites=(_sat(0),), seed=3)
    gen = scenario.GnssScenario(cfg)
    assert gen._period_s[0] == pytest.approx(511 / 511_000.0)
    x = np.asarray(_zero_noise_block(gen, 3 * 6132))
    # signal repeats exactly every code period (static range, no nav)
    p0, p1 = x[:6132], x[6132:2 * 6132]
    corr = np.abs(np.vdot(p0, p1)) / (
        np.linalg.norm(p0) * np.linalg.norm(p1))
    assert corr > 0.999


def test_glonass_code_correlates_at_true_rate():
    """A 12-spc replica of the 511-chip m-sequence must correlate
    against one noise-free code period."""
    cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.01,
                                  satellites=(_sat(0),), seed=4)
    gen = scenario.GnssScenario(cfg)
    x = np.asarray(_zero_noise_block(gen, 6132))
    rep = np.repeat(prn.glonass_l1of_code().astype(np.float64), 12)
    c = np.fft.ifft(np.fft.fft(x) * np.conj(np.fft.fft(rep)))
    peak = np.abs(c).max() / np.abs(c).mean()
    assert peak > 50.0


def test_fdma_offset_moves_spectral_peak():
    """carrier_offset_hz = ±k·562.5 kHz must shift the channel's
    spectrum by exactly that offset."""
    for k in (-3, 2):
        cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.01,
                                      satellites=(_sat(k),), seed=5)
        gen = scenario.GnssScenario(cfg)
        x = np.asarray(_zero_noise_block(gen, 1 << 15))
        f = np.fft.fftfreq(len(x), 1.0 / FS)
        spec = np.abs(np.fft.fft(x * np.hanning(len(x))))
        # centroid of the top-power bins (BPSK mainlobe is ~1 MHz wide)
        top = spec > 0.5 * spec.max()
        centroid = float(np.sum(f[top] * spec[top]) / np.sum(spec[top]))
        assert centroid == pytest.approx(k * 562_500.0, abs=40_000.0)


def test_fdma_phase_exact_across_blocks():
    """The integer-phase FDMA path must be continuous across block
    boundaries: two chained blocks == one double block, exactly."""
    cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.02,
                                  satellites=(_sat(3),), seed=6)
    n = 8192
    g1 = scenario.GnssScenario(cfg)
    whole = np.asarray(_zero_noise_block(g1, 2 * n))
    g2 = scenario.GnssScenario(cfg)
    a = np.asarray(_zero_noise_block(g2, n))
    # advance state exactly one block (generate_block advances _n0)
    g2.generate_block(n)
    b = np.asarray(_zero_noise_block(g2, n))
    np.testing.assert_allclose(a, whole[:n], atol=1e-5)
    np.testing.assert_allclose(b, whole[n:], atol=1e-5)


def test_fdma_mixdown_recovers_baseband():
    """Mixing a k=+2 channel down by the exact integer phase restores
    the baseband code correlation to the k=0 level."""
    k = 2
    cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.01,
                                  satellites=(_sat(k),), seed=7)
    gen = scenario.GnssScenario(cfg)
    x = np.asarray(_zero_noise_block(gen, 6132))
    # exact host-side mixdown at the same rational phase
    num, den = gen._fdma_num[0], gen._fdma_den
    qn = (np.arange(len(x), dtype=np.int64) * int(num)) % den
    x_bb = x * np.exp(-2j * np.pi * qn / den)
    rep = np.repeat(prn.glonass_l1of_code().astype(np.float64), 12)
    c = np.fft.ifft(np.fft.fft(x_bb) * np.conj(np.fft.fft(rep)))
    peak = np.abs(c).max() / np.abs(c).mean()
    assert peak > 50.0


def test_incommensurate_offset_rejected():
    with pytest.raises(ValueError, match="denominator"):
        scenario.GnssScenario(scenario.ScenarioConfig(
            sample_rate=5e6, duration_s=0.01,
            satellites=(scenario.SatelliteConfig(
                signal="GlonassL1of", prn=1,
                carrier_offset_hz=562_500.1),)))


def test_mixed_constellation_chip_rates():
    """GPS and GLONASS in ONE scenario keep their own chip rates."""
    sats = (scenario.SatelliteConfig(signal="GpsL1Ca", prn=7,
                                     cn0_dbhz=50.0,
                                     range_m=21e6, elevation_deg=60.0),
            _sat(1))
    cfg = scenario.ScenarioConfig(sample_rate=FS, duration_s=0.01,
                                  satellites=sats, seed=8)
    gen = scenario.GnssScenario(cfg)
    assert gen._chip_sub[0] == pytest.approx(1_023_000.0 * 12)
    assert gen._chip_sub[1] == pytest.approx(511_000.0 * 12)
    assert gen._carrier_hz[0] == pytest.approx(1_575_420_000.0)
    assert gen._carrier_hz[1] == pytest.approx(1_602_562_500.0)
    x = np.asarray(_zero_noise_block(gen, 1 << 14))
    assert np.all(np.isfinite(x)) and np.abs(x).max() > 0
