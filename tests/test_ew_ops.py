"""ESPRIT, SAR, passive radar, TDOA, ELINT, ESM ops."""

import numpy as np
import jax.numpy as jnp

from r4w_tpu.ops import ew


def _ula_snapshots(angles_deg, n_elem=8, n_snap=200, snr_db=20, d=0.5,
                   seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_snap)
    x = np.zeros((n_snap, n_elem), complex)
    for k, ang in enumerate(angles_deg):
        steer = np.exp(-2j * np.pi * d * np.arange(n_elem)
                       * np.sin(np.radians(ang)))
        sig = np.exp(2j * np.pi * (0.11 + 0.07 * k) * t)
        x += sig[:, None] * steer[None, :]
    noise = (rng.standard_normal(x.shape) + 1j *
             rng.standard_normal(x.shape)) / np.sqrt(2)
    x += noise * 10 ** (-snr_db / 20)
    return x.astype(np.complex64)


def test_esprit_doa_two_sources():
    got = ew.esprit_doa(_ula_snapshots([-20.0, 25.0]), 2)
    assert abs(got[0] + 20.0) < 1.5
    assert abs(got[1] - 25.0) < 1.5


def test_esprit_frequencies():
    t = np.arange(512)
    x = (np.exp(2j * np.pi * 0.12 * t) + 0.8 *
         np.exp(2j * np.pi * -0.31 * t)).astype(np.complex64)
    f = ew.esprit_frequencies(x, 2, m=24)
    assert abs(f[0] + 0.31) < 1e-3
    assert abs(f[1] - 0.12) < 1e-3


def test_sar_point_target_focuses():
    n_p, n_r = 64, 128
    t = np.arange(32)
    range_ref = np.exp(1j * np.pi * 0.03 * t**2)  # range chirp
    tp = np.arange(n_p)
    azimuth_ref = np.exp(1j * np.pi * 0.01 * (tp - n_p / 2) ** 2)
    raw = ew.sar_point_target(n_p, n_r, rng_bin=40, az_bin=0,
                              range_ref=range_ref,
                              azimuth_ref=azimuth_ref)
    img = np.asarray(ew.sar_process(raw, range_ref, azimuth_ref))
    p, r = np.unravel_index(np.argmax(img), img.shape)
    assert r == 40  # focused to the right range bin
    peak = img[p, r]
    # exclude a circular +-3-bin mainlobe region (azimuth FFT wraps)
    az_d = np.minimum(np.abs(np.arange(n_p) - p),
                      n_p - np.abs(np.arange(n_p) - p))
    img2 = img.copy()
    img2[az_d <= 3, max(r - 3, 0):r + 4] = 0
    assert peak > 5 * img2.max()  # sharp mainlobe vs far sidelobes


def test_cross_ambiguity_finds_delay_doppler():
    rng = np.random.default_rng(1)
    n = 2048
    ref = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    delay, fd = 17, 0.05
    echo = np.roll(ref, delay) * np.exp(2j * np.pi * fd * np.arange(n))
    surv = (0.3 * echo + 0.01 * (rng.standard_normal(n) + 1j *
                                 rng.standard_normal(n))
            ).astype(np.complex64)
    caf, freqs = ew.cross_ambiguity(ref, surv, max_delay=32)
    mag = np.abs(np.asarray(caf))
    d, f = np.unravel_index(np.argmax(mag), mag.shape)
    assert d == delay
    assert abs(freqs[f] - fd) < 1e-3


def test_cancel_dsi_suppresses_direct_path():
    rng = np.random.default_rng(2)
    n = 4096
    ref = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
           ).astype(np.complex64)
    # surveillance = strong direct + weak delayed target echo
    surv = (ref + 0.5 * np.roll(ref, 3)
            + 0.01 * np.roll(ref, 200)).astype(np.complex64)
    clean = np.asarray(ew.cancel_dsi(ref, surv, n_taps=8))
    before = np.mean(np.abs(surv) ** 2)
    after = np.mean(np.abs(clean) ** 2)
    assert after < before / 100  # >20 dB suppression


def test_gcc_phat_delay():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    y = np.roll(x, -25)  # x arrives 25 samples after y
    d, _ = ew.gcc_phat(x, y, max_delay=64)
    assert int(d) == 25


def test_tdoa_localize():
    recv = np.asarray([[0.0, 0.0], [1000.0, 0.0], [0.0, 1000.0],
                       [1000.0, 1000.0]])
    emitter = np.asarray([420.0, 310.0])
    d = np.linalg.norm(recv - emitter, axis=1)
    est = ew.tdoa_localize(recv, d[1:] - d[0])
    assert np.linalg.norm(est - emitter) < 1.0


def test_pulse_characterizer():
    fs = 1e6
    n = 20000
    x = np.zeros(n, np.complex64)
    pw, pri = 200, 2000  # samples
    for k in range(8):
        a = 1000 + k * pri
        t = np.arange(pw)
        x[a:a + pw] = np.exp(2j * np.pi * 0.1 * t)
    x += 0.01 * (np.random.default_rng(4).standard_normal(n)
                 + 1j * np.random.default_rng(5).standard_normal(n))
    res = ew.pulse_characterize(x, fs, threshold_db=10.0)
    assert res["count"] == 8
    assert abs(res["width_s"][0] - pw / fs) < 20 / fs
    assert abs(res["pri_s"] - pri / fs) < 20 / fs
    assert abs(res["carrier_hz"][0] - 0.1 * fs) < fs / 128


def test_esm_scan_two_emitters():
    fs = 1e6
    t = np.arange(1 << 16)
    x = (np.exp(2j * np.pi * 0.11 * t) +
         0.5 * np.exp(2j * np.pi * -0.23 * t)).astype(np.complex64)
    x += 0.05 * (np.random.default_rng(6).standard_normal(len(t))
                 + 1j * np.random.default_rng(7).standard_normal(len(t)))
    ems = ew.esm_scan(x, fs, threshold_db=12.0)
    freqs = sorted(e["freq_hz"] for e in ems)
    assert len(ems) == 2
    assert abs(freqs[0] + 0.23 * fs) < fs / 256
    assert abs(freqs[1] - 0.11 * fs) < fs / 256
