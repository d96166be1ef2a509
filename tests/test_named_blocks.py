"""Known-answer + behavior tests for the r1-missing named blocks:
DVB-S2X LDPC (fec/dvb_s2x.py), RAKE receiver (ops/spreading.py), turbo
equalizer + time-domain equalizer (ops/equalizers.py), FBMC polyphase
mapper + NR resource grid (ops/modem.py). VERDICT r1 missing #4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.fec import dvb_s2x
from r4w_tpu.ops import equalizers as eq
from r4w_tpu.ops import modem, spreading

pytestmark = pytest.mark.slow  # heavy integration lane

RNG = np.random.default_rng(42)


# ------------------------------------------------------------- DVB-S2X


def test_dvb_s2x_info_bits_all_rates():
    # k = round(n · rate) for both frame sizes (dvb_s2x_ldpc_codec.rs:139)
    assert dvb_s2x.info_bits("1/2", "short") == 8100
    assert dvb_s2x.info_bits("9/10", "normal") == 58320
    assert dvb_s2x.info_bits("1/4", "short") == 4050
    for rate in dvb_s2x.CODE_RATES:
        for frame in ("short", "normal"):
            k = dvb_s2x.info_bits(rate, frame)
            assert 0 < k < dvb_s2x.FRAME_BITS[frame]


def test_dvb_s2x_encode_satisfies_parity():
    st = dvb_s2x.parity_structure("2/3", "short")
    u = RNG.integers(0, 2, st["k"]).astype(np.int32)
    c = np.asarray(dvb_s2x.encode(u, "2/3", "short"))
    assert c.shape == (16200,)
    assert np.array_equal(c[: st["k"]], u)  # systematic
    row_bits = np.where(st["edge_mask"], c[st["edge_col"]], 0)
    assert np.all(row_bits.sum(1) % 2 == 0)


@pytest.mark.parametrize("rate,ebn0", [("1/4", 2.0), ("1/2", 3.0),
                                       ("3/4", 4.0), ("9/10", 6.5)])
def test_dvb_s2x_decode_noisy(rate, ebn0):
    st = dvb_s2x.parity_structure(rate, "short")
    u = RNG.integers(0, 2, st["k"]).astype(np.int32)
    c = np.asarray(dvb_s2x.encode(u, rate, "short"))
    esn0 = 10 ** (ebn0 / 10) * dvb_s2x.CODE_RATES[rate]
    y = (1 - 2 * c) + RNG.normal(0, np.sqrt(1 / (2 * esn0)), len(c))
    hard, ok = dvb_s2x.decode(jnp.asarray(4 * esn0 * y, jnp.float32),
                              rate, "short", iters=40)
    assert bool(ok)
    assert np.array_equal(np.asarray(hard), u)


def test_dvb_s2x_batched_decode():
    st = dvb_s2x.parity_structure("1/2", "short")
    u = RNG.integers(0, 2, (3, st["k"])).astype(np.int32)
    c = np.asarray(dvb_s2x.encode(u, "1/2", "short"))
    hard, ok = dvb_s2x.decode(jnp.asarray((1 - 2 * c) * 4.0, jnp.float32),
                              "1/2", "short", iters=5)
    assert hard.shape == u.shape and bool(jnp.all(ok))
    assert np.array_equal(np.asarray(hard), u)


# ---------------------------------------------------------------- RAKE


def _rake_setup(h1=0.6 * np.exp(1j * 1.1), noise=0.3, seed=1):
    rng = np.random.default_rng(seed)
    code = spreading.gold_code(5, 1).astype(np.float32)
    l = len(code)
    n_sym = 64
    bits = rng.integers(0, 2, n_sym) * 2 - 1
    bits[0] = 1  # pilot resolves BPSK gain-sign ambiguity
    tx = np.repeat(bits, l) * np.tile(code, n_sym)
    rx = tx.astype(np.complex64)
    rx[7:] += h1 * tx[:-7]
    rx += noise * (rng.normal(0, 1, len(rx))
                   + 1j * rng.normal(0, 1, len(rx))).astype(np.complex64)
    return code, l, bits, rx


def test_rake_search_finds_true_fingers():
    code, l, _bits, rx = _rake_setup()
    delays, gains, valid = spreading.rake_search(
        jnp.asarray(rx), code, max_fingers=3, window=l)
    d = np.asarray(delays)
    assert d[0] == 0 and d[1] == 7
    assert bool(valid[0]) and bool(valid[1])
    assert abs(float(jnp.abs(gains[0])) - 1.0) < 0.15
    assert abs(float(jnp.abs(gains[1])) - 0.6) < 0.15


@pytest.mark.parametrize("mode", ["mrc", "egc", "selection"])
def test_rake_combine_modes_decode(mode):
    code, l, bits, rx = _rake_setup()
    delays, gains, valid = spreading.rake_search(
        jnp.asarray(rx), code, max_fingers=3, window=l)
    sym = np.asarray(spreading.rake_combine(
        jnp.asarray(rx), code, delays, gains, valid, mode))
    n = len(bits) - 1  # last symbol truncated by the delayed path
    assert np.mean(np.sign(sym.real[:n]) != bits[:n]) == 0.0


def test_rake_mrc_beats_noisy_single_finger():
    """With two comparable paths, MRC collects ~2x the energy of one
    finger — check the combined SNR proxy is higher."""
    code, l, bits, rx = _rake_setup(h1=0.9 * np.exp(1j * 2.0), noise=0.6,
                                    seed=3)
    delays, gains, valid = spreading.rake_search(
        jnp.asarray(rx), code, max_fingers=2, window=l)
    mrc = np.asarray(spreading.rake_combine(
        jnp.asarray(rx), code, delays, gains, valid, "mrc"))
    sel = np.asarray(spreading.rake_combine(
        jnp.asarray(rx), code, delays, gains, valid, "selection"))

    def snr_proxy(s):
        sgn = np.sign(s.real[: len(bits) - 1]) * bits[: len(bits) - 1]
        return np.mean(s.real[: len(bits) - 1] * bits[: len(bits) - 1]) / (
            np.std(s.imag[: len(bits) - 1]) + 1e-12)

    assert snr_proxy(mrc) > snr_proxy(sel)


# ------------------------------------------------------- turbo equalizer


def test_turbo_equalize_iteration_gain():
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 1024)
    x, _coded, pi = eq.turbo_equalizer_tx(bits)
    h = np.array([0.407, 0.815, 0.407], np.complex64)  # Proakis B
    m = len(np.asarray(x))
    y_clean = np.fft.ifft(np.fft.fft(np.asarray(x)) * np.fft.fft(h, m))
    n0 = 1 / 10 ** (4.0 / 10)
    y = y_clean + (rng.normal(0, np.sqrt(n0 / 2), m)
                   + 1j * rng.normal(0, np.sqrt(n0 / 2), m))
    y = jnp.asarray(y.astype(np.complex64))
    hard1, _ = eq.turbo_equalize(y, h, pi, n0, n_iters=1)
    hard4, _ = eq.turbo_equalize(y, h, pi, n0, n_iters=4)
    ber1 = np.mean(np.asarray(hard1) != bits)
    ber4 = np.mean(np.asarray(hard4) != bits)
    assert ber4 < ber1
    assert ber4 < 0.02


def test_time_domain_equalizer_train_then_dd():
    rng = np.random.default_rng(7)
    const = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))
                   ).astype(np.complex64)
    syms = const[rng.integers(0, 4, 1500)]
    ch = np.array([1.0, 0.4 + 0.2j, 0.1], np.complex64)
    rx = np.convolve(syms, ch)[:1500].astype(np.complex64)
    rx += 0.02 * (rng.normal(0, 1, 1500)
                  + 1j * rng.normal(0, 1, 1500)).astype(np.complex64)
    out = eq.time_domain_equalizer(rx, n_taps=15, mu=0.01,
                                   reference=syms[:400],
                                   constellation=const)
    y = np.asarray(out.y)
    dec = np.asarray(eq.nearest_point(jnp.asarray(y[1000:]), const))
    assert np.mean(dec != syms[1000:1500]) == 0.0
    # decision-directed error keeps shrinking after training
    err = np.asarray(out.error)
    assert err[-100:].mean() < err[400:500].mean()


def test_nearest_point_known_answer():
    const = jnp.asarray([1 + 0j, -1 + 0j, 0 + 1j, 0 - 1j], jnp.complex64)
    y = jnp.asarray([0.9 + 0.1j, -1.2 + 0.3j, 0.2 + 0.8j], jnp.complex64)
    got = np.asarray(eq.nearest_point(y, const))
    assert np.allclose(got, [1, -1, 1j])


# ------------------------------------------------------------------ FBMC


def test_phydyas_filter_properties():
    h = modem.phydyas_filter(16, 4)
    assert h.shape == (64,)
    assert abs(np.sum(h * h) - 1.0) < 1e-5  # unit energy
    assert np.allclose(h, h[::-1], atol=1e-5)  # symmetric
    assert np.argmax(h) in (31, 32)  # centered main lobe


def test_oqam_stagger_destagger_roundtrip():
    q = (RNG.normal(0, 1, (5, 8)) + 1j * RNG.normal(0, 1, (5, 8))
         ).astype(np.complex64)
    oq = modem.oqam_stagger(jnp.asarray(q))
    assert oq.shape == (10, 8)
    back = np.asarray(modem.oqam_destagger(oq))
    assert np.allclose(back, q, atol=1e-6)


def test_fbmc_modulate_demodulate_decisions():
    """PHYDYAS FBMC is perfect-reconstruction up to intrinsic imaginary
    interference (discarded by OQAM): sign decisions round-trip."""
    m, t = 16, 8
    q = ((RNG.integers(0, 2, (t, m)) * 2 - 1)
         + 1j * (RNG.integers(0, 2, (t, m)) * 2 - 1)
         ).astype(np.complex64) / np.sqrt(2)
    oq = modem.oqam_stagger(jnp.asarray(q))
    tx = modem.fbmc_modulate(oq, overlap=4)
    assert tx.shape == ((2 * t - 1) * (m // 2) + 4 * m,)
    rx = modem.fbmc_demodulate(tx, m, 2 * t, overlap=4)
    got = np.asarray(modem.oqam_destagger(rx))
    assert np.all(np.sign(got.real) == np.sign(q.real))
    assert np.all(np.sign(got.imag) == np.sign(q.imag))


def test_fbmc_lower_sidelobes_than_ofdm():
    """The prototype filter suppresses out-of-band emission vs
    rectangular-pulse OFDM (the block's raison d'être)."""
    m, t = 32, 64
    q = ((RNG.integers(0, 2, (t, m)) * 2 - 1)
         + 1j * (RNG.integers(0, 2, (t, m)) * 2 - 1)
         ).astype(np.complex64) / np.sqrt(2)
    # occupy only subcarriers 0..7 (low band); measure leakage far away
    q[:, 8:] = 0.0
    oq = modem.oqam_stagger(jnp.asarray(q))
    fbmc = np.asarray(modem.fbmc_modulate(oq, overlap=4))
    ofdm = np.asarray(jnp.fft.ifft(jnp.asarray(q), axis=-1)).reshape(-1)

    def oob_db(sig, nfft=1024):
        n = len(sig) // nfft * nfft
        segs = sig[:n].reshape(-1, nfft) * np.hanning(nfft)
        psd = (np.abs(np.fft.fft(segs, axis=-1)) ** 2).mean(0)
        # subcarrier k sits at bin k*nfft/m; occupied 0..7, probe 12..16
        inband = psd[: 8 * nfft // m].mean()
        far = psd[12 * nfft // m: 16 * nfft // m].mean()
        return 10 * np.log10(far / inband)

    # PHYDYAS prototype buys tens of dB of sidelobe suppression over the
    # rectangular OFDM pulse a few subcarriers from the band edge
    # (measured: fbmc ~-94 dB vs ofdm ~-20 dB)
    assert oob_db(fbmc) < oob_db(ofdm) - 20.0


# ----------------------------------------------------------- NR grid


def test_nr_grid_config_numerology():
    cfg = modem.NrGridConfig(numerology=2, num_prbs=10)
    assert cfg.num_subcarriers == 120
    assert cfg.subcarrier_spacing_khz == 60.0
    assert cfg.slot_duration_ms == 0.25


def test_nr_grid_dmrs_comb2_positions():
    cfg = modem.NrGridConfig(num_prbs=2)
    types = modem.nr_re_types(cfg)
    assert types.shape == (14, 24)
    # DMRS on symbols 2,3, even subcarriers; odd ones guarded
    assert np.all(types[2, 0::2] == modem.NR_RE_DMRS)
    assert np.all(types[2, 1::2] == modem.NR_RE_GUARD)
    assert np.all(types[0] == modem.NR_RE_DATA)


def test_nr_map_demap_roundtrip():
    cfg = modem.NrGridConfig(num_prbs=4)
    cap = modem.nr_data_capacity(cfg)
    assert cap == (14 - 2) * 48  # 12 data symbols x full band
    d = (RNG.normal(0, 1, cap) + 1j * RNG.normal(0, 1, cap)
         ).astype(np.complex64)
    grid = modem.nr_map(d, cfg)
    assert grid.shape == (14, 48)
    back = np.asarray(modem.nr_demap(grid, cfg))
    assert np.allclose(back, d, atol=1e-6)
    # DMRS cells carry the deterministic unit-power QPSK sequence
    g = np.asarray(grid)
    dm = g[2, 0::2]
    assert np.allclose(np.abs(dm), 1 / np.sqrt(2), atol=1e-6)


def test_nr_dmrs_seed_changes_with_slot():
    a = modem.nr_dmrs_values(modem.NrGridConfig(num_prbs=2, slot_number=0))
    b = modem.nr_dmrs_values(modem.NrGridConfig(num_prbs=2, slot_number=1))
    assert not np.allclose(a, b)
