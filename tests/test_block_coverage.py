"""Block→test coverage audit + dedicated tests for the last uncovered
blocks (VERDICT r3 #3: mechanical proof that no registry block is
exercised zero times — the reference's equivalent assurance is its
~11.9k inline #[cfg(test)] functions, SURVEY §4)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.slow
def test_every_registry_block_is_exercised():
    """tools/block_test_audit.py must report ZERO uncovered blocks:
    each of the 523 registry names maps to a test that names it, its
    underlying callable, or its waveform (the fleet suite's covers-all
    assert guarantees every list_waveforms() entry). The audit
    excludes THIS file from the corpus, so coverage can never be
    satisfied by the audit's own companion tests (the last 8 such
    blocks got independent truths in test_known_answers_r4j.py)."""
    from tools.block_test_audit import audit

    out = audit()
    assert out["total"] >= 500
    assert not out["uncovered"], out["uncovered"]


# ---- dedicated known-answer tests for the blocks the audit found bare


def test_impedance_tomography_point_reconstruction():
    """A single bright detector bin seen from all angles must
    backproject to a hot spot near the corresponding radius."""
    from r4w_tpu.ops.sensing import impedance_tomography_backproject

    n_ang, n_det, n_px = 16, 64, 32
    meas = np.zeros((n_ang, n_det), np.float32)
    meas[:, n_det // 2] = 1.0  # center-of-detector line integrals
    img = np.asarray(impedance_tomography_backproject(
        meas, np.linspace(0, 180, n_ang, endpoint=False), n_px))
    c = n_px // 2
    # center pixel (t=0 for every angle) accumulates every projection
    assert img[c, c] >= img.max() * 0.999
    assert img[c, c] > 4.0 * np.abs(img[2, 2])


def test_dvb_s2x_ldpc_roundtrip_and_correction():
    from r4w_tpu.fec import dvb_s2x

    rng = np.random.default_rng(3)
    k = dvb_s2x.info_bits("1/2", "short")
    bits = rng.integers(0, 2, k).astype(np.int32)
    coded = np.asarray(dvb_s2x.encode(bits, "1/2", "short"))
    llr = (1.0 - 2.0 * coded) * 4.0
    # flip a few channel LLRs — the LDPC decode must still recover
    flip = rng.choice(coded.shape[0], 40, replace=False)
    llr[flip] = -llr[flip]
    got = np.asarray(dvb_s2x.decode(jnp.asarray(llr), "1/2",
                                    "short")[0])
    assert (got[:k] == bits).all()


def test_emc_immunity_levels_profile():
    from r4w_tpu.ops.instruments import immunity_test_levels

    lv = np.asarray(immunity_test_levels([80e6, 1e9, 2.7e9], 3.0))
    assert lv.shape == (3,)
    np.testing.assert_allclose(lv, 3.0 * 1.8, rtol=1e-6)  # 80% AM peak


def test_freq_domain_channel_sounder_recovers_delay():
    from r4w_tpu.ops.propagation import freq_domain_sound

    rng = np.random.default_rng(5)
    tx = (rng.standard_normal(256) + 1j * rng.standard_normal(256)
          ).astype(np.complex64)
    rx = np.roll(tx, 7) * 0.8  # pure 7-sample delay channel
    _, imp = freq_domain_sound(tx, rx)
    imp = np.asarray(imp)
    assert int(np.argmax(np.abs(imp))) == 7
    assert abs(abs(imp[7]) - 0.8) < 0.05


def test_matched_filter_pulse_radar_compresses():
    from r4w_tpu.ops.radar_sonar import matched_filter_pulses

    n = 128
    t = np.arange(64)
    replica = np.exp(1j * np.pi * 0.01 * t * t).astype(np.complex64)
    cube = np.zeros((3, n), np.complex64)
    for p, d in enumerate((10, 30, 50)):
        cube[p, d:d + 64] = replica
    out = np.abs(np.asarray(matched_filter_pulses(cube, replica)))
    for p, d in enumerate((10, 30, 50)):
        assert int(out[p].argmax()) == d
        # compression gain: peak is the full pulse energy
        assert out[p, d] > 0.9 * 64


def test_pll_biquad_tracks_offset_tone():
    from r4w_tpu.ops.sync2 import pll_biquad

    f0 = 0.02  # cycles/sample
    n = 4096
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    _, freqs = pll_biquad(jnp.asarray(x), loop_bw=0.05)
    tail = np.asarray(freqs)[-500:]
    assert abs(tail.mean() - 2 * np.pi * f0) < 0.01


def test_power_control_step_direction():
    from r4w_tpu.ops.cognitive import power_control_step

    cmd = np.asarray(power_control_step(
        jnp.asarray([3.0, 15.0]), target_db=10.0, step_db=1.0))
    assert cmd[0] == 1.0 and cmd[1] == -1.0


def test_pseudodoppler_df_bearing():
    """A pseudo-Doppler commutation at rot_hz whose FM component peaks
    at phase φ must report bearing ≈ φ."""
    from r4w_tpu.ops.instruments import df_bearing_pseudodoppler

    fs, rot = 48000.0, 100.0
    n = 9600
    t = np.arange(n) / fs
    bearing_true = 72.0
    # FM by the commutation tone; the block's convention reports the
    # NEGATED phase of the rot-component, so synthesize with +φ
    inst = np.cos(2 * np.pi * rot * t + np.deg2rad(bearing_true))
    phase = np.cumsum(inst) * 0.3
    x = np.exp(1j * phase).astype(np.complex64)
    got = float(np.asarray(df_bearing_pseudodoppler(
        jnp.asarray(x), fs, rot)))
    err = (got - bearing_true + 180.0) % 360.0 - 180.0
    assert abs(err) < 5.0, (got, bearing_true)


def test_range_velocity_decoupling_fmcw():
    from r4w_tpu.ops.radar_sonar import range_velocity_decouple

    rng_axis = jnp.asarray(np.arange(64, dtype=np.float32))
    vel_axis = jnp.asarray(np.arange(8, dtype=np.float32))
    up = np.zeros((8, 64), np.float32)
    dn = np.zeros((8, 64), np.float32)
    up[3, 20] = 1.0   # f_beat,up = R − V
    dn[3, 30] = 1.0   # f_beat,dn = R + V
    r, v = range_velocity_decouple(up, dn, rng_axis, vel_axis)
    assert float(r) == 25.0 and float(v) == 5.0


def test_sta_lta_direct_onset_ratio():
    from r4w_tpu.ops.sensing import sta_lta

    x = np.ones(1000) * 0.01
    x[600:] = 1.0  # sharp onset
    r = np.asarray(sta_lta(jnp.asarray(x.astype(np.float32)),
                           n_sta=20, n_lta=200))
    # ceiling ≈ LTA(200) with 20 hot samples: 1.0/0.109 ≈ 9.2
    assert r.max() > 5.0
    assert int(r.argmax()) > 300  # fires at/after the onset


# ---- typed block param metadata (VERDICT r3 #8, block_metadata.rs role)


def test_param_schema_shape_and_typing():
    from r4w_tpu.registry import default_registry

    reg = default_registry()
    rows = reg.param_schema("cfar")
    by = {r["name"]: r for r in rows}
    assert by["power"]["role"] == "input"
    assert by["guard"]["type"] == "int" and by["guard"]["default"] == 2
    assert by["pfa"]["type"] == "float" and not by["pfa"]["required"]
    rows = reg.param_schema("fir_filter")
    by = {r["name"]: r for r in rows}
    assert by["x"]["role"] == "input" and by["taps"]["required"]


@pytest.mark.slow
def test_param_schema_builds_for_entire_catalog():
    """Every registry block yields a schema without raising; blocks
    with introspectable callables yield at least one row."""
    from r4w_tpu.registry import default_registry

    reg = default_registry()
    empty = []
    for info in reg.list():
        rows = reg.param_schema(info.name)
        assert isinstance(rows, list)
        for r in rows:
            assert {"name", "type", "default", "required",
                    "role", "doc"} <= set(r)
        if not rows:
            empty.append(info.name)
    # a handful of object factories have no introspectable signature;
    # keep that tail bounded
    assert len(empty) <= 30, (len(empty), empty[:15])
