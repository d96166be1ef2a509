"""LNAV subframe 1-3 ephemeris encode/decode, streaming frame sync,
bit-edge recovery, and transmit-time bookkeeping (VERDICT r4 #2 —
beyond nav_message.rs:51/231 which stop at preamble search + subframe-1
clock words)."""

import numpy as np
import pytest

from r4w_tpu.gnss import nav_message as nm
from r4w_tpu.gnss.coordinates import lla_to_ecef
from r4w_tpu.gnss.ephemeris import (BroadcastEphemeris,
                                    circular_ephemeris_for_position)


def _geometry(seed=0, n=6):
    rng = np.random.default_rng(seed)
    rcv = np.asarray(lla_to_ecef(45.0, 7.0, 250.0))
    up = rcv / np.linalg.norm(rcv)
    sats = []
    for _ in range(n):
        los = rng.normal(size=3)
        los /= np.linalg.norm(los)
        if los @ up < 0.4:
            los = 0.7 * up + 0.3 * los
            los /= np.linalg.norm(los)
        b = 2 * rcv @ los
        c = rcv @ rcv - 26_560e3 ** 2
        t = (-b + np.sqrt(b * b - 4 * c)) / 2
        sats.append(rcv + t * los)
    return rcv, np.asarray(sats)


class TestParityConvention:
    def test_parity_sums_source_bits_is_polarity_invariant(self):
        """IS-GPS-200 §20.3.5: parity XORs SOURCE bits; a globally
        inverted word (with inverted D29*/D30*) must still validate
        and recover identical data — the property real receivers use
        to sidestep the 180° carrier ambiguity."""
        rng = np.random.default_rng(3)
        for _ in range(20):
            d = rng.integers(0, 2, 24).astype(np.int32)
            d29, d30 = int(rng.integers(0, 2)), int(rng.integers(0, 2))
            w = nm.word_parity(d, d29, d30)
            assert nm.check_parity(w, d29, d30)
            assert nm.check_parity(1 - w, 1 - d29, 1 - d30)
            # recovered data identical under inversion
            assert np.array_equal((1 - w)[:24] ^ (1 - d30),
                                  w[:24] ^ d30)

    def test_chained_subframes_validate_across_boundary(self):
        sf1 = nm.build_subframe(1, 100)
        sf2 = nm.build_subframe(2, 101, d29=int(sf1[-2]),
                                d30=int(sf1[-1]))
        words = sf2.reshape(10, 30)
        assert nm.check_parity(words[0], int(sf1[-2]), int(sf1[-1]))


class TestEphemerisFields:
    def test_sf_field_roundtrip_exact_quantized(self):
        vals = {"week": 231, "iodc": 17, "tgd": -5 * 2.0 ** -31,
                "toc": 9616.0, "af2": 3 * 2.0 ** -55,
                "af1": -7 * 2.0 ** -43, "af0": 417 * 2.0 ** -31}
        sf = nm.encode_subframe_fields(1, vals, tow_count=1601)
        out = nm.decode_subframe_fields(sf)
        assert out["subframe_id"] == 1 and out["tow_count"] == 1601
        for k, v in vals.items():
            assert out[k] == pytest.approx(v, abs=0), k

    def test_signed_fields_negative(self):
        sf = nm.encode_subframe_fields(
            2, {"m0": -0.73, "delta_n": -1e-9 / nm.SEMI * nm.SEMI,
                "crs": -87.3125, "e": 0.0123,
                "sqrt_a": 5153.7, "toe": 9616.0}, tow_count=5)
        out = nm.decode_subframe_fields(sf)
        assert out["m0"] == pytest.approx(-0.73, abs=2.0 ** -31)
        assert out["crs"] == pytest.approx(-87.3125, abs=2.0 ** -5)
        assert out["e"] == pytest.approx(0.0123, abs=2.0 ** -33)
        assert out["sqrt_a"] == pytest.approx(5153.7, abs=2.0 ** -19)

    def test_field_overflow_raises(self):
        with pytest.raises(ValueError):
            nm.encode_subframe_fields(2, {"sqrt_a": 1e4}, tow_count=1)

    def test_ephemeris_bits_roundtrip_position(self):
        """encode → frame_sync → decode → IS-GPS position within the
        documented quantization (~cm)."""
        rcv, sats = _geometry()
        t_eval = 9618.3
        for i, p in enumerate(sats[:3]):
            eph = circular_ephemeris_for_position(
                p, rcv, t_eval, prn=i + 1, af0=(i - 1) * 1e-7)
            bits = nm.build_ephemeris_frames(eph, week=231,
                                             tow_count_sf1=1601)
            frames = nm.frame_sync(bits)
            assert [f.subframe_id for f in frames] == [1, 2, 3]
            sfs = {f.subframe_id: nm.decode_subframe_fields(f.bits)
                   for f in frames}
            eph2 = nm.ephemeris_from_subframes(sfs[1], sfs[2], sfs[3],
                                               prn=i + 1)
            assert np.linalg.norm(eph2.position(t_eval) - p) < 0.5
            assert eph2.af0 == pytest.approx((i - 1) * 1e-7,
                                             abs=2.0 ** -31)


class TestCircularEphemeris:
    def test_position_exact_and_velocity_perp_los(self):
        rcv, sats = _geometry(seed=4)
        t_eval = 345_616.2
        for p in sats:
            eph = circular_ephemeris_for_position(p, rcv, t_eval)
            assert np.linalg.norm(eph.position(t_eval) - p) < 1e-6
            v = eph.position(t_eval + 0.5) - eph.position(t_eval - 0.5)
            los = (p - rcv) / np.linalg.norm(p - rcv)
            assert abs(v @ los) < 0.01  # m/s along LOS
            # range insensitive to ±50 ms evaluation-epoch error
            for dt in (-0.05, 0.05):
                r2 = np.linalg.norm(eph.position(t_eval + dt) - rcv)
                r0 = np.linalg.norm(p - rcv)
                assert abs(r2 - r0) < 0.01

    def test_toe_snapped_to_field_scale(self):
        rcv, sats = _geometry(seed=5, n=1)
        eph = circular_ephemeris_for_position(sats[0], rcv, 9618.3)
        assert eph.toe % 16.0 == 0.0

    def test_target_range_rate_matched(self):
        """range_rate_mps orients the along-track velocity so the ECEF
        range rate toward the receiver equals the target (the seam for
        Doppler-spread scenarios, tools/dual_pvt.py)."""
        rcv, sats = _geometry(seed=6)
        t_eval = 345_616.2
        for p, rdot in zip(sats, (-90.0, -30.0, 45.0, 85.0)):
            eph = circular_ephemeris_for_position(
                p, rcv, t_eval, range_rate_mps=rdot)
            assert np.linalg.norm(eph.position(t_eval) - p) < 1e-6
            r_m = np.linalg.norm(eph.position(t_eval - 0.25) - rcv)
            r_p = np.linalg.norm(eph.position(t_eval + 0.25) - rcv)
            assert (r_p - r_m) / 0.5 == pytest.approx(rdot, abs=0.05)


class TestFrameSync:
    def _stream(self, offset=137, polarity=0, seed=1):
        rcv, sats = _geometry(seed=2, n=1)
        eph = circular_ephemeris_for_position(sats[0], rcv, 9618.3)
        bits = nm.build_ephemeris_frames(eph, week=1, tow_count_sf1=1601)
        rng = np.random.default_rng(seed)
        return np.concatenate([
            rng.integers(0, 2, offset), bits ^ polarity,
            rng.integers(0, 2, 60)]).astype(np.int32), bits

    def test_finds_frames_any_offset_both_polarities(self):
        for pol in (0, 1):
            for off in (0, 1, 137):
                stream, _ = self._stream(offset=off, polarity=pol)
                frames = nm.frame_sync(stream)
                assert [f.subframe_id for f in frames] == [1, 2, 3]
                assert frames[0].bit_index == off
                assert frames[0].tow_count == 1601
                assert frames[1].parity_ok and frames[2].parity_ok

    def test_rejects_random_bits(self):
        junk = np.random.default_rng(7).integers(0, 2, 6000)
        assert nm.frame_sync(junk.astype(np.int32)) == []

    def test_streaming_class_matches_batch(self):
        stream, _ = self._stream()
        sync = nm.LnavFrameSync()
        got = []
        pm = 1.0 - 2.0 * stream  # feed as ±1 soft signs
        for i in range(0, len(pm), 91):
            got += sync.add_bits(pm[i:i + 91])
        batch = nm.frame_sync(stream)
        assert [(f.bit_index, f.subframe_id, f.tow_count) for f in got] \
            == [(f.bit_index, f.subframe_id, f.tow_count) for f in batch]


class TestBitTiming:
    def test_find_bit_edge_and_bits(self):
        rng = np.random.default_rng(11)
        bits = rng.integers(0, 2, 50)
        edge = 7
        prompts = np.repeat(1.0 - 2.0 * bits, 20)
        prompts = np.concatenate([np.full(edge, prompts[0]), prompts])
        prompts += 0.3 * rng.standard_normal(len(prompts))
        assert nm.find_bit_edge(prompts) == edge
        got = nm.bits_from_prompts(prompts, edge)
        assert np.array_equal(got[:50], bits)

    def test_transmit_time_bookkeeping(self):
        """Synthetic tracked stream with a known transit delay: the
        recovered transmit time must satisfy
        c*(t_rx - t_tx) == range for any probe block."""
        delay_ms = 71.837  # transit, NOT an integer, NOT bit-aligned
        tow_count = 1601
        t_sf = nm.subframe_start_sow(tow_count)  # 9600.0
        rcv, sats = _geometry(seed=2, n=1)
        eph = circular_ephemeris_for_position(sats[0], rcv, 9618.3)
        nav = nm.build_ephemeris_frames(eph, week=1,
                                        tow_count_sf1=tow_count)
        n_blocks = 20000
        m = np.arange(n_blocks)
        # transmit time at block m start (s rel. to nav bit 0 = t_sf)
        t_tx_rel = m * 1e-3 - delay_ms * 1e-3
        bit_idx = np.floor(t_tx_rel / 0.020).astype(int)
        sign = np.where((nav[np.clip(bit_idx, 0, len(nav) - 1)] == 0)
                        | (bit_idx < 0), 1.0, -1.0)
        prompts = sign + 0.0
        code_phase = np.mod(t_tx_rel * 1e3, 1.0) * 1023.0  # chips

        edge = nm.find_bit_edge(prompts)
        bits = nm.bits_from_prompts(prompts, edge)
        frames = nm.frame_sync(bits)
        sf1 = [f for f in frames if f.subframe_id == 1][0]
        for m_star in (9000, 15000, 19001):
            t_tx = nm.transmit_time_at_block(
                m_star, sf1, edge,
                lambda mm: code_phase[mm] )
            t_rx = t_sf + m_star * 1e-3  # receiver clock = GPS time
            rho_ms = (t_rx - t_tx) * 1e3
            assert rho_ms == pytest.approx(delay_ms, abs=1e-6)
