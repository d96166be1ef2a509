"""Known-answer + roundtrip tests for the Link-16 TDMA/CCSK/RS stack and
the SINCGARS data-mode framing (VERDICT r1 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.waveforms import create_waveform
from r4w_tpu.waveforms import link16 as l16
from r4w_tpu.waveforms.milfh_waveforms import (
    SINCGARS_DATA_MODES,
    Sincgars,
    SincgarsDataFramer,
    sincgars_demodulate_data,
    sincgars_modulate_data,
)

pytestmark = pytest.mark.slow  # heavy integration lane

DATA = bytes([0xA7, 0x1B, 0x3C, 0xD2])


class TestLink16:
    def test_tdma_constants(self):
        wf = l16.Link16()
        assert wf.slot_samples == 78125           # 7.8125 ms @ 10 Msps
        assert l16.SLOTS_PER_FRAME == 1536        # 96 epochs × 16 slots
        assert l16.PULSES_PER_SLOT_P2 == 258      # packed-2
        assert l16.DP_PER_SLOT == 16 + 4 + 16 + 93
        assert wf.burst_samples == 64             # 6.4 µs @ 10 Msps
        assert wf.pulse_window_samples == 130     # 13 µs

    def test_frequency_set(self):
        assert l16.NUM_FREQUENCIES == 51
        assert l16.BASE_FREQ_HZ == 969e6
        assert l16.FREQ_SPACING_HZ == 3e6

    def test_ccsk_base_known_answer(self):
        base = l16.ccsk_base()
        assert base.shape == (32,)
        assert base[:12].tolist() == [1, 1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 1]
        assert base[-1] == 0  # balancing chip
        # balanced: 16 ones / 16 zeros
        assert int(base.sum()) == 16

    def test_ccsk_cross_correlation(self):
        t = l16.ccsk_table()
        gram = t @ t.T
        assert np.allclose(np.diag(gram), 32.0)
        off = gram - np.diag(np.diag(gram))
        assert np.abs(off).max() <= 8.0  # m-sequence-derived shifts

    def test_rs_31_15_corrects_8_symbols(self):
        data = np.arange(15, dtype=np.int32) % 32
        cw = l16.rs_encode_data(data)
        assert cw.shape == (31,)
        bad = cw.copy()
        bad[[0, 3, 7, 12, 18, 22, 27, 30]] ^= np.int32(21)
        dec, n = l16.rs_decode_data(bad)
        assert n == 8 and dec.tolist() == data.tolist()
        worse = cw.copy()
        worse[:9] ^= np.int32(13)
        _, n = l16.rs_decode_data(worse)
        assert n == -1  # beyond t=8: detected failure

    def test_rs_header_shortened_16_7(self):
        data = np.asarray([3, 14, 15, 9, 2, 6, 5], np.int32)
        cw = l16.rs_encode_header(data)
        assert cw.shape == (16,)
        bad = cw.copy()
        bad[[1, 5, 9, 14]] ^= np.int32(17)
        dec, n = l16.rs_decode_header(bad)
        assert n == 4 and dec.tolist() == data.tolist()

    def test_slot_symbol_structure(self):
        wf = l16.Link16()
        bits = np.zeros(l16.SLOT_PAYLOAD_BITS, np.int32)
        syms = wf.slot_symbols(bits)
        assert syms.shape == (129,)
        assert tuple(syms[:16]) == l16.SYNC_SYMBOLS
        assert tuple(syms[16:20]) == l16.REFINE_SYMBOLS
        assert (syms >= 0).all() and (syms < 32).all()

    def test_data_interleave_bijection(self):
        p = l16.data_interleave_pattern()
        assert sorted(p.tolist()) == list(range(93))
        # symbols of one RS word spread at stride 32 around the slot
        assert p[:4].tolist() == [0, 32, 64, 3]

    def test_roundtrip_clean(self):
        wf = create_waveform("Link-16")
        res = wf.demodulate(wf.modulate(DATA))
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)
        assert res.metadata["sync_fraction"] == 1.0
        assert res.metadata["slots"] == 1

    def test_roundtrip_awgn(self):
        wf = create_waveform("Link-16")
        rx = awgn(jax.random.key(2), wf.modulate(DATA), -6.0)
        res = wf.demodulate(rx)
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_pulse_jamming_rs_recovery(self):
        """Zeroing 8 double pulses (24 µs of jamming) splits across the
        three interleaved RS words and stays within t=8 per word."""
        wf = l16.Link16()
        tx = np.array(wf.modulate(DATA))  # writable host copy
        win = wf.pulse_window_samples
        start = (l16.SYNC_DP + l16.REFINE_DP + l16.HEADER_DP) * 2 * win
        for dp in range(8):
            a = start + dp * 2 * win
            tx[a:a + 2 * win] = 0
        res = wf.demodulate(jnp.asarray(tx))
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)
        # 8 erased symbols; >=7 decode to wrong values and get corrected
        assert res.metadata["rs_symbols_corrected"] >= 7

    def test_multislot(self):
        wf = create_waveform("Link-16")
        payload = bytes(range(60))  # > 210 bits -> 3 slots
        tx = wf.modulate(payload)
        assert tx.shape[0] == 3 * wf.slot_samples
        res = wf.demodulate(tx)
        assert np.asarray(res.bits)[: len(payload)].tolist() == list(payload)


class TestSincgarsData:
    def test_mode_table(self):
        assert SINCGARS_DATA_MODES[75] == 75
        assert SINCGARS_DATA_MODES[4800] == 480
        assert SINCGARS_DATA_MODES[16000] == 1600

    def test_crc_reference_algorithm(self):
        """Bitwise CRC-16/CCITT (init 0xFFFF, xorout 0xFFFF) exactly as
        sincgars/data.rs:254-268 computes it."""
        from r4w_tpu.waveforms.milfh_waveforms import _sincgars_crc

        def ref_crc(data: bytes) -> int:
            crc = 0xFFFF
            for byte in data:
                crc ^= byte << 8
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x1021 if crc & 0x8000
                           else crc << 1) & 0xFFFF
            return crc ^ 0xFFFF

        for vec in (b"123456789", b"\x00", b"SINCGARS", bytes(range(32))):
            assert _sincgars_crc(vec) == ref_crc(vec), vec

    def test_frame_wire_format(self):
        fr = SincgarsDataFramer(1200, use_fec=False)
        frame = fr.frame_data(b"AB")[0]
        bits = fr.frame_to_bits(frame)
        wire = np.packbits(bits.astype(np.uint8)).tobytes()
        assert wire[:3] == b"\xaa\xaa\x7e"     # preamble
        assert wire[3] == 0x00 and wire[4] == 0x00  # type=data, seq=0
        assert wire[5] == 2                     # payload length
        assert wire[6:8] == b"AB"

    def test_frame_roundtrip_and_sequence(self):
        fr = SincgarsDataFramer(1200)
        frames = fr.frame_data(bytes(range(200)))
        assert len(frames) > 1
        assert [f.sequence for f in frames] == list(range(len(frames)))
        for f in frames:
            back = fr.bits_to_frame(fr.frame_to_bits(f))
            assert back.payload == f.payload and back.sequence == f.sequence

    def test_fec_corrects_channel_errors(self):
        fr = SincgarsDataFramer(600)
        frame = fr.frame_data(b"FEC TEST")[0]
        bits = fr.frame_to_bits(frame)
        bad = bits.copy()
        bad[::97] ^= 1  # scattered errors
        assert fr.bits_to_frame(bad).payload == b"FEC TEST"

    def test_crc_rejects_corruption(self):
        fr = SincgarsDataFramer(1200, use_fec=False)
        frame = fr.frame_data(b"PAYLOAD")[0]
        bits = fr.frame_to_bits(frame)
        bits[60] ^= 1  # flip a payload bit; no FEC to fix it
        with pytest.raises(ValueError):
            fr.bits_to_frame(bits)

    def test_phy_end_to_end(self):
        radio = Sincgars()
        iq, flen = sincgars_modulate_data(radio, b"TACTICAL DATA", 1200)
        rx = awgn(jax.random.key(4), iq, 10.0)
        out = sincgars_demodulate_data(radio, rx, flen, 1200)
        assert out and out[0].payload == b"TACTICAL DATA"
        assert out[0].sequence == 0
