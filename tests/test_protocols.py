"""Protocol codec tests: AX.25/HDLC, APRS, SLIP, AIS, ACARS, CTCSS —
known-answer vectors per block (SURVEY §4 pattern)."""

import numpy as np
import pytest

from r4w_tpu.ops import protocols as pr


class TestHdlcAx25:
    def test_crc16_x25_vector(self):
        # standard check value: CRC-16/X25("123456789") = 0x906E
        assert pr.crc16_x25(b"123456789") == 0x906E

    def test_bit_stuffing(self):
        bits = np.asarray([1, 1, 1, 1, 1, 1, 0, 1], np.int32)
        stuffed = pr.hdlc_bit_stuff(bits)
        assert stuffed.tolist() == [1, 1, 1, 1, 1, 0, 1, 0, 1]
        assert pr.hdlc_bit_unstuff(stuffed).tolist() == bits.tolist()

    def test_nrzi_roundtrip(self):
        bits = np.asarray([0, 1, 1, 0, 0, 0, 1], np.int32)
        assert pr.nrzi_decode(pr.nrzi_encode(bits)).tolist() == bits.tolist()

    def test_ax25_roundtrip(self):
        frame = pr.Ax25Frame(dest="APRS", source="N0CALL",
                             info=b">hello from r4w", source_ssid=7)
        levels = pr.ax25_encode(frame)
        back = pr.ax25_decode(levels)
        assert back.source == "N0CALL" and back.dest == "APRS"
        assert back.source_ssid == 7
        assert back.info == b">hello from r4w"
        assert back.control == 0x03 and back.pid == 0xF0

    def test_ax25_fcs_rejects_corruption(self):
        levels = pr.ax25_encode(pr.Ax25Frame("APRS", "N0CALL", b"x"))
        bad = np.asarray(levels).copy()
        bad[40] ^= 1  # flip a bit inside the frame
        with pytest.raises(ValueError):
            pr.ax25_decode(bad)

    def test_aprs(self):
        levels = pr.aprs_encode("K1ABC", "!4903.50N/07201.75W-Test")
        out = pr.aprs_decode(levels)
        assert out["source"] == "K1ABC"
        assert out["type"] == "position"
        assert out["message"].startswith("!4903.50N")


class TestSlip:
    def test_escaping_known_answer(self):
        data = bytes([0x01, pr.SLIP_END, 0x02, pr.SLIP_ESC, 0x03])
        enc = pr.slip_encode(data)
        assert enc == bytes([0xC0, 0x01, 0xDB, 0xDC, 0x02, 0xDB, 0xDD,
                             0x03, 0xC0])
        assert pr.slip_decode(enc) == [data]

    def test_multiframe_stream(self):
        stream = pr.slip_encode(b"one") + pr.slip_encode(b"two")
        assert pr.slip_decode(stream) == [b"one", b"two"]


class TestAis:
    def test_sixbit_armor_roundtrip(self):
        bits = np.asarray([1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 0, 1], np.int32)
        enc = pr._ais_sixbit_encode(bits)
        assert pr._ais_sixbit_decode(enc)[:12].tolist() == bits.tolist()

    def test_position_report_roundtrip(self):
        s = pr.ais_encode_position(mmsi=244_070_156, lat_deg=52.37,
                                   lon_deg=4.90, sog_knots=12.3,
                                   cog_deg=87.0)
        assert s.startswith("!AIVDM,1,1,,A,")
        out = pr.ais_decode(s)
        assert out["msg_type"] == 1
        assert out["mmsi"] == 244_070_156
        assert out["lat_deg"] == pytest.approx(52.37, abs=1e-4)
        assert out["lon_deg"] == pytest.approx(4.90, abs=1e-4)
        assert out["sog_knots"] == pytest.approx(12.3, abs=0.05)
        assert out["cog_deg"] == pytest.approx(87.0, abs=0.05)

    def test_checksum_rejects(self):
        s = pr.ais_encode_position(1, 0.0, 0.0)
        bad = s[:-1] + ("0" if s[-1] != "0" else "1")
        with pytest.raises(ValueError, match="checksum"):
            pr.ais_decode(bad)


class TestAcars:
    def test_roundtrip(self):
        blk = pr.acars_encode("N12345", "Q0", "ETA 1430Z RWY 27L")
        out = pr.acars_decode(blk)
        assert out["registration"] == "N12345"
        assert out["label"] == "Q0"
        assert out["text"] == "ETA 1430Z RWY 27L"

    def test_parity_enforced(self):
        blk = bytearray(pr.acars_encode("N1", "A1", "X"))
        blk[3] ^= 0x80  # break parity
        with pytest.raises(ValueError, match="parity"):
            pr.acars_decode(bytes(blk))

    def test_odd_parity_property(self):
        for c in (0x00, 0x41, 0x7F, 0x55):
            assert bin(pr._acars_parity(c)).count("1") % 2 == 1


class TestCtcss:
    def test_tone_table(self):
        assert len(pr.CTCSS_TONES) == 38
        assert pr.CTCSS_TONES[0] == 67.0 and pr.CTCSS_TONES[-1] == 245.3

    def test_detects_generated_tone(self):
        import jax.numpy as jnp

        fs = 8000.0
        audio = pr.ctcss_generate(123.0, 4000, fs)
        rng = np.random.default_rng(0)
        noisy = np.asarray(audio) + 0.05 * rng.standard_normal(4000)
        tone, metric = pr.ctcss_detect(jnp.asarray(noisy, jnp.float32), fs)
        assert float(tone) == pytest.approx(123.0)
        assert float(metric) > 10.0

    def test_no_tone_below_threshold(self):
        import jax

        noise = jax.random.normal(jax.random.key(0), (4000,))
        tone, _ = pr.ctcss_detect(noise, 8000.0)
        assert float(tone) == -1.0
