"""Tests for scrambler/whitener and packet/protocol fills."""

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import packets as pk
from r4w_tpu.ops import scramblers as sc


class TestScramblers:
    def test_additive_scrambler_self_inverse(self):
        rng = np.random.default_rng(0)
        bits = jnp.asarray(rng.integers(0, 2, 500), jnp.int32)
        s = sc.additive_scramble(bits, taps=0b1100000, seed=0x7F, nbits=7)
        assert int(jnp.sum(s != bits)) > 100  # actually scrambled
        back = sc.additive_scramble(s, taps=0b1100000, seed=0x7F, nbits=7)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))

    def test_pn_scrambler_roundtrip_and_selfsync(self):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, 400)
        s = np.asarray(sc.pn_scramble(bits, taps=0x21, seed=0x5A, nbits=7))
        back = np.asarray(sc.pn_descramble(s, taps=0x21, seed=0x5A,
                                           nbits=7))
        np.testing.assert_array_equal(back, bits)
        # self-sync: descrambler with WRONG seed recovers after nbits
        back2 = np.asarray(sc.pn_descramble(s, taps=0x21, seed=0x00,
                                            nbits=7))
        np.testing.assert_array_equal(back2[7:], bits[7:])

    def test_lcg_whitener_self_inverse(self):
        data = np.arange(256, dtype=np.uint8)
        w = np.asarray(sc.lcg_whiten(data))
        assert (w != data).sum() > 200
        back = np.asarray(sc.lcg_whiten(w))
        np.testing.assert_array_equal(back, data)

    def test_glfsr_full_period(self):
        # degree-4 Galois LFSR with primitive poly has period 15
        seq = np.asarray(sc.glfsr_source(taps=0b1001, seed=1, nbits=4,
                                         n=30))
        np.testing.assert_array_equal(seq[:15], seq[15:30])
        assert 0 < seq[:15].sum() < 15

    def test_gold_alias_extends(self):
        c = sc.gold_code_generator(5, 2, n=40)
        assert c.shape[0] == 40

    def test_crc16_parallel_matches_serial(self):
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (8, 16))
        got = np.asarray(sc.crc16_parallel(jnp.asarray(frames)))

        def serial(data):
            crc = 0xFFFF
            for b in data:
                crc ^= int(b)
                for _ in range(8):
                    crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
            return crc ^ 0xFFFF

        want = [serial(f) for f in frames]
        np.testing.assert_array_equal(got, want)

    def test_fec_generic_api(self):
        assert "golay" in sc.fec_list()
        bits = jnp.asarray(np.random.default_rng(3).integers(0, 2, 12),
                           jnp.int32)
        enc = sc.fec_encode("golay", bits)
        dec = sc.fec_decode("golay", enc)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(bits))

    def test_aes_ctr_roundtrip(self):
        key = bytes(range(32))
        nonce = b"\x01" * 16
        ct = sc.aes_ctr_keystream_xor(b"hello world", key, nonce)
        assert ct != b"hello world"
        assert sc.aes_ctr_keystream_xor(ct, key, nonce) == b"hello world"

    def test_covert_timing_roundtrip(self):
        bits = [1, 0, 1, 1, 0, 0, 1]
        ev = sc.covert_timing_encode(bits, base_interval=100, delta=40)
        back = np.asarray(sc.covert_timing_decode(ev, 100, 40))
        np.testing.assert_array_equal(back, bits)


class TestPackets:
    def test_packet_roundtrip_and_errors(self):
        f = pk.packet_encode(b"payload!")
        p, err = pk.packet_decode(b"\x00\x01" + f)
        assert p == b"payload!" and err is None
        bad = bytearray(f)
        bad[-3] ^= 0xFF
        p2, err2 = pk.packet_decode(bytes(bad))
        assert p2 is None and err2 == "crc"
        sink = pk.PacketSink()
        sink.push(f)
        sink.push(bytes(bad))
        assert len(sink.packets) == 1 and sink.errors == 1

    def test_header_payload_demux(self):
        h, p = pk.header_payload_demux(b"HHHHpayload", 4)
        assert h == b"HHHH" and p == b"payload"

    def test_protocol_format_parse(self):
        d = {"freq": "100", "mode": "fm"}
        for fmt in ("kv", "json"):
            assert pk.protocol_parse(pk.protocol_format(d, fmt), fmt) == d

    def test_telemetry_roundtrip(self):
        f = pk.telemetry_frame([1.23, -4.56, 78.9], frame_id=7)
        fid, vals = pk.telemetry_parse(f)
        assert fid == 7
        np.testing.assert_allclose(vals, [1.23, -4.56, 78.9], atol=0.01)

    def test_random_pdu(self):
        p = pk.random_pdu(jax.random.key(0), 8, 16)
        assert 8 <= len(p) <= 16

    def test_ccsds_roundtrip(self):
        f = pk.ccsds_frame_encode(b"\xde\xad\xbe\xef", scid=0x155, vcid=3)
        scid, vcid, payload = pk.ccsds_frame_decode(b"junk" + f)
        assert scid == 0x155 and vcid == 3 and payload == b"\xde\xad\xbe\xef"
        assert pk.ccsds_frame_decode(f[:-1] + b"\x00") is None

    def test_dvb_s2_deframer(self):
        h = pk.dvb_s2_bbheader(4, 16000)
        mod, rate, dfl = pk.dvb_s2_deframe(h + b"\x00" * 10)
        assert (mod, rate, dfl) == ("QPSK", "1/2", 16000)
        assert pk.dvb_s2_deframe(b"\x00" * 8) is None

    def test_zigbee_frame_roundtrip(self):
        f = pk.zigbee_frame_build(b"sensor", seq=42, dst=0xBEEF,
                                  src=0x0010)
        info = pk.zigbee_frame_parse(f)
        assert info["fcs_ok"] and info["type"] == "data"
        assert info["seq"] == 42 and info["dst"] == 0xBEEF
        assert info["src"] == 0x0010 and info["payload"] == b"sensor"
        bad = bytearray(f)
        bad[5] ^= 1
        assert not pk.zigbee_frame_parse(bytes(bad))["fcs_ok"]

    def test_pocsag_roundtrip(self):
        words = pk.pocsag_encode_numeric(1234568, "0425 1234",
                                         function=2)
        addr, func, nibbles, valid = pk.pocsag_decode(words)
        assert int(addr) == 1234568 and int(func) == 2
        assert pk.pocsag_digits_to_str(nibbles, valid) == "0425 1234"

    def test_psk31_varicode_roundtrip(self):
        msg = "cq cq de r4w"
        bits = pk.psk31_encode(msg)
        assert pk.psk31_decode(bits) == msg
        # no varicode word contains 00
        for ch, code in pk._VARICODE.items():
            assert "00" not in code

    def test_noaa_apt_lines_shape(self):
        fs = 11025.0
        t = np.arange(int(fs * 2)) / fs
        # 2.4 kHz subcarrier AM-modulated by a slow raster pattern
        pattern = 0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 4 * t))
        audio = (pattern * np.sin(2 * np.pi * 2400 * t)).astype(np.float32)
        img = np.asarray(pk.noaa_apt_lines(jnp.asarray(audio), fs))
        assert img.shape == (4, int(fs / 2))
        assert img.max() > 200 and img.min() < 50

    def test_meteor_burst_detect(self):
        rng = np.random.default_rng(4)
        x = 0.01 * (rng.standard_normal(8192)
                    + 1j * rng.standard_normal(8192))
        x[2048:2560] += 1.0  # a burst opening
        mask, floor = pk.meteor_burst_detect(
            jnp.asarray(x.astype(np.complex64)), frame=256)
        m = np.asarray(mask)
        assert m[8] and m[9] and m.sum() <= 3

    def test_sigfox_roundtrip(self):
        f = pk.sigfox_frame_build(0xCAFEBABE, 5, b"\x01\x02\x03")
        dev, seq, payload = pk.sigfox_frame_parse(b"\xaa" + f)
        assert dev == 0xCAFEBABE and seq == 5 and payload == b"\x01\x02\x03"

    def test_tagged_stream_utilities(self):
        x, tags = pk.stream_to_tagged(jnp.arange(12), 4)
        assert tags == [(0, {"len": 4}), (4, {"len": 4}), (8, {"len": 4})]
        y, t2 = pk.tagged_stream_align(jnp.arange(12),
                                       [(2, {"other": 1}),
                                        (4, {"len": 8})])
        assert int(y[0]) == 4 and t2 == [(0, {"len": 8})]
        stream, t3 = pk.tagged_stream_mux([jnp.ones(3), jnp.zeros(2)])
        assert stream.shape[0] == 5 and t3[1] == (3, {"len": 2})
        t4 = pk.tagged_stream_multiply_length(t3, 2)
        assert t4[1] == (6, {"len": 4})
        merged = pk.tag_share(t3, [(1, {"x": 1})])
        assert merged[1] == (1, {"x": 1})
        assert "@0" in pk.tag_debug(t3)

    def test_file_meta_and_tagged_sink(self, tmp_path):
        x = np.arange(16, dtype=np.float32)
        p = str(tmp_path / "data.bin")
        pk.file_meta_write(p, x, {"fs": 1000})
        back, meta = pk.file_meta_read(p)
        np.testing.assert_array_equal(back, x)
        assert meta["fs"] == 1000
        pk.tagged_file_sink(p, x, [(0, {"len": 16})])
        import json
        with open(p + ".tags.json") as f:
            assert json.load(f) == [[0, {"len": 16}]]
