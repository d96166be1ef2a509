"""Meshtastic wire-format interop tests (VERDICT r1 item 8): byte-exact
header layout, channel hash, AES-256-CTR with the firmware nonce,
byte-identical frame encode, and next-hop routing over a line topology."""

import struct

import pytest

from r4w_tpu import mesh_meshtastic as mm


class TestWireHeader:
    def test_byte_layout_known_answer(self):
        hdr = mm.WireHeader(to=0xFFFFFFFF, from_=0x12345678,
                            id=0xABCDEF01, hop_limit=3, want_ack=True,
                            hop_start=5, channel_hash=0x5A,
                            next_hop=0x22, relay_node=0x33)
        raw = hdr.to_bytes()
        assert len(raw) == 16
        # to | from | id little-endian
        assert raw[0:4] == b"\xff\xff\xff\xff"
        assert raw[4:8] == bytes([0x78, 0x56, 0x34, 0x12])
        assert raw[8:12] == bytes([0x01, 0xEF, 0xCD, 0xAB])
        # flags: hop_limit=3 | want_ack<<3 | hop_start=5 <<5
        assert raw[12] == (3 | 0x08 | (5 << 5))
        assert raw[13] == 0x5A and raw[14] == 0x22 and raw[15] == 0x33

    def test_roundtrip(self):
        hdr = mm.WireHeader(to=42, from_=7, id=999, hop_limit=2,
                            want_ack=False, via_mqtt=True, hop_start=7,
                            channel_hash=0x11, next_hop=1, relay_node=9)
        back = mm.WireHeader.from_bytes(hdr.to_bytes())
        assert back == hdr

    def test_flags_bit_ranges(self):
        hdr = mm.WireHeader(to=0, from_=0, id=0, hop_limit=7,
                            hop_start=7, via_mqtt=True, want_ack=True)
        assert hdr.flags == 0x07 | 0x08 | 0x10 | 0xE0


class TestChannelCrypto:
    def test_default_psk_value(self):
        assert mm.DEFAULT_PSK.hex() == "d4f1bb3a20290759f0bcffabcf4e6901"

    def test_psk_expansion(self):
        # index 0 -> unencrypted
        k0 = mm.ChannelKey("LongFast", b"\x00")
        assert not k0.encrypted
        # index 1 -> default PSK zero-padded
        k1 = mm.ChannelKey("LongFast", b"\x01")
        assert k1.key[:16] == mm.DEFAULT_PSK and k1.key[16:] == b"\x00" * 16
        # index 5 -> default PSK with last byte replaced
        k5 = mm.ChannelKey("LongFast", b"\x05")
        assert k5.key[15] == 5 and k5.key[:15] == mm.DEFAULT_PSK[:15]
        # 32-byte PSK used directly
        raw = bytes(range(32))
        assert mm.ChannelKey("x", raw).key == raw

    def test_channel_hash_xor_fold(self):
        key = mm.ChannelKey("LongFast")
        name_h = 0
        for b in b"LongFast":
            name_h ^= b
        key_h = 0
        for b in key.key:
            key_h ^= b
        assert key.channel_hash() == name_h ^ key_h

    def test_nonce_layout(self):
        n = mm.make_nonce(0xA1B2C3D4, 0x11223344)
        assert len(n) == 16
        assert n[0:8] == struct.pack("<Q", 0xA1B2C3D4)
        assert n[8:12] == struct.pack("<I", 0x11223344)
        assert n[12:] == b"\x00" * 4

    def test_ctr_roundtrip_and_independence(self):
        ctx = mm.CryptoContext(mm.ChannelKey("LongFast"))
        pt = b"meshtastic payload bytes"
        ct = ctx.encrypt(pt, packet_id=77, source=5)
        assert ct != pt
        assert ctx.decrypt(ct, 77, 5) == pt
        # a different packet id gives a different keystream
        assert ctx.encrypt(pt, 78, 5) != ct

    def test_ctr_known_answer_independent_construction(self):
        """Cross-check against a hand-built AES-256-CTR keystream."""
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)

        key = mm.ChannelKey("LongFast")
        ctx = mm.CryptoContext(key)
        pt = bytes(24)
        got = ctx.encrypt(pt, packet_id=0x01020304, source=0x0A0B0C0D)
        nonce = (struct.pack("<Q", 0x01020304)
                 + struct.pack("<I", 0x0A0B0C0D) + b"\x00" * 4)
        enc = Cipher(algorithms.AES(key.key), modes.CTR(nonce)).encryptor()
        assert got == enc.update(pt) + enc.finalize()


class TestCodec:
    def test_byte_identical_reference_frame(self):
        """Frame bytes must equal header || AES-CTR(payload) built
        independently — the 'byte-identical encode' gate."""
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)

        chan = mm.ChannelKey("LongFast")
        codec = mm.MeshtasticCodec(chan)
        hdr = mm.WireHeader.broadcast(from_=0xDEADBEEF, id=0x12345678,
                                      hop_limit=3,
                                      channel_hash=chan.channel_hash())
        payload = b"hello mesh"
        frame = codec.encode(hdr, payload)

        nonce = (struct.pack("<Q", 0x12345678)
                 + struct.pack("<I", 0xDEADBEEF) + b"\x00" * 4)
        enc = Cipher(algorithms.AES(chan.key), modes.CTR(nonce)).encryptor()
        expected = hdr.to_bytes() + enc.update(payload) + enc.finalize()
        assert frame == expected

    def test_decode_rejects_wrong_channel(self):
        tx = mm.MeshtasticCodec(mm.ChannelKey("LongFast"))
        rx = mm.MeshtasticCodec(mm.ChannelKey("Private", bytes(range(32))))
        hdr = mm.WireHeader.broadcast(1, 2, 3, 0)
        frame = tx.encode(hdr, b"secret")
        with pytest.raises(ValueError, match="channel hash"):
            rx.decode(frame)

    def test_unencrypted_channel(self):
        codec = mm.MeshtasticCodec(mm.ChannelKey("open", b"\x00"))
        hdr = mm.WireHeader.broadcast(9, 10, 3, 0)
        frame = codec.encode(hdr, b"clear")
        assert frame[16:] == b"clear"  # payload in the clear
        _, payload = codec.decode(frame)
        assert payload == b"clear"


class TestNextHopRouting:
    def _line(self, n=4):
        """A(1)-B(2)-C(3)-D(4) line; returns nodes + link map."""
        nodes = {i: mm.MeshtasticNode(i) for i in range(1, n + 1)}
        links = {i: [j for j in (i - 1, i + 1) if 1 <= j <= n]
                 for i in range(1, n + 1)}
        return nodes, links

    def _deliver(self, nodes, links, frames):
        """frames: list of (from_node, frame). Flood until quiescent;
        returns total transmissions."""
        tx = len(frames)
        while frames:
            nxt = []
            for src, frame in frames:
                for nb in links[src]:
                    relay = nodes[nb].on_receive(frame, from_neighbor=src)
                    if relay is not None:
                        nxt.append((nb, relay))
                        tx += 1
            frames = nxt
        return tx

    def test_route_learning_from_broadcast(self):
        nodes, links = self._line()
        frame = nodes[1].send(mm.BROADCAST, b"announce")
        self._deliver(nodes, links, [(1, frame)])
        # everyone hears it
        for i in (2, 3, 4):
            assert nodes[i].received[-1][1] == b"announce"
        # D learned: to reach 1, go via 3, 3 hops
        route = nodes[4].router.routes.get(1)
        assert route is not None
        assert route.next_hop == 3
        assert route.hop_count == 3
        # B learned a direct route to 1
        assert nodes[2].router.routes.get(1).next_hop == 1
        assert nodes[2].router.routes.get(1).hop_count == 1

    def test_direct_packet_uses_next_hop_not_flood(self):
        nodes, links = self._line()
        self._deliver(nodes, links, [(1, nodes[1].send(mm.BROADCAST, b"a"))])
        for n in nodes.values():
            n.tx_count = 0
        frame = nodes[4].send(1, b"direct reply")
        hdr = mm.WireHeader.from_bytes(frame)
        assert hdr.next_hop == 3 & 0xFF  # routed, not flooded
        total_tx = self._deliver(nodes, links, [(4, frame)])
        # delivered to node 1
        assert nodes[1].received[-1][1] == b"direct reply"
        # next-hop chain: D->C->B->A = 3 transmissions (no extra floods)
        assert total_tx == 3
        # relay trail recorded
        assert nodes[1].received[-1][0].relay_node == 2

    def test_unrouted_direct_floods(self):
        nodes, links = self._line()
        frame = nodes[1].send(4, b"no route yet")
        hdr = mm.WireHeader.from_bytes(frame)
        assert hdr.next_hop == 0  # no route known -> flood fallback
        self._deliver(nodes, links, [(1, frame)])
        assert nodes[4].received[-1][1] == b"no route yet"

    def test_duplicate_suppression(self):
        nodes, links = self._line(3)
        frame = nodes[1].send(mm.BROADCAST, b"x")
        self._deliver(nodes, links, [(1, frame)])
        count = len(nodes[3].received)
        # replaying the same frame does nothing
        assert nodes[2].on_receive(frame, from_neighbor=1) is None
        assert len(nodes[3].received) == count

    def test_hop_limit_exhaustion(self):
        nodes = {i: mm.MeshtasticNode(i, hop_limit=1) for i in (1, 2, 3)}
        links = {1: [2], 2: [1, 3], 3: [2]}
        frame = nodes[1].send(mm.BROADCAST, b"short reach")
        self._deliver(nodes, links, [(1, frame)])
        assert nodes[2].received  # 1 hop: B hears it
        # relay from B has hop_limit 0 -> C receives but does not relay
        assert all(len(n.received) <= 1 for n in nodes.values())

    def test_routing_table_eviction_and_prune(self):
        table = mm.RoutingTable(timeout_s=0.0, max_routes=2)
        table.update(mm.Route(1, 9, 2, 0.5))
        assert table.get(1) is None  # instantly expired
        table2 = mm.RoutingTable(timeout_s=100.0, max_routes=2)
        table2.update(mm.Route(1, 9, 2, 0.5))
        table2.update(mm.Route(2, 9, 5, 0.2))
        table2.update(mm.Route(3, 9, 1, 0.9))  # evicts worst (dest 2)
        assert len(table2) == 2
        assert table2.get(2) is None and table2.get(3) is not None

    def test_modem_presets(self):
        assert mm.MODEM_PRESETS["LongFast"] == (11, 250_000.0, 5)
        assert mm.MODEM_PRESETS["ShortFast"][0] == 7
        assert len(mm.MODEM_PRESETS) == 7
