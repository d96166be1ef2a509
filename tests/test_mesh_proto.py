"""Meshtastic protobuf app layer (mesh_proto.py vs proto/messages.rs,
proto/portnum.rs): wire-format known answers, prost-style default
omission, roundtrips, and end-to-end through the AES-256-CTR radio
frame."""

import pytest

from r4w_tpu.mesh_proto import (AirQualityMetrics, Data, DeviceMetrics,
                                EnvironmentMetrics, LocalStats, PortNum,
                                Position, PowerMetrics, Telemetry, User,
                                classify_payload)


def test_data_text_known_bytes():
    # field 1 varint 1 (TEXT), field 2 len-delim "hi" — canonical proto
    assert Data.text("hi").encode() == b"\x08\x01\x12\x02hi"


def test_default_fields_omitted():
    # prost omits defaults: an all-default Data encodes to zero bytes
    assert Data().encode() == b""
    assert Position().encode() == b""
    assert User().encode() == b""


def test_data_roundtrip_all_fields():
    d = Data(portnum=int(PortNum.TELEMETRY), payload=b"\x01\x02",
             want_response=True, dest=0xAABBCCDD, source=0x11223344,
             request_id=7, reply_id=9, emoji=0x1F44D, bitfield=5)
    d2 = Data.decode(d.encode())
    assert d2 == d
    assert d2.port == PortNum.TELEMETRY


def test_fixed32_wire_type():
    # dest is fixed32 (tag 4, wire type 5): 4-byte little-endian
    raw = Data(dest=0x01020304).encode()
    assert raw == b"\x25\x04\x03\x02\x01"


def test_position_coords_and_sint32():
    p = Position.from_coords(37.422, -122.084, alt=10)
    p.altitude_hae = -1500     # sint32 zigzag
    p2 = Position.decode(p.encode())
    assert p2.latitude_i == 374220000
    assert p2.longitude_i == -1220840000
    assert abs(p2.latitude - 37.422) < 1e-6
    assert abs(p2.longitude + 122.084) < 1e-6
    assert p2.altitude == 10
    assert p2.altitude_hae == -1500


def test_negative_int32_varint():
    # proto int32: negatives go out as 10-byte two's-complement varints
    p = Position(altitude=-50)
    raw = p.encode()
    assert len(raw) == 11  # 1 tag byte + 10 varint bytes
    assert Position.decode(raw).altitude == -50


def test_sfixed32_negative_latitude():
    p = Position(latitude_i=-1)
    assert p.encode() == b"\x0d\xff\xff\xff\xff"
    assert Position.decode(p.encode()).latitude_i == -1


def test_user_roundtrip_and_truncation():
    u = User.new("!aabbccdd", "LONGNAME", "A" * 60)
    assert u.short_name == "LONG"       # 4-char cap (messages.rs)
    assert len(u.long_name) == 40       # 40-char cap
    u.macaddr = bytes(range(6))
    u.is_licensed = True
    u2 = User.decode(u.encode())
    assert u2 == u


@pytest.mark.parametrize("variant", [
    # float fields are f32 on the wire — use float32-exact values so the
    # roundtrip compares equal
    DeviceMetrics(battery_level=87, voltage=3.875,
                  channel_utilization=12.5, uptime_seconds=3600),
    EnvironmentMetrics(temperature=21.5, relative_humidity=40.0,
                       barometric_pressure=1013.25, iaq=51),
    AirQualityMetrics(pm25_standard=12, co2=415),
    PowerMetrics(ch1_voltage=5.0, ch1_current=0.375),
    LocalStats(uptime_seconds=120, num_packets_tx=17),
])
def test_telemetry_oneof_roundtrip(variant):
    t = Telemetry(time=1_700_000_000, variant=variant)
    t2 = Telemetry.decode(t.encode())
    assert t2.time == t.time
    assert type(t2.variant) is type(variant)
    assert t2.variant == variant


def test_unknown_fields_skipped():
    # a future field (tag 200, varint) must not break decode
    extra = Data.text("ok").encode() + b"\xc0\x0c\x2a"
    d = Data.decode(extra)
    assert d.decode_text() == "ok"


def test_classify_payload_falls_back_to_text():
    port, inner = classify_payload(b"plain old text")
    assert port == PortNum.TEXT
    # valid protobuf Data classifies properly
    port2, inner2 = classify_payload(Data.text("msg").encode())
    assert port2 == PortNum.TEXT and inner2 == b"msg"
    pos = Data.position(Position.from_coords(1.0, 2.0))
    port3, inner3 = classify_payload(pos.encode())
    assert port3 == PortNum.POSITION
    assert Position.decode(inner3).latitude_i == 10_000_000


def test_portnum_values_match_reference():
    # spot-check the portnum table (proto/portnum.rs:15-81)
    assert PortNum.TEXT == 1
    assert PortNum.POSITION == 3
    assert PortNum.NODEINFO == 4
    assert PortNum.REPLY == 32
    assert PortNum.SERIAL == 64
    assert PortNum.TELEMETRY == 67
    assert PortNum.TRACEROUTE == 70
    assert PortNum.PRIVATE_APP == 256
    assert PortNum.MAX == 511
    assert PortNum.from_int(999) == PortNum.UNKNOWN


def test_end_to_end_encrypted_text():
    """Text message protobuf → AES-256-CTR frame → decode on the peer
    (meshtastic.rs:1216-1233 test_protobuf_text_roundtrip role)."""
    from r4w_tpu.mesh_meshtastic import (BROADCAST, MeshtasticNode,
                                         classify_received, send_text)

    a = MeshtasticNode(0x10)
    b = MeshtasticNode(0x20)
    frame = send_text(a, "Hello Meshtastic protobuf!", to=BROADCAST)
    assert b.on_receive(frame, from_neighbor=0x10) is not None  # relays
    [(hdr, port, decoded)] = classify_received(b)
    assert hdr.from_ == 0x10
    assert port == PortNum.TEXT
    assert decoded == "Hello Meshtastic protobuf!"


def test_end_to_end_position_and_telemetry():
    from r4w_tpu.mesh_meshtastic import (MeshtasticNode,
                                         classify_received,
                                         send_position, send_telemetry)

    a = MeshtasticNode(0x11)
    b = MeshtasticNode(0x22)
    b.on_receive(send_position(a, 48.8584, 2.2945, alt=330, to=0x22),
                 from_neighbor=0x11)
    b.on_receive(send_telemetry(
        a, Telemetry(time=123, variant=DeviceMetrics(battery_level=64)),
        to=0x22), from_neighbor=0x11)
    got = classify_received(b)
    assert [p for _, p, _ in got] == [PortNum.POSITION, PortNum.TELEMETRY]
    pos = got[0][2]
    assert abs(pos.latitude - 48.8584) < 1e-6 and pos.altitude == 330
    tel = got[1][2]
    assert tel.variant.battery_level == 64
