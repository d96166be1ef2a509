"""Stream/PDU plumbing: tags, PDUs, mux/demux, message bus, WAV."""

import numpy as np
import pytest

from r4w_tpu import streams as st


def test_pdu_filter_route_set():
    pdus = [st.Pdu(np.arange(4), {"ch": 1}), st.Pdu(np.arange(2), {"ch": 2}),
            st.Pdu(np.arange(3), {"ch": 1})]
    assert len(st.pdu_filter(pdus, "ch", 1)) == 2
    assert len(st.pdu_filter(pdus, "missing")) == 0
    routed = st.pdu_route(pdus, "ch")
    assert sorted(routed) == [1, 2]
    st.pdu_set(pdus, "crc", True)
    assert all(p.meta["crc"] for p in pdus)


def test_stream_pdu_roundtrip():
    x = np.arange(10.0)
    pdus = st.stream_to_pdus(x, [0, 4, 7])
    assert [len(p.data) for p in pdus] == [4, 3, 3]
    y, tags = st.pdus_to_stream(pdus)
    assert np.array_equal(y, x)
    assert [t.offset for t in tags] == [0, 4, 7]


def test_burst_tagger():
    mask = np.asarray([0, 0, 1, 1, 1, 0, 1, 0], bool)
    tags = st.burst_tagger(np.zeros(8), mask)
    assert [(t.offset, t.value) for t in tags] == [
        (2, True), (5, False), (6, True), (7, False)]


def test_head_skip_delay_valve():
    x = np.arange(8.0)
    assert np.array_equal(np.asarray(st.head(x, 3)), [0, 1, 2])
    assert np.array_equal(np.asarray(st.skiphead(x, 6)), [6, 7])
    d = np.asarray(st.delay(x, 2))
    assert np.array_equal(d[:3], [0, 0, 0]) and len(d) == 10
    assert len(st.valve(x, False)) == 0
    assert len(st.valve(x, True)) == 8


def test_stream_mux_demux_roundtrip():
    a = np.arange(6.0)
    b = np.arange(100.0, 109.0)
    muxed = st.stream_mux([a, b], [2, 3])
    outs = st.stream_demux(muxed, [2, 3])
    assert np.array_equal(outs[0], a)
    assert np.array_equal(outs[1], b)


def test_vectors_roundtrip_and_map():
    x = np.arange(12.0)
    v = st.stream_to_vectors(x, 4)
    assert v.shape == (3, 4)
    back = np.asarray(st.vectors_to_stream(v))
    assert np.array_equal(back, x)
    doubled = np.asarray(st.vector_map(v, lambda r: 2 * r))
    assert np.array_equal(doubled, 2 * np.asarray(v))


def test_message_bus_and_strobe():
    bus = st.MessageBus()
    seen = []
    bus.subscribe("ctl", seen.append)
    bus.publish("ctl", {"cmd": "start"})
    st.message_strobe(bus, "ctl", "ping", 3)
    assert seen == [{"cmd": "start"}, "ping", "ping", "ping"]
    assert len(bus.history("ctl")) == 4
    assert bus.history("other") == []


def test_wav_roundtrip(tmp_path):
    fs = 8000
    t = np.arange(1600) / fs
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = str(tmp_path / "tone.wav")
    st.write_wav(p, x, fs)
    y, rate = st.read_wav(p)
    assert rate == fs
    # normalized to peak; compare shapes
    corr = np.corrcoef(x, y[: len(x)])[0, 1]
    assert corr > 0.999


def test_chain_composition():
    f = st.chain(lambda x: st.skiphead(x, 2), lambda x: st.head(x, 3))
    out = np.asarray(f(np.arange(10.0)))
    assert np.array_equal(out, [2, 3, 4])
