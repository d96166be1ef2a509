"""Mesh networking, block registry, plugin system, spectrum analysis."""

import os
import textwrap

import numpy as np
import pytest

from r4w_tpu import analysis, mesh
from r4w_tpu.registry import (
    BlockCategory,
    BlockRegistry,
    PluginManager,
    default_registry,
)


# ------------------------------------------------------------------- mesh


def test_packet_wire_roundtrip_and_crc():
    p = mesh.MeshPacket(src=1, dst=2, packet_id=42, hop_limit=3,
                        want_ack=True, payload=b"hello mesh")
    raw = p.encode()
    q = mesh.MeshPacket.decode(raw)
    assert q.src == 1 and q.dst == 2 and q.packet_id == 42
    assert q.want_ack and q.payload == b"hello mesh"
    # corrupt a byte -> CRC rejects
    bad = bytearray(raw); bad[5] ^= 0xFF
    assert mesh.MeshPacket.decode(bytes(bad)) is None


def test_flood_routing_multi_hop_line_topology():
    sim = mesh.MeshSimulation()
    for nid in (1, 2, 3, 4):
        sim.add_node(nid)
    sim.connect(1, 2); sim.connect(2, 3); sim.connect(3, 4)
    sim.nodes[1].send(4, b"end to end")
    sim.run()
    got = [p.payload for p in sim.nodes[4].inbox]
    assert b"end to end" in got
    # duplicate suppression: node 4 received it exactly once
    assert got.count(b"end to end") == 1
    # hop-limited flood should not echo forever
    assert sim.round < 10


def test_ack_and_neighbor_learning():
    sim = mesh.MeshSimulation()
    a = sim.add_node(10)
    b = sim.add_node(20)
    sim.connect(10, 20, snr_db=7.5)
    a.send(20, b"ping", want_ack=True)
    sim.run()
    # b heard a as neighbor with the link SNR
    assert 10 in b.neighbors
    assert abs(b.neighbors[10].snr_db - 7.5) < 1.0
    # a got the ACK back
    assert any(p.payload.startswith(b"\x02ACK:") for p in a.inbox)


def test_hop_limit_prevents_delivery():
    sim = mesh.MeshSimulation()
    for nid in (1, 2, 3, 4, 5):
        sim.add_node(nid, hop_limit=2)
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
        sim.connect(a, b)
    sim.nodes[1].send(5, b"too far")
    sim.run()
    assert not sim.nodes[5].inbox  # 4 hops needed, only 2 allowed


def test_traceroute_accumulates_relays():
    sim = mesh.MeshSimulation()
    for nid in (1, 2, 3):
        sim.add_node(nid)
    sim.connect(1, 2); sim.connect(2, 3)
    sim.nodes[1].traceroute(3)
    sim.run()
    tr = [p for p in sim.nodes[3].inbox if p.payload.startswith(b"\x01TRACE:")]
    assert tr
    hops = np.frombuffer(tr[0].payload[7:], np.uint32)
    assert 2 in hops


def test_store_and_forward():
    node = mesh.MeshNode(1)
    pkt = node.send(99, b"queued")
    node.outbox.clear()
    node.store_for(99, pkt)
    assert not node.outbox
    released = node.flush_store(99)
    assert released and node.outbox


def test_lossy_link_statistics():
    sim = mesh.MeshSimulation(seed=1)
    a = sim.add_node(1); b = sim.add_node(2)
    sim.connect(1, 2, loss=0.5)
    for i in range(40):
        a.send(2, bytes([i]))
    sim.run(max_rounds=2)
    # roughly half the packets arrive
    assert 5 < len(b.inbox) < 35


# ---------------------------------------------------------------- registry


def test_default_registry_catalog():
    reg = default_registry()
    cats = reg.categories()
    assert cats[BlockCategory.FILTER] >= 5
    assert cats[BlockCategory.MODULATOR] >= 40
    info = reg.get("pfb_channelizer")
    assert info.category == BlockCategory.RESAMPLER
    with pytest.raises(KeyError):
        reg.create("not_a_block")


def test_registry_creates_waveform_block():
    reg = default_registry()
    wf = reg.create("mod_qpsk", sample_rate=48_000.0)
    tx = wf.modulate(b"ok")
    assert tx.shape[-1] > 0


# ----------------------------------------------------------------- plugins


def test_plugin_load_and_factory_extension(tmp_path):
    plug = tmp_path / "my_wave.py"
    plug.write_text(textwrap.dedent("""
        R4W_PLUGIN = {"name": "my_wave", "version": "1.0",
                      "api_version": 1, "waveforms": ("MYWAVE",)}

        def register(register_waveform):
            import dataclasses, jax.numpy as jnp
            from r4w_tpu.core.types import CommonParams
            from r4w_tpu.waveforms.base import (DemodResult, Waveform,
                                                WaveformInfo)

            @dataclasses.dataclass(frozen=True)
            class MyWave(Waveform):
                common: CommonParams = CommonParams()

                @property
                def common_params(self):
                    return self.common

                def samples_per_symbol(self):
                    return 1

                def info(self):
                    return WaveformInfo(name="MYWAVE", full_name="test")

                def modulate(self, data):
                    return jnp.ones(8, jnp.complex64)

                def demodulate(self, samples):
                    z = jnp.zeros(0, jnp.int32)
                    return DemodResult(bits=z, symbols=z)

            @register_waveform("MYWAVE")
            def _build(sample_rate):
                return MyWave(common=CommonParams(sample_rate=sample_rate))
    """))
    pm = PluginManager(search_paths=(str(tmp_path),))
    found = pm.discover_plugins()
    assert len(found) == 1
    infos = pm.load_all()
    assert infos and infos[0].name == "my_wave"
    from r4w_tpu.waveforms import create_waveform

    wf = create_waveform("MYWAVE")
    assert wf is not None and wf.modulate(b"").shape == (8,)


def test_plugin_bad_api_version_rejected(tmp_path):
    (tmp_path / "bad.py").write_text(
        'R4W_PLUGIN = {"name": "bad", "version": "1", "api_version": 99}\n'
        "def register(r):\n    pass\n"
    )
    pm = PluginManager(search_paths=(str(tmp_path),))
    assert pm.load_all() == []
    assert "api_version" in pm.errors["bad"]


# ---------------------------------------------------------------- analysis


def test_spectrum_analyzer_two_tones():
    fs = 100_000.0
    t = np.arange(32768) / fs
    x = (np.exp(2j * np.pi * 10_000 * t)
         + 0.3 * np.exp(-2j * np.pi * 20_000 * t)).astype(np.complex64)
    sa = analysis.SpectrumAnalyzer(fs, fft_size=1024)
    res = sa.compute(x, n_peaks=2)
    freqs = sorted(p.freq_hz for p in res.peaks)
    assert abs(freqs[1] - 10_000) < fs / 1024 * 2
    assert abs(freqs[0] + 20_000) < fs / 1024 * 2
    assert res.bandwidth_3db_hz < 1500.0
    # renderings
    assert "freq_hz,psd_db" in res.to_csv().splitlines()[0]
    assert '"peaks"' in res.to_json()
    art = res.to_ascii()
    assert "#" in art


def test_waterfall_shows_sweep():
    fs = 50_000.0
    n = 20_000
    t = np.arange(n) / fs
    f = np.linspace(-15_000, 15_000, n)
    phase = 2 * np.pi * np.cumsum(f) / fs
    x = np.exp(1j * phase).astype(np.complex64)
    wf = analysis.Waterfall(fs, fft_size=128)
    img = wf.compute(x)
    assert img.shape[1] == 128
    peaks = np.argmax(img, axis=1)
    assert peaks[-1] > peaks[0]  # rising sweep moves across bins
    art = wf.to_ascii(x)
    assert len(art.splitlines()) > 4


# ---------------------------------------------- native C-ABI plugins


def test_native_plugin_load_and_roundtrip(tmp_path):
    """Build the shipped example C plugin, load it through the
    PluginManager's C-ABI path, and roundtrip through the factory."""
    import subprocess

    from r4w_tpu.registry import PluginManager
    from r4w_tpu.waveforms import create_waveform

    src_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "r4w_tpu", "native")
    so = tmp_path / "libr4w_example_plugin.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-I", src_dir,
         "-o", str(so), os.path.join(src_dir, "example_plugin.cpp")],
        check=True, capture_output=True, timeout=120)

    pm = PluginManager(search_paths=[str(tmp_path)])
    info = pm.load_native_plugin(str(so))
    assert info is not None, pm.errors
    assert info.name == "example-native"
    assert info.waveforms == ("manchester-ook",)

    wf = create_waveform("manchester-ook", 125_000.0)
    assert wf is not None
    payload = bytes([0xC3, 0x5A, 0x0F])
    tx = wf.modulate(payload)
    assert tx.shape[0] == 3 * 8 * 2 * 8  # bits x halves x sps
    res = wf.demodulate(tx)
    assert np.asarray(res.bits)[:3].tolist() == list(payload)


def test_native_plugin_api_version_rejected(tmp_path):
    import subprocess

    from r4w_tpu.registry import PluginManager

    bad = tmp_path / "bad.cpp"
    bad.write_text(
        '#include <cstdint>\n'
        'extern "C" uint32_t r4w_plugin_api_version() { return 99; }\n')
    so = tmp_path / "libbad.so"
    subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", str(so),
                    str(bad)], check=True, capture_output=True,
                   timeout=120)
    pm = PluginManager(search_paths=[str(tmp_path)])
    assert pm.load_native_plugin(str(so)) is None
    assert "api_version" in list(pm.errors.values())[0]
