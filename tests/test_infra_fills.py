"""Tests for infra fills, aliases, prelude, and the accelerator seam."""

import threading

import jax.numpy as jnp
import numpy as np

from r4w_tpu.ops import infra_fills as inf


class TestFileIo:
    def test_file_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.iq")
        data = (np.arange(16) + 1j * np.arange(16)).astype(np.complex64)
        inf.file_sink(p, data)
        back = np.asarray(inf.file_source(p))
        np.testing.assert_array_equal(back, data)
        part = np.asarray(inf.file_source(p, count=4, offset_items=2))
        np.testing.assert_array_equal(part, data[2:6])

    def test_fd_roundtrip(self):
        import os
        r, w = os.pipe()
        data = np.arange(8).astype(np.complex64)
        inf.fd_sink(w, data)
        os.close(w)
        back = np.asarray(inf.fd_source(r, 8))
        os.close(r)
        np.testing.assert_array_equal(back, data)

    def test_tcp_link(self):
        src = inf.TcpSource(0)
        port = src.port
        data = np.arange(32).astype(np.complex64)
        result = {}

        def server():
            src.accept()
            result["rx"] = np.asarray(src.recv())

        th = threading.Thread(target=server)
        th.start()
        sink = inf.TcpSink("127.0.0.1", port)
        sink.send(data)
        th.join(timeout=5)
        sink.close()
        src.close()
        np.testing.assert_array_equal(result["rx"], data)

    def test_socket_pdu(self):
        send, recv, close = inf.socket_pdu_pair()
        send(b"hello pdu")
        assert recv() == b"hello pdu"
        close()

    def test_stream_control_gate(self):
        ctl = inf.StreamControl()
        x = jnp.arange(4)
        assert ctl.process(x).shape[0] == 4
        ctl.pause()
        assert ctl.process(x).shape[0] == 0
        ctl.single_step()
        assert ctl.process(x).shape[0] == 4
        assert ctl.process(x).shape[0] == 0
        ctl.resume()
        assert ctl.process(x).shape[0] == 4

    def test_indexed_recorder(self, tmp_path):
        rec = inf.IndexedRecorder(str(tmp_path / "rec.iq"))
        a = np.arange(8).astype(np.complex64)
        b = (np.arange(4) + 5j).astype(np.complex64)
        rec.record(a, freq=100e6)
        rec.record(b, freq=200e6)
        back, meta = rec.read(1)
        np.testing.assert_array_equal(np.asarray(back), b)
        assert meta["freq"] == 200e6
        assert rec.find(freq=100e6) == [0]


class TestHopping:
    def test_hop_pattern_coverage(self):
        pat = np.asarray(inf.hop_pattern_lfsr(50, 500))
        assert pat.min() >= 0 and pat.max() < 50
        assert len(np.unique(pat)) > 40  # visits most channels
        f = np.asarray(inf.hop_frequencies(pat[:4], 900e6, 25e3))
        assert np.all(f >= 900e6) and np.all(f < 900e6 + 50 * 25e3)

    def test_hop_controller_timing(self):
        ctl = inf.FrequencyHoppingController([3, 7, 1], 100,
                                             guard_samples=10)
        assert int(ctl.channel_at(0)) == 3
        assert int(ctl.channel_at(110)) == 7
        assert int(ctl.channel_at(330)) == 3  # wrapped
        assert bool(ctl.in_guard(105))
        assert not bool(ctl.in_guard(50))
        assert np.asarray(ctl.hop_boundaries(300)).tolist() == [0, 110,
                                                                220]


class TestSpeechDpdSimd:
    def test_speech_enhance_beamform_runs(self):
        rng = np.random.default_rng(0)
        fs = 8000.0
        t = np.arange(8000) / fs
        speech = np.sin(2 * np.pi * 400 * t)
        speech[:1500] = 0.0
        mics = np.stack([
            speech + 0.5 * rng.standard_normal(8000),
            np.roll(speech, 2) + 0.5 * rng.standard_normal(8000),
        ]).astype(np.float32)
        out = np.asarray(inf.speech_enhance_beamform(mics, [0, -2], fs))
        assert np.isfinite(out).all()
        # array + postfilter beats a single noisy mic on SNR
        n = min(out.shape[0], 8000)
        err_bf = np.mean((out[3000:n] - speech[3000:n]) ** 2)
        err_raw = np.mean((mics[0][3000:] - speech[3000:]) ** 2)
        assert err_bf < err_raw

    def test_dpd_linearizes_rapp_pa(self):
        from r4w_tpu.ops.impairments import rapp_pa
        rng = np.random.default_rng(1)
        x = 0.45 * (rng.standard_normal(8000)
                   + 1j * rng.standard_normal(8000)).astype(np.complex64)
        y = np.asarray(rapp_pa(jnp.asarray(x), saturation=1.0, smoothness=2.0))
        coef, g = inf.dpd_learn_polynomial(x, y, order=7)
        pre = inf.dpd_apply(jnp.asarray(x), coef)
        y2 = np.asarray(rapp_pa(pre, saturation=1.0, smoothness=2.0))
        # third-order distortion shrinks: compare EVM vs scaled input
        def evm(out):
            gg = np.vdot(out, x) / np.vdot(out, out)
            return np.mean(np.abs(gg * out - x) ** 2)
        assert evm(y2) < 0.5 * evm(y)

    def test_simd_ops(self):
        a = jnp.asarray([1 + 1j])
        b = jnp.asarray([2 - 1j])
        assert complex(inf.cmul(a, b)[0]) == (1 + 1j) * (2 - 1j)
        assert complex(inf.cmac(jnp.asarray([1 + 0j]), a, b)[0]) == \
            1 + (1 + 1j) * (2 - 1j)
        x = jnp.ones(8, jnp.complex64)
        y = np.asarray(inf.rotator_apply(x, np.pi / 4))
        assert abs(y[2] - np.exp(1j * np.pi / 2)) < 1e-6


class TestAliases:
    def test_all_alias_blocks_resolve(self):
        from r4w_tpu.registry import default_registry
        reg = default_registry()
        for name in ("cross_ambiguity_function", "iq_balance",
                     "linear_equalizer", "ml_sequence_detector",
                     "noise_reduction", "phase_noise_model",
                     "power_amplifier_dpd", "tapped_delay_line",
                     "fmcw_radar"):
            info = reg.get(name)
            assert info is not None, name
            assert ".rs" in info.description


class TestPreludeAccel:
    def test_prelude_star_import(self):
        ns = {}
        exec("from r4w_tpu.prelude import *", ns)
        assert "create_waveform" in ns and "awgn" in ns
        wf = ns["create_waveform"]("bpsk", 48000.0)
        assert wf is not None

    def test_accelerator_backends_agree(self):
        from r4w_tpu.accel import create_accelerator
        rng = np.random.default_rng(2)
        x = (rng.standard_normal(256)
             + 1j * rng.standard_normal(256)).astype(np.complex64)
        taps = (rng.standard_normal(16)).astype(np.complex64)
        sim = create_accelerator("sim")
        jx = create_accelerator("jax")
        assert sim.capabilities().name == "sim"
        assert jx.capabilities().supports_fft
        np.testing.assert_allclose(np.asarray(jx.fft(x)), sim.fft(x),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(jx.fir(x, taps))[:64],
                                   sim.fir(x, taps)[:64], atol=1e-3)
        chirp = np.exp(1j * np.pi * 0.01 * np.arange(256) ** 2).astype(
            np.complex64)
        c_j = np.asarray(jx.chirp_correlate(x, chirp))
        c_s = sim.chirp_correlate(x, chirp)
        np.testing.assert_allclose(c_j, c_s, atol=1e-3)
