"""Infrastructure tests: equalizers, radar ops, parallel, scheduler,
UDP transport, agent protocol, benchmark harness."""

import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu import scheduler as sched
from r4w_tpu.net import UdpConfig, UdpSink, UdpSource, decode_packet, encode_packet
from r4w_tpu.ops import equalizers as eq
from r4w_tpu.ops import radar


# --------------------------------------------------------------- equalizers


def _qpsk_syms(n, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.choice([-1, 1], n) + 1j * rng.choice([-1, 1], n))
            / np.sqrt(2)).astype(np.complex64)


def _apply_channel(x, h):
    return np.convolve(x, h)[: len(x)].astype(np.complex64)


def test_lms_converges_on_isi_channel():
    h = np.array([1.0, 0.4, -0.2], np.complex64)
    syms = _qpsk_syms(4000)
    rx = _apply_channel(syms, h)
    out = eq.lms_equalize(jnp.asarray(rx), jnp.asarray(syms), n_taps=9,
                          mu=0.02)
    tail = np.asarray(out.error[-500:])
    head = np.asarray(out.error[:500])
    assert tail.mean() < head.mean() * 0.5
    assert tail.mean() < 0.15


def test_rls_converges_faster_than_lms():
    h = np.array([1.0, 0.5], np.complex64)
    syms = _qpsk_syms(800, seed=1)
    rx = _apply_channel(syms, h)
    lms = eq.lms_equalize(jnp.asarray(rx), jnp.asarray(syms), n_taps=7,
                          mu=0.02)
    rls = eq.rls_equalize(jnp.asarray(rx), jnp.asarray(syms), n_taps=7)
    assert np.asarray(rls.error[100:300]).mean() < \
        np.asarray(lms.error[100:300]).mean()


def test_cma_restores_constant_modulus():
    h = np.array([1.0, 0.3], np.complex64)
    syms = _qpsk_syms(6000, seed=2)  # QPSK is constant-modulus
    rx = _apply_channel(syms, h)
    out = eq.cma_equalize(jnp.asarray(rx), n_taps=11, mu=0.002, modulus=1.0)
    y = np.asarray(out.y[-1000:])
    mod_var = np.var(np.abs(y))
    mod_var_in = np.var(np.abs(rx[-1000:]))
    assert mod_var < mod_var_in * 0.5


def test_mmse_block_equalizer_opens_eye():
    h = np.array([0.8, 0.5, 0.3], np.complex64)
    syms = _qpsk_syms(500, seed=3)
    rx = _apply_channel(syms, h)
    y, w = eq.mmse_block_equalize(jnp.asarray(rx), h, snr_db=30.0,
                                  n_taps=15)
    y = np.asarray(y)
    delay = (15 + 3) // 2  # equalizer target delay
    seg = y[delay : delay + 400]
    errs = np.mean(np.sign(seg.real) != np.sign(syms[: len(seg)].real))
    assert errs < 0.05


def test_fde_equalizer_inverts_channel():
    h_time = np.zeros(64, np.complex64)
    h_time[0], h_time[3] = 1.0, 0.5
    h_freq = np.fft.fft(h_time)
    syms = _qpsk_syms(64, seed=4)
    rx_block = np.fft.ifft(np.fft.fft(syms) * h_freq)
    out = np.asarray(eq.fde_equalize(rx_block[None, :], h_freq, 40.0))[0]
    assert np.mean(np.abs(out - syms)) < 0.05


# ------------------------------------------------------------------- radar


def test_pulse_compression_peak_at_delay():
    rng = np.random.default_rng(5)
    pulse = np.exp(1j * np.pi * 0.3 * np.arange(64)**2 / 64).astype(
        np.complex64
    )
    rx = np.zeros(512, np.complex64)
    rx[100:164] = pulse
    rx += 0.1 * (rng.standard_normal(512) + 1j * rng.standard_normal(512))
    out = np.abs(np.asarray(radar.pulse_compress(rx, pulse)))
    assert abs(int(np.argmax(out)) - 100) <= 1


def test_cfar_detects_target_rejects_noise():
    rng = np.random.default_rng(6)
    power = rng.exponential(1.0, 512).astype(np.float32)
    power[200] = 60.0
    det, thr = radar.cfar_1d(jnp.asarray(power), pfa=1e-4)
    det = np.asarray(det)
    assert det[200]
    assert det.sum() <= 4  # almost no false alarms


def test_range_doppler_and_mti():
    n_p, n_r = 32, 128
    rng = np.random.default_rng(7)
    # target at range bin 40 with Doppler bin 5
    pulses = 0.1 * (rng.standard_normal((n_p, n_r))
                    + 1j * rng.standard_normal((n_p, n_r)))
    dop_phase = np.exp(2j * np.pi * 5 * np.arange(n_p) / n_p)
    pulses[:, 40] += dop_phase
    # stationary clutter at bin 80
    pulses[:, 80] += 5.0
    rd = np.asarray(radar.range_doppler_map(pulses.astype(np.complex64)))
    d_idx, r_idx = np.unravel_index(np.argmax(rd), rd.shape)
    assert r_idx in (40, 80)
    # MTI kills the clutter
    canc = np.asarray(radar.mti_filter(pulses.astype(np.complex64)))
    # DC clutter cancelled to the (diff-amplified) noise floor
    assert np.abs(canc[:, 80]).mean() < 0.1 * np.abs(pulses[:, 80]).mean()


def test_music_finds_two_sources():
    m, snaps = 8, 400
    rng = np.random.default_rng(8)
    a1 = np.asarray(radar.steering_vector(m, 0.5, [20.0]))[0]
    a2 = np.asarray(radar.steering_vector(m, 0.5, [-40.0]))[0]
    s = (rng.standard_normal((2, snaps)) + 1j * rng.standard_normal((2, snaps)))
    x = np.outer(a1, s[0]) + np.outer(a2, s[1])
    x += 0.1 * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    scan, spec = radar.music_spectrum(x.astype(np.complex64), 2)
    spec = np.asarray(spec)
    peaks = np.asarray(scan)[np.argsort(spec)[-2:]]
    assert min(abs(peaks - 20.0).min(), abs(peaks + 40.0).min()) < 3.0
    assert sorted(np.round(peaks / 10) * 10.0 for peaks in peaks) == [-40.0, 20.0]


def test_mvdr_beamformer_gains_look_direction():
    m = 8
    rng = np.random.default_rng(9)
    noise = (rng.standard_normal((m, 500)) + 1j * rng.standard_normal((m, 500)))
    w = np.asarray(radar.mvdr_weights(noise.astype(np.complex64), 0.0))
    a0 = np.asarray(radar.steering_vector(m, 0.5, [0.0]))[0]
    a60 = np.asarray(radar.steering_vector(m, 0.5, [60.0]))[0]
    g0 = abs(np.conj(w) @ a0)
    g60 = abs(np.conj(w) @ a60)
    assert abs(g0 - 1.0) < 0.01  # distortionless constraint
    assert g60 < g0


# ---------------------------------------------------------------- parallel


def test_monte_carlo_ber_sharded_mesh():
    from r4w_tpu import parallel
    from r4w_tpu.waveforms import lora

    p = lora.LoRaParams(sf=7)
    payload = jnp.arange(8)
    mesh = parallel.make_mesh(("dp",))
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    ber = parallel.ber_sweep(
        lambda pl, k, s: lora.loopback_ber(p, pl, k, s),
        payload, snrs_db=[-20.0, 0.0], n_lanes=16, mesh=mesh,
    )
    ber = np.asarray(ber)
    assert ber.shape == (2,)
    assert ber[0] > ber[1]
    assert ber[1] == 0.0


# --------------------------------------------------------------- scheduler


def test_tick_scheduler_ordering_and_periodic():
    ts = sched.TickScheduler(tick_rate_hz=1000.0)
    fired = []
    ts.schedule_at(5, lambda t: fired.append(("a", t)))
    ts.schedule_periodic(3, lambda t: fired.append(("p", t)))
    ts.subscribe("count", lambda t: None)
    ts.run_until(10)
    assert ("a", 5) in fired
    p_ticks = [t for k, t in fired if k == "p"]
    assert p_ticks == [3, 6, 9]
    assert ts.virtual_time_s == 0.01


def test_sample_schedule_masks_and_conflicts():
    ss = sched.SampleSchedule(sample_rate=1000.0)
    ss.add_hop_pattern([3, 7, 1], dwell_s=0.01, start_s=0.0)
    active, channel, kind = ss.masks(40)
    assert active[:30].all() and not active[30:].any()
    assert channel[5] == 3 and channel[15] == 7 and channel[25] == 1
    assert not ss.conflicts()
    ss.add(sched.ScheduledEvent(5, 10, kind="hop", channel=9))
    assert ss.conflicts()


# --------------------------------------------------------------------- net


def test_udp_packet_wire_format():
    x = (np.arange(4) + 1j * np.arange(4)).astype(np.complex64)
    raw = encode_packet(7, x)
    assert raw[:4] == (7).to_bytes(4, "little")
    seq, back = decode_packet(raw)
    assert seq == 7
    assert np.array_equal(back, x)


def test_udp_loopback_with_drop_accounting():
    src = UdpSource(UdpConfig(port=0, timeout_s=0.5))
    sink = UdpSink("127.0.0.1", src.port)
    x = np.exp(1j * 0.1 * np.arange(500)).astype(np.complex64)
    sink.send(x)
    got = src.recv_batch()
    assert np.allclose(got, x, atol=1e-6)
    # simulate a drop: skip a sequence number
    sink.seq += 3
    sink.send(x[:10])
    src.recv_batch()
    assert src.packets_dropped == 3
    sink.close(); src.close()


# ------------------------------------------------------------------- agent


def test_agent_server_client_roundtrip():
    from r4w_tpu.agent import AgentClient, AgentServer
    from r4w_tpu.net import UdpConfig, UdpSource

    server = AgentServer(port=0)
    server.serve_in_thread()
    client = AgentClient(port=server.port)
    assert client.ping()["response"] == "pong"
    st = client.status()
    assert st["response"] == "status" and not st["data"]["tx_active"]
    lw = client.call("list_waveforms")
    assert "BPSK" in lw["data"]
    # full data path: agent TX -> local UDP -> demod
    rx = UdpSource(UdpConfig(port=0, timeout_s=1.0))
    r = client.start_tx(f"127.0.0.1:{rx.port}", waveform="QPSK",
                        message="agent!")
    assert r["response"] == "ok"
    time.sleep(0.3)
    samples = rx.recv_batch()
    from r4w_tpu.waveforms import create_waveform

    res = create_waveform("QPSK", 125_000.0).demodulate(samples)
    assert bytes(np.asarray(res.bits[:6]).astype(np.uint8)) == b"agent!"
    assert client.call("nonsense")["response"] == "error"
    client.shutdown()
    rx.close()


# --------------------------------------------------------------- benchmark


def test_benchmark_receiver_end_to_end():
    from r4w_tpu.benchmark import BenchmarkReceiver
    from r4w_tpu.net import UdpSink
    from r4w_tpu.waveforms import create_waveform

    recv = BenchmarkReceiver(port=0, waveform_name="BPSK")
    wf = create_waveform("BPSK", 125_000.0)
    burst = np.asarray(wf.modulate(b"bench"))

    def feed():
        sink = UdpSink("127.0.0.1", recv.port)
        for _ in range(5):
            sink.send(burst)
            time.sleep(0.05)
        sink.close()

    t = threading.Thread(target=feed)
    t.start()
    metrics = recv.run(duration_s=1.0)
    t.join()
    assert metrics.samples_processed >= len(burst) * 4
    assert metrics.throughput_msps() > 0
    lat = metrics.latency_stats()
    assert lat["p99"] >= lat["avg"] > 0
    recv.close()
