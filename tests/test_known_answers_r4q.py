"""Round-4 KA batch Q: up/down conversion, FMCW geometry, pulse
descriptors, NTP algebra, packet framing, MPPT, VLC Manchester,
bearing-fault envelope lines and timing-advance truths — checked
against closed-form laws (FMCW beat law f_b = 2RS/c on the FFT grid,
NTP four-timestamp algebra, Manchester waveform bytes) and numpy.

Reference roles: digital_down_converter.rs, digital_up_converter.rs,
fmcw_automotive_processor.rs, pulse_descriptor_extractor.rs,
network_time_synchronizer.rs, timing_advance_estimator.rs,
packet_encoder.rs, packet_decoder.rs,
photovoltaic_mppt_controller.rs, vlc_modulator.rs,
vibration_bearing_fault_detector.rs, tuning_estimator.rs,
variable_rate_cic.rs, log_block role.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


# ------------------------------------------------------- up/down conv


class TestDucDdc:
    def test_duc_places_tone_then_ddc_recovers_it(self):
        """DUC: baseband tone f_b interpolated ×4 and mixed to f_c
        must put its spectral line at f_c + f_b exactly; DDC at f_c
        brings it back to f_b with ~unit amplitude."""
        from r4w_tpu.ops.filters2 import digital_up_converter
        from r4w_tpu.ops.stream_math import digital_down_convert

        fs_in, interp = 50e3, 4
        fs_out = fs_in * interp
        f_c, f_b = 40e3, 2e3
        n = 4096
        t = np.arange(n) / fs_in
        x = np.exp(2j * np.pi * f_b * t).astype(np.complex64)
        up = np.asarray(digital_up_converter(jnp.asarray(x), interp,
                                             f_c, fs_out))
        spec = np.abs(np.fft.fft(up))
        k = int(np.argmax(spec))
        f_peak = k / up.shape[0] * fs_out
        assert f_peak == pytest.approx(f_c + f_b,
                                       abs=fs_out / up.shape[0] * 1.5)
        down = np.asarray(digital_down_convert(jnp.asarray(up), f_c,
                                               fs_out, interp))
        td = np.arange(down.shape[0]) / fs_in
        ref = np.exp(-2j * np.pi * f_b * td)
        seg = slice(128, down.shape[0] - 128)
        amp = np.abs(np.mean(down[seg] * ref[seg]))
        assert amp == pytest.approx(1.0, rel=0.1)


# ------------------------------------------------------------- FMCW


class TestFmcwAutomotive:
    def test_beat_bins_place_range_and_doppler(self):
        """A point target at fast-time beat bin k_r and chirp-to-chirp
        phase rate k_d must peak at exactly that (doppler, range)
        cell; the angle spectrum across a steered ULA peaks at the
        phase-consistent bin."""
        from r4w_tpu.ops.radar_sonar import fmcw_automotive

        n_rx, n_ch, n_s = 4, 16, 64
        k_r, k_d = 9, 3
        rxv = np.arange(n_rx)
        ch = np.arange(n_ch)
        sm = np.arange(n_s)
        phase_elem = 0.8  # inter-element phase (target angle)
        cube = (np.exp(1j * phase_elem * rxv)[:, None, None]
                * np.exp(2j * np.pi * k_d * ch / n_ch)[None, :, None]
                * np.exp(2j * np.pi * k_r * sm / n_s)[None, None, :]
                ).astype(np.complex64)
        rd, angle_spec = fmcw_automotive(jnp.asarray(cube), n_rx=n_rx)
        rd = np.asarray(rd)
        d, r = np.unravel_index(np.argmax(rd), rd.shape)
        assert r == k_r
        assert d == n_ch // 2 + k_d  # fftshifted Doppler axis
        angle_spec = np.asarray(angle_spec)
        k_ang = int(np.argmax(np.abs(angle_spec)))
        n_fft_ang = angle_spec.shape[-1]
        # ULA phase 0.8 rad/elem → fftshifted bin N/2 + 0.8/(2π)·N
        assert k_ang == n_fft_ang // 2 + round(
            phase_elem / (2 * np.pi) * n_fft_ang)


class TestPulseDescriptors:
    def test_toa_width_amplitude_frequency(self):
        from r4w_tpu.ops.radar_sonar import pulse_descriptors

        fs = 1e6
        n = 4000
        x = np.zeros(n, np.complex64)
        pulses = [(500, 100, 2.0, 50e3), (2000, 200, 1.0, -100e3)]
        for start, width, amp, f in pulses:
            tt = np.arange(width) / fs
            x[start:start + width] = amp * np.exp(2j * np.pi * f * tt)
        toas, ws, amps, fqs, valid = pulse_descriptors(x, fs)
        assert int(np.sum(np.asarray(valid))) == 2
        for k, (start, width, amp, f_true) in enumerate(pulses):
            assert float(toas[k]) == pytest.approx(start / fs,
                                                   abs=2 / fs)
            assert float(ws[k]) == pytest.approx(width / fs,
                                                 abs=3 / fs)
            assert float(amps[k]) == pytest.approx(amp, rel=1e-3)
            assert float(fqs[k]) == pytest.approx(f_true, abs=500.0)


# ---------------------------------------------------------- timing


class TestNetworkTimeOffset:
    def test_ntp_four_timestamp_algebra(self):
        """Client clock 0.25 s behind, symmetric 10 ms path: the NTP
        formulas must return offset = +0.25 and delay = 0.02
        exactly."""
        from r4w_tpu.ops.sync2 import network_time_offset

        true_offset, one_way = 0.25, 0.010
        t1 = 100.0                        # client send (client clock)
        t2 = t1 + one_way + true_offset   # server receive
        t3 = t2 + 0.005                   # server send
        t4 = t3 + one_way - true_offset   # client receive
        off, delay = network_time_offset(t1, t2, t3, t4)
        assert off == pytest.approx(true_offset, abs=1e-12)
        assert delay == pytest.approx(2 * one_way, abs=1e-12)


class TestTimingAdvance:
    def test_offset_to_distance(self):
        from r4w_tpu.ops.cognitive import timing_advance

        fs, c = 30.72e6, 299_792_458.0
        adv, dist = timing_advance(100, 40, fs)
        assert adv == -60
        assert dist == pytest.approx(60 / fs * c / 2.0, rel=1e-9)


# -------------------------------------------------------- packetizing


class TestPacketCodec:
    def test_roundtrip_exact_frame_layout_and_crc(self):
        from r4w_tpu.ops.packets import packet_decode, packet_encode

        payload = b"hello r4w"
        frame = packet_encode(payload)
        assert frame[:2] == b"\x2d\xd4"
        assert frame[2] == len(payload)
        assert frame[3:3 + len(payload)] == payload
        got, err = packet_decode(frame)
        assert err is None and got == payload
        # corrupt one payload byte → CRC must catch it
        bad = bytearray(frame)
        bad[5] ^= 0x40
        got2, err2 = packet_decode(bytes(bad))
        assert got2 is None and err2 == "crc"
        # frame embedded mid-stream still found via sync scan
        got3, err3 = packet_decode(b"\x00\x55" * 7 + frame + b"\xff")
        assert err3 is None and got3 == payload


# ------------------------------------------------------------- MPPT


class TestMppt:
    def test_perturb_observe_climbs_to_maximum_power(self):
        """PV curve p(v) = v·(6 − v) peaks at v = 3: P&O must walk the
        operating point into [3−step, 3+step] and stay there."""
        from r4w_tpu.ops.exotic_modems import mppt_perturb_observe

        v, state = 1.0, (0.0, 0.0, 1.0)
        step = 0.1
        history = []
        for _ in range(100):
            i = 6.0 - v  # current model ⇒ p = v(6−v)
            v, state = mppt_perturb_observe(v, i, v_step=step,
                                            state=state)
            history.append(v)
        tail = np.array(history[-20:])
        assert np.all(np.abs(tail - 3.0) <= 2 * step + 1e-9)


# -------------------------------------------------------------- VLC


class TestVlcManchester:
    def test_exact_waveform_and_roundtrip(self):
        """IEEE 802.15.7 OOK Manchester: bit 1 → high-then-low, bit 0
        → low-then-high; dimming 0.5 scales the high level to 1.0."""
        from r4w_tpu.ops.exotic_modems import vlc_demodulate, vlc_modulate

        bits = np.array([1, 0, 1, 1, 0], np.int32)
        wave = np.asarray(vlc_modulate(jnp.asarray(bits), sps=4))
        want = np.array([1, 1, 0, 0,
                         0, 0, 1, 1,
                         1, 1, 0, 0,
                         1, 1, 0, 0,
                         0, 0, 1, 1], np.float32)
        assert np.array_equal(wave, want)
        back = np.asarray(vlc_demodulate(jnp.asarray(wave), sps=4))
        assert np.array_equal((back > 0).astype(np.int32), bits)
        # every Manchester symbol carries the same energy (dimming
        # invariant): per-bit mean intensity is constant
        assert np.allclose(wave.reshape(5, 4).mean(axis=1), 0.5)


# -------------------------------------------------- bearing vibration


class TestEnvelopeSpectrum:
    def test_fault_line_appears_at_modulation_rate(self):
        """Amplitude-modulated resonance: carrier 2 kHz ring modulated
        at the 97 Hz fault rate — the envelope spectrum must peak at
        97 Hz (the carrier itself must NOT appear there)."""
        from r4w_tpu.ops.applied import envelope_spectrum

        fs, n = 12800.0, 1 << 14
        t = np.arange(n) / fs
        f_fault, f_res = 97.0, 2000.0
        env = 1.0 + 0.8 * np.cos(2 * np.pi * f_fault * t)
        x = (env * np.cos(2 * np.pi * f_res * t)).astype(np.float32)
        freqs, es = envelope_spectrum(jnp.asarray(x), fs)
        freqs, es = np.asarray(freqs), np.asarray(es)
        band = (freqs > 20.0) & (freqs < 500.0)
        f_peak = freqs[band][np.argmax(es[band])]
        assert f_peak == pytest.approx(f_fault, abs=fs / n * 1.5)


# ------------------------------------------------------------ tuning


class TestTuningEstimate:
    def test_offset_recovered_within_fraction_of_bin(self):
        from r4w_tpu.ops.sync2 import tuning_estimate

        fs, nfft = 1e6, 4096
        f_off = 12_345.0
        t = np.arange(nfft) / fs
        x = np.exp(2j * np.pi * f_off * t).astype(np.complex64)
        got = float(tuning_estimate(jnp.asarray(x), fs, nfft=nfft))
        assert got == pytest.approx(f_off, abs=fs / nfft / 2)


class TestVariableRateCic:
    def test_interpolation_dc_gain_unity(self):
        """Interpolating CIC normalized to unit DC gain: a constant
        input interpolates to (eventually) the same constant."""
        from r4w_tpu.ops.filters2 import variable_rate_cic

        x = np.ones(64, np.float32)
        y = np.asarray(variable_rate_cic(jnp.asarray(x), rate=4,
                                         stages=3, interp=True))
        assert y.shape[0] >= 4 * 64 - 16
        mid = y[32: 4 * 64 - 32]
        assert np.allclose(mid, 1.0, atol=1e-4)


class TestLogBlock:
    def test_natural_and_based_logs(self):
        from r4w_tpu.ops.stream_blocks import log_block

        x = np.linspace(0.5, 9.0, 30).astype(np.float32)
        assert np.allclose(np.asarray(log_block(jnp.asarray(x))),
                           np.log(x), atol=1e-5)
        assert np.allclose(np.asarray(log_block(jnp.asarray(x),
                                                base=2.0)),
                           np.log2(x), atol=1e-4)
