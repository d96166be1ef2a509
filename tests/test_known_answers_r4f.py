"""Round-4 KA batch F: published physical-layer constants for the
standards waveforms — IEEE 802.15.4 chip sequences, TIA-102 P25 frame
sync / C4FM deviations, ETSI DMR deviations, TETRA π/4-DQPSK phase
alphabet, MIL-STD-188-141 ALE tone grid, WSPR/JT65 tone spacings,
MSK/GMSK h=1/2 phase law, and the EIA CTCSS tone table.

Every expected value is typed here from the published standard, never
read from the implementation. Reference roles: zigbee.rs, p25.rs,
dmr.rs, tetra.rs, ale.rs, wspr_modulator.rs, jt65_modulator.rs,
msk_modulator.rs, gmsk_modulator.rs, ctcss_squelch.rs.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _per_symbol_freq(x, sps, fs):
    """Mean discriminator frequency per symbol (Hz), edges trimmed."""
    x = np.asarray(x)
    d = np.angle(x[1:] * np.conj(x[:-1])) * fs / (2 * np.pi)
    n = len(d) // sps
    f = d[: n * sps].reshape(n, sps)
    return f[:, sps // 4: -sps // 4 or None].mean(axis=1)


# ------------------------------------------------------ IEEE 802.15.4


class TestZigbeeChips:
    # 802.15.4-2020 §12.2.4, data-symbol-to-chip mapping, symbol 0
    # (c0 first): 1101 1001 1100 0011 0101 0010 0010 1110
    SYM0 = [int(c) for c in "11011001110000110101001000101110"]

    def test_symbol0_matches_published(self):
        from r4w_tpu.waveforms.iot_waveforms import zigbee_chip_table

        assert list(zigbee_chip_table()[0]) == self.SYM0

    def test_symbols_1_to_7_are_cyclic_rotations(self):
        """Published structure: symbol s (s<8) = seq0 rotated left by
        4s chips."""
        from r4w_tpu.waveforms.iot_waveforms import zigbee_chip_table

        tab = zigbee_chip_table()
        for s in range(8):
            want = np.roll(self.SYM0, -4 * s)
            np.testing.assert_array_equal(tab[s], want)

    def test_symbols_8_to_15_conjugate_odd_chips(self):
        from r4w_tpu.waveforms.iot_waveforms import zigbee_chip_table

        tab = zigbee_chip_table()
        for s in range(8):
            want = np.asarray(tab[s]).copy()
            want[1::2] ^= 1
            np.testing.assert_array_equal(tab[8 + s], want)

    def test_chip_sequences_near_orthogonal(self):
        """±1-mapped sequences: |cross-corr| ≤ 8 of 32 for s≠t (the
        published quasi-orthogonality that enables chip-level MLD)."""
        from r4w_tpu.waveforms.iot_waveforms import zigbee_chip_table

        c = 2.0 * np.asarray(zigbee_chip_table(), np.float64) - 1.0
        g = c @ c.T
        off = g - np.diag(np.diag(g))
        assert np.diag(g).min() == 32
        assert np.abs(off).max() <= 8


# ------------------------------------------------------------- P25


class TestP25Constants:
    FS = 0x5575F5FF77FF  # TIA-102.BAAA frame sync, 48 bits

    def test_frame_sync_dibits_match_tia102(self):
        from r4w_tpu.waveforms.pmr_waveforms import p25_sync_dibits

        want = [(self.FS >> (46 - 2 * i)) & 0x3 for i in range(24)]
        assert list(p25_sync_dibits()) == want

    def test_c4fm_deviations_600_1800(self):
        """TIA-102: dibit→deviation 01→+1800? No — the published map is
        01→+3·600, 00→+600, 10→−600, 11→−1800 Hz at 4800 baud."""
        from r4w_tpu.waveforms import create_waveform

        wf = create_waveform("P25", sample_rate=48_000.0)
        iq = np.asarray(wf.modulate(b"\x00"))
        sps = wf.samples_per_symbol()
        freqs = _per_symbol_freq(iq, sps, 48_000.0)
        lut = {0b01: 3, 0b00: 1, 0b10: -1, 0b11: -3}
        want = [600.0 * lut[d] for d in
                [(self.FS >> (46 - 2 * i)) & 0x3 for i in range(24)]]
        np.testing.assert_allclose(freqs[:24], want, atol=25.0)
        # every measured level is one of the four published deviations
        levels = np.unique(np.round(freqs / 600.0))
        assert set(levels).issubset({-3.0, -1.0, 1.0, 3.0})

    def test_nid_bch_roundtrip_and_correction(self):
        from r4w_tpu.waveforms.pmr_waveforms import (p25_decode_nid,
                                                     p25_encode_nid)

        bits = np.asarray(p25_encode_nid(0x293, 0x7))
        nac, duid, n_corr = p25_decode_nid(bits)
        assert (nac, duid, n_corr) == (0x293, 0x7, 0)
        bad = bits.copy()
        bad[3] ^= 1
        bad[40] ^= 1
        nac2, duid2, n2 = p25_decode_nid(bad)
        assert (nac2, duid2) == (0x293, 0x7)
        assert n2 == 2


class TestDmrTetra:
    def test_dmr_deviations_648_1944(self):
        """ETSI TS 102 361-1: 4FSK deviations ±648/±1944 Hz, 4800 Bd."""
        from r4w_tpu.waveforms import create_waveform

        wf = create_waveform("DMR", sample_rate=48_000.0)
        iq = np.asarray(wf.modulate(bytes(range(16))))
        freqs = _per_symbol_freq(iq, wf.samples_per_symbol(), 48_000.0)
        levels = np.unique(np.round(freqs / 648.0))
        assert set(levels).issubset({-3.0, -1.0, 1.0, 3.0})
        assert {1.0, -1.0} <= set(np.sign(freqs))
        # nearest published deviation within 25 Hz for every symbol
        snapped = 648.0 * np.round(freqs / 648.0)
        np.testing.assert_allclose(freqs, snapped, atol=25.0)

    def test_tetra_pi4dqpsk_phase_alphabet(self):
        """ETSI EN 300 392-2: differential phase steps are exactly
        {±π/4, ±3π/4} — never 0, ±π/2, or π."""
        from r4w_tpu.waveforms import create_waveform

        wf = create_waveform("TETRA", sample_rate=72_000.0)
        iq = np.asarray(wf.modulate(bytes(range(32))))
        sps = wf.samples_per_symbol()
        pts = iq[sps // 2::sps]  # mid-symbol samples
        steps = np.angle(pts[1:] * np.conj(pts[:-1]))
        quarters = steps / (np.pi / 4)
        np.testing.assert_allclose(quarters, np.round(quarters),
                                   atol=1e-3)
        assert set(np.round(quarters).astype(int)) <= {-3, -1, 1, 3}


# ----------------------------------------------------------- HF / WSJT


class TestToneGrids:
    def test_ale_8fsk_tone_grid_mil_std_188_141(self):
        """ALE tones: 750+250k Hz, k=0..7, 125 baud (8 kHz audio)."""
        from r4w_tpu.waveforms import create_waveform

        wf = create_waveform("ALE", sample_rate=8000.0)
        iq = np.asarray(wf.modulate(b"K"))
        sps = wf.samples_per_symbol()
        assert sps == 64  # 125 baud at 8 kHz
        n = len(iq) // sps
        syms = iq[: n * sps].reshape(n, sps)
        spec = np.abs(np.fft.fft(syms, 512, axis=1))
        peak_hz = np.argmax(spec[:, :256], axis=1) * 8000.0 / 512
        grid = 750.0 + 250.0 * np.arange(8)
        for f in peak_hz:
            assert np.min(np.abs(grid - f)) < 20.0, f

    def test_wspr_tone_spacing_published(self):
        """WSPR: 4-FSK, spacing 12000/8192 = 1.4648 Hz, 0.683 s/symbol."""
        from r4w_tpu.ops.exotic_modems import wspr_modulate

        fs = 12_000.0
        x = np.asarray(wspr_modulate(np.array([0, 3]), fs))
        sym_len = len(x) // 2
        assert abs(sym_len / fs - 8192 / 12000) < 1e-3
        freqs = []
        for k in range(2):
            seg = x[k * sym_len:(k + 1) * sym_len]
            nfft = 1 << 18
            spec = np.abs(np.fft.fft(seg, nfft))
            pk = np.argmax(spec[: nfft // 2])
            freqs.append(pk * fs / nfft)
        got = (freqs[1] - freqs[0]) / 3.0
        assert abs(got - 12000.0 / 8192.0) < 0.05

    def test_jt65_tone_spacing_published(self):
        """JT65: 65-FSK, spacing 11025/4096 = 2.6917 Hz."""
        from r4w_tpu.ops.exotic_modems import jt65_modulate

        fs = 11_025.0
        x = np.asarray(jt65_modulate(np.array([0, 10]), fs))
        sym_len = len(x) // 2
        freqs = []
        for k in range(2):
            seg = x[k * sym_len:(k + 1) * sym_len]
            nfft = 1 << 18
            spec = np.abs(np.fft.fft(seg, nfft))
            freqs.append(np.argmax(spec[: nfft // 2]) * fs / nfft)
        got = (freqs[1] - freqs[0]) / 10.0
        assert abs(got - 11025.0 / 4096.0) < 0.05


# ------------------------------------------------------------ MSK/GMSK


class TestCpmPhaseLaw:
    def test_msk_phase_advances_exactly_half_pi(self):
        """MSK = CPM h=1/2 rect: phase advances ±π/2 per symbol."""
        from r4w_tpu.ops.modem import msk_modulate

        bits = np.array([1, 1, 0, 1, 0, 0, 1, 0, 1, 1])
        sps = 8
        x = np.asarray(msk_modulate(bits, sps))
        ph = np.unwrap(np.angle(x))
        steps = ph[sps - 1::sps]
        d = np.diff(np.concatenate([[0.0], steps]))
        want = (2 * bits - 1) * np.pi / 2
        np.testing.assert_allclose(d, want, atol=0.15)

    def test_gmsk_steady_state_ramp_half_pi_per_bit(self):
        """A long run of ones through GMSK ramps π/2 per bit once the
        Gaussian pulse tail settles (total pulse area is normalized)."""
        from r4w_tpu.ops.modem import gmsk_modulate

        sps = 8
        bits = np.ones(32, np.int32)
        x = np.asarray(gmsk_modulate(bits, sps, bt=0.3))
        ph = np.unwrap(np.angle(x))
        # steady-state region: bits 8..24
        slope = (ph[24 * sps] - ph[8 * sps]) / 16.0
        assert abs(slope - np.pi / 2) < 0.02


# --------------------------------------------------------------- CTCSS


class TestCtcss:
    # EIA/TIA-603 standard tone set (38 tones)
    EIA = [67.0, 71.9, 74.4, 77.0, 79.7, 82.5, 85.4, 88.5, 91.5, 94.8,
           97.4, 100.0, 103.5, 107.2, 110.9, 114.8, 118.8, 123.0,
           127.3, 131.8, 136.5, 141.3, 146.2, 151.4, 156.7, 162.2,
           167.9, 173.8, 179.9, 186.2, 192.8, 199.5, 206.5, 213.8,
           221.3, 229.1, 237.1, 245.3]

    def test_tone_table_matches_eia(self):
        from r4w_tpu.ops.protocols import CTCSS_TONES

        np.testing.assert_allclose(np.asarray(CTCSS_TONES), self.EIA)

    @pytest.mark.parametrize("tone", [67.0, 100.0, 151.4, 245.3])
    def test_detect_finds_injected_tone(self, tone):
        from r4w_tpu.ops.protocols import ctcss_detect

        fs = 8000.0
        t = np.arange(int(fs)) / fs
        audio = (0.15 * np.sin(2 * np.pi * tone * t)
                 + 0.5 * np.sin(2 * np.pi * 1000.0 * t)
                 ).astype(np.float32)
        got, metric = ctcss_detect(jnp.asarray(audio), fs)
        assert abs(float(got) - tone) < 0.5
        assert float(metric) > 8.0
