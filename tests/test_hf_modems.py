"""Frame-level known-answer + roundtrip tests for the conformant HF
serial-tone modems (STANAG 4285, MIL-STD-188-110A) — the per-standard
test pattern VERDICT r1 item 4 asks for: pinned preamble sequences,
pinned interleaver permutation vectors, autobaud detection, probe-based
equalization through static channels, and noisy roundtrips, instead of
loopback-only coverage."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r4w_tpu.channel import awgn
from r4w_tpu.core.types import CommonParams
from r4w_tpu.waveforms import create_waveform
from r4w_tpu.waveforms import milstd188110 as ms
from r4w_tpu.waveforms import stanag4285 as st

pytestmark = pytest.mark.slow  # heavy integration lane

DATA = bytes([0xA7, 0x1B, 0x3C, 0xD2, 0x55, 0x00, 0xFF, 0x42])


# ------------------------------------------------------- STANAG 4285


class TestStanag4285:
    def test_preamble_known_answer(self):
        pre = st.preamble_indices()
        assert pre.shape == (80,)
        # BPSK on the 8PSK grid
        assert set(np.unique(pre)) <= {0, 4}
        # first 16 symbols pinned (m-seq x^5+x^2+1 from all-ones)
        assert pre[:16].tolist() == [4, 4, 4, 4, 4, 0, 0, 4,
                                     4, 0, 4, 0, 0, 4, 0, 0]
        # the 31-chip m-sequence tiles: pre[i] == pre[i+31]
        assert pre[:49].tolist() == pre[31:].tolist()
        # m-sequence balance: 16 ones / 15 zeros per period
        assert int(np.sum(pre[:31] == 4)) == 16

    def test_scrambler_known_answer(self):
        scr = st.frame_scrambler()
        assert scr.shape == (176,)
        assert scr[:16].tolist() == [7, 7, 7, 0, 3, 6, 7, 0,
                                     2, 6, 3, 3, 3, 6, 4, 1]

    def test_frame_layout(self):
        data_pos, probe_pos = st._frame_layout()
        assert data_pos.shape == (128,) and probe_pos.shape == (48,)
        # 32 data / 16 probe alternation
        assert data_pos[:32].tolist() == list(range(32))
        assert probe_pos[:16].tolist() == list(range(32, 48))
        assert data_pos[32:64].tolist() == list(range(48, 80))
        assert sorted(data_pos.tolist() + probe_pos.tolist()) == list(
            range(176))

    def test_interleaver_permutation_vector(self):
        perm = st.interleave_permutation(4, 8)
        # row-write column-read: out j reads in[(j%4)*8 + j//4]
        assert perm.tolist() == [0, 8, 16, 24, 1, 9, 17, 25,
                                 2, 10, 18, 26, 3, 11, 19, 27,
                                 4, 12, 20, 28, 5, 13, 21, 29,
                                 6, 14, 22, 30, 7, 15, 23, 31]
        assert sorted(perm.tolist()) == list(range(32))

    def test_interleaver_shapes(self):
        assert st.interleaver_shape(2400, False) == (96, 32)   # 8 frames
        assert st.interleaver_shape(2400, True) == (1152, 32)  # 96 frames
        assert st.interleaver_shape(600, False) == (32, 32)

    def test_frame_symbol_grid(self):
        wf = st.Stanag4285(mode_bps=2400)
        syms = np.asarray(wf.frame_symbols(DATA))
        assert syms.shape[1] == 256
        # every frame starts with the fixed preamble
        assert (syms[:, :80] == st.preamble_indices()[None, :]).all()
        # probe symbols equal the scrambler (tx probe index 0)
        _, probe_pos = st._frame_layout()
        scr = st.frame_scrambler()
        assert (syms[:, 80 + probe_pos] == scr[probe_pos][None, :]).all()

    @pytest.mark.parametrize("mode", [75, 150, 300, 600, 1200, 2400, 3600])
    def test_roundtrip_clean(self, mode):
        wf = st.Stanag4285(mode_bps=mode)
        res = wf.demodulate(wf.modulate(DATA))
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_roundtrip_long_interleave(self):
        wf = st.Stanag4285(mode_bps=1200, long_interleave=True)
        res = wf.demodulate(wf.modulate(DATA))
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    @pytest.mark.parametrize("mode,snr", [(2400, 14.0), (1200, 8.0),
                                          (600, 5.0), (75, -2.0)])
    def test_roundtrip_awgn(self, mode, snr):
        wf = st.Stanag4285(mode_bps=mode)
        rx = awgn(jax.random.key(11), wf.modulate(DATA), snr)
        res = wf.demodulate(rx)
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_probe_equalization_static_channel(self):
        """A static complex gain (attenuation + rotation) must be removed
        by the probe/preamble channel estimator."""
        wf = st.Stanag4285(mode_bps=2400)
        tx = wf.modulate(DATA)
        gain = 0.4 * np.exp(1j * 2.2).astype(np.complex64)
        rx = awgn(jax.random.key(5), tx * gain, 18.0)
        res = wf.demodulate(rx)
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_factory(self):
        wf = create_waveform("STANAG-4285")
        assert isinstance(wf, st.Stanag4285)
        assert wf.info().bits_per_symbol == 3


# --------------------------------------------------- MIL-STD-188-110


class TestMilStd188110:
    def test_base_block_known_answer(self):
        blk = ms.base_block()
        assert blk.shape == (32,)
        assert blk[:16].tolist() == [4, 4, 4, 4, 4, 0, 4, 4,
                                     0, 0, 4, 4, 4, 0, 0, 0]

    def test_scrambler_period_160(self):
        scr = ms.scrambler_sequence()
        assert scr.shape == (160,)
        assert scr[:16].tolist() == [5, 6, 5, 5, 3, 3, 5, 7,
                                     6, 2, 3, 0, 1, 4, 7, 2]
        assert set(np.unique(scr)) <= set(range(8))

    def test_walsh_orthogonality(self):
        w = ms.walsh_blocks()
        assert w.shape == (4, 32)
        chips = np.where(w == 0, 1.0, -1.0)
        gram = chips @ chips.T
        assert np.allclose(gram, 32 * np.eye(4))

    def test_interleaver_permutation_vector(self):
        perm = ms.interleave_permutation(10, 9)  # 75 bps short
        assert perm[:18].tolist() == [0, 10, 20, 30, 40, 50, 60, 70, 80,
                                      9, 19, 29, 39, 49, 59, 69, 79, 89]
        assert sorted(perm.tolist()) == list(range(90))
        # load row-increment 9: consecutive coded bits land 9 rows apart
        rows, cols = 40, 72  # 2400 bps short
        p = ms.interleave_permutation(rows, cols)
        assert sorted(p.tolist()) == list(range(rows * cols))
        inv = np.argsort(p)  # inv[i] = output slot of input bit i
        r = inv // cols
        assert ((r[1:40] - r[:39]) % rows == 9).all()

    def test_interleaver_shapes(self):
        assert ms.interleaver_shape(2400, "short") == (40, 72)
        assert ms.interleaver_shape(2400, "long") == (40, 576)
        assert ms.interleaver_shape(75, "short") == (10, 9)
        assert ms.interleaver_shape(600, "zero") == (1, 1)

    def test_segment_structure(self):
        vals = ms.segment_values(6, 5, remaining=2)
        assert vals[:9].tolist() == list(ms.SYNC_PATTERN)
        assert vals[9] == 6 and vals[10] == 5
        assert vals[11:14].tolist() == [0, 0, 2]
        assert vals.shape == (15,)

    @pytest.mark.parametrize("rate", [75, 150, 300, 600, 1200, 2400])
    @pytest.mark.parametrize("interleave", ["zero", "short"])
    def test_autobaud_roundtrip(self, rate, interleave):
        tx_modem = ms.MilStd188110(rate=rate, interleave=interleave)
        tx = tx_modem.modulate(DATA)
        rx_modem = ms.MilStd188110()  # defaults; must autobaud
        res = rx_modem.demodulate(tx)
        assert res.metadata["rate"] == rate
        assert res.metadata["interleave"] == interleave
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_roundtrip_long_interleave(self):
        wf = ms.MilStd188110(rate=2400, interleave="long")
        res = ms.MilStd188110().demodulate(wf.modulate(DATA))
        assert res.metadata["interleave"] == "long"
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    @pytest.mark.parametrize("rate,snr", [(2400, 14.0), (1200, 8.0),
                                          (600, 5.0), (75, -4.0)])
    def test_autobaud_roundtrip_awgn(self, rate, snr):
        tx = ms.MilStd188110(rate=rate, interleave="short").modulate(DATA)
        rx = awgn(jax.random.key(7), tx, snr)
        res = ms.MilStd188110().demodulate(rx)
        assert res.metadata["rate"] == rate
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_probe_equalization_static_channel(self):
        wf = ms.MilStd188110(rate=1200, interleave="short")
        gain = 0.5 * np.exp(1j * -1.1).astype(np.complex64)
        rx = awgn(jax.random.key(9), wf.modulate(DATA) * gain, 15.0)
        res = ms.MilStd188110().demodulate(rx)
        assert np.asarray(res.bits)[: len(DATA)].tolist() == list(DATA)

    def test_sync_rejection(self):
        noise = awgn(jax.random.key(1),
                     jnp.zeros(4 * ms.SEGMENT_SYMS, jnp.complex64), 0.0)
        with pytest.raises(ValueError):
            ms.MilStd188110().demodulate(noise)

    def test_factory(self):
        wf = create_waveform("MIL-STD-188-110")
        assert isinstance(wf, ms.MilStd188110)

    def test_preamble_countdown(self):
        wf = ms.MilStd188110(rate=600, interleave="long")
        pre = wf.preamble_symbols()
        assert pre.shape == (24 * ms.SEGMENT_SYMS,)
        # countdown in the first segment says 23 segments remain
        stream = jnp.asarray(
            np.exp(1j * 2 * np.pi * pre / 8.0).astype(np.complex64))
        rate, interleave, pre_syms = ms.MilStd188110.detect_preamble(stream)
        assert (rate, interleave) == (600, "long")
        assert pre_syms == 24 * ms.SEGMENT_SYMS
