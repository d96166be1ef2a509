"""Gallery figure generation (viz.py)."""

import os

import numpy as np
import pytest

from r4w_tpu import viz


def test_plot_primitives(tmp_path):
    rng = np.random.default_rng(0)
    iq = (np.exp(2j * np.pi * 0.01 * np.arange(4000))
          + 0.1 * (rng.standard_normal(4000)
                   + 1j * rng.standard_normal(4000))).astype(np.complex64)
    p1 = viz.plot_constellation(iq[::40], str(tmp_path / "c.png"))
    p2 = viz.plot_time(iq, str(tmp_path / "t.png"), sample_rate=1e3)
    p3 = viz.plot_spectrum(iq, str(tmp_path / "s.png"), 1e3)
    p4 = viz.plot_waterfall(iq, str(tmp_path / "w.png"), 1e3)
    p5 = viz.plot_eye(np.sign(rng.standard_normal(100)).repeat(8),
                      8, str(tmp_path / "e.png"))
    p6 = viz.plot_ber_curves([0, 2, 4], {"BPSK": [1e-1, 1e-2, 1e-3],
                                         "QPSK": [2e-1, 3e-2, 4e-3]},
                             str(tmp_path / "b.png"))
    for p in (p1, p2, p3, p4, p5, p6):
        assert os.path.getsize(p) > 5000  # non-trivial PNG


@pytest.mark.slow
def test_generate_gallery_subset(tmp_path):
    made = viz.generate_gallery(str(tmp_path), ["BPSK", "CW"], 48000.0)
    assert len(made) == 6  # 3 figures x 2 waveforms
    for p in made:
        assert os.path.getsize(p) > 5000
