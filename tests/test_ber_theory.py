"""BER-vs-theory statistical acceptance (VERDICT r1 item 5; reference
ber_tool.rs:44,164, channel.rs:788, MEASURABLE_OBJECTIVES "<10%
deviation from theory"): batched Monte-Carlo BER for the linear fleet
must track the closed-form Gray-coded AWGN curves."""

import jax
import numpy as np
import pytest

from r4w_tpu import ber
from r4w_tpu.ops import measure

N_BITS = 1_000_000  # relative CI ~<3% at Pb >= 2e-3


@pytest.mark.parametrize("scheme,points", sorted(
    ber.DEFAULT_GATE_POINTS.items()))
def test_linear_ber_within_10pct_of_theory(scheme, points):
    results = ber.ber_acceptance_report({scheme: points}, n_bits=N_BITS)
    for r in results:
        # <10% of theory, or statistically indistinguishable (theory
        # inside the Wilson CI of the measured count)
        assert r.deviation < 0.10 or r.theory_in_ci, (
            f"{r.scheme} @ {r.ebn0_db} dB: measured {r.measured:.3e} vs "
            f"theory {r.theory:.3e} ({100 * r.deviation:.1f}% off)")


def test_theory_curves_known_values():
    # BPSK: Pb(0 dB) = Q(sqrt(2)) = 0.0786; Pb(9.6 dB) ~ 1e-5
    assert abs(float(measure.theoretical_ber_bpsk(0.0)) - 0.0786) < 2e-3
    assert float(measure.theoretical_ber_bpsk(9.6)) < 1.2e-5
    # QPSK per-bit == BPSK
    assert float(measure.theoretical_ber_qpsk(5.0)) == pytest.approx(
        float(measure.theoretical_ber_bpsk(5.0)))
    # noncoherent BFSK: Pb(10 dB) = 0.5 exp(-5) = 3.37e-3
    assert abs(float(measure.theoretical_ber_fsk_noncoherent(10.0))
               - 0.5 * np.exp(-5.0)) < 1e-6
    # 8PSK needs ~3.6 dB more than QPSK at Pb=1e-3 (textbook gap)
    from scipy.optimize import brentq  # scipy is available via jax deps

    def ebn0_at(fn, target):
        return brentq(lambda x: float(fn(x)) - target, -5.0, 30.0)

    gap = (ebn0_at(lambda x: measure.theoretical_ber_mpsk(x, 8), 1e-3)
           - ebn0_at(measure.theoretical_ber_bpsk, 1e-3))
    assert 3.0 < gap < 4.2


def test_ber_monotone_in_snr():
    pts = np.asarray([2.0, 5.0, 8.0])
    meas = np.asarray(ber.linear_ber_monte_carlo(
        "qpsk", pts, 200_000, jax.random.key(0)))
    assert meas[0] > meas[1] > meas[2]


def test_waveform_level_ber_matches_theory():
    """The actual BPSK Waveform chain (modulate -> channel.awgn ->
    demodulate) measured at a known per-sample SNR must land on the
    theory curve at the implied Eb/N0 (validates the whole TX/RX path
    plus the channel's noise calibration, not just the constellation
    maths)."""
    # sps=125 -> integration gain 21 dB; -16 dB/sample => Eb/N0 ~ 5 dB
    measured, ebn0 = ber.waveform_ber_monte_carlo(
        "BPSK", snr_db=-16.0, n_bytes=256, lanes=24, seed=1)
    theory = float(measure.theoretical_ber_bpsk(ebn0))
    assert theory > 0
    # 24*2048 bits at Pb~6e-3: statistical + chain tolerance 25%
    assert abs(measured - theory) / theory < 0.25, (measured, theory, ebn0)


def test_confidence_interval_brackets_theory():
    results = ber.ber_acceptance_report({"bpsk": (5.0,)}, n_bits=400_000)
    r = results[0]
    # Wilson CI from the measured count must bracket the exact theory
    assert r.ci_low <= r.theory <= r.ci_high
