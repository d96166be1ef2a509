"""Instrument / EMC / direction-finding / fingerprinting fills.

Re-designs of network_analyzer.rs, oscilloscope_trigger.rs,
jitter_analyzer.rs, power_meter.rs, rf_power_monitor.rs,
vector_signal_analyzer.rs, rf_impedance_tuner.rs,
transmission_line_simulator.rs, rf_circuit_em_simulator.rs,
antenna_design_optimizer.rs, rf_impairment_calibrator.rs,
passive_intermod_analyzer.rs, emi_conducted_analyzer.rs,
emc_radiated_immunity.rs, injection_locking_detector.rs,
spurious_emission_scanner.rs, spurs_mitigation.rs,
direction_finding_watson_watt.rs, radio_direction_finder.rs,
rdf_network_triangulator.rs, gps_spoofing_detector.rs,
modulation_fingerprinter.rs, modulation_recognition_classifier.rs
(feature core shared with applied.classify_modulation),
rf_fingerprinting_engine.rs, rf_environment_mapper.rs,
protocol_anomaly_detector.rs, radio_astronomy_receiver.rs,
radio_telescope_correlator.rs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import cis
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# -------------------------------------------------------- instruments


def network_analyzer_s21(stimulus, response, n_fft: int | None = None):
    """Transfer-function measurement (network_analyzer.rs):
    S21(f) = FFT(response)/FFT(stimulus), magnitude dB + phase."""
    a = jnp.asarray(stimulus, IQ_DTYPE)
    b = jnp.asarray(response, IQ_DTYPE)
    n = n_fft or a.shape[0]
    fa = jnp.fft.fft(a, n)
    fb = jnp.fft.fft(b, n)
    h = fb * jnp.conj(fa) / (jnp.abs(fa) ** 2 + 1e-12)
    return 20.0 * jnp.log10(jnp.maximum(jnp.abs(h), 1e-12)), \
        jnp.angle(h)


def oscilloscope_trigger(x, level: float, slope: str = "rising",
                         holdoff: int = 16, pre: int = 8,
                         length: int = 64, max_captures: int = 16):
    """Edge-trigger capture (oscilloscope_trigger.rs): aligned frames
    at each trigger crossing. jit-safe fixed-capacity form (VERDICT
    r4 #6): returns `(indices[K] int32, frames[K, length],
    valid[K])` for K = max_captures; the holdoff state machine is a
    device lax.scan and the frame capture one padded gather."""
    from r4w_tpu.ops.events import masked_indices, refractory_trigger

    a = jnp.asarray(x)
    n = a.shape[0]
    if slope == "rising":
        cross = (a[:-1] < level) & (a[1:] >= level)
    else:
        cross = (a[:-1] > level) & (a[1:] <= level)
    acc = refractory_trigger(cross, holdoff)
    # only crossings whose full pre+post window fits the record
    i = jnp.arange(n - 1)
    acc = acc & (i - pre >= 0) & (i - pre + length <= n)
    idx, valid = masked_indices(acc, max_captures)
    pad = jnp.concatenate([a, jnp.zeros(length + 1, a.dtype)])
    frames = pad[(idx - pre)[:, None] + jnp.arange(length)[None, :]]
    frames = jnp.where(valid[:, None], frames, 0)
    return idx, frames, valid


def jitter_analyze(edges_s, nominal_period_s: float):
    """Time-interval-error jitter metrics (jitter_analyzer.rs):
    TIE series, RMS + peak-to-peak jitter, period jitter."""
    e = jnp.asarray(edges_s, jnp.float32)
    n = e.shape[0]
    expected = e[0] + nominal_period_s * jnp.arange(n, dtype=jnp.float32)
    tie = e - expected
    periods = jnp.diff(e)
    return {"tie_rms_s": jnp.std(tie),
            "tie_pp_s": jnp.max(tie) - jnp.min(tie),
            "period_jitter_rms_s": jnp.std(periods),
            "tie": tie}


def power_meter_dbm(x, impedance_ohm: float = 50.0,
                    full_scale_v: float = 1.0):
    """Average + peak power in dBm (power_meter.rs /
    rf_power_monitor.rs)."""
    v = jnp.abs(jnp.asarray(x)) * full_scale_v
    p_avg_w = jnp.mean(v ** 2) / (2.0 * impedance_ohm)
    p_pk_w = jnp.max(v ** 2) / (2.0 * impedance_ohm)
    to_dbm = lambda p: 10.0 * jnp.log10(jnp.maximum(p, 1e-15)) + 30.0
    return to_dbm(p_avg_w), to_dbm(p_pk_w)


def vector_signal_analyze(x, constellation, sps: int = 1):
    """Composite VSA report (vector_signal_analyzer.rs): EVM, CFO
    proxy, magnitude/phase error, PAPR — reusing the measurement ops."""
    from r4w_tpu.ops import mapping as _mapping
    from r4w_tpu.ops import measure as _measure
    from r4w_tpu.ops import modem as _modem
    x = jnp.asarray(x, IQ_DTYPE)
    syms = x[::sps]
    idx, evm, margin = _mapping.constellation_receiver(syms,
                                                      constellation)
    table = jnp.asarray(constellation, IQ_DTYPE)
    ref = table[idx]
    mag_err = jnp.mean(jnp.abs(jnp.abs(syms) - jnp.abs(ref)))
    ph_err = jnp.mean(jnp.abs(jnp.angle(syms * jnp.conj(ref))))
    return {"evm_rms": evm, "decision_margin": margin,
            "mag_error": mag_err, "phase_error_rad": ph_err,
            "papr_db": _modem.papr_db(x),
            "snr_est_db": _measure.snr_estimate_m2m4(syms)}


# ------------------------------------------------------ RF circuits


def transmission_line_input_impedance(z_load, z0: float,
                                      beta_l_rad: float):
    """Lossless line impedance transform
    (transmission_line_simulator.rs): Zin = Z0 (ZL + jZ0 tanβl)/(Z0 +
    jZL tanβl)."""
    zl = complex(z_load)
    t = np.tan(beta_l_rad)
    return z0 * (zl + 1j * z0 * t) / (z0 + 1j * zl * t)


def reflection_coefficient(z, z0: float = 50.0):
    z = np.asarray(z, complex)
    return (z - z0) / (z + z0)


def vswr(z, z0: float = 50.0):
    g = np.abs(reflection_coefficient(z, z0))
    return (1.0 + g) / np.maximum(1.0 - g, 1e-9)


def stub_match(z_load, z0: float = 50.0, n_grid: int = 400):
    """Single-stub matching search (rf_impedance_tuner.rs): grid over
    stub position/length minimizing |Γ|. Returns (d_frac, l_frac,
    residual_vswr) in wavelengths."""
    best = (0.0, 0.0, np.inf)
    for d in np.linspace(0.01, 0.49, n_grid // 20):
        zin = transmission_line_input_impedance(z_load, z0,
                                                2 * np.pi * d)
        yin = 1.0 / zin
        for l in np.linspace(0.01, 0.49, n_grid // 20):
            y_stub = -1j / (z0 * np.tan(2 * np.pi * l))  # shorted stub
            y_tot = yin + y_stub
            s = float(vswr(1.0 / y_tot, z0))
            if s < best[2]:
                best = (d, l, s)
    return best


def microstrip_impedance(w_over_h: float, eps_r: float = 4.4):
    """Closed-form microstrip Z0 (rf_circuit_em_simulator.rs —
    Hammerstad)."""
    u = w_over_h
    eps_eff = (eps_r + 1) / 2 + (eps_r - 1) / 2 \
        / np.sqrt(1 + 12.0 / u)
    if u < 1:
        z0 = 60.0 / np.sqrt(eps_eff) * np.log(8.0 / u + u / 4.0)
    else:
        z0 = 120.0 * np.pi / (np.sqrt(eps_eff)
                              * (u + 1.393 + 0.667 * np.log(u + 1.444)))
    return z0, eps_eff


def dipole_optimize(freq_hz: float, n_grid: int = 200):
    """Half-wave dipole length tuning (antenna_design_optimizer.rs):
    sweep length around λ/2 minimizing |X_in| with the classic
    induced-EMF reactance fit X ≈ 43·(L/λ - 0.468)/0.01 Ω."""
    lam = 299_792_458.0 / freq_hz
    lengths = np.linspace(0.40, 0.52, n_grid) * lam
    react = 43.0 * (lengths / lam - 0.468) / 0.01 * 0.01 * 100
    k = int(np.argmin(np.abs(react)))
    return float(lengths[k]), float(lengths[k] / lam)


def iq_impairment_calibrate(x):
    """Blind IQ gain/phase imbalance estimation + correction matrix
    (rf_impairment_calibrator.rs): from E[I²]/E[Q²] and E[IQ]."""
    z = jnp.asarray(x, IQ_DTYPE)
    i, q = z.real, z.imag
    gain = jnp.sqrt(jnp.mean(i * i) / jnp.maximum(jnp.mean(q * q),
                                                  1e-12))
    phase = jnp.mean(i * q) / jnp.maximum(
        jnp.sqrt(jnp.mean(i * i) * jnp.mean(q * q)), 1e-12)
    # correction: q' = (q*gain + phase-compensation)
    q_c = (q * gain + i * (-phase)) / jnp.sqrt(1 - phase ** 2)
    return jax.lax.complex(i, q_c), \
        {"gain": gain, "phase_sin": phase}


# --------------------------------------------------------- EMC / PIM


def pim_products(f1_hz: float, f2_hz: float, order: int = 3):
    """Passive-intermod product frequencies
    (passive_intermod_analyzer.rs): |m·f1 ± n·f2| with m+n = order."""
    out = []
    for m in range(order + 1):
        n = order - m
        if m and n:
            out += [abs(m * f1_hz - n * f2_hz), m * f1_hz + n * f2_hz]
    return sorted(set(out))


def pim_level(x, f1_hz: float, f2_hz: float, sample_rate: float,
              order: int = 3):
    """Measure the IM3/IM5 level around the predicted products
    (passive_intermod_analyzer.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[0]
    spec = jnp.abs(jnp.fft.fft(x * jnp.asarray(np.hanning(n),
                                               REAL_DTYPE))) ** 2
    freqs = np.fft.fftfreq(n, 1.0 / sample_rate)
    # product bins are static (tones + grid are design-time)
    worst = jnp.asarray(-jnp.inf)
    for f in pim_products(f1_hz, f2_hz, order):
        for sgn in (f, -f):
            k = int(np.argmin(np.abs(freqs - sgn)))
            worst = jnp.maximum(worst, 10.0 * jnp.log10(
                jnp.maximum(spec[k], 1e-30)))
    carrier = 10.0 * jnp.log10(jnp.maximum(
        spec[int(np.argmin(np.abs(freqs - f1_hz)))], 1e-30))
    return worst - carrier      # dBc


def emi_conducted_scan(x, sample_rate: float, rbw_hz: float = 9e3):
    """CISPR-style conducted-emission scan (emi_conducted_analyzer.rs):
    quasi-peak-ish per-bin max over frames at the given RBW."""
    x = jnp.asarray(x, REAL_DTYPE)
    n_fft = max(64, int(sample_rate / rbw_hz))
    n = (x.shape[0] // n_fft) * n_fft
    spec = jnp.abs(jnp.fft.rfft(x[:n].reshape(-1, n_fft), axis=-1))
    qp = jnp.max(spec, axis=0)       # peak-hold detector
    avg = jnp.mean(spec, axis=0)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    return jnp.asarray(freqs), qp, avg


def immunity_test_levels(freq_hz, field_v_per_m: float = 3.0):
    """IEC 61000-4-3 style immunity test profile
    (emc_radiated_immunity.rs): required field over the sweep with the
    80% AM factor."""
    f = np.atleast_1d(np.asarray(freq_hz, float))
    peak = field_v_per_m * 1.8      # 80% AM peak factor
    return jnp.asarray(np.full(f.shape, peak, np.float32))


def injection_locking_detect(x, sample_rate: float, f_free_hz: float,
                             tol_hz: float = 2.0):
    """Detect oscillator injection locking
    (injection_locking_detector.rs): the instantaneous frequency
    collapses onto the injected tone (variance drops, mean shifts)."""
    x = jnp.asarray(x, IQ_DTYPE)
    d = x[1:] * jnp.conj(x[:-1])
    inst = jnp.angle(d) * sample_rate / (2.0 * np.pi)
    mean_f = jnp.mean(inst)
    std_f = jnp.std(inst)
    locked = (jnp.abs(mean_f - f_free_hz) > tol_hz) & (std_f < tol_hz)
    return locked, mean_f, std_f


def spur_scan(x, sample_rate: float, carrier_hz: float,
              exclude_hz: float = 1e3, threshold_dbc: float = -60.0,
              max_spurs: int = 16):
    """Spurious-emission scan (spurious_emission_scanner.rs): the
    spurs above the threshold relative to the carrier. jit-safe
    fixed-capacity form (VERDICT r4 #6): `(freqs[K], dbc[K],
    valid[K])` for the K = max_spurs strongest spurs (descending),
    `valid` False below threshold_dbc."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[0]
    spec = jnp.abs(jnp.fft.fft(
        x * jnp.asarray(np.hanning(n), REAL_DTYPE))) ** 2
    freqs = jnp.asarray(np.fft.fftfreq(n, 1.0 / sample_rate),
                        REAL_DTYPE)
    kc = jnp.argmin(jnp.abs(freqs - carrier_hz))
    p_c = spec[kc]
    in_excl = jnp.abs(freqs - carrier_hz) < exclude_hz
    vals, idx = jax.lax.top_k(jnp.where(in_excl, 0.0, spec), max_spurs)
    dbc = 10.0 * jnp.log10(vals / p_c + 1e-30)
    valid = dbc > threshold_dbc
    return (jnp.where(valid, freqs[idx], 0.0),
            jnp.where(valid, dbc, -jnp.inf), valid)


def spur_cancel(x, spur_hz, sample_rate: float):
    """Cancel known spurs by complex-tone least squares
    (spurs_mitigation.rs)."""
    x = jnp.asarray(x, IQ_DTYPE)
    n = x.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE) / sample_rate
    y = x
    for f in np.atleast_1d(spur_hz):
        tone = cis(2.0 * np.pi * float(f) * t)
        amp = jnp.vdot(tone, y) / n
        y = y - amp * tone
    return y


# -------------------------------------------------- direction finding


def watson_watt_bearing(adcock_ns, adcock_ew, sense=None):
    """Watson–Watt DF bearing (direction_finding_watson_watt.rs):
    atan2 of the two orthogonal Adcock channel amplitudes, with
    optional sense-antenna 180° resolution."""
    ns = jnp.asarray(adcock_ns, REAL_DTYPE)
    ew = jnp.asarray(adcock_ew, REAL_DTYPE)
    # correlate against NS to get signed amplitudes
    ref = ns / jnp.maximum(jnp.sqrt(jnp.mean(ns ** 2)), 1e-12)
    a_ns = jnp.mean(ns * ref)
    a_ew = jnp.mean(ew * ref)
    bearing = jnp.rad2deg(jnp.arctan2(a_ew, a_ns))
    if sense is not None:
        s = jnp.mean(jnp.asarray(sense, REAL_DTYPE) * ref)
        bearing = jnp.where(s < 0, bearing + 180.0, bearing)
    return bearing % 360.0


def df_bearing_pseudodoppler(x, sample_rate: float, rot_hz: float):
    """Pseudo-Doppler radio direction finder (radio_direction_finder.rs):
    phase of the rotation-rate component of the FM-demodulated antenna
    commutation."""
    from r4w_tpu.ops import modem as _modem
    x = jnp.asarray(x, IQ_DTYPE)
    demod = _modem.quadrature_demod(x)
    n = demod.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE) / sample_rate
    ref = cis(-2.0 * np.pi * rot_hz * t)
    return (jnp.rad2deg(jnp.angle(jnp.sum(demod * ref)))) % 360.0


def triangulate_bearings(stations_xy, bearings_deg):
    """Multi-station bearing triangulation (rdf_network_triangulator.rs):
    least-squares intersection of bearing lines."""
    p = jnp.asarray(stations_xy, jnp.float32)
    th = jnp.deg2rad(jnp.asarray(bearings_deg, jnp.float32))
    # line: point p_i, direction (sin θ, cos θ) (bearing from north)
    d = jnp.stack([jnp.sin(th), jnp.cos(th)], axis=-1)     # (S, 2)
    # normal equations for min Σ dist(x, line_i)^2, batched over
    # stations: proj_i = I − d_i d_iᵀ
    proj = (jnp.eye(2, dtype=jnp.float32)[None]
            - d[:, :, None] * d[:, None, :])               # (S, 2, 2)
    a = jnp.sum(proj, axis=0)
    b = jnp.einsum("sij,sj->i", proj, p)
    return jnp.linalg.solve(a, b)


def gps_spoof_detect(cn0_dbhz, doppler_hz, clock_drift_s_s,
                     n_sv_strong_thresh: int = 6):
    """GNSS spoofing heuristics (gps_spoofing_detector.rs): uniform
    high C/N0 across SVs, near-identical Doppler, abnormal clock
    drift. Returns (is_spoofed, flags)."""
    cn0 = np.asarray(cn0_dbhz, float)
    dop = np.asarray(doppler_hz, float)
    flags = {
        "uniform_cn0": bool(cn0.std() < 1.0
                            and (cn0 > 45.0).sum()
                            >= n_sv_strong_thresh),
        "clustered_doppler": bool(np.std(dop) < 5.0),
        "clock_drift": bool(abs(clock_drift_s_s) > 1e-6),
    }
    return sum(flags.values()) >= 2, flags


# ------------------------------------------------------ fingerprinting


def modulation_fingerprint(x):
    """Cumulant-based modulation fingerprint vector
    (modulation_fingerprinter.rs /
    modulation_recognition_classifier.rs feature core): |C20|, |C40|,
    |C42|, envelope CV."""
    z = jnp.asarray(x, IQ_DTYPE)
    z = z / jnp.sqrt(jnp.mean(jnp.abs(z) ** 2))
    c20 = jnp.mean(z ** 2)
    m21 = jnp.mean(jnp.abs(z) ** 2)
    c40 = jnp.mean(z ** 4) - 3.0 * c20 ** 2
    c42 = jnp.mean(jnp.abs(z) ** 4) - jnp.abs(c20) ** 2 - 2.0 * m21 ** 2
    mag = jnp.abs(z)
    cv = jnp.std(mag) / jnp.maximum(jnp.mean(mag), 1e-12)
    return jnp.stack([jnp.abs(c20), jnp.abs(c40), jnp.abs(c42), cv])


def rf_device_fingerprint(x, n_fft: int = 1024):
    """Transmitter hardware fingerprint (rf_fingerprinting_engine.rs):
    CFO, IQ-imbalance proxy, spectral tilt, transient kurtosis —
    stable per-device impairment features."""
    z = jnp.asarray(x, IQ_DTYPE)
    d = z[1:] * jnp.conj(z[:-1])
    cfo = jnp.angle(jnp.mean(d))
    i, q = z.real, z.imag
    iq_gain = jnp.sqrt(jnp.mean(i * i) / jnp.maximum(jnp.mean(q * q),
                                                     1e-12))
    iq_cross = jnp.mean(i * q) / jnp.maximum(jnp.mean(jnp.abs(z) ** 2),
                                             1e-12)
    n = min(z.shape[0], n_fft)
    spec = jnp.abs(jnp.fft.fft(z[:n])) ** 2
    half = n // 2
    tilt = 10.0 * jnp.log10(jnp.maximum(jnp.mean(spec[:half]), 1e-30)
                            / jnp.maximum(jnp.mean(spec[half:]), 1e-30))
    return jnp.stack([cfo, iq_gain, iq_cross, tilt])


def rf_environment_map(powers_dbm, positions_xy, grid_n: int = 32,
                       extent: float = 100.0):
    """IDW interpolated coverage map (rf_environment_mapper.rs)."""
    p = jnp.asarray(powers_dbm, jnp.float32)
    xy = jnp.asarray(positions_xy, jnp.float32)
    xs = jnp.linspace(-extent, extent, grid_n)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    # one batched IDW over the whole grid (was: per-pixel Python loop)
    d2 = ((xy[:, 0][:, None, None] - gx[None]) ** 2
          + (xy[:, 1][:, None, None] - gy[None]) ** 2)   # (S, G, G)
    w = 1.0 / jnp.maximum(d2, 1.0)
    out = jnp.sum(w * p[:, None, None], axis=0) / jnp.sum(w, axis=0)
    return out.astype(jnp.float32)


def protocol_anomaly_score(msg_lengths, msg_intervals_s,
                           train_frac: float = 0.5):
    """Protocol-behavior anomaly scoring (protocol_anomaly_detector.rs):
    z-scores of message length + inter-arrival vs the training
    prefix."""
    ln = jnp.asarray(msg_lengths, jnp.float32)
    iv = jnp.asarray(msg_intervals_s, jnp.float32)
    k = max(2, int(ln.shape[0] * train_frac))  # static train split
    mu_l, sd_l = jnp.mean(ln[:k]), jnp.std(ln[:k]) + 1e-9
    mu_i, sd_i = jnp.mean(iv[:k]), jnp.std(iv[:k]) + 1e-9
    return jnp.sqrt(((ln - mu_l) / sd_l) ** 2
                    + ((iv - mu_i) / sd_i) ** 2).astype(jnp.float32)


# --------------------------------------------------- radio astronomy


def radiometer_total_power(x, frame: int = 1024):
    """Total-power radiometer series + radiometer-equation sensitivity
    (radio_astronomy_receiver.rs)."""
    z = jnp.asarray(x, IQ_DTYPE)
    n = (z.shape[0] // frame) * frame
    p = jnp.mean(jnp.abs(z[:n].reshape(-1, frame)) ** 2, axis=-1)
    # ΔT/T = 1/sqrt(B·τ) with B·τ = frame samples
    sens = 1.0 / np.sqrt(frame)
    return p, sens


def telescope_cross_correlate(a, b, n_lags: int = 64):
    """FX correlator lag spectrum for one baseline
    (radio_telescope_correlator.rs): band-averaged complex visibility
    + fringe delay estimate."""
    x = jnp.asarray(a, IQ_DTYPE)
    y = jnp.asarray(b, IQ_DTYPE)
    n = x.shape[0]
    nfft = 1 << (2 * n - 1).bit_length()
    c = jnp.fft.ifft(jnp.fft.fft(x, nfft)
                     * jnp.conj(jnp.fft.fft(y, nfft)))
    lags = jnp.concatenate([c[-n_lags:], c[:n_lags + 1]])
    vis = jnp.mean(x * jnp.conj(y))
    k = jnp.argmax(jnp.abs(lags)) - n_lags
    return vis, k, lags


BLOCKS = {
    "network_analyzer": ("network_analyzer_s21", "measurement",
                         "S21 magnitude+phase (network_analyzer.rs)"),
    "oscilloscope_trigger": ("oscilloscope_trigger", "measurement",
                             "edge-trigger capture "
                             "(oscilloscope_trigger.rs)",
                             ("level", "slope", "holdoff")),
    "jitter_analyzer": ("jitter_analyze", "measurement",
                        "TIE/period jitter (jitter_analyzer.rs)",
                        ("nominal_period_s",)),
    "power_meter": ("power_meter_dbm", "measurement",
                    "avg+peak dBm (power_meter.rs / "
                    "rf_power_monitor.rs)", ("impedance_ohm",)),
    "vector_signal_analyzer": ("vector_signal_analyze", "measurement",
                               "EVM/margin/PAPR/SNR report "
                               "(vector_signal_analyzer.rs)",
                               ("sps",)),
    "transmission_line_simulator": (
        "transmission_line_input_impedance", "math",
        "Zin transform (transmission_line_simulator.rs)",
        ("z0", "beta_l_rad")),
    "rf_impedance_tuner": ("stub_match", "math",
                           "single-stub match search "
                           "(rf_impedance_tuner.rs)", ("z0",)),
    "rf_circuit_em_simulator": ("microstrip_impedance", "math",
                                "Hammerstad microstrip Z0 "
                                "(rf_circuit_em_simulator.rs)",
                                ("eps_r",)),
    "antenna_design_optimizer": ("dipole_optimize", "math",
                                 "dipole resonance tuning "
                                 "(antenna_design_optimizer.rs)"),
    "rf_impairment_calibrator": ("iq_impairment_calibrate", "filter",
                                 "blind IQ imbalance cal "
                                 "(rf_impairment_calibrator.rs)"),
    "passive_intermod_analyzer": ("pim_level", "measurement",
                                  "IM-product dBc "
                                  "(passive_intermod_analyzer.rs)",
                                  ("order",)),
    "emi_conducted_analyzer": ("emi_conducted_scan", "measurement",
                               "peak/avg emission scan "
                               "(emi_conducted_analyzer.rs)",
                               ("rbw_hz",)),
    "emc_radiated_immunity": ("immunity_test_levels", "measurement",
                              "IEC 61000-4-3 profile "
                              "(emc_radiated_immunity.rs)",
                              ("field_v_per_m",)),
    "injection_locking_detector": ("injection_locking_detect",
                                   "measurement",
                                   "IF collapse detection "
                                   "(injection_locking_detector.rs)",
                                   ("f_free_hz",)),
    "spurious_emission_scanner": ("spur_scan", "measurement",
                                  "spur list in dBc "
                                  "(spurious_emission_scanner.rs)",
                                  ("carrier_hz", "threshold_dbc")),
    "spurs_mitigation": ("spur_cancel", "filter",
                         "LS tone cancellation (spurs_mitigation.rs)",
                         ("spur_hz",)),
    "direction_finding_watson_watt": ("watson_watt_bearing", "radar",
                                      "Adcock DF bearing "
                                      "(direction_finding_watson_"
                                      "watt.rs)"),
    "radio_direction_finder": ("df_bearing_pseudodoppler", "radar",
                               "pseudo-Doppler bearing "
                               "(radio_direction_finder.rs)",
                               ("rot_hz",)),
    "rdf_network_triangulator": ("triangulate_bearings", "radar",
                                 "bearing-line LS intersection "
                                 "(rdf_network_triangulator.rs)"),
    "gps_spoofing_detector": ("gps_spoof_detect", "gnss",
                              "spoofing heuristics "
                              "(gps_spoofing_detector.rs)"),
    "modulation_fingerprinter": ("modulation_fingerprint",
                                 "measurement",
                                 "cumulant fingerprint "
                                 "(modulation_fingerprinter.rs / "
                                 "modulation_recognition_"
                                 "classifier.rs)"),
    "rf_fingerprinting_engine": ("rf_device_fingerprint",
                                 "measurement",
                                 "hardware-impairment fingerprint "
                                 "(rf_fingerprinting_engine.rs)"),
    "rf_environment_mapper": ("rf_environment_map", "measurement",
                              "IDW coverage map "
                              "(rf_environment_mapper.rs)",
                              ("grid_n", "extent")),
    "protocol_anomaly_detector": ("protocol_anomaly_score",
                                  "measurement",
                                  "length/interval z-scores "
                                  "(protocol_anomaly_detector.rs)"),
    "radio_astronomy_receiver": ("radiometer_total_power",
                                 "measurement",
                                 "total-power radiometer "
                                 "(radio_astronomy_receiver.rs)",
                                 ("frame",)),
    "radio_telescope_correlator": ("telescope_cross_correlate",
                                   "measurement",
                                   "baseline visibility + fringe "
                                   "(radio_telescope_correlator.rs)",
                                   ("n_lags",)),
}
