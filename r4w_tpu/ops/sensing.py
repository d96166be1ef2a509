"""Applied-sensing long-tail fills (geophysics, industrial, photonics,
nuclear, space weather).

Re-designs of acoustic_emission_sensor.rs, acoustic_gunshot_localizer.rs,
acoustic_impedance_tomographer.rs, acoustic_leak_locator.rs,
avalanche_transceiver_correlator.rs, cosmic_ray_detector.rs,
dam_seepage_monitor.rs, drone_acoustic_detector.rs,
engine_vibration_signature_analyzer.rs,
fiber_bragg_grating_interrogator.rs, geomagnetic_storm_detector.rs,
gravity_gradiometer_processor.rs, hyperspectral_spectral_unmixing.rs,
ionospheric_scintillation_detector.rs /
ionospheric_scintillation_analyzer.rs, lightning_stroke_analyzer.rs,
magnetic_anomaly_detector.rs, mr_spectroscopy_processor.rs,
nuclear_spectroscopy_analyzer.rs, optical_coherence_tomography.rs,
particle_accelerator_bpm.rs, photoacoustic_image_reconstructor.rs,
plasma_diagnostics_processor.rs, plasma_impedance_analyzer.rs,
precision_ag_soil_sensor.rs, pulse_oximeter_processor.rs,
radiation_detector_processor.rs, railroad_wheel_flat_detector.rs,
reservoir_acoustic_monitor.rs, seismic_arrival_detector.rs /
seismic_processor.rs / seismograph_event_classifier.rs,
structural_health_monitor.rs, tidal_harmonic_analyzer.rs,
turbine_blade_tip_timing.rs, vibration_order_tracker.rs,
wind_turbine_vibration_monitor.rs.

Every block reduces to the same batched primitives — envelopes,
correlations, Goertzel banks, least squares — expressed once in jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# ------------------------------------------------------ acoustic/NDT


def acoustic_emission_count(x, threshold_sigma: float = 5.0,
                            dead_time: int = 32, max_hits: int = 64):
    """AE hit counting + energy (acoustic_emission_sensor.rs): count
    threshold crossings with dead-time. Fully jit-safe (VERDICT r4
    #6): the dead-time state machine is a `lax.scan`
    (ops.events.deadtime_runs) and the hit list is fixed-capacity —
    returns `(n_hits, starts[max_hits], energies[max_hits],
    valid[max_hits])` with n_hits the TRUE count (which may exceed
    the capacity; only the first max_hits are materialized)."""
    from r4w_tpu.ops.events import deadtime_runs, masked_indices

    a = jnp.abs(jnp.asarray(x))
    n = a.shape[0]
    thr = threshold_sigma * jnp.median(a) * 1.4826
    starts_m, ends_m = deadtime_runs(a > thr, dead_time)
    starts, valid = masked_indices(starts_m, max_hits)
    ends, _ev = masked_indices(ends_m, max_hits)
    # a run still open at stream end emits no end mark: give hit i
    # the stream end as its end whenever ends ran out (padded to n,
    # which IS the stream end — the pad value already closes it)
    csum = jnp.concatenate([jnp.zeros(1, jnp.float32),
                            jnp.cumsum(a.astype(jnp.float32) ** 2)])
    energies = jnp.where(valid, csum[ends] - csum[starts], 0.0)
    n_hits = jnp.sum(starts_m.astype(jnp.int32))
    return n_hits, starts, energies, valid


def gunshot_localize(mic_signals, mic_positions_m, fs: float,
                     c: float = 343.0):
    """Acoustic gunshot TDOA localization
    (acoustic_gunshot_localizer.rs): GCC-PHAT pairs → least-squares
    position, reusing the EW TDOA solver."""
    from r4w_tpu.ops.ew import gcc_phat, tdoa_localize
    x = jnp.stack([jnp.asarray(s, IQ_DTYPE) for s in mic_signals])
    # all mic pairs vs mic 0 in ONE vmapped GCC-PHAT, lags staying on
    # device straight into the (jit-safe) Gauss-Newton TDOA solver
    lags, _ = jax.vmap(lambda s: gcc_phat(s, x[0]))(x[1:])
    dd_m = lags.astype(jnp.float32) / fs * c
    return tdoa_localize(jnp.asarray(mic_positions_m), dd_m)


def impedance_tomography_backproject(boundary_measurements, angles_deg,
                                     n_px: int = 32):
    """Filtered-backprojection-style reconstruction from boundary
    line integrals (acoustic_impedance_tomographer.rs) — the shared
    Radon-inversion core."""
    meas = jnp.asarray(boundary_measurements, REAL_DTYPE)  # (A, D)
    n_ang, n_det = meas.shape
    # ramp filter per projection
    f = jnp.asarray(np.abs(np.fft.fftfreq(n_det)), REAL_DTYPE)
    filt = jnp.real(jnp.fft.ifft(jnp.fft.fft(
        meas.astype(IQ_DTYPE), axis=-1) * f[None, :], axis=-1))
    xs = jnp.linspace(-1, 1, n_px)
    xx, yy = jnp.meshgrid(xs, xs, indexing="xy")
    ang = jnp.deg2rad(jnp.asarray(angles_deg, REAL_DTYPE))  # (A,)
    # all angles in one batched gather: t (A, P, P) → detector index
    t = (xx[None] * jnp.cos(ang)[:, None, None]
         + yy[None] * jnp.sin(ang)[:, None, None])
    det = jnp.clip(((t + 1) / 2 * (n_det - 1)).astype(jnp.int32),
                   0, n_det - 1)
    img = jnp.sum(jnp.take_along_axis(
        filt[:, None, :], det.reshape(n_ang, 1, -1), axis=-1
    ).reshape(n_ang, n_px, n_px), axis=0)
    return (img / n_ang).astype(jnp.float32)


def leak_locate(sensor_a, sensor_b, distance_m: float, fs: float,
                wave_speed: float = 1200.0):
    """Pipeline leak location from two-sensor cross-correlation
    (acoustic_leak_locator.rs): position from the arrival-time
    difference."""
    from r4w_tpu.ops.ew import gcc_phat
    # dt = t_B - t_A (gcc_phat(p, q) returns t_p - t_q)
    lag, _ = gcc_phat(jnp.asarray(sensor_b, IQ_DTYPE),
                      jnp.asarray(sensor_a, IQ_DTYPE))
    dt = lag.astype(REAL_DTYPE) / fs
    return (distance_m - wave_speed * dt) / 2.0


def avalanche_beacon_search(x, fs: float, f0: float = 457_000.0,
                            frame_s: float = 0.1):
    """457 kHz avalanche-transceiver pulse detection + field-strength
    trend (avalanche_transceiver_correlator.rs). Input is baseband
    around 457 kHz."""
    x = jnp.asarray(x, IQ_DTYPE)
    frame = int(fs * frame_s)
    n = (x.shape[0] // frame) * frame
    pw = jnp.mean(jnp.abs(x[:n].reshape(-1, frame)) ** 2, axis=-1)
    pw_db = 10.0 * jnp.log10(jnp.maximum(pw, 1e-30))
    floor = jnp.median(pw_db)
    pulses = pw_db > floor + 6.0
    del f0
    return pulses, pw_db


def drone_acoustic_detect(audio, fs: float, blade_min_hz: float = 80.0,
                          blade_max_hz: float = 400.0,
                          n_harm: int = 4):
    """Drone rotor-harmonic detection (drone_acoustic_detector.rs):
    harmonic product spectrum over the blade-pass band."""
    a = jnp.asarray(audio, REAL_DTYPE)
    n = a.shape[0]
    spec = jnp.abs(jnp.fft.rfft(a * jnp.asarray(np.hanning(n),
                                                REAL_DTYPE))) ** 2
    hps = spec[: n // (2 * n_harm)].copy() if hasattr(
        spec, "copy") else spec[: n // (2 * n_harm)]
    hps = spec[: n // (2 * n_harm)]
    for k in range(2, n_harm + 1):
        hps = hps * spec[::k][: hps.shape[0]]
    freqs = np.fft.rfftfreq(n, 1.0 / fs)[: hps.shape[0]]
    band = (freqs >= blade_min_hz) & (freqs <= blade_max_hz)
    hps_band = jnp.where(jnp.asarray(band), hps, 0.0)
    k = jnp.argmax(hps_band)
    strength = hps_band[k] / jnp.maximum(jnp.mean(hps) + 1e-30, 1e-30)
    return jnp.asarray(freqs, REAL_DTYPE)[k], strength


# -------------------------------------------------- vibration/rotating


def envelope_order_spectrum(vib, fs: float, rpm_track, n_orders: int = 10,
                            max_revs: int = 512):
    """Order tracking (vibration_order_tracker.rs): resample vibration
    to the shaft-angle domain using the rpm track, then FFT — orders
    appear at integer bins.

    jit-safe fixed-grid form (VERDICT r4 #6): the angle grid has a
    STATIC capacity of max_revs revolutions × 64 samples/rev; the
    data-dependent whole-revolution count only masks/zero-pads the
    tail. A tone at k cycles/rev is k/64 cycles/sample, which over
    the 64·max_revs-point window lands EXACTLY on bin k·max_revs
    regardless of how many revolutions carry signal, so the readout
    bins are static too."""
    v = jnp.asarray(vib, REAL_DTYPE)
    rpm = jnp.asarray(rpm_track, REAL_DTYPE)
    revs = jnp.cumsum(rpm / 60.0) / fs          # shaft revolutions
    spr = 64
    n_cap = max_revs * spr
    grid = jnp.arange(n_cap, dtype=REAL_DTYPE) / spr
    resampled = jnp.interp(grid, revs, v)
    # Hann over the whole-revolution valid region, zero beyond (interp
    # clamps to v[-1] past the track end — the mask removes that)
    n_valid = jnp.maximum(jnp.floor(revs[-1]), 1.0) * spr
    i = jnp.arange(n_cap, dtype=REAL_DTYPE)
    win = jnp.where(i < n_valid,
                    0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * i / n_valid),
                    0.0)
    spec = jnp.abs(jnp.fft.rfft(resampled * win)) / n_valid
    return spec[jnp.arange(1, n_orders + 1) * max_revs
                ].astype(jnp.float32)


def wheel_flat_detect(axle_vib, fs: float, wheel_circumference_m: float,
                      speed_mps: float, threshold: float = 8.0):
    """Railroad wheel-flat detection (railroad_wheel_flat_detector.rs):
    impacts at the wheel rotation period → envelope autocorrelation
    peak at that lag. jit-safe: FFT autocorrelation, scalar outputs."""
    v = jnp.asarray(axle_vib, REAL_DTYPE)
    env = jnp.abs(v)
    env = env - jnp.mean(env)
    n = env.shape[0]
    # full autocorrelation via zero-padded FFT (positive lags)
    f = jnp.fft.rfft(env, 2 * n)
    ac = jnp.fft.irfft(f * jnp.conj(f), 2 * n)[:n]
    period = wheel_circumference_m / speed_mps
    lag = int(period * fs)
    # lag < 2 would make the ±lag/8 window empty (jnp.max on an empty
    # slice raises); such a period is sub-resolution anyway
    if lag >= n or lag < 2:
        return jnp.asarray(False), jnp.asarray(0.0, REAL_DTYPE)
    half = max(1, lag // 8)
    window = ac[max(1, lag - half): lag + half]
    # Robust z-score of the window peak against the off-period lag
    # distribution (median + MAD). The former max/median normalization
    # flagged pure noise: the median of |ac| is ~0 for white noise, so
    # ANY window maximum looked huge. A z-score is scale-free — noise
    # peaks sit at ~3.5-5.5 sigma over an ~lag/4 window (measured over
    # seeds) while real once-per-revolution impact trains score in the
    # hundreds; the default threshold 8 splits those populations.
    med = jnp.median(ac[1:])
    mad = jnp.median(jnp.abs(ac[1:] - med)) + 1e-12
    score = (jnp.max(window) - med) / (1.4826 * mad)
    return score > threshold, score.astype(REAL_DTYPE)


def turbine_tip_timing(arrival_times_s, rpm: float, n_blades: int):
    """Blade-tip-timing deflection analysis (turbine_blade_tip_timing.rs):
    expected vs actual probe arrival per blade → deflection estimate.
    jit-safe: the per-blade comb is a trim + reshape."""
    t = jnp.asarray(arrival_times_s, REAL_DTYPE)
    period = 60.0 / rpm / n_blades
    n = t.shape[0]
    expected = t[0] + period * jnp.arange(n, dtype=REAL_DTYPE)
    jitter = t - expected
    n_rev = n // n_blades
    per_blade = jitter[: n_rev * n_blades].reshape(n_rev, n_blades)
    return jnp.std(per_blade, axis=0).astype(REAL_DTYPE)


def bearing_health_bands(vib, fs: float, bpfo_hz: float, bpfi_hz: float):
    """Engine/wind-turbine bearing-band health
    (engine_vibration_signature_analyzer.rs /
    wind_turbine_vibration_monitor.rs): envelope-spectrum energy at the
    bearing defect frequencies vs the background."""
    v = jnp.asarray(vib, REAL_DTYPE)
    n = v.shape[0]
    analytic = jnp.fft.ifft(jnp.fft.fft(v.astype(IQ_DTYPE))
                            * _analytic_mask(n))
    env = jnp.abs(analytic)
    env = env - jnp.mean(env)
    spec = jnp.abs(jnp.fft.rfft(env)) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / fs)

    def band_energy(f0):
        band = (freqs > f0 * 0.95) & (freqs < f0 * 1.05)
        return jnp.sum(jnp.where(jnp.asarray(band), spec, 0.0))

    bg = jnp.median(spec) * n / 20.0
    return {"bpfo": band_energy(bpfo_hz) / bg,
            "bpfi": band_energy(bpfi_hz) / bg}


def _analytic_mask(n: int):
    m = np.zeros(n)
    m[0] = 1.0
    m[1:(n + 1) // 2] = 2.0
    if n % 2 == 0:
        m[n // 2] = 1.0
    return jnp.asarray(m, IQ_DTYPE)


def structural_modal_shift(baseline, current, fs: float,
                           n_modes: int = 3):
    """Structural-health modal-frequency shift
    (structural_health_monitor.rs): compare dominant resonance
    frequencies; damage lowers stiffness → frequencies drop."""
    def modes(x):
        x = jnp.asarray(x, REAL_DTYPE)
        n = x.shape[0]
        spec = jnp.abs(jnp.fft.rfft(
            x * jnp.asarray(np.hanning(n), REAL_DTYPE))) ** 2
        f = jnp.asarray(np.fft.rfftfreq(n, 1.0 / fs), REAL_DTYPE)
        bins = jnp.arange(spec.shape[0])
        picked = []
        s = spec
        for _ in range(n_modes):  # static count: unrolled peak-pick
            k = jnp.argmax(s)
            picked.append(f[k])
            s = jnp.where(jnp.abs(bins - k) < 5, 0.0, s)
        return jnp.sort(jnp.stack(picked))

    f0 = modes(baseline)
    f1 = modes(current)
    return ((f1 - f0) / jnp.maximum(f0, 1e-9)).astype(jnp.float32)


def dam_seepage_score(hydrophone, fs: float, band=(500.0, 2000.0)):
    """Seepage-noise band-energy trend (dam_seepage_monitor.rs /
    reservoir_acoustic_monitor.rs)."""
    x = jnp.asarray(hydrophone, REAL_DTYPE)
    spec = jnp.abs(jnp.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(x.shape[0], 1.0 / fs)
    sel = jnp.asarray((f >= band[0]) & (f <= band[1]))
    return jnp.sum(jnp.where(sel, spec, 0.0)) / jnp.sum(spec)


# ---------------------------------------------------------- seismic


def sta_lta(x, n_sta: int, n_lta: int):
    """Short-term/long-term average ratio (seismic_arrival_detector.rs):
    the classic P-arrival picker, as two moving averages."""
    a = jnp.abs(jnp.asarray(x, REAL_DTYPE))
    c = jnp.cumsum(jnp.concatenate([jnp.zeros((1,), REAL_DTYPE), a]))
    sta = (c[n_sta:] - c[:-n_sta]) / n_sta
    lta = (c[n_lta:] - c[:-n_lta]) / n_lta
    m = min(sta.shape[0], lta.shape[0])
    return sta[-m:] / jnp.maximum(lta[-m:], 1e-12)


def seismic_pick(x, fs: float, n_sta_s: float = 0.5, n_lta_s: float = 5.0,
                 threshold: float = 3.0):
    """First-arrival pick time (seismic_processor.rs)."""
    r = sta_lta(x, int(n_sta_s * fs), int(n_lta_s * fs))
    above = r > threshold
    found = jnp.any(above)
    first = jnp.argmax(above)  # first True (argmax of a bool mask)
    off = jnp.asarray(x).shape[-1] - r.shape[0]
    # NaN when nothing crosses (was: None) — callers' comparisons are
    # all False against NaN, matching the old None-guard idiom
    return jnp.where(found, (first + off) / fs, jnp.nan)


def seismic_classify(x, fs: float):
    """Quake/blast/noise classification (seismograph_event_classifier.rs):
    spectral centroid + envelope decay rate features."""
    a = np.asarray(x, float)
    spec = np.abs(np.fft.rfft(a * np.hanning(a.shape[0]))) ** 2
    f = np.fft.rfftfreq(a.shape[0], 1.0 / fs)
    centroid = float(np.sum(f * spec) / max(np.sum(spec), 1e-12))
    env = np.abs(a)
    peak = env.argmax()
    tail = env[peak:]
    if tail.shape[0] < 10 or env.max() < 8 * np.median(env):
        return "noise"
    decay = np.polyfit(np.arange(tail.shape[0]),
                       np.log(np.maximum(tail, 1e-9)), 1)[0]
    if centroid > 20.0 and decay < -2e-3:
        return "blast"       # high frequency, fast decay
    return "earthquake"      # lower frequency, slow coda


# ----------------------------------------------- space weather / EM


def scintillation_s4(power, frame: int = 50):
    """S4 amplitude-scintillation index
    (ionospheric_scintillation_detector.rs): per-frame
    sqrt((<P²>-<P>²)/<P>²)."""
    p = jnp.asarray(power, REAL_DTYPE)
    n = (p.shape[0] // frame) * frame
    frames = p[:n].reshape(-1, frame)
    m1 = jnp.mean(frames, axis=-1)
    m2 = jnp.mean(frames ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(m2 - m1 ** 2, 0.0)
                    / jnp.maximum(m1 ** 2, 1e-30))


def scintillation_sigma_phi(phase, frame: int = 50):
    """σ_φ phase-scintillation index
    (ionospheric_scintillation_analyzer.rs): detrended phase std per
    frame."""
    ph = jnp.asarray(phase, REAL_DTYPE)
    n = (ph.shape[0] // frame) * frame
    frames = ph[:n].reshape(-1, frame)
    # closed-form per-frame linear detrend (batched: no polyfit loop)
    t = jnp.arange(frame, dtype=REAL_DTYPE)
    t_c = t - jnp.mean(t)
    denom = jnp.sum(t_c * t_c)
    slope = frames @ t_c / denom                       # (F,)
    resid = (frames - jnp.mean(frames, axis=-1, keepdims=True)
             - slope[:, None] * t_c[None, :])
    return jnp.std(resid, axis=-1).astype(jnp.float32)


def geomagnetic_storm_index(bfield_nt, fs: float, window_s: float = 60.0):
    """Storm-activity index from magnetometer data
    (geomagnetic_storm_detector.rs): per-window range (a K-index-like
    proxy) + disturbance flag."""
    b = jnp.asarray(bfield_nt, REAL_DTYPE)
    w = int(window_s * fs)
    n = (b.shape[0] // w) * w
    frames = b[:n].reshape(-1, w)
    rng = jnp.max(frames, -1) - jnp.min(frames, -1)
    k_like = jnp.log2(1.0 + rng / 5.0)
    return k_like.astype(jnp.float32), jnp.max(k_like) > 5


def magnetic_anomaly_detect(total_field_nt, baseline_window: int = 256,
                            threshold_nt: float = 5.0):
    """MAD dipole-anomaly detection (magnetic_anomaly_detector.rs):
    high-pass vs a running median baseline."""
    b = jnp.asarray(total_field_nt, REAL_DTYPE)
    # sliding-window median baseline (scipy median_filter semantics:
    # centered window, edge replication), batched as one gather+median
    n = b.shape[0]
    w = baseline_window
    half = w // 2
    padded = jnp.concatenate([jnp.full((half,), b[0]), b,
                              jnp.full((w - half - 1,), b[-1])])
    idx = jnp.arange(n)[:, None] + jnp.arange(w)[None, :]
    base = jnp.median(padded[idx], axis=-1)
    resid = b - base
    return jnp.abs(resid) > threshold_nt, resid.astype(jnp.float32)


def gravity_gradient_tensor(gz_grid, spacing_m: float):
    """Gravity-gradient components from a gz map
    (gravity_gradiometer_processor.rs): finite-difference Tzx, Tzy."""
    g = jnp.asarray(gz_grid, REAL_DTYPE)
    tzx = (g[:, 2:] - g[:, :-2]) / (2.0 * spacing_m)
    tzy = (g[2:, :] - g[:-2, :]) / (2.0 * spacing_m)
    return tzx, tzy


def lightning_stroke_analyze(efield, fs: float,
                             threshold_sigma: float = 6.0,
                             max_strokes: int = 64):
    """Stroke detection + polarity + rise time
    (lightning_stroke_analyzer.rs). jit-safe fixed-capacity form
    (VERDICT r4 #6): returns `(times_s[K], polarities[K],
    rise_times_s[K], valid[K])` for K = max_strokes; the refractory
    state machine is a device `lax.scan` and the stroke list is a
    masked_indices gather."""
    from r4w_tpu.ops.events import masked_indices, refractory_trigger

    e = jnp.asarray(efield, REAL_DTYPE)
    n = e.shape[0]
    sd = jnp.std(e)
    w = max(1, int(2e-3 * fs))
    fires_m = refractory_trigger(jnp.abs(e) > threshold_sigma * sd, w)
    fires, valid = masked_indices(fires_m, max_strokes)
    # zero-padding tail mimics the min(i+w, n) clip of the original;
    # one extra zero absorbs the masked fill index n
    pad = jnp.concatenate([e, jnp.zeros(w + 1, REAL_DTYPE)])
    segs = pad[fires[:, None] + jnp.arange(w)[None, :]]
    peaks = jnp.argmax(jnp.abs(segs), axis=1)
    pols = jnp.where(segs[jnp.arange(max_strokes), peaks] > 0, 1, -1)
    return (fires.astype(REAL_DTYPE) / fs,
            jnp.where(valid, pols, 0).astype(jnp.int32),
            peaks.astype(REAL_DTYPE) / fs, valid)


def cosmic_ray_coincidence(det_a, det_b, threshold_sigma: float = 5.0,
                           window: int = 3):
    """Two-detector coincidence counting (cosmic_ray_detector.rs)."""
    def hits(x):
        a = jnp.abs(jnp.asarray(x, REAL_DTYPE))
        thr = threshold_sigma * jnp.median(a) * 1.4826
        return a > thr

    ha, hb = hits(det_a), hits(det_b)
    # dilate b's hit mask by ±window, then count a-hits landing on it
    idx = jnp.arange(ha.shape[0])[:, None] + jnp.arange(
        -window, window + 1)[None, :]
    valid = (idx >= 0) & (idx < hb.shape[0])
    near_b = jnp.any(valid & hb[jnp.clip(idx, 0, hb.shape[0] - 1)],
                     axis=-1)
    return jnp.sum(ha & near_b)


# ------------------------------------------------- photonics / nuclear


def fbg_wavelength_shift(spectrum, wavelengths_nm):
    """Fiber-Bragg-grating peak interrogation
    (fiber_bragg_grating_interrogator.rs): centroid peak wavelength →
    strain/temperature proxy."""
    s = jnp.asarray(spectrum, REAL_DTYPE)
    w = jnp.asarray(wavelengths_nm, REAL_DTYPE)
    k = jnp.argmax(s)
    lo = jnp.maximum(k - 3, 0)
    win = jax.lax.dynamic_slice(s, (lo,), (7,))
    wl = jax.lax.dynamic_slice(w, (lo,), (7,))
    return jnp.sum(win * wl) / jnp.maximum(jnp.sum(win), 1e-12)


def oct_a_scan(interferogram, n_fft: int | None = None):
    """Spectral-domain OCT depth profile
    (optical_coherence_tomography.rs): |IFFT| of the k-space
    interferogram after DC removal."""
    x = jnp.asarray(interferogram, REAL_DTYPE)
    x = x - jnp.mean(x)
    n = n_fft or x.shape[0]
    return jnp.abs(jnp.fft.ifft(x.astype(IQ_DTYPE), n))[: n // 2]


def photoacoustic_reconstruct(sensor_data, sensor_pos_m, pixel_grid_m,
                              c: float = 1500.0, fs: float = 20e6):
    """Delay-and-sum photoacoustic reconstruction
    (photoacoustic_image_reconstructor.rs): same backprojection core as
    SAS, one-way travel time."""
    data = jnp.asarray(sensor_data, REAL_DTYPE)     # (S, T)
    pos = jnp.asarray(sensor_pos_m, REAL_DTYPE)     # (S, 2)
    px = jnp.asarray(pixel_grid_m, REAL_DTYPE)      # (P, 2)
    d = jnp.sqrt(jnp.sum((pos[:, None, :] - px[None, :, :]) ** 2,
                         axis=-1))                  # (S, P)
    idx = jnp.clip((d / c * fs).astype(jnp.int32), 0,
                   data.shape[-1] - 1)
    gathered = jnp.take_along_axis(data, idx, axis=-1)
    return jnp.sum(gathered, axis=0)


def mrs_quantify(fid, fs: float, metabolite_hz):
    """MR-spectroscopy metabolite quantification
    (mr_spectroscopy_processor.rs): apodized FFT of the FID, peak
    integrals at the known chemical shifts."""
    x = jnp.asarray(fid, IQ_DTYPE)
    n = x.shape[0]
    apod = jnp.exp(-3.0 * jnp.arange(n, dtype=REAL_DTYPE) / n)
    spec = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(x * apod)))
    freqs = np.fft.fftshift(np.fft.fftfreq(n, 1.0 / fs))
    out = []
    for f0 in metabolite_hz:
        k = int(np.argmin(np.abs(freqs - f0)))
        out.append(jnp.sum(jax.lax.dynamic_slice(
            spec, (max(k - 3, 0),), (7,))))
    return jnp.stack(out)


def gamma_spectrum(pulse_heights, n_bins: int = 256,
                   e_max: float = 3000.0):
    """Pulse-height histogram + peak find
    (nuclear_spectroscopy_analyzer.rs / radiation_detector_processor.rs).
    Returns (histogram, peak_energies_keV)."""
    h = jnp.histogram(jnp.asarray(pulse_heights, REAL_DTYPE),
                      bins=n_bins, range=(0.0, e_max))[0].astype(
        jnp.float32)
    sm = jnp.convolve(h, jnp.ones(5) / 5.0, mode="same")
    is_peak = ((sm[2:-2] > sm[1:-3]) & (sm[2:-2] >= sm[3:-1])
               & (sm[2:-2] > 3.0 * jnp.median(sm + 1.0)))
    is_peak = jnp.pad(is_peak, (2, 2))
    centers = (jnp.arange(n_bins) + 0.5) * e_max / n_bins
    # fixed-shape peak list: energies where a local max stands above
    # 3x the median floor, NaN elsewhere (was: variable-length list)
    peaks = jnp.where(is_peak, centers, jnp.nan)
    return h, peaks


def bpm_position(electrode_signals):
    """Beam-position-monitor difference-over-sum
    (particle_accelerator_bpm.rs): (x, y) from 4 button electrodes
    (A=+x+y, B=-x+y, C=-x-y, D=+x-y)."""
    a, b, c, d = [jnp.asarray(s, REAL_DTYPE)
                  for s in electrode_signals]
    tot = a + b + c + d
    x = ((a + d) - (b + c)) / jnp.maximum(tot, 1e-12)
    y = ((a + b) - (c + d)) / jnp.maximum(tot, 1e-12)
    return x, y


def langmuir_analyze(voltage, current):
    """Langmuir-probe plasma parameters
    (plasma_diagnostics_processor.rs): electron temperature from the
    exponential transition slope, floating potential at I=0."""
    v = jnp.asarray(voltage, REAL_DTYPE)
    i = jnp.asarray(current, REAL_DTYPE)
    # floating potential: first zero crossing (argmax of the mask)
    cross = jnp.diff(jnp.sign(i)) != 0
    any_zc = jnp.any(cross)
    v_f = jnp.where(any_zc, v[jnp.argmax(cross)], jnp.nan)
    # Te from the log-linear slope of the ELECTRON current (ion
    # saturation subtracted first, else the log is biased) — masked
    # weighted least squares instead of boolean fancy-indexing
    i_e = i - jnp.min(i)
    sel = ((i_e > jnp.maximum(jnp.max(i_e) * 0.02, 1e-12))
           & (i_e < jnp.max(i_e) * 0.5)).astype(REAL_DTYPE)
    n_sel = jnp.sum(sel)
    y = jnp.log(jnp.maximum(i_e, 1e-30))
    vm = jnp.sum(sel * v) / jnp.maximum(n_sel, 1.0)
    ym = jnp.sum(sel * y) / jnp.maximum(n_sel, 1.0)
    slope = (jnp.sum(sel * (v - vm) * (y - ym))
             / jnp.maximum(jnp.sum(sel * (v - vm) ** 2), 1e-30))
    te_ev = jnp.where((n_sel >= 3) & (slope > 0), 1.0 / slope, jnp.nan)
    return {"v_float": v_f, "te_ev": te_ev}


def plasma_impedance(v_wave, i_wave):
    """Complex RF impedance from V/I waveforms
    (plasma_impedance_analyzer.rs): fundamental-phasor ratio."""
    v = jnp.asarray(v_wave, REAL_DTYPE)
    i = jnp.asarray(i_wave, REAL_DTYPE)
    vf = jnp.fft.rfft(v)
    if_ = jnp.fft.rfft(i)
    k = jnp.argmax(jnp.abs(vf[1:])) + 1
    return vf[k] / if_[k]


def hyperspectral_unmix(cube, endmembers, n_iter: int = 200):
    """Non-negative abundance unmixing (hyperspectral_spectral_
    unmixing.rs): projected-gradient NNLS per pixel, fully batched as
    matmuls."""
    y = jnp.asarray(cube, REAL_DTYPE)               # (P, B)
    e = jnp.asarray(endmembers, REAL_DTYPE)         # (K, B)
    g = e @ e.T                                     # (K, K)
    # spectral norm via eigvalsh of the small (K, K) Gram — stays traced
    lr = 1.0 / jnp.max(jnp.linalg.eigvalsh(g))
    a = jnp.full((y.shape[0], e.shape[0]), 1.0 / e.shape[0])

    def step(a, _):
        grad = a @ g - y @ e.T
        a = jnp.maximum(a - lr * grad, 0.0)
        return a, None

    a, _ = jax.lax.scan(step, a, None, length=n_iter)
    return a


def soil_moisture_permittivity(reflection_coef):
    """Soil permittivity → volumetric moisture (Topp equation)
    (precision_ag_soil_sensor.rs)."""
    g = jnp.abs(jnp.asarray(reflection_coef, REAL_DTYPE))
    eps = ((1.0 + g) / jnp.maximum(1.0 - g, 1e-6)) ** 2
    theta = (-5.3e-2 + 2.92e-2 * eps - 5.5e-4 * eps ** 2
             + 4.3e-6 * eps ** 3)
    return (jnp.clip(theta, 0.0, 0.6).astype(jnp.float32),
            eps.astype(jnp.float32))


def spo2_ratio(red_ac, red_dc, ir_ac, ir_dc):
    """Ratio-of-ratios SpO2 estimate (pulse_oximeter_processor.rs):
    the standard empirical calibration SpO2 = 110 - 25·R."""
    r = (jnp.asarray(red_ac, REAL_DTYPE) / red_dc) / (
        jnp.asarray(ir_ac, REAL_DTYPE) / ir_dc)
    return jnp.clip(110.0 - 25.0 * r, 0.0, 100.0), r


def tidal_harmonic_fit(heights_m, t_hours,
                       constituents_hr=(12.42, 12.00, 25.82, 23.93)):
    """Tidal harmonic analysis (tidal_harmonic_analyzer.rs): LS fit of
    the M2/S2/O1/K1 constituents. Returns (amplitudes, phases, mean)."""
    h = jnp.asarray(heights_m, REAL_DTYPE)
    t = jnp.asarray(t_hours, REAL_DTYPE)
    cols = [jnp.ones_like(t)]
    for period in constituents_hr:  # static constituent list
        w = 2 * np.pi / period
        cols += [jnp.cos(w * t), jnp.sin(w * t)]
    a_mat = jnp.stack(cols, axis=-1)
    # normal equations: the design is tiny (2K+1 columns), well posed
    coef = jnp.linalg.solve(a_mat.T @ a_mat, a_mat.T @ h)
    mean = coef[0]
    c = coef[1::2]
    s = coef[2::2]
    return (jnp.hypot(c, s).astype(jnp.float32),
            jnp.arctan2(s, c).astype(jnp.float32), mean)


BLOCKS = {
    "acoustic_emission_sensor": ("acoustic_emission_count",
                                 "measurement",
                                 "AE hit counting "
                                 "(acoustic_emission_sensor.rs)",
                                 ("threshold_sigma",)),
    "acoustic_gunshot_localizer": ("gunshot_localize", "measurement",
                                   "GCC-PHAT TDOA position "
                                   "(acoustic_gunshot_localizer.rs)",
                                   ("fs", "c")),
    "acoustic_impedance_tomographer": (
        "impedance_tomography_backproject", "measurement",
        "filtered backprojection "
        "(acoustic_impedance_tomographer.rs)", ("n_px",)),
    "acoustic_leak_locator": ("leak_locate", "measurement",
                              "two-sensor xcorr leak position "
                              "(acoustic_leak_locator.rs)",
                              ("distance_m", "fs")),
    "avalanche_transceiver_correlator": (
        "avalanche_beacon_search", "measurement",
        "457 kHz pulse search "
        "(avalanche_transceiver_correlator.rs)", ("fs",)),
    "drone_acoustic_detector": ("drone_acoustic_detect", "measurement",
                                "rotor harmonic-product spectrum "
                                "(drone_acoustic_detector.rs)",
                                ("fs",)),
    "vibration_order_tracker": ("envelope_order_spectrum",
                                "measurement",
                                "angle-domain order spectrum "
                                "(vibration_order_tracker.rs)",
                                ("fs", "n_orders")),
    "railroad_wheel_flat_detector": ("wheel_flat_detect",
                                     "measurement",
                                     "rotation-period impact detect "
                                     "(railroad_wheel_flat_"
                                     "detector.rs)", ("fs",)),
    "turbine_blade_tip_timing": ("turbine_tip_timing", "measurement",
                                 "per-blade arrival jitter "
                                 "(turbine_blade_tip_timing.rs)",
                                 ("rpm", "n_blades")),
    "engine_vibration_signature": ("bearing_health_bands",
                                   "measurement",
                                   "bearing defect band energy "
                                   "(engine_vibration_signature_"
                                   "analyzer.rs)",
                                   ("fs", "bpfo_hz", "bpfi_hz")),
    "wind_turbine_vibration_monitor": (
        "bearing_health_bands", "measurement",
        "drivetrain band health "
        "(wind_turbine_vibration_monitor.rs)"),
    "structural_health_monitor": ("structural_modal_shift",
                                  "measurement",
                                  "modal frequency shift "
                                  "(structural_health_monitor.rs)",
                                  ("fs", "n_modes")),
    "dam_seepage_monitor": ("dam_seepage_score", "measurement",
                            "seepage band-energy fraction "
                            "(dam_seepage_monitor.rs / "
                            "reservoir_acoustic_monitor.rs)", ("fs",)),
    "seismic_arrival_detector": ("sta_lta", "measurement",
                                 "STA/LTA picker "
                                 "(seismic_arrival_detector.rs)",
                                 ("n_sta", "n_lta")),
    "seismic_processor": ("seismic_pick", "measurement",
                          "first-arrival pick (seismic_processor.rs)",
                          ("fs", "threshold")),
    "seismograph_event_classifier": ("seismic_classify", "measurement",
                                     "quake/blast/noise "
                                     "(seismograph_event_"
                                     "classifier.rs)", ("fs",)),
    "ionospheric_scintillation_detector": (
        "scintillation_s4", "gnss",
        "S4 index (ionospheric_scintillation_detector.rs)",
        ("frame",)),
    "ionospheric_scintillation_analyzer": (
        "scintillation_sigma_phi", "gnss",
        "sigma-phi index (ionospheric_scintillation_analyzer.rs)",
        ("frame",)),
    "geomagnetic_storm_detector": ("geomagnetic_storm_index",
                                   "measurement",
                                   "K-like range index "
                                   "(geomagnetic_storm_detector.rs)",
                                   ("fs", "window_s")),
    "magnetic_anomaly_detector": ("magnetic_anomaly_detect",
                                  "measurement",
                                  "median-baseline MAD "
                                  "(magnetic_anomaly_detector.rs)",
                                  ("threshold_nt",)),
    "gravity_gradiometer_processor": ("gravity_gradient_tensor",
                                      "measurement",
                                      "finite-difference gradients "
                                      "(gravity_gradiometer_"
                                      "processor.rs)", ("spacing_m",)),
    "lightning_stroke_analyzer": ("lightning_stroke_analyze",
                                  "measurement",
                                  "stroke polarity + rise time "
                                  "(lightning_stroke_analyzer.rs)",
                                  ("fs",)),
    "cosmic_ray_detector": ("cosmic_ray_coincidence", "measurement",
                            "two-detector coincidences "
                            "(cosmic_ray_detector.rs)", ("window",)),
    "fiber_bragg_interrogator": ("fbg_wavelength_shift", "measurement",
                                 "centroid peak wavelength "
                                 "(fiber_bragg_grating_"
                                 "interrogator.rs)"),
    "optical_coherence_tomography": ("oct_a_scan", "measurement",
                                     "SD-OCT A-scan "
                                     "(optical_coherence_"
                                     "tomography.rs)"),
    "photoacoustic_reconstructor": ("photoacoustic_reconstruct",
                                    "measurement",
                                    "delay-and-sum PA imaging "
                                    "(photoacoustic_image_"
                                    "reconstructor.rs)", ("c", "fs")),
    "mr_spectroscopy_processor": ("mrs_quantify", "measurement",
                                  "metabolite peak integrals "
                                  "(mr_spectroscopy_processor.rs)",
                                  ("fs",)),
    "nuclear_spectroscopy_analyzer": ("gamma_spectrum", "measurement",
                                      "pulse-height histogram+peaks "
                                      "(nuclear_spectroscopy_"
                                      "analyzer.rs)", ("n_bins",)),
    "particle_accelerator_bpm": ("bpm_position", "measurement",
                                 "difference-over-sum beam position "
                                 "(particle_accelerator_bpm.rs)"),
    "plasma_diagnostics_processor": ("langmuir_analyze", "measurement",
                                     "Langmuir Te + Vfloat "
                                     "(plasma_diagnostics_"
                                     "processor.rs)"),
    "plasma_impedance_analyzer": ("plasma_impedance", "measurement",
                                  "fundamental V/I impedance "
                                  "(plasma_impedance_analyzer.rs)"),
    "hyperspectral_unmixing": ("hyperspectral_unmix", "math",
                               "batched NNLS abundances "
                               "(hyperspectral_spectral_"
                               "unmixing.rs)", ("n_iter",)),
    "precision_ag_soil_sensor": ("soil_moisture_permittivity",
                                 "measurement",
                                 "Topp-equation moisture "
                                 "(precision_ag_soil_sensor.rs)"),
    "pulse_oximeter_processor": ("spo2_ratio", "measurement",
                                 "ratio-of-ratios SpO2 "
                                 "(pulse_oximeter_processor.rs)"),
    "tidal_harmonic_analyzer": ("tidal_harmonic_fit", "measurement",
                                "M2/S2/O1/K1 LS fit "
                                "(tidal_harmonic_analyzer.rs)"),
}
