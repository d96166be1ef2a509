"""Specialty-modem & power-systems fills.

Re-designs of jt65_modulator.rs, wspr_modulator.rs,
underwater_acoustic_modem.rs, powerline_carrier_modem.rs,
rfid_backscatter_receiver.rs, ambient_backscatter_processor.rs,
vlc_modulator.rs, optical_coherent_receiver.rs, dab_plus.rs,
drm_ofdm_processor.rs, industrial_process_modulation.rs,
ev_motor_commutation_controller.rs, photovoltaic_mppt_controller.rs,
phasor_measurement_unit.rs, power_line_harmonic_analyzer.rs,
power_quality_harmonics_analyzer.rs, power_quality_event_classifier.rs,
powerline_carrier_modem.rs, quantum_key_distribution.rs,
photonic_processing.rs, wavelength_division_mux.rs.

Each modem is a compact TX/RX pair over batched tone synthesis +
Goertzel-bank detection; power-systems analysis is one windowed FFT.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.hostio import cis
from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

# ----------------------------------------------------------- WSJT-ish

_JT65_NTONES = 65
_JT65_TONE_SPACING = 2.6917  # Hz
_JT65_SYM_S = 0.372

_WSPR_NTONES = 4
_WSPR_TONE_SPACING = 1.4648
_WSPR_SYM_S = 0.6827


def _mfsk_modulate(symbols, n_tones: int, tone_spacing: float,
                   sym_s: float, sample_rate: float,
                   base_hz: float = 1270.5):
    """Shared MFSK synth for the WSJT family: one row per symbol via a
    (n_sym, sym_len) phase grid; phase-continuous across symbols."""
    s = jnp.asarray(symbols, jnp.int32)
    sym_len = int(round(sym_s * sample_rate))
    freqs = base_hz + s.astype(REAL_DTYPE) * tone_spacing
    # phase continuity: cumulative phase at each symbol boundary
    dphi = 2.0 * np.pi * freqs * sym_len / sample_rate
    phi0 = jnp.concatenate([jnp.zeros((1,), REAL_DTYPE),
                            jnp.cumsum(dphi)[:-1]])
    t = jnp.arange(sym_len, dtype=REAL_DTYPE) / sample_rate
    phase = phi0[:, None] + 2.0 * np.pi * freqs[:, None] * t[None, :]
    del n_tones
    return cis(phase).reshape(-1).astype(IQ_DTYPE)


def _mfsk_demodulate(x, n_tones: int, tone_spacing: float, sym_s: float,
                     sample_rate: float, base_hz: float = 1270.5):
    x = jnp.asarray(x, IQ_DTYPE)
    sym_len = int(round(sym_s * sample_rate))
    n_sym = x.shape[0] // sym_len
    frames = x[: n_sym * sym_len].reshape(n_sym, sym_len)
    t = jnp.arange(sym_len, dtype=REAL_DTYPE) / sample_rate
    freqs = base_hz + jnp.arange(n_tones, dtype=REAL_DTYPE) \
        * tone_spacing
    basis = cis(-2.0 * np.pi * freqs[:, None] * t[None, :])
    energy = jnp.abs(frames @ basis.T) ** 2
    return jnp.argmax(energy, axis=-1).astype(jnp.int32)


def jt65_modulate(symbols, sample_rate: float = 11025.0):
    """JT65 65-FSK symbol synthesis (jt65_modulator.rs): 2.69 Hz tone
    grid, 0.372 s symbols, phase-continuous."""
    return _mfsk_modulate(symbols, _JT65_NTONES, _JT65_TONE_SPACING,
                          _JT65_SYM_S, sample_rate)


def jt65_demodulate(x, sample_rate: float = 11025.0):
    return _mfsk_demodulate(x, _JT65_NTONES, _JT65_TONE_SPACING,
                            _JT65_SYM_S, sample_rate)


def wspr_modulate(symbols, sample_rate: float = 12000.0):
    """WSPR 4-FSK synthesis (wspr_modulator.rs): 1.4648 Hz spacing,
    0.683 s symbols."""
    return _mfsk_modulate(symbols, _WSPR_NTONES, _WSPR_TONE_SPACING,
                          _WSPR_SYM_S, sample_rate)


def wspr_demodulate(x, sample_rate: float = 12000.0):
    return _mfsk_demodulate(x, _WSPR_NTONES, _WSPR_TONE_SPACING,
                            _WSPR_SYM_S, sample_rate)


# ------------------------------------------------------- underwater


def underwater_modulate(bits, sample_rate: float = 48000.0,
                        f0: float = 9000.0, f1: float = 11000.0,
                        baud: float = 100.0):
    """Underwater acoustic FSK modem TX (underwater_acoustic_modem.rs):
    slow FSK with raised-cosine symbol shaping against the
    reverberant channel."""
    b = jnp.asarray(bits, jnp.int32)
    sym_len = int(sample_rate / baud)
    freqs = jnp.where(b > 0, f1, f0).astype(REAL_DTYPE)
    dphi = 2.0 * np.pi * freqs * sym_len / sample_rate
    phi0 = jnp.concatenate([jnp.zeros((1,), REAL_DTYPE),
                            jnp.cumsum(dphi)[:-1]])
    t = jnp.arange(sym_len, dtype=REAL_DTYPE) / sample_rate
    phase = phi0[:, None] + 2.0 * np.pi * freqs[:, None] * t[None, :]
    ramp = jnp.asarray(np.hanning(sym_len) ** 0.25, REAL_DTYPE)
    return (cis(phase) * ramp[None, :]).reshape(-1).astype(IQ_DTYPE)


def underwater_demodulate(x, sample_rate: float = 48000.0,
                          f0: float = 9000.0, f1: float = 11000.0,
                          baud: float = 100.0):
    """Noncoherent dual-tone energy detection (robust to multipath
    phase)."""
    x = jnp.asarray(x, IQ_DTYPE)
    sym_len = int(sample_rate / baud)
    n_sym = x.shape[0] // sym_len
    frames = x[: n_sym * sym_len].reshape(n_sym, sym_len)
    t = jnp.arange(sym_len, dtype=REAL_DTYPE) / sample_rate
    b0 = cis(-2.0 * np.pi * f0 * t)
    b1 = cis(-2.0 * np.pi * f1 * t)
    e0 = jnp.abs(frames @ b0) ** 2
    e1 = jnp.abs(frames @ b1) ** 2
    return (e1 > e0).astype(jnp.int32)


# --------------------------------------------------------- powerline


def plc_modulate(bits, sample_rate: float = 250e3,
                 carriers_hz=(75e3, 85e3), baud: float = 2400.0):
    """Powerline-carrier S-FSK modem (powerline_carrier_modem.rs):
    spread-frequency-shift keying on two widely spaced carriers so
    narrowband powerline noise only hits one."""
    return underwater_modulate(bits, sample_rate, carriers_hz[0],
                               carriers_hz[1], baud)


def plc_demodulate(x, sample_rate: float = 250e3,
                   carriers_hz=(75e3, 85e3), baud: float = 2400.0):
    """S-FSK receive decision (IEC 61334-5-1 style, the point of
    powerline_carrier_modem.rs): per-carrier quality = bimodality of
    the symbol-energy distribution. A jammed carrier is 'always on'
    (low bimodality) — demodulate from the clean carrier alone against
    its own threshold instead of comparing the two energies."""
    x = jnp.asarray(x, IQ_DTYPE)
    sym_len = int(sample_rate / baud)
    n_sym = x.shape[0] // sym_len
    frames = x[: n_sym * sym_len].reshape(n_sym, sym_len)
    t = jnp.arange(sym_len, dtype=REAL_DTYPE) / sample_rate
    e0 = np.asarray(jnp.abs(frames @ cis(-2.0 * np.pi * carriers_hz[0]
                                         * t)) ** 2)
    e1 = np.asarray(jnp.abs(frames @ cis(-2.0 * np.pi * carriers_hz[1]
                                         * t)) ** 2)

    def quality(e):
        s = np.sort(e)
        lo = np.median(s[: max(1, len(s) // 2)])
        hi = np.median(s[len(s) // 2:])
        return hi / max(lo, 1e-12)

    q0, q1 = quality(e0), quality(e1)
    if min(q0, q1) > 3.0:            # both carriers clean
        bits = e1 > e0
    elif q1 >= q0:                    # carrier 0 jammed -> use f1 only
        thr = 0.5 * (np.median(np.sort(e1)[: len(e1) // 2])
                     + np.median(np.sort(e1)[len(e1) // 2:]))
        bits = e1 > thr
    else:                             # carrier 1 jammed -> use f0 only
        thr = 0.5 * (np.median(np.sort(e0)[: len(e0) // 2])
                     + np.median(np.sort(e0)[len(e0) // 2:]))
        bits = ~(e0 > thr)
    return jnp.asarray(bits.astype(np.int64), jnp.int32)


# -------------------------------------------------------- backscatter


def rfid_backscatter_decode(x, blf_hz: float, sample_rate: float):
    """FM0-coded RFID backscatter decode
    (rfid_backscatter_receiver.rs): envelope → matched half-bit
    integrate → FM0 transitions. Returns bits."""
    env = jnp.abs(jnp.asarray(x, IQ_DTYPE))
    env = env - jnp.mean(env)
    half = max(1, int(round(sample_rate / blf_hz / 2.0)))
    n_half = env.shape[0] // half
    halves = jnp.sum(env[: n_half * half].reshape(n_half, half),
                     axis=-1)
    signs = jnp.sign(halves)
    # FM0: transition at every bit boundary; mid-bit transition = 0
    first = signs[0:n_half - 1:2]
    second = signs[1:n_half:2]
    bits = (first == second).astype(jnp.int32)  # no mid transition -> 1
    return bits


def ambient_backscatter_detect(x, frame: int = 64):
    """Ambient-backscatter bit detection
    (ambient_backscatter_processor.rs): averaged envelope levels
    cluster into reflect/absorb states; threshold at the midpoint."""
    env = jnp.abs(jnp.asarray(x))
    n = (env.shape[0] // frame) * frame
    levels = jnp.mean(env[:n].reshape(-1, frame), axis=-1)
    thr = 0.5 * (jnp.max(levels) + jnp.min(levels))
    return (levels > thr).astype(jnp.int32), levels


# --------------------------------------------------------------- VLC


def vlc_modulate(bits, sps: int = 8, kind: str = "ook_manchester",
                 dimming: float = 0.5):
    """Visible-light OOK/VPPM modulation (vlc_modulator.rs):
    Manchester-coded intensity (non-negative) with dimming support."""
    b = jnp.asarray(bits, jnp.int32)
    half = sps // 2
    if kind == "ook_manchester":
        hi = jnp.ones((half,), REAL_DTYPE)
        lo = jnp.zeros((half,), REAL_DTYPE)
        one = jnp.concatenate([hi, lo])
        zero = jnp.concatenate([lo, hi])
        wave = jnp.where(b[:, None] > 0, one[None, :], zero[None, :])
        return (wave * 2.0 * dimming).reshape(-1)
    if kind == "vppm":
        width = jnp.clip(jnp.asarray(dimming), 0.1, 0.9)
        pos = jnp.where(b > 0, 0.0, 1.0 - width)
        t = jnp.arange(sps, dtype=REAL_DTYPE) / sps
        wave = ((t[None, :] >= pos[:, None])
                & (t[None, :] < pos[:, None] + width)).astype(REAL_DTYPE)
        return wave.reshape(-1)
    raise ValueError(f"unknown VLC kind '{kind}'")


def vlc_demodulate(intensity, sps: int = 8):
    """Manchester OOK decode: first-half minus second-half energy."""
    x = jnp.asarray(intensity, REAL_DTYPE)
    n_sym = x.shape[0] // sps
    frames = x[: n_sym * sps].reshape(n_sym, sps)
    half = sps // 2
    return (jnp.sum(frames[:, :half], axis=-1)
            > jnp.sum(frames[:, half:], axis=-1)).astype(jnp.int32)


# ------------------------------------------------------------ optical


def coherent_optical_receive(x, constellation, loop_bw: float = 0.02):
    """Coherent optical DSP chain (optical_coherent_receiver.rs):
    CD-free toy chain = power normalize → Viterbi&Viterbi phase
    recovery → decisions."""
    from r4w_tpu.ops import sync2 as _sync2
    from r4w_tpu.ops import mapping as _mapping
    x = jnp.asarray(x, IQ_DTYPE)
    x = x / jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))
    order = 4 if jnp.asarray(constellation).shape[0] <= 4 else 4
    y, _ = _sync2.carrier_recovery_mpsk(x, order=order, bw=loop_bw)
    idx = _mapping.symbol_demap(y, constellation)
    return idx, y


def wdm_mux(channels, spacing_cycles: float = 0.2):
    """Wavelength-division multiplex N baseband channels onto an
    optical-frequency comb (wavelength_division_mux.rs): channel k at
    offset k·spacing (cycles/sample)."""
    chans = [jnp.asarray(c, IQ_DTYPE) for c in channels]
    n = chans[0].shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE)
    out = jnp.zeros((n,), IQ_DTYPE)
    for k, c in enumerate(chans):
        out = out + c * cis(2.0 * np.pi * (k - (len(chans) - 1) / 2.0)
                            * spacing_cycles * t)
    return out


def wdm_demux(x, n_channels: int, spacing_cycles: float = 0.2,
              n_taps: int = 101):
    """Inverse: mix each channel to baseband + lowpass."""
    from r4w_tpu.ops import filters as _filters
    x = jnp.asarray(x, IQ_DTYPE)
    t = jnp.arange(x.shape[0], dtype=REAL_DTYPE)
    lp = jnp.asarray(_filters.design_lowpass(
        n_taps, spacing_cycles / 2.5, 1.0), REAL_DTYPE)
    outs = []
    for k in range(n_channels):
        mixed = x * cis(-2.0 * np.pi * (k - (n_channels - 1) / 2.0)
                        * spacing_cycles * t)
        outs.append(_filters.fir_apply(lp, mixed))
    return jnp.stack(outs)


def photonic_mzi_transfer(phase_rad, extinction_db: float = 30.0):
    """Mach-Zehnder interferometer intensity transfer
    (photonic_processing.rs): T = cos²(φ/2) with finite extinction."""
    p = jnp.asarray(phase_rad, REAL_DTYPE)
    leak = 10.0 ** (-extinction_db / 10.0)
    return (1.0 - leak) * jnp.cos(p / 2.0) ** 2 + leak


# ------------------------------------------------------------ DAB/DRM


def dab_symbol_modulate(bits, n_carriers: int = 1536, n_fft: int = 2048):
    """DAB-style DQPSK-OFDM symbol chain (dab_plus.rs): π/4-DQPSK per
    carrier across symbols, centered carrier allocation, CP."""
    b = jnp.asarray(bits, jnp.int32)
    n = (b.shape[0] // (2 * n_carriers)) * (2 * n_carriers)
    pairs = b[:n].reshape(-1, n_carriers, 2)
    phases = (np.pi / 2.0) * (2 * pairs[..., 0] + pairs[..., 1]) \
        .astype(REAL_DTYPE) + np.pi / 4.0
    # differential across OFDM symbols (first symbol = reference ones)
    ref = jnp.zeros((1, n_carriers), REAL_DTYPE)
    cum = jnp.cumsum(jnp.concatenate([ref, phases], axis=0), axis=0)
    syms = cis(cum)
    # center carriers around DC, skip DC
    grid = jnp.zeros((syms.shape[0], n_fft), IQ_DTYPE)
    half = n_carriers // 2
    idx = jnp.concatenate([jnp.arange(-half, 0), jnp.arange(1, half + 1)])
    grid = grid.at[:, idx % n_fft].set(syms)
    td = jnp.fft.ifft(grid, axis=-1)
    cp = n_fft // 4
    with_cp = jnp.concatenate([td[:, -cp:], td], axis=-1)
    return with_cp.reshape(-1), cum


def dab_symbol_demodulate(x, n_carriers: int = 1536, n_fft: int = 2048):
    """Differential demod across symbols — no channel estimate needed
    (the DAB design point)."""
    cp = n_fft // 4
    sym_len = n_fft + cp
    n_sym = jnp.asarray(x).shape[0] // sym_len
    frames = jnp.asarray(x, IQ_DTYPE)[: n_sym * sym_len].reshape(
        n_sym, sym_len)[:, cp:]
    grid = jnp.fft.fft(frames, axis=-1)
    half = n_carriers // 2
    idx = jnp.concatenate([jnp.arange(-half, 0), jnp.arange(1, half + 1)])
    carriers = grid[:, idx % n_fft]
    diff = carriers[1:] * jnp.conj(carriers[:-1])
    ph = (jnp.angle(diff) - np.pi / 4.0) / (np.pi / 2.0)
    q = jnp.round(ph).astype(jnp.int32) % 4
    msb = q // 2
    lsb = q % 2
    return jnp.stack([msb, lsb], axis=-1).reshape(n_sym - 1, -1) \
        .reshape(-1)


def drm_ofdm_params(mode: str = "B"):
    """DRM OFDM numerology table (drm_ofdm_processor.rs)."""
    table = {
        "A": {"t_u_ms": 24.0, "t_g_ms": 2.66, "carriers": 226},
        "B": {"t_u_ms": 21.33, "t_g_ms": 5.33, "carriers": 206},
        "C": {"t_u_ms": 14.66, "t_g_ms": 5.33, "carriers": 138},
        "D": {"t_u_ms": 9.33, "t_g_ms": 7.33, "carriers": 88},
    }
    return table[mode]


# ----------------------------------------------------- power systems


def pmu_phasor(x, sample_rate: float, f_nominal: float = 50.0):
    """Synchrophasor estimate (phasor_measurement_unit.rs): amplitude,
    phase and frequency of the fundamental over one reporting window,
    via the DFT at nominal + frequency correction from phase slope."""
    x = jnp.asarray(x, REAL_DTYPE)
    n = x.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE) / sample_rate
    basis = cis(-2.0 * np.pi * f_nominal * t)
    half = n // 2
    p1 = jnp.sum(x[:half] * basis[:half]) * (2.0 / half)
    p2 = jnp.sum(x[half:] * basis[half:]) * (2.0 / (n - half))
    dphi = jnp.angle(p2 * jnp.conj(p1))
    dt = half / sample_rate
    f_est = f_nominal + dphi / (2.0 * np.pi * dt)
    phasor = (p1 + p2) / 2.0
    return jnp.abs(phasor), jnp.angle(phasor), f_est


def harmonics_analyze(x, sample_rate: float, f0: float = 50.0,
                      n_harmonics: int = 13):
    """Harmonic amplitudes + THD (power_line_harmonic_analyzer.rs /
    power_quality_harmonics_analyzer.rs) via a Goertzel bank at k·f0."""
    x = jnp.asarray(x, REAL_DTYPE)
    n = x.shape[0]
    t = jnp.arange(n, dtype=REAL_DTYPE) / sample_rate
    k = jnp.arange(1, n_harmonics + 1, dtype=REAL_DTYPE)
    basis = cis(-2.0 * np.pi * f0 * k[:, None] * t[None, :])
    amps = jnp.abs(basis @ x) * (2.0 / n)
    thd = jnp.sqrt(jnp.sum(amps[1:] ** 2)) / jnp.maximum(amps[0], 1e-12)
    return amps, thd


def power_quality_classify(x, sample_rate: float, f0: float = 50.0,
                           frame_cycles: int = 1):
    """Sag/swell/interruption/harmonic event classification per frame
    (power_quality_event_classifier.rs): RMS vs nominal + THD."""
    x = np.asarray(x, np.float64)
    frame = int(sample_rate / f0) * frame_cycles
    n_frames = x.shape[0] // frame
    nominal = None
    events = []
    for i in range(n_frames):
        seg = x[i * frame:(i + 1) * frame]
        rms = np.sqrt(np.mean(seg ** 2))
        if nominal is None:
            nominal = rms
        r = rms / nominal
        amps, thd = harmonics_analyze(seg, sample_rate, f0, 7)
        if r < 0.1:
            events.append((i, "interruption"))
        elif r < 0.9:
            events.append((i, "sag"))
        elif r > 1.1:
            events.append((i, "swell"))
        elif float(thd) > 0.1:
            events.append((i, "harmonic"))
    return events


def mppt_perturb_observe(v, i, v_step: float = 0.1,
                         state: tuple = (0.0, 0.0, 1.0)):
    """Perturb-and-observe MPPT command
    (photovoltaic_mppt_controller.rs): returns (new_v_ref, state)."""
    p = v * i
    p_prev, v_prev, direction = state
    if p < p_prev:
        direction = -direction
    v_ref = v + direction * v_step
    return v_ref, (p, v, direction)


def bldc_commutation(theta_rad, pole_pairs: int = 4):
    """Six-step BLDC commutation state from the electrical angle
    (ev_motor_commutation_controller.rs): returns the sector 0-5 and
    the three phase drive levels."""
    elec = (np.asarray(theta_rad) * pole_pairs) % (2.0 * np.pi)
    sector = (elec / (np.pi / 3.0)).astype(int) % 6
    table = np.array([
        [1, -1, 0], [1, 0, -1], [0, 1, -1],
        [-1, 1, 0], [-1, 0, 1], [0, -1, 1]])
    return sector, table[sector]


def industrial_4_20ma_encode(values, lo: float, hi: float):
    """4–20 mA process-current encoding
    (industrial_process_modulation.rs)."""
    v = jnp.asarray(values, REAL_DTYPE)
    frac = jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)
    return 4.0 + 16.0 * frac


def industrial_4_20ma_decode(ma, lo: float, hi: float):
    cur = jnp.clip(jnp.asarray(ma, REAL_DTYPE), 4.0, 20.0)
    return lo + (cur - 4.0) / 16.0 * (hi - lo)


# --------------------------------------------------------------- QKD


def bb84_sift(key, n_bits: int, error_rate: float = 0.0, seed: int = 0):
    """BB84 protocol simulation (quantum_key_distribution.rs): random
    bases for Alice/Bob, sifting, QBER estimate. Returns
    (sifted_key_alice, sifted_key_bob, qber)."""
    rng = np.random.default_rng(seed)
    alice_bits = rng.integers(0, 2, n_bits)
    alice_bases = rng.integers(0, 2, n_bits)
    bob_bases = rng.integers(0, 2, n_bits)
    # measurement: same basis -> alice's bit (maybe flipped by noise),
    # different basis -> random
    noise = rng.uniform(size=n_bits) < error_rate
    rand_bits = rng.integers(0, 2, n_bits)
    bob_bits = np.where(alice_bases == bob_bases,
                        alice_bits ^ noise.astype(np.int64), rand_bits)
    keep = alice_bases == bob_bases
    a, b = alice_bits[keep], bob_bits[keep]
    qber = float(np.mean(a != b)) if a.shape[0] else 0.0
    del key
    return jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32), qber


BLOCKS = {
    "jt65_modulator": ("jt65_modulate", "modulator",
                       "65-FSK JT65 synth (jt65_modulator.rs)",
                       ("sample_rate",)),
    "wspr_modulator": ("wspr_modulate", "modulator",
                       "WSPR 4-FSK synth (wspr_modulator.rs)",
                       ("sample_rate",)),
    "underwater_acoustic_modem": ("underwater_modulate", "modulator",
                                  "slow shaped FSK "
                                  "(underwater_acoustic_modem.rs)",
                                  ("f0", "f1", "baud")),
    "powerline_carrier_modem": ("plc_modulate", "modulator",
                                "S-FSK PLC modem "
                                "(powerline_carrier_modem.rs)",
                                ("carriers_hz", "baud")),
    "rfid_backscatter_receiver": ("rfid_backscatter_decode",
                                  "demodulator",
                                  "FM0 backscatter decode "
                                  "(rfid_backscatter_receiver.rs)",
                                  ("blf_hz", "sample_rate")),
    "ambient_backscatter_processor": (
        "ambient_backscatter_detect", "demodulator",
        "envelope-level bit detect "
        "(ambient_backscatter_processor.rs)", ("frame",)),
    "vlc_modulator": ("vlc_modulate", "modulator",
                      "Manchester/VPPM intensity (vlc_modulator.rs)",
                      ("sps", "kind", "dimming")),
    "optical_coherent_receiver": ("coherent_optical_receive",
                                  "demodulator",
                                  "normalize + V&V phase recovery "
                                  "(optical_coherent_receiver.rs)",
                                  ("loop_bw",)),
    "wavelength_division_mux": ("wdm_mux", "modulator",
                                "comb multiplexing "
                                "(wavelength_division_mux.rs)",
                                ("spacing_cycles",)),
    "photonic_processing": ("photonic_mzi_transfer", "math",
                            "MZI transfer curve "
                            "(photonic_processing.rs)",
                            ("extinction_db",)),
    "dab_plus": ("dab_symbol_modulate", "modulator",
                 "DQPSK-OFDM DAB symbols (dab_plus.rs)",
                 ("n_carriers", "n_fft")),
    "drm_ofdm_processor": ("drm_ofdm_params", "modulator",
                           "DRM numerology (drm_ofdm_processor.rs)",
                           ("mode",)),
    "phasor_measurement_unit": ("pmu_phasor", "measurement",
                                "synchrophasor amp/phase/freq "
                                "(phasor_measurement_unit.rs)",
                                ("sample_rate", "f_nominal")),
    "power_line_harmonic_analyzer": (
        "harmonics_analyze", "measurement",
        "harmonic amplitudes + THD "
        "(power_line_harmonic_analyzer.rs)", ("f0", "n_harmonics")),
    "power_quality_event_classifier": (
        "power_quality_classify", "measurement",
        "sag/swell/interruption events "
        "(power_quality_event_classifier.rs)", ("f0",)),
    "photovoltaic_mppt_controller": ("mppt_perturb_observe", "math",
                                     "P&O MPPT step "
                                     "(photovoltaic_mppt_"
                                     "controller.rs)", ("v_step",)),
    "ev_motor_commutation": ("bldc_commutation", "math",
                             "six-step BLDC sectors "
                             "(ev_motor_commutation_controller.rs)",
                             ("pole_pairs",)),
    "industrial_process_modulation": (
        "industrial_4_20ma_encode", "modulator",
        "4-20 mA process encoding "
        "(industrial_process_modulation.rs)", ("lo", "hi")),
    "quantum_key_distribution": ("bb84_sift", "fec",
                                 "BB84 sifting + QBER "
                                 "(quantum_key_distribution.rs)",
                                 ("n_bits", "error_rate")),
}
