"""DLL/PLL tracking channel as a lax.scan over code blocks.

Re-design of waveform/gnss/tracking.rs:36-446: the reference's
per-sample loop becomes — per 1 ms block — three batched E/P/L
correlations (gathers + dots over the whole block) with the loop state
(code phase, carrier freq/phase, 2nd/3rd-order filter integrators)
carried by `lax.scan` across blocks. vmap over channels tracks many
PRNs concurrently.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.lax as lax
import jax.numpy as jnp

from r4w_tpu.core.hostio import cis
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE

GPS_L1_HZ = 1_575_420_000.0


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    code_length: int = 1023
    sample_rate: float = 1_023_000.0
    chipping_rate: float = 1_023_000.0
    dll_bandwidth: float = 1.0
    pll_bandwidth: float = 15.0
    el_spacing: float = 0.5  # chips
    block_period: float = 0.001  # seconds per update (1 ms)
    carrier_hz: float = GPS_L1_HZ
    # Costas (decision-insensitive) phase discriminator: atan(Q/I)
    # instead of atan2(Q, I). Required whenever the prompt sign can
    # flip per block — GPS 20 ms nav bits, the Galileo E1C 25-chip
    # secondary code (tracking.rs pll_discriminator role). Default ON:
    # a full-quadrant atan2 loop at design bandwidth would chase each
    # 180° data flip and scramble the demodulated bits. Set False only
    # for a pilot channel whose overlay has been wiped.
    costas: bool = True
    # FLL (cross-product) frequency-assist gain. Essential during
    # pull-in (removes the acquisition Doppler-bin quantization fast),
    # but at low C/N0 the squared cross-product is noisy — ~9 Hz 1σ
    # per 4 ms block at 34 dB-Hz — and a 0.3 gain injects a multi-Hz
    # random walk into the carrier NCO. Set 0.0 for a locked/narrow
    # stage once the frequency is pulled in.
    fll_gain: float = 0.3

    @property
    def block_size(self) -> int:
        return int(round(self.sample_rate * self.block_period))

    def loop_gains(self):
        """(dll k1 k2, pll k1 k2 k3) per tracking.rs:364-433."""
        t = self.block_period
        wn_d = self.dll_bandwidth * 8.0 / 3.0
        zeta = 1.0 / np.sqrt(2.0)
        dll = (2 * zeta * wn_d * t, (wn_d * t) ** 2)
        wn_p = self.pll_bandwidth * 2.4
        pll = (2.4 * wn_p * t, 1.1 * (wn_p * t) ** 2, (wn_p * t) ** 3)
        return dll, pll


class TrackingState(NamedTuple):
    code_phase: jax.Array  # chips
    code_freq: jax.Array  # chips/s
    carrier_phase: jax.Array  # cycles
    carrier_freq: jax.Array  # Hz
    dll_int: jax.Array
    pll_int1: jax.Array
    pll_int2: jax.Array
    prev_prompt: jax.Array  # complex, for the FLL cross-product


class TrackingOutput(NamedTuple):
    prompt_i: jax.Array  # (B,) per block
    prompt_q: jax.Array
    early_mag: jax.Array
    late_mag: jax.Array
    dll_disc: jax.Array
    pll_disc: jax.Array
    carrier_freq: jax.Array
    code_phase: jax.Array
    cn0_dbhz: jax.Array
    # auxiliary data-channel prompts, slaved to the SAME NCO (e.g.
    # Galileo E1B symbols off the E1C pilot loop): (B, aux_per_block)
    # complex sub-prompts; zeros when track() is given no aux_code
    aux_i: jax.Array
    aux_q: jax.Array


def init_state(cfg: TrackingConfig, code_phase_chips, doppler_hz
               ) -> TrackingState:
    code_doppler = jnp.asarray(doppler_hz, REAL_DTYPE) * (
        cfg.chipping_rate / cfg.carrier_hz
    )
    z = jnp.zeros_like(jnp.asarray(code_phase_chips, REAL_DTYPE))
    return TrackingState(
        code_phase=jnp.asarray(code_phase_chips, REAL_DTYPE),
        code_freq=cfg.chipping_rate + code_doppler,
        carrier_phase=z,
        carrier_freq=jnp.asarray(doppler_hz, REAL_DTYPE),
        dll_int=z, pll_int1=z, pll_int2=z,
        prev_prompt=jnp.zeros_like(z).astype(IQ_DTYPE),
    )


def track(cfg: TrackingConfig, state: TrackingState, samples, code,
          aux_code=None, aux_per_block: int = 1
          ) -> tuple[TrackingState, TrackingOutput]:
    """Run the tracking loop over (n_blocks·block_size) samples.

    samples: (N,) complex64; code: (code_length,) ±1 chips.

    aux_code: optional second spreading code correlated open-loop at
    the SAME chip/carrier alignment as the prompt — the data-channel
    companion of a pilot loop (Galileo E1B off the E1C pilot). With
    aux_per_block = A, each block yields A sub-prompts over equal
    sample quarters (a 16 ms pilot block → four 4 ms E1B symbol
    prompts); they appear in TrackingOutput.aux_i/aux_q.
    """
    bs = cfg.block_size
    samples = jnp.asarray(samples, IQ_DTYPE)
    n_blocks = samples.shape[-1] // bs
    blocks = samples[: n_blocks * bs].reshape(n_blocks, bs)
    code = jnp.asarray(code, REAL_DTYPE)
    aux = (None if aux_code is None
           else jnp.asarray(aux_code, REAL_DTYPE))
    assert bs % aux_per_block == 0
    (dk1, dk2), (pk1, pk2, pk3) = cfg.loop_gains()
    i_idx = jnp.arange(bs, dtype=REAL_DTYPE)
    t_in_block = i_idx / cfg.sample_rate

    def step(st: TrackingState, block):
        spc = cfg.sample_rate / st.code_freq  # samples per chip
        # carrier strip (tracking.rs:186-194)
        ph = st.carrier_freq * t_in_block + st.carrier_phase
        carrier = cis(-2 * jnp.pi * ph.astype(REAL_DTYPE))
        stripped = block * carrier.astype(IQ_DTYPE)
        # E/P/L code replicas via linearly-interpolated gathers: a
        # nearest-sample (floor) gather misaligns the replica by up to
        # one code sample, which on a steep ACF (BOC/CBOC: zero at ±2
        # subchips) costs up to ~2.5 dB and amplitude-modulates the
        # prompt as the truncation phase wanders — fatal at low C/N0.
        chip = st.code_phase + i_idx / spc
        def corr(offset):
            pos = jnp.mod(chip + offset, cfg.code_length)
            i0 = jnp.floor(pos)
            w = (pos - i0).astype(REAL_DTYPE)
            i0 = i0.astype(jnp.int32)
            i1 = jnp.where(i0 + 1 >= cfg.code_length, 0, i0 + 1)
            c = code[i0] * (1.0 - w) + code[i1] * w
            v = jnp.sum(stripped * c)
            return v
        half = cfg.el_spacing / 2.0
        early = corr(-half)
        prompt = corr(0.0)
        late = corr(half)
        # auxiliary (data-channel) sub-prompts at the prompt alignment
        if aux is not None:
            pos_a = jnp.mod(chip, cfg.code_length)
            a0 = jnp.floor(pos_a)
            wa = (pos_a - a0).astype(REAL_DTYPE)
            a0 = a0.astype(jnp.int32)
            a1 = jnp.where(a0 + 1 >= cfg.code_length, 0, a0 + 1)
            ca = aux[a0] * (1.0 - wa) + aux[a1] * wa
            va = (stripped * ca).reshape(aux_per_block, -1).sum(axis=1)
        else:
            va = jnp.zeros((aux_per_block,), IQ_DTYPE)
        e_mag = jnp.abs(early)
        l_mag = jnp.abs(late)
        dll_disc = jnp.where(
            e_mag + l_mag > 0, (e_mag - l_mag) / jnp.maximum(e_mag + l_mag, 1e-12), 0.0
        )
        if cfg.costas:
            # atan(Q/I): invariant to per-block sign flips (data bits /
            # secondary code). atan2(|I| form keeps the full quadrant
            # math without a divide-by-zero guard.
            pll_disc = jnp.arctan2(
                prompt.imag * jnp.sign(prompt.real),
                jnp.abs(prompt.real)) / (2.0 * jnp.pi)
        else:
            pll_disc = jnp.arctan2(prompt.imag, prompt.real) / (2.0 * jnp.pi)
        # FLL cross-product: frequency error in Hz from successive prompts
        # (Costas-insensitive: square to remove data-bit flips)
        cross = (prompt * jnp.conj(st.prev_prompt)) ** 2
        freq_err_hz = jnp.where(
            jnp.abs(st.prev_prompt) > 0,
            jnp.arctan2(cross.imag, cross.real)
            / (2.0 * 2.0 * jnp.pi * cfg.block_period),
            0.0,
        )
        # loop filters (2nd order DLL, 3rd order PLL + FLL assist).
        # The PLL is a phase-STEPPING NCO: the proportional term is a
        # direct phase step (pk1, cycles per unit disc) while the
        # integral terms trim frequency (pk2/T, Hz) and acceleration
        # (pk3/T², Hz/s). Applying pk1 to frequency instead — as a
        # naive transliteration of the per-sample reference loop does —
        # shrinks the effective bandwidth by ~1/T and the loop then
        # freezes at whatever phase error exists when the FLL pins the
        # frequency (measured: E1C channels parked at 80-110° forever).
        t_blk = cfg.block_period
        dll_int = st.dll_int + dk2 * dll_disc
        code_corr = dk1 * dll_disc + dll_int
        pll_acc = st.pll_int2 + (pk3 / (t_blk * t_blk)) * pll_disc
        new_carrier_freq = (st.carrier_freq + (pk2 / t_blk) * pll_disc
                            + pll_acc * t_blk
                            + cfg.fll_gain * freq_err_hz)
        pll_int1 = st.pll_int1  # retained for state-shape stability
        pll_int2 = pll_acc
        # NCO updates (tracking.rs:247-257). disc > 0 means E > L,
        # i.e. the replica runs AHEAD of the signal (see dll_s_curve:
        # positive replica offset → positive disc), so the correction
        # must RETARD the code phase — subtract, don't add (a wrong
        # sign here diverges at ~dk1·disc chips/block, measured).
        new_code_phase = jnp.mod(
            st.code_phase + bs / spc - code_corr * cfg.el_spacing,
            cfg.code_length,
        )
        new_carrier_phase = jnp.mod(
            st.carrier_phase + st.carrier_freq * t_blk
            + pk1 * pll_disc, 1.0
        )
        code_doppler = new_carrier_freq * cfg.chipping_rate / cfg.carrier_hz
        new_state = TrackingState(
            code_phase=new_code_phase,
            code_freq=cfg.chipping_rate + code_doppler,
            carrier_phase=new_carrier_phase,
            carrier_freq=new_carrier_freq,
            dll_int=dll_int, pll_int1=pll_int1, pll_int2=pll_int2,
            prev_prompt=prompt,
        )
        p_pow = prompt.real**2 + prompt.imag**2
        noise = jnp.maximum(
            jnp.sum(jnp.abs(stripped) ** 2) - p_pow / bs, 1e-12
        )
        cn0 = 10.0 * jnp.log10(
            jnp.maximum(p_pow / noise / cfg.block_period, 1e-12)
        )
        out = TrackingOutput(
            prompt_i=prompt.real, prompt_q=prompt.imag,
            early_mag=e_mag, late_mag=l_mag,
            dll_disc=dll_disc, pll_disc=pll_disc,
            carrier_freq=new_carrier_freq, code_phase=new_code_phase,
            cn0_dbhz=cn0, aux_i=va.real, aux_q=va.imag,
        )
        return new_state, out

    final, outs = lax.scan(step, state, blocks)
    return final, outs


@functools.partial(jax.jit, static_argnums=(0,))
def track_jit(cfg: TrackingConfig, state, samples, code):
    return track(cfg, state, samples, code)


def extract_nav_bits(prompt_i, bits_per_symbol: int = 20):
    """Majority-vote nav bits from prompt-I blocks (20 ms GPS bits;
    tracking.rs nav-bit extraction)."""
    p = jnp.asarray(prompt_i)
    n = p.shape[-1] // bits_per_symbol
    groups = p[..., : n * bits_per_symbol].reshape(
        *p.shape[:-1], n, bits_per_symbol
    )
    return (jnp.sum(jnp.sign(groups), axis=-1) < 0).astype(jnp.int32)


def dll_s_curve(cfg: TrackingConfig, code, offsets_chips):
    """Open-loop DLL S-curve for test/visualization (tracking.rs:468-495):
    discriminator response vs true code offset."""
    code = jnp.asarray(code, REAL_DTYPE)
    bs = cfg.block_size
    spc = cfg.sample_rate / cfg.chipping_rate
    i_idx = jnp.arange(bs, dtype=REAL_DTYPE)

    def disc(offset):
        chip_true = i_idx / spc
        sig = code[jnp.mod(chip_true, cfg.code_length).astype(jnp.int32)]
        chip_local = offset + i_idx / spc
        half = cfg.el_spacing / 2.0
        def mag(o):
            idx = jnp.mod(chip_local + o, cfg.code_length).astype(jnp.int32)
            return jnp.abs(jnp.sum(sig * code[idx]))
        e, l = mag(-half), mag(half)
        return (e - l) / jnp.maximum(e + l, 1e-12)

    return jax.vmap(disc)(jnp.asarray(offsets_chips, REAL_DTYPE))
