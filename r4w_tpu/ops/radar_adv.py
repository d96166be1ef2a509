"""Advanced radar/array processing: STAP, clutter filtering, coherent
integration, CLEAN-style track extraction, radar target tracking.

Re-designs of space_time_adaptive_processor.rs, clutter_filter.rs,
coherent_integrator.rs, automotive_radar_tracker.rs,
weather_radar_clutter_suppressor.rs: joint angle-Doppler adaptive
weights are one regularized solve per range cell (batched over cells),
clutter rejection is a projection, and tracking is the constant-
velocity Kalman from ops/kalman.py run per target.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import IQ_DTYPE, REAL_DTYPE


# ---------------------------------------------------------------- STAP


def space_time_steering(n_elements: int, n_pulses: int,
                        spatial_freq: float, doppler_freq: float
                        ) -> jax.Array:
    """Joint space-time steering vector v = d(fd) ⊗ a(fs): spatial_freq
    and doppler_freq in cycles (d·sinθ/λ and fd/PRF)."""
    from r4w_tpu.core.hostio import cis

    a = cis((2.0 * jnp.pi * spatial_freq
             * jnp.arange(n_elements, dtype=REAL_DTYPE)).astype(
                 REAL_DTYPE)).astype(IQ_DTYPE)
    d = cis((2.0 * jnp.pi * doppler_freq
             * jnp.arange(n_pulses, dtype=REAL_DTYPE)).astype(
                 REAL_DTYPE)).astype(IQ_DTYPE)
    return jnp.kron(d, a)


def stap_weights(snapshots: jax.Array, target_steering: jax.Array,
                 diagonal_loading: float = 1e-3) -> jax.Array:
    """Optimum STAP weights w = R⁻¹v / (vᴴR⁻¹v)
    (space_time_adaptive_processor.rs).

    snapshots: (K, N·M) training space-time snapshots (range cells);
    target_steering: (N·M,). Diagonal loading regularizes the SCM.
    """
    x = jnp.asarray(snapshots, IQ_DTYPE)
    v = jnp.asarray(target_steering, IQ_DTYPE)
    k, nm = x.shape
    r = (x.conj().T @ x) / k
    r = r + diagonal_loading * jnp.trace(r).real / nm * jnp.eye(
        nm, dtype=IQ_DTYPE)
    rinv_v = jnp.linalg.solve(r, v)
    return rinv_v / (v.conj() @ rinv_v)


def stap_output(w: jax.Array, cell_data: jax.Array) -> jax.Array:
    """Filter range cells (..., N·M) with the STAP weights."""
    return jnp.einsum("i,...i->...", jnp.conj(w),
                      jnp.asarray(cell_data, IQ_DTYPE))


def sinr_loss(w: jax.Array, steering: jax.Array, r: jax.Array) -> float:
    """SINR of weights w against interference covariance r for a unit
    target along `steering` (diagnostic)."""
    num = jnp.abs(jnp.conj(w) @ steering) ** 2
    den = jnp.real(jnp.conj(w) @ (r @ w))
    return float(num / jnp.maximum(den, 1e-18))


# ------------------------------------------------------------- clutter


def clutter_notch(pulses: jax.Array, n_zero_bins: int = 1) -> jax.Array:
    """Doppler-domain zero-velocity clutter rejection
    (clutter_filter.rs / weather_radar_clutter_suppressor.rs): FFT over
    the slow-time axis, zero the DC±n bins, inverse FFT.

    pulses: (..., n_pulses, n_range).
    """
    x = jnp.asarray(pulses, IQ_DTYPE)
    spec = jnp.fft.fft(x, axis=-2)
    n = x.shape[-2]
    mask = np.ones(n, np.float32)
    mask[:n_zero_bins + 1] = 0.0
    if n_zero_bins:
        mask[-n_zero_bins:] = 0.0
    return jnp.fft.ifft(spec * jnp.asarray(mask)[:, None], axis=-2
                        ).astype(IQ_DTYPE)


def coherent_integrate(pulses: jax.Array) -> jax.Array:
    """Coherent pulse integration (coherent_integrator.rs): the sum
    over slow time gains N in SNR for phase-stable targets."""
    return jnp.sum(jnp.asarray(pulses, IQ_DTYPE), axis=-2)


def noncoherent_integrate(pulses: jax.Array) -> jax.Array:
    """|·|² sum — √N gain but Doppler/phase tolerant."""
    p = jnp.asarray(pulses)
    return jnp.sum(p.real ** 2 + p.imag ** 2, axis=-2)


# ------------------------------------------------------------ tracking


@dataclasses.dataclass
class RadarTrack:
    """One constant-velocity track (automotive_radar_tracker.rs)."""

    x: np.ndarray          # state [r, v]
    cov: np.ndarray
    hits: int = 1
    misses: int = 0
    track_id: int = 0


class RadarTracker:
    """Nearest-neighbour gating + per-track constant-velocity Kalman
    (automotive_radar_tracker.rs): confirm after `confirm_hits`, drop
    after `max_misses`."""

    def __init__(self, dt: float, gate: float = 30.0,
                 q_accel: float = 1.0, meas_var: float = 4.0,
                 confirm_hits: int = 2, max_misses: int = 3):
        from r4w_tpu.ops.kalman import KalmanParams

        self.params = KalmanParams.constant_velocity(dt, q_accel,
                                                     meas_var)
        self.dt = dt
        self.meas_var = meas_var
        self.gate = gate
        self.confirm_hits = confirm_hits
        self.max_misses = max_misses
        self.tracks: list[RadarTrack] = []
        self._next_id = 0

    def step(self, detections_m: np.ndarray) -> list[RadarTrack]:
        """One scan of range detections; returns confirmed tracks."""
        from r4w_tpu.ops.kalman import kalman_step

        dets = list(np.atleast_1d(np.asarray(detections_m, np.float64)))
        used = set()
        for tr in self.tracks:
            # predicted range
            pred = tr.x[0] + tr.x[1] * self.dt
            best, best_d = None, self.gate
            for i, z in enumerate(dets):
                if i in used:
                    continue
                if abs(z - pred) < best_d:
                    best, best_d = i, abs(z - pred)
            if best is None:
                tr.misses += 1
                # coast: propagate without update
                tr.x = np.asarray([pred, tr.x[1]])
                continue
            used.add(best)
            x, cov = kalman_step(self.params, jnp.asarray(tr.x),
                                 jnp.asarray(tr.cov),
                                 jnp.asarray([dets[best]]))
            tr.x, tr.cov = np.asarray(x), np.asarray(cov)
            tr.hits += 1
            tr.misses = 0
        # spawn tracks for unassociated detections
        for i, z in enumerate(dets):
            if i not in used:
                self.tracks.append(RadarTrack(
                    x=np.asarray([z, 0.0]),
                    cov=np.diag([self.meas_var, 100.0]),
                    track_id=self._next_id))
                self._next_id += 1
        self.tracks = [t for t in self.tracks
                       if t.misses <= self.max_misses]
        return [t for t in self.tracks if t.hits >= self.confirm_hits]
