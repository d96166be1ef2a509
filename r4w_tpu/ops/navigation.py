"""Inertial navigation & state-estimation fills.

Re-designs of quaternion_attitude_tracker.rs, imu_aided_tracking.rs,
inertial_nav_processor.rs, particle_filter_tracker.rs,
magnetometer_vector_rotator.rs, digital_twin_state_observer.rs,
spatio_temporal_fusion.rs.

The strapdown/complementary recursions are lax.scan; the particle
filter keeps the whole ensemble as one batch (resampling via
systematic gather).
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp

from r4w_tpu.core.types import REAL_DTYPE

# ---------------------------------------------------------- quaternion


def quat_multiply(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion q (body→nav)."""
    q = jnp.asarray(q, REAL_DTYPE)
    v = jnp.asarray(v, REAL_DTYPE)
    qv = jnp.concatenate([jnp.zeros(v.shape[:-1] + (1,), REAL_DTYPE),
                          v], axis=-1)
    qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], REAL_DTYPE)
    return quat_multiply(quat_multiply(q, qv), qc)[..., 1:]


def quat_to_euler(q):
    """Quaternion → roll/pitch/yaw (rad)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def attitude_track_mahony(gyro_rad_s, accel_mps2, dt: float,
                          kp: float = 1.0, q0=None):
    """Mahony complementary attitude filter
    (quaternion_attitude_tracker.rs): gyro integration corrected
    toward the accelerometer gravity direction. Returns the (N, 4)
    quaternion track."""
    g = jnp.asarray(gyro_rad_s, REAL_DTYPE)
    a = jnp.asarray(accel_mps2, REAL_DTYPE)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True),
                        1e-9)
    if q0 is None:
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], REAL_DTYPE)

    def step(q, inp):
        w, acc = inp
        # estimated gravity in body frame: rotate nav-down by q⁻¹
        qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], REAL_DTYPE)
        v = quat_rotate(qc, jnp.asarray([0.0, 0.0, 1.0], REAL_DTYPE))
        err = jnp.cross(acc, v)
        w_corr = w + kp * err
        dq = 0.5 * quat_multiply(q, jnp.concatenate(
            [jnp.zeros((1,), REAL_DTYPE), w_corr]))
        q = q + dq * dt
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
        return q, q

    _, track = lax.scan(step, q0, (g, a))
    return track


# ------------------------------------------------------------ strapdown


def strapdown_integrate(accel_body, gyro_rad_s, dt: float,
                        q0=None, v0=None, p0=None,
                        gravity: float = 9.81):
    """Strapdown inertial navigation (inertial_nav_processor.rs):
    attitude from gyro, specific force rotated to nav frame, gravity
    removed, double-integrated. Returns (positions, velocities,
    quaternions)."""
    a = jnp.asarray(accel_body, REAL_DTYPE)
    g = jnp.asarray(gyro_rad_s, REAL_DTYPE)
    if q0 is None:
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], REAL_DTYPE)
    v0 = jnp.zeros((3,), REAL_DTYPE) if v0 is None else v0
    p0 = jnp.zeros((3,), REAL_DTYPE) if p0 is None else p0
    grav = jnp.asarray([0.0, 0.0, -gravity], REAL_DTYPE)

    def step(carry, inp):
        q, v, p = carry
        w, f = inp
        dq = 0.5 * quat_multiply(q, jnp.concatenate(
            [jnp.zeros((1,), REAL_DTYPE), w]))
        q = q + dq * dt
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-9)
        a_nav = quat_rotate(q, f) + grav
        v = v + a_nav * dt
        p = p + v * dt
        return (q, v, p), (p, v, q)

    _, (ps, vs, qs) = lax.scan(step, (q0, v0, p0), (g, a))
    return ps, vs, qs


def imu_aided_update(ins_pos, ins_vel, fix_pos, fix_weight: float = 0.2):
    """Loose GNSS/INS aiding step (imu_aided_tracking.rs):
    complementary blend of the INS solution toward the fix."""
    p = jnp.asarray(ins_pos, REAL_DTYPE)
    f = jnp.asarray(fix_pos, REAL_DTYPE)
    blended = (1.0 - fix_weight) * p + fix_weight * f
    return blended, jnp.asarray(ins_vel, REAL_DTYPE)


def magnetometer_rotate(mag_body, q):
    """Body→nav magnetometer rotation + heading
    (magnetometer_vector_rotator.rs)."""
    m_nav = quat_rotate(jnp.asarray(q, REAL_DTYPE),
                        jnp.asarray(mag_body, REAL_DTYPE))
    heading = jnp.arctan2(-m_nav[..., 1], m_nav[..., 0])
    return m_nav, heading


# ------------------------------------------------------ particle filter


def particle_filter_track(measurements, key, n_particles: int = 512,
                          q_std: float = 0.1, r_std: float = 1.0):
    """Bootstrap particle filter for a 1-D constant-velocity target
    (particle_filter_tracker.rs): predict → weight → systematic
    resample, all ensemble ops batched. Returns the posterior-mean
    track."""
    z = jnp.asarray(measurements, REAL_DTYPE)
    k1, k2 = jax.random.split(key)
    pos = z[0] + r_std * jax.random.normal(k1, (n_particles,))
    vel = jax.random.normal(k2, (n_particles,))

    def step(carry, inp):
        pos, vel, key = carry
        zt, _ = inp
        key, kq, kr = jax.random.split(key, 3)
        vel = vel + q_std * jax.random.normal(kq, vel.shape)
        pos = pos + vel
        logw = -0.5 * ((zt - pos) / r_std) ** 2
        w = jax.nn.softmax(logw)
        est = jnp.sum(w * pos)
        # systematic resampling
        edges = jnp.cumsum(w)
        u = (jax.random.uniform(kr) + jnp.arange(pos.shape[0])) \
            / pos.shape[0]
        idx = jnp.searchsorted(edges, u)
        idx = jnp.clip(idx, 0, pos.shape[0] - 1)
        return (pos[idx], vel[idx], key), est

    key3 = jax.random.split(key)[0]
    _, track = lax.scan(step, (pos, vel, key3),
                        (z, jnp.arange(z.shape[0])))
    return track


# ------------------------------------------------------- observers


def luenberger_observe(measurements, a, b, c, l_gain, u=None):
    """Digital-twin state observer (digital_twin_state_observer.rs):
    x̂ₖ₊₁ = A x̂ₖ + B uₖ + L(yₖ − C x̂ₖ). Returns the state track."""
    y = jnp.asarray(measurements, REAL_DTYPE)
    a = jnp.asarray(a, REAL_DTYPE)
    b = jnp.asarray(b, REAL_DTYPE)
    c = jnp.asarray(c, REAL_DTYPE)
    l_g = jnp.asarray(l_gain, REAL_DTYPE)
    n = a.shape[0]
    if u is None:
        u = jnp.zeros((y.shape[0], b.shape[1]), REAL_DTYPE)

    def step(x, inp):
        yt, ut = inp
        innov = yt - c @ x
        x = a @ x + b @ ut + l_g * innov
        return x, x

    _, xs = lax.scan(step, jnp.zeros((n,), REAL_DTYPE), (y, u))
    return xs


def spatio_temporal_fuse(sensor_tracks, sensor_vars):
    """Variance-weighted multi-sensor track fusion
    (spatio_temporal_fusion.rs): per-time-step inverse-variance
    weighting across sensors. tracks: (S, T[, D])."""
    x = jnp.asarray(sensor_tracks, REAL_DTYPE)
    v = jnp.asarray(sensor_vars, REAL_DTYPE)
    w = 1.0 / jnp.maximum(v, 1e-12)
    while w.ndim < x.ndim:
        w = w[..., None]
    fused = jnp.sum(x * w, axis=0) / jnp.sum(w, axis=0)
    fused_var = 1.0 / jnp.sum(1.0 / jnp.maximum(v, 1e-12), axis=0)
    return fused, fused_var


BLOCKS = {
    "quaternion_attitude_tracker": ("attitude_track_mahony", "math",
                                    "Mahony complementary filter "
                                    "(quaternion_attitude_"
                                    "tracker.rs)", ("dt", "kp")),
    "inertial_nav_processor": ("strapdown_integrate", "math",
                               "strapdown INS integration "
                               "(inertial_nav_processor.rs)",
                               ("dt", "gravity")),
    "imu_aided_tracking": ("imu_aided_update", "math",
                           "loose GNSS/INS blend "
                           "(imu_aided_tracking.rs)",
                           ("fix_weight",)),
    "magnetometer_vector_rotator": ("magnetometer_rotate", "math",
                                    "body->nav + heading "
                                    "(magnetometer_vector_"
                                    "rotator.rs)"),
    "particle_filter_tracker": ("particle_filter_track", "math",
                                "bootstrap PF, batched ensemble "
                                "(particle_filter_tracker.rs)",
                                ("n_particles", "q_std", "r_std")),
    "digital_twin_state_observer": ("luenberger_observe", "math",
                                    "Luenberger observer "
                                    "(digital_twin_state_"
                                    "observer.rs)"),
    "spatio_temporal_fusion": ("spatio_temporal_fuse", "math",
                               "inverse-variance track fusion "
                               "(spatio_temporal_fusion.rs)"),
}
