"""Kalman-family state estimators (kalman_filter.rs, unscented_kalman_filter.rs
re-design).

Batch-first, pure-functional: a filter is `(params, state, measurements)
-> (states, covs)` driven by one `lax.scan` over time; vmap over the
leading axes gives banks of independent trackers (per-channel carrier
smoothing, per-SV clock drift, ...). State dimensions in SDR use are
tiny (1-4), so each step is a handful of small matmuls that XLA fuses
into one kernel — the win over the reference's per-sample Rust loop is
the free batching across trackers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from r4w_tpu.core.types import REAL_DTYPE


@dataclasses.dataclass(frozen=True)
class KalmanParams:
    """Linear-Gaussian model x' = F x + w, z = H x + v.

    Matrices are (n,n), (m,n), (n,n), (m,m) (kalman_filter.rs:126 layout).
    """

    f: jax.Array
    h: jax.Array
    q: jax.Array
    r: jax.Array

    @staticmethod
    def constant_velocity(dt: float, q_accel: float,
                          r_meas: float) -> "KalmanParams":
        """2-state position/velocity tracker (kalman_filter.rs new_2d role)."""
        f = jnp.asarray([[1.0, dt], [0.0, 1.0]], REAL_DTYPE)
        h = jnp.asarray([[1.0, 0.0]], REAL_DTYPE)
        g = jnp.asarray([[0.5 * dt * dt], [dt]], REAL_DTYPE)
        q = q_accel * (g @ g.T)
        r = jnp.asarray([[r_meas]], REAL_DTYPE)
        return KalmanParams(f, h, q, r)

    @staticmethod
    def scalar(process_var: float, meas_var: float) -> "KalmanParams":
        """1-state tracker (kalman_filter.rs new_1d)."""
        eye = jnp.ones((1, 1), REAL_DTYPE)
        return KalmanParams(eye, eye, process_var * eye, meas_var * eye)


def kalman_step(p: KalmanParams, x, cov, z):
    """One predict+update. x (n,), cov (n,n), z (m,) -> (x', cov')."""
    x_pred = p.f @ x
    cov_pred = p.f @ cov @ p.f.T + p.q
    innov = z - p.h @ x_pred
    s = p.h @ cov_pred @ p.h.T + p.r
    k = jnp.linalg.solve(s, p.h @ cov_pred).T  # (n, m)
    x_new = x_pred + k @ innov
    eye = jnp.eye(x.shape[0], dtype=cov.dtype)
    cov_new = (eye - k @ p.h) @ cov_pred
    return x_new, cov_new


def kalman_filter(p: KalmanParams, measurements, x0=None, cov0=None):
    """Run the filter over (T, m) measurements -> states (T, n), covs
    (T, n, n). Scalar measurement streams (T,) are auto-lifted."""
    z = jnp.asarray(measurements, REAL_DTYPE)
    if z.ndim == 1:
        z = z[:, None]
    n = p.f.shape[0]
    x0 = jnp.zeros(n, REAL_DTYPE) if x0 is None else jnp.asarray(x0, REAL_DTYPE)
    cov0 = (jnp.eye(n, dtype=REAL_DTYPE) if cov0 is None
            else jnp.asarray(cov0, REAL_DTYPE))

    def step(carry, zt):
        x, cov = carry
        x, cov = kalman_step(p, x, cov, zt)
        return (x, cov), (x, cov)

    _, (xs, covs) = jax.lax.scan(step, (x0, cov0), z)
    return xs, covs


# ---------------------------------------------------------------- UKF


@dataclasses.dataclass(frozen=True)
class UkfParams:
    """Unscented transform weights (unscented_kalman_filter.rs:107)."""

    alpha: float = 1e-1
    beta: float = 2.0
    kappa: float = 0.0


def _sigma_points(x, cov, lam):
    n = x.shape[0]
    # numerically-guarded Cholesky of (n+lam) P
    a = jnp.linalg.cholesky(
        (n + lam) * (cov + 1e-9 * jnp.eye(n, dtype=cov.dtype)))
    pts = jnp.concatenate(
        [x[None, :], x[None, :] + a.T, x[None, :] - a.T], axis=0)
    return pts  # (2n+1, n)


def _ut_weights(n: int, p: UkfParams):
    lam = p.alpha**2 * (n + p.kappa) - n
    wm = jnp.full(2 * n + 1, 1.0 / (2 * (n + lam)), REAL_DTYPE)
    wm = wm.at[0].set(lam / (n + lam))
    wc = wm.at[0].add(1.0 - p.alpha**2 + p.beta)
    return lam, wm, wc


def ukf_step(fx: Callable, hx: Callable, q, r, x, cov, z,
             params: UkfParams = UkfParams()):
    """One UKF predict+update with process fx(x)->x' and measurement
    hx(x)->z (unscented_kalman_filter.rs:143,182 semantics)."""
    n = x.shape[0]
    lam, wm, wc = _ut_weights(n, params)
    # predict
    pts = _sigma_points(x, cov, lam)
    pts_f = jax.vmap(fx)(pts)
    x_pred = wm @ pts_f
    d = pts_f - x_pred
    cov_pred = jnp.einsum("i,ij,ik->jk", wc, d, d) + q
    # update
    pts2 = _sigma_points(x_pred, cov_pred, lam)
    pts_h = jax.vmap(hx)(pts2)
    z_pred = wm @ pts_h
    dz = pts_h - z_pred
    dx = pts2 - x_pred
    s = jnp.einsum("i,ij,ik->jk", wc, dz, dz) + r
    c = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    k = jnp.linalg.solve(s.T, c.T).T
    x_new = x_pred + k @ (z - z_pred)
    cov_new = cov_pred - k @ s @ k.T
    return x_new, cov_new


def ukf_filter(fx: Callable, hx: Callable, q, r, measurements,
               x0, cov0, params: UkfParams = UkfParams()):
    """Run the UKF over (T, m) measurements."""
    z = jnp.asarray(measurements, REAL_DTYPE)
    if z.ndim == 1:
        z = z[:, None]
    q = jnp.asarray(q, REAL_DTYPE)
    r = jnp.asarray(r, REAL_DTYPE)
    x0 = jnp.asarray(x0, REAL_DTYPE)
    cov0 = jnp.asarray(cov0, REAL_DTYPE)

    def step(carry, zt):
        x, cov = carry
        x, cov = ukf_step(fx, hx, q, r, x, cov, zt, params)
        return (x, cov), (x, cov)

    _, (xs, covs) = jax.lax.scan(step, (x0, cov0), z)
    return xs, covs


def nees(xs, covs, truth):
    """Normalized estimation error squared (unscented_kalman_filter.rs:316)."""
    e = jnp.asarray(xs) - jnp.asarray(truth)
    return jax.vmap(lambda ei, pi: ei @ jnp.linalg.solve(pi, ei))(
        e, jnp.asarray(covs))
