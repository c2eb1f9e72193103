"""Acoustic-ranging fusion: chirp-interval distance model + LM optimizers.

TPU-native re-design of the reference fork's acoustic layer:

* Distance model ``d = c(T)·(n1+n2)/(2·fs) + k`` with speed of sound
  ``c = 331.3 + 0.606·T`` at 48 kHz, offset k = 0.0272 m, accepted range
  0–4 m (`/root/reference/src/Socket/server.cc:47-49,232-270`).
* Range factor ``err = d − s·‖T − p‖`` (EdgeDistS,
  `/root/reference/include/Optimizer.h:152-187`), relative-position factor
  ``err = Δ − (T₁ − T₂)`` (Edge3d, `Optimizer.h:189-214`), and microphone
  calibration factor (EdgeCalib, `Optimizer.h:216-244`).
* The five fusion solves (`/root/reference/src/Optimizer.cc:5590-5896`):
  PoseOptimizationDistanceGivenScale, PoseOptimizationDistanceRegu,
  IMUAcousticOptimization, IMUAcousticKeyOptimization, CalibOptimization.

All are tiny dense problems (≤ tens of variables), so each is a single
jitted Levenberg–Marquardt loop with autodiff Jacobians — fixed 10
iterations like the reference's ``optimizer.optimize(10)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SAMPLE_RATE = 48000.0
K_DISTANCE = 0.0272
MAX_RANGE_M = 4.0


def speed_of_sound(temperature_c: float = 27.1) -> float:
    return 331.3 + 0.606 * temperature_c


def interval_to_distance(n1, n2, sample_rate: float = SAMPLE_RATE,
                         temperature_c: float = 27.1,
                         k: float = K_DISTANCE):
    """Two-way chirp sample intervals -> metric distance (CalAcoustic,
    `server.cc:247-249`). Returns (distance, valid) with the reference's
    0–4 m acceptance gate."""
    n1 = jnp.asarray(n1, jnp.float32)
    n2 = jnp.asarray(n2, jnp.float32)
    d = speed_of_sound(temperature_c) * (n1 + n2) / (2.0 * sample_rate) + k
    return d, (d > 0.0) & (d < MAX_RANGE_M)


# ------------------------------------------------------------------ LM core

def _lm(residual_fn, x0: jnp.ndarray, n_iters: int = 10,
        lam0: float = 1e-4) -> jnp.ndarray:
    """Dense LM over a flat parameter vector; autodiff Jacobian; accept/reject
    with multiplicative damping. Small fixed-size problems only."""

    def cost(x):
        r = residual_fn(x)
        return jnp.dot(r, r)

    def step(carry, _):
        x, lam = carry
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = J.T @ J
        g = J.T @ r
        dx = jnp.linalg.solve(H + lam * jnp.eye(x.shape[0], dtype=x.dtype), -g)
        x_new = x + dx
        better = cost(x_new) < jnp.dot(r, r)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, lam * 0.3, lam * 5.0)
        return (x, lam), None

    (x, _), _ = lax.scan(step, (x0, jnp.asarray(lam0, x0.dtype)), None,
                         length=n_iters)
    return x


def _range_residuals(T, anchors, distances, scale, valid=None):
    """EdgeDistS residuals d_i − s·‖T − p_i‖ for one position vs M anchors."""
    diff = T[None, :] - anchors
    r = distances - scale * jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    if valid is not None:
        r = jnp.where(valid, r, 0.0)
    return r


# ---------------------------------------------------------------- solvers

@functools.partial(jax.jit, static_argnames=('n_iters',))
def optimize_position_given_scale(pos, anchors, distances, scale,
                                  valid=None, n_iters: int = 10):
    """Trilaterate one user position from ranges to others at known scale
    (PoseOptimizationDistanceGivenScale, `Optimizer.cc:5590-5631`)."""
    pos = jnp.asarray(pos, jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    distances = jnp.asarray(distances, jnp.float32)

    def res(x):
        return _range_residuals(x, anchors, distances, scale, valid)

    return _lm(res, pos, n_iters)


@functools.partial(jax.jit, static_argnames=('n_iters',))
def optimize_position_regularized(pos, pos_last, anchors, distances, scale,
                                  valid=None, n_iters: int = 10):
    """Same trilateration plus a zero-distance pull toward the previous
    estimate (PoseOptimizationDistanceRegu, `Optimizer.cc:5634-5681` — the
    extra EdgeDistS with measurement 0 anchored at pose_last)."""
    pos = jnp.asarray(pos, jnp.float32)
    pos_last = jnp.asarray(pos_last, jnp.float32)

    def res(x):
        r = _range_residuals(x, jnp.asarray(anchors, jnp.float32),
                             jnp.asarray(distances, jnp.float32), scale, valid)
        d_last = scale * jnp.linalg.norm(x - pos_last)
        return jnp.concatenate([r, jnp.array([0.0]) - d_last[None]])

    return _lm(res, pos, n_iters)


@functools.partial(jax.jit, static_argnames=('n_iters',))
def imu_acoustic_optimize(pos, delta_pos, anchors, distances, scale,
                          valid=None, n_iters: int = 10):
    """Fuse an IMU dead-reckoned position chain with ranges on the latest
    position (IMUAcousticOptimization, `Optimizer.cc:5684-5776`): Edge3d
    relative-position factors Δp_t − (p_t − p_{t−1}) for t=1..T−1 plus
    EdgeDistS factors on p_{T−1}. All positions free."""
    pos = jnp.asarray(pos, jnp.float32)          # (T, 3)
    delta_pos = jnp.asarray(delta_pos, jnp.float32)
    T = pos.shape[0]

    def res(x):
        p = x.reshape(T, 3)
        rel = (delta_pos[1:] - (p[1:] - p[:-1])).reshape(-1)
        rng = _range_residuals(p[-1], jnp.asarray(anchors, jnp.float32),
                               jnp.asarray(distances, jnp.float32), scale,
                               valid)
        return jnp.concatenate([rel, rng])

    return _lm(res, pos.reshape(-1), n_iters).reshape(T, 3)


@functools.partial(jax.jit, static_argnames=('n_iters',))
def imu_acoustic_key_optimize(pos, delta_p, distances, anchors, scale,
                              valid=None, n_iters: int = 10):
    """Keyframe-chain fusion (IMUAcousticKeyOptimization,
    `Optimizer.cc:5778-5843`): first position FIXED; relative-position
    factors delta_p[t−1] − (p_t − p_{t−1}); per-step range factors
    distances[t−1, j] on p_t for t=1..T−1."""
    pos = jnp.asarray(pos, jnp.float32)          # (T, 3)
    delta_p = jnp.asarray(delta_p, jnp.float32)  # (T-1, 3)
    distances = jnp.asarray(distances, jnp.float32)  # (T-1, M)
    anchors_a = jnp.asarray(anchors, jnp.float32)    # (M, 3)
    T = pos.shape[0]
    p0 = pos[0]

    def res(x):
        p = jnp.concatenate([p0[None], x.reshape(T - 1, 3)], axis=0)
        rel = (delta_p - (p[1:] - p[:-1])).reshape(-1)
        vm = valid if valid is not None else jnp.ones_like(distances, bool)
        rng = jax.vmap(
            lambda pt, dt, vt: _range_residuals(pt, anchors_a, dt, scale, vt)
        )(p[1:], distances, vm).reshape(-1)
        return jnp.concatenate([rel, rng])

    x = _lm(res, pos[1:].reshape(-1), n_iters)
    return jnp.concatenate([p0[None], x.reshape(T - 1, 3)], axis=0)


@functools.partial(jax.jit, static_argnames=('n_iters',))
def calibrate_mic_offset(t_mc, scale, R0, t0, R_others, t_others, distances,
                         valid=None, n_iters: int = 10):
    """Joint microphone-offset + metric-scale calibration (CalibOptimization,
    `Optimizer.cc:5845-5896`; EdgeCalib, `Optimizer.h:216-244`).

    Solves for t_mc (mic position in camera frame) and s (real-world→SLAM
    scale) from K poses of user 0, M poses of other users, and a (K, M)
    distance table:  err = d − ‖t_wm0 − t_wm1‖ / s  with
    t_wm = R·(−s·t_mc) + t.
    Returns (t_mc, scale).
    """
    R0 = jnp.asarray(R0, jnp.float32)            # (K, 3, 3)
    t0 = jnp.asarray(t0, jnp.float32)            # (K, 3)
    R_others = jnp.asarray(R_others, jnp.float32)  # (M, 3, 3)
    t_others = jnp.asarray(t_others, jnp.float32)  # (M, 3)
    distances = jnp.asarray(distances, jnp.float32)  # (K, M)

    def res(x):
        mc, s = x[:3], x[3]
        wm0 = jnp.einsum('kij,j->ki', R0, -s * mc) + t0      # (K, 3)
        wm1 = jnp.einsum('mij,j->mi', R_others, -s * mc) + t_others
        diff = wm0[:, None, :] - wm1[None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12) / s
        r = (distances - d).reshape(-1)
        if valid is not None:
            r = jnp.where(jnp.asarray(valid).reshape(-1), r, 0.0)
        return r

    x0 = jnp.concatenate([jnp.asarray(t_mc, jnp.float32),
                          jnp.asarray([scale], jnp.float32)])
    x = _lm(res, x0, n_iters)
    return x[:3], x[3]
