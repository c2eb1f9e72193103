"""Pose-only optimization: fixed-iteration robust Gauss-Newton on SE(3).

TPU-native replacement for `Optimizer::PoseOptimization`
(`/root/reference/src/Optimizer.cc:814-1114`): the reference runs 4 rounds of
10 LM iterations on g2o, re-classifying outliers by chi2 (5.991 mono) between
rounds. Here each round is a fixed `lax.fori_loop` of damped GN steps; the
whole 4-round schedule with outlier re-classification compiles to one XLA
program; residuals/Jacobians for all observations are evaluated as one batch.

Perturbation convention: left-multiplicative, T <- exp(xi) * T with
xi = (rho, phi), so dXc/dxi = [I | -hat(Xc)].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie, robust

CHI2_MONO = robust.CHI2_MONO
HUBER_MONO = CHI2_MONO ** 0.5


def reprojection_residuals(R, t, points, uv, camera, u_r=None, bf=None):
    """Residuals (N,2|3) and Jacobians (N,2|3,6) wrt left-perturbation.

    With `u_r`/`bf`, appends the stereo component (u - bf/z) - u_r, masked
    to zero for mono observations (u_r < 0) — reference
    EdgeStereoSE3ProjectXYZOnlyPose."""
    xc = lie.se3_apply(R, t, points)
    pred = camera.project(xc)
    res = pred - uv
    Jproj = camera.project_jac(xc)  # (N,2,3)
    if u_r is not None:
        has_st = (u_r >= 0.0)[:, None]
        z = jnp.maximum(xc[:, 2], 1e-6)
        r3 = (pred[:, 0] - bf / z) - u_r
        res = jnp.concatenate([res, jnp.where(has_st, r3[:, None], 0.0)], -1)
        Jr3 = Jproj[:, 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), bf / (z * z)], -1)
        Jproj = jnp.concatenate(
            [Jproj, jnp.where(has_st, Jr3, 0.0)[:, None, :]], axis=1)
    # dXc/dxi = [I | -hat(Xc)]
    Jpose = jnp.concatenate([Jproj, -Jproj @ lie.hat(xc)], axis=-1)
    return res, Jpose, xc


@partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def optimize_pose(
    R0: jax.Array,  # (3,3) initial Tcw rotation
    t0: jax.Array,  # (3,)
    points: jax.Array,  # (N,3) world points
    uv: jax.Array,  # (N,2) observations
    info: jax.Array,  # (N,) information weight (1/sigma^2 per octave)
    valid: jax.Array,  # (N,) bool
    camera,
    n_rounds: int = 4,
    n_iters: int = 10,
    damping: float = 1e-3,
    u_r: jax.Array | None = None,  # (N,) virtual right u; <0 = mono
    bf: jax.Array | None = None,
):
    """Returns (R, t, inliers, n_inliers). Matches the reference's
    round structure: after each round, obs with chi2 > 5.991 are excluded
    (and can re-enter if they fall back under threshold, like g2o level-0/1
    edge re-activation at Optimizer.cc:1049-1070)."""

    if u_r is None:
        delta = HUBER_MONO
        gate = CHI2_MONO
    else:  # per-obs thresholds: sqrt(7.815) / 7.815 for stereo rows
        delta = jnp.where(u_r >= 0.0, robust.CHI2_STEREO ** 0.5, HUBER_MONO)
        gate = jnp.where(u_r >= 0.0, robust.CHI2_STEREO, CHI2_MONO)

    def gn_round(carry, _):
        R, t, inlier = carry

        def gn_step(_, Rt):
            R, t = Rt
            res, J, _ = reprojection_residuals(R, t, points, uv, camera,
                                               u_r, bf)
            chi2 = jnp.sum(res * res, axis=-1) * info
            w = robust.huber_weight(chi2, delta) * info * inlier
            JW = J * w[:, None, None]
            H = jnp.einsum("nia,nib->ab", JW, J)
            b = jnp.einsum("nia,ni->a", JW, res)
            # Marquardt-style *relative* diagonal damping: H's diagonal spans
            # ~4 orders of magnitude between rotation and translation blocks,
            # so absolute damping would crush the small block and leave a
            # systematic under-convergence bias.
            H = H + damping * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            dx = -jnp.linalg.solve(H, b)
            dR, dt = lie.se3_exp(dx)
            return (dR @ R, dR @ t + dt)

        R, t = jax.lax.fori_loop(0, n_iters, gn_step, (R, t))
        # Re-orthonormalize: ~40 fp32 dR@R compositions per call would
        # otherwise leave a scale/shear in R (det drifting off 1) that
        # projects as an un-fittable image-zoom residual field and creates a
        # spurious pose minimum. (Root-caused on the zero-noise e2e run:
        # det(R) had drifted to 0.994 by frame 16.)
        R = lie.so3_normalize(R)
        # re-classify
        res, _, xc = reprojection_residuals(R, t, points, uv, camera,
                                            u_r, bf)
        chi2 = jnp.sum(res * res, axis=-1) * info
        inlier_new = (
            valid.astype(R.dtype)
            * (chi2 < gate).astype(R.dtype)
            * (xc[:, 2] > 0).astype(R.dtype)
        )
        return (R, t, inlier_new), None

    inlier0 = valid.astype(R0.dtype)
    (R, t, inlier), _ = jax.lax.scan(
        gn_round, (R0, t0, inlier0), None, length=n_rounds
    )
    return R, t, inlier > 0, jnp.sum(inlier).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def optimize_pose_batch(
    R0: jax.Array,      # (F,3,3)
    t0: jax.Array,      # (F,3)
    points: jax.Array,  # (F,N,3)
    uv: jax.Array,      # (F,N,2)
    info: jax.Array,    # (F,N)
    valid: jax.Array,   # (F,N)
    camera,
    n_rounds: int = 4,
    n_iters: int = 10,
):
    """vmapped pose-only optimization over a batch of frames — one device
    program refines a whole trajectory at once (used by the export-time
    trajectory polish; there is no reference analog, the reference exports
    raw per-frame poses)."""

    def one(R0_, t0_, p_, u_, i_, v_):
        return optimize_pose(R0_, t0_, p_, u_, i_, v_, camera,
                             n_rounds=n_rounds, n_iters=n_iters)

    return jax.vmap(one)(R0, t0, points, uv, info, valid)
