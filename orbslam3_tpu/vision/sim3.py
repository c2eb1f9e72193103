"""Sim(3)/SE(3) alignment: batched Horn RANSAC + robust GN refinement.

TPU-native replacement for the reference's Sim3Solver
(`/root/reference/src/Sim3Solver.cc`: `iterate` 44-45, `ComputeSim3` 56 —
Horn 1987 closed-form over 3-point samples, bidirectional reprojection
scoring) and `Optimizer::OptimizeSim3` (`/root/reference/src/Optimizer.cc:
2115` — g2o refinement with mutual-projection edges). Fixed-scale mode covers
stereo/inertial loop candidates (Sim3Solver.h mbFixScale).

All RANSAC hypotheses are solved and scored in one vmapped program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie, robust

SAMPLE = 3


def horn_alignment(p1: jax.Array, p2: jax.Array, fix_scale: bool):
    """Closed-form Sim3 (s, R, t) with p2 ~ s*R@p1 + t (Horn 1987; the
    reference's ComputeSim3, Sim3Solver.cc:232-313 quaternion method is
    replaced by the equivalent SVD form, MXU-friendlier)."""
    c1 = p1.mean(0)
    c2 = p2.mean(0)
    q1 = p1 - c1
    q2 = p2 - c2
    H = q2.T @ q1  # (3,3)
    u, sv, vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(u @ vt)
    S = jnp.diag(jnp.stack([jnp.float32(1), jnp.float32(1), d]))
    R = u @ S @ vt
    denom = jnp.maximum(jnp.sum(q1 * q1), 1e-12)
    s = jnp.where(fix_scale, 1.0, jnp.sum(sv * jnp.diag(S)) / denom)
    t = c2 - s * (R @ c1)
    return s, R, t


class Sim3Result(NamedTuple):
    s: jax.Array
    R: jax.Array
    t: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    p1: jax.Array,       # (N,3) matched points in frame-1 camera coords
    p2: jax.Array,       # (N,3) same landmarks in frame-2 camera coords
    uv1: jax.Array,      # (N,2) pixel obs in image 1
    uv2: jax.Array,      # (N,2) pixel obs in image 2
    valid: jax.Array,    # (N,) bool
    camera1,
    camera2,
    key: jax.Array,
    n_hyp: int = 256,
    fix_scale: bool = False,
    th_px: float = 9.210 ** 0.5,  # chi2(2) @ 99% like Sim3Solver mTh
):
    """Batched 3-point Sim3 RANSAC with bidirectional reprojection scoring
    (Sim3Solver::CheckInliers, Sim3Solver.cc:316-341)."""
    n = p1.shape[0]
    valid_f = valid.astype(jnp.float32)
    probs = valid_f / jnp.maximum(valid_f.sum(), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(probs + 1e-20)[None, :].repeat(n_hyp * SAMPLE, 0)
    ).reshape(n_hyp, SAMPLE)

    def solve_one(sample):
        s, R, t = horn_alignment(p1[sample], p2[sample],
                                 jnp.asarray(fix_scale))
        # project frame-1 points into image 2 via T21, and vice versa
        p1_in2 = s * (p1 @ R.T) + t
        sinv, Rinv, tinv = lie.sim3_inverse(s, R, t)
        p2_in1 = sinv * (p2 @ Rinv.T) + tinv
        e2 = jnp.sum((camera2.project(p1_in2) - uv2) ** 2, -1)
        e1 = jnp.sum((camera1.project(p2_in1) - uv1) ** 2, -1)
        inl = valid & (e1 < th_px**2) & (e2 < th_px**2) \
            & (p1_in2[:, 2] > 0) & (p2_in1[:, 2] > 0)
        return s, R, t, inl, jnp.sum(inl)

    ss, Rs, ts, inls, scores = jax.vmap(solve_one)(idx)
    best = jnp.argmax(scores)
    return Sim3Result(ss[best], Rs[best], ts[best], inls[best], scores[best])


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_sim3(
    s0, R0, t0,
    p1, p2, uv1, uv2, info, valid,
    camera1, camera2,
    n_iters: int = 10,
    fix_scale: bool = False,
    huber: float = jnp.sqrt(10.0),
):
    """Robust GN over the 7-dof Sim3 (Optimizer::OptimizeSim3,
    Optimizer.cc:2115-2380): mutual reprojection residuals, Huber kernel,
    returns refined (s, R, t, inliers, n_inliers)."""

    def residuals(s, R, t):
        p1_in2 = s * (p1 @ R.T) + t
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        p2_in1 = si * (p2 @ Ri.T) + ti
        r2 = camera2.project(p1_in2) - uv2
        r1 = camera1.project(p2_in1) - uv1
        return r1, r2

    def gn_step(_, state):
        s, R, t = state

        def res_vec(xi):
            ds, dR, dt = lie.sim3_exp(xi)
            s_, R_, t_ = lie.sim3_compose(ds, dR, dt, s, R, t)
            r1, r2 = residuals(s_, R_, t_)
            return jnp.concatenate([r1.ravel(), r2.ravel()])

        xi0 = jnp.zeros(7)
        r = res_vec(xi0)
        J = jax.jacfwd(res_vec)(xi0)
        chi2 = (r.reshape(-1, 2) ** 2).sum(-1) * jnp.concatenate([info, info])
        w = robust.huber_weight(chi2, huber) * jnp.concatenate([info, info])
        w = w * jnp.concatenate([valid, valid]).astype(w.dtype)
        w2 = jnp.repeat(w, 2)
        H = J.T @ (J * w2[:, None])
        b = J.T @ (r * w2)
        if fix_scale:
            # zero out the scale dof (last tangent slot in sim3_exp layout)
            H = H.at[6, :].set(0).at[:, 6].set(0).at[6, 6].set(1.0)
            b = b.at[6].set(0)
        H = H + 1e-6 * jnp.eye(7)
        dx = -jnp.linalg.solve(H, b)
        ds, dR, dt = lie.sim3_exp(dx)
        return lie.sim3_compose(ds, dR, dt, s, R, t)

    s, R, t = jax.lax.fori_loop(0, n_iters, gn_step, (s0, R0, t0))
    R = lie.so3_normalize(R)
    r1, r2 = residuals(s, R, t)
    chi1 = (r1**2).sum(-1) * info
    chi2_ = (r2**2).sum(-1) * info
    inl = valid & (chi1 < 9.21) & (chi2_ < 9.21)
    return s, R, t, inl, jnp.sum(inl)
