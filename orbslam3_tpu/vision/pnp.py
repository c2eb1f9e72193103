"""PnP: batched hypothesize-and-verify RANSAC + GN polish, for relocalization.

TPU-native replacement for the reference's MLPnPsolver
(`/root/reference/src/MLPnPsolver.cpp`, used by `Tracking::Relocalization`,
`/root/reference/src/Tracking.cc:3753-3921`). The reference runs sequential
RANSAC with a maximum-likelihood bearing-vector solver; here ALL hypotheses
are solved and scored in one vmapped device program (SURVEY §7 "RANSAC control
flow"): each hypothesis takes a 6-point sample, solves the DLT projection
matrix (SVD of 12x12 normal matrix), projects onto SE(3) by Procrustes, and
is scored by inlier count; the winner is polished with the robust pose GN
(`opt/pose_gn.optimize_pose`, the reference's `PoseOptimization` follow-up).

Works in normalized camera coordinates so it is camera-model generic
(pinhole & KB8), like the reference's bearing-vector formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie
from orbslam3_tpu.opt.pose_gn import optimize_pose

SAMPLE = 6


def _dlt_pose(pts: jax.Array, xn: jax.Array) -> tuple[jax.Array, jax.Array]:
    """DLT from (S,3) world points and (S,2) normalized image coords.

    Builds the 2S x 12 system for P = [R|t] (calibrated), takes the smallest
    right singular vector, and projects the 3x3 block to SO(3).
    """
    s = pts.shape[0]
    zeros = jnp.zeros((s, 4))
    Xh = jnp.concatenate([pts, jnp.ones((s, 1))], -1)  # (S,4)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, :1] * Xh], -1)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)  # (2S,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    p = vt[-1].reshape(3, 4)
    M, t = p[:, :3], p[:, 3]
    # scale + orientation fix: project M onto a rotation
    u, sv, vtm = jnp.linalg.svd(M)
    det = jnp.linalg.det(u @ vtm)
    R = u @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.stack(
        [jnp.float32(1), jnp.float32(1), det])) @ vtm
    scale = jnp.sum(sv) / 3.0 * det
    t = t / jnp.where(jnp.abs(scale) > 1e-12, scale, 1e-12)
    # enforce cheirality of the sample: majority of points must be in front
    z = (pts @ R.T + t)[:, 2]
    flip = jnp.sum(z < 0) > (s // 2)
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # -R is not a rotation (det=-1) — recover closest rotation again
    u2, _, vt2 = jnp.linalg.svd(R)
    d2 = jnp.linalg.det(u2 @ vt2)
    R = u2 @ jnp.diag(jnp.stack([jnp.float32(1), jnp.float32(1), d2])) @ vt2
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(
    points: jax.Array,   # (N,3) world points
    uv: jax.Array,       # (N,2) pixel observations
    valid: jax.Array,    # (N,) bool
    camera,
    key: jax.Array,
    n_hyp: int = 256,
    inlier_thresh_px: float = 5.991 ** 0.5 * 2.0,
):
    """Returns (R, t, inliers (N,) bool, n_inliers, best_score_ok).

    All `n_hyp` minimal samples solved+scored in parallel; sampling is with
    replacement biased to valid entries (invalid rows are remapped to the
    first valid row — degenerate duplicates just score poorly).
    """
    n = points.shape[0]
    xn = camera.unproject(uv)[..., :2]  # normalized coords

    valid_f = valid.astype(jnp.float32)
    probs = valid_f / jnp.maximum(valid_f.sum(), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(probs + 1e-20)[None, :].repeat(n_hyp * SAMPLE, 0)
    ).reshape(n_hyp, SAMPLE)

    def solve_one(sample_idx):
        R, t = _dlt_pose(points[sample_idx], xn[sample_idx])
        pred = camera.project(points @ R.T + t)
        err2 = jnp.sum((pred - uv) ** 2, -1)
        z = (points @ R.T + t)[:, 2]
        inl = valid & (err2 < inlier_thresh_px**2) & (z > 0)
        return R, t, inl, jnp.sum(inl)

    Rs, ts, inls, scores = jax.vmap(solve_one)(idx)
    best = jnp.argmax(scores)
    return Rs[best], ts[best], inls[best], scores[best]


def relocalize_pose(points, uv, octave_info, valid, camera, key,
                    min_inliers: int = 15):
    """Full relocalization solve: PnP RANSAC + robust pose GN polish
    (Tracking.cc:3753-3921 candidate loop body). Returns
    (R, t, ok, n_inliers)."""
    R0, t0, inl, n0 = pnp_ransac(points, uv, valid, camera, key)
    R, t, inliers, n = optimize_pose(
        R0, t0, points, uv, octave_info, valid & inl, camera)
    ok = n >= min_inliers
    return R, t, ok, n
