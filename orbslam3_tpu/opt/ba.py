"""Bundle adjustment: sparse Levenberg-Marquardt with Schur elimination in XLA.

TPU-native replacement for the g2o-based BA suite
(`/root/reference/src/Optimizer.cc`: `BundleAdjustment` 60,
`LocalBundleAdjustment` 1116, `GlobalBundleAdjustemnt` 52; block solver +
CSparse in `Thirdparty/g2o`).

Re-design (the core of the framework — see SURVEY.md section 7):
  g2o builds pointer-linked sparse block matrices and eliminates landmarks
  with a CPU Schur complement. Here the problem is four flat arrays
  (poses, landmarks, observations in COO form) and one GN/LM iteration is:

    1. vmapped residual+Jacobian evaluation for ALL observations at once;
    2. landmark blocks Hll (P,3,3) by `segment_sum` over the observation
       landmark index; per-landmark 3x3 Cholesky inverse (vmapped);
    3. the Schur reduced camera system assembled as ONE matmul:
       scatter per-observation blocks U_o = W_o * Hll_j^{-1/2} into a dense
       (6M, 3P) matrix Z, then S = Hpp - Z Z^T on the MXU. For local windows
       (M <= ~60 keyframes) S is a tiny dense system solved by Cholesky.
    4. landmark back-substitution via segment ops.

  The same structure shards over a device mesh by splitting landmark columns
  of Z and psum-ing S — that is `distributed/sharded_ba.py`.

Gauge handling matches the reference: fixed keyframes enter residuals but get
infinite-stiffness (masked) updates, exactly like g2o's `setFixed`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie, robust

HUBER_MONO = robust.CHI2_MONO ** 0.5


class BAProblem(NamedTuple):
    """COO bundle-adjustment problem over fixed-capacity arrays."""

    R: jax.Array        # (M,3,3) Tcw rotations
    t: jax.Array        # (M,3)
    points: jax.Array   # (P,3) world landmarks
    kf_idx: jax.Array   # (O,) int32 observation -> keyframe
    lm_idx: jax.Array   # (O,) int32 observation -> landmark
    uv: jax.Array       # (O,2) measurements (ideal-pinhole pixels)
    info: jax.Array     # (O,) information weights
    valid: jax.Array    # (O,) bool
    fixed_kf: jax.Array  # (M,) bool — poses held constant (gauge)
    fixed_lm: jax.Array  # (P,) bool
    # stereo extension (EdgeStereoSE3ProjectXYZ, G2oTypes.h:342-466):
    # virtual right-image u per observation (<0 = mono) and bf = baseline*fx.
    # None => pure-mono problem (2-component residuals, old behavior).
    u_r: jax.Array | None = None  # (O,)
    bf: jax.Array | None = None   # scalar


def _eval_residuals(prob: BAProblem, camera):
    """All-observation residuals + Jacobians.

    Mono problems: res (O,2), Jp (O,2,6), Jl (O,2,3).
    Stereo problems (u_r given): res (O,3) with the third component
    (u - bf/z) - u_r masked to zero for mono observations — the reference's
    EdgeStereo 3-vector residual (G2oTypes.h:342-466).
    """
    Rk = prob.R[prob.kf_idx]
    tk = prob.t[prob.kf_idx]
    Xw = prob.points[prob.lm_idx]
    xc = lie.se3_apply(Rk, tk, Xw)
    pred = camera.project(xc)
    res = pred - prob.uv
    Jproj = camera.project_jac(xc)
    if prob.u_r is not None:
        has_st = (prob.u_r >= 0.0)[:, None]
        z = jnp.maximum(xc[:, 2], 1e-6)
        r3 = (pred[:, 0] - prob.bf / z) - prob.u_r
        res = jnp.concatenate(
            [res, jnp.where(has_st, r3[:, None], 0.0)], axis=-1)
        # d(u - bf/z)/dxc = du/dxc + [0, 0, bf/z^2]
        Jr3 = Jproj[:, 0, :] + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), prob.bf / (z * z)], -1)
        Jr3 = jnp.where(has_st, Jr3, 0.0)
        Jproj = jnp.concatenate([Jproj, Jr3[:, None, :]], axis=1)
    Jp = jnp.concatenate([Jproj, -Jproj @ lie.hat(xc)], axis=-1)
    Jl = Jproj @ Rk  # dXc/dXw = R
    chi2 = jnp.sum(res * res, axis=-1) * prob.info
    return res, Jp, Jl, chi2


def _huber_delta(prob: BAProblem):
    """Per-observation Huber threshold: sqrt(5.991) mono, sqrt(7.815)
    stereo (reference deltaMonoSq/deltaStereoSq)."""
    if prob.u_r is None:
        return HUBER_MONO
    return jnp.where(prob.u_r >= 0.0, robust.CHI2_STEREO ** 0.5, HUBER_MONO)


def _chi2_gate(prob: BAProblem):
    if prob.u_r is None:
        return robust.CHI2_MONO
    return jnp.where(prob.u_r >= 0.0, robust.CHI2_STEREO, robust.CHI2_MONO)


def _weights(prob: BAProblem, chi2, behind):
    w = robust.huber_weight(chi2, _huber_delta(prob)) * prob.info
    return jnp.where(prob.valid & ~behind, w, 0.0)


def _spd_inv3(A: jax.Array) -> jax.Array:
    """Batched 3x3 SPD inverse via Cholesky (vmapped)."""
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def _chol_inv_sqrt3(A: jax.Array) -> jax.Array:
    """Batched T = L^{-T} with A = L L^T, so that T T^T = A^{-1}."""
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Linv, -1, -2)


def ba_normal_equations(prob: BAProblem, camera, lm_lambda):
    """Build the Schur-reduced camera system for one LM iteration.

    Returns (S, b_schur, Hll_damped, b_l, W-related tensors) packaged for the
    solve + back-substitution.
    """
    M = prob.R.shape[0]
    P = prob.points.shape[0]
    O = prob.uv.shape[0]
    dtype = prob.points.dtype

    res, Jp, Jl, chi2 = _eval_residuals(prob, camera)
    xc_behind = lie.se3_apply(prob.R[prob.kf_idx], prob.t[prob.kf_idx],
                              prob.points[prob.lm_idx])[:, 2] <= 0
    w = _weights(prob, chi2, xc_behind)

    JpW = Jp * w[:, None, None]
    JlW = Jl * w[:, None, None]

    # pose diagonal blocks (M,6,6) and gradients
    Hpp = jnp.zeros((M, 6, 6), dtype).at[prob.kf_idx].add(
        jnp.einsum("oia,oib->oab", JpW, Jp)
    )
    b_p = jnp.zeros((M, 6), dtype).at[prob.kf_idx].add(
        jnp.einsum("oia,oi->oa", JpW, res)
    )
    # landmark blocks (P,3,3)
    Hll = jnp.zeros((P, 3, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oia,oib->oab", JlW, Jl)
    )
    b_l = jnp.zeros((P, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oia,oi->oa", JlW, res)
    )
    # damping (LM): augment diagonals
    eye3 = jnp.eye(3, dtype=dtype)
    Hll_d = Hll + lm_lambda * jax.vmap(lambda h: jnp.diag(jnp.maximum(jnp.diag(h), 1e-6)))(Hll)
    Hpp_d = Hpp + lm_lambda * jax.vmap(lambda h: jnp.diag(jnp.maximum(jnp.diag(h), 1e-6)))(Hpp)

    # guard empty landmarks (no valid obs): make their block identity
    lm_obs = jnp.zeros((P,), dtype).at[prob.lm_idx].add(w)
    empty_lm = (lm_obs <= 1e-9) | prob.fixed_lm
    Hll_d = jnp.where(empty_lm[:, None, None], jnp.broadcast_to(eye3, Hll_d.shape), Hll_d)
    b_l = jnp.where(empty_lm[:, None], 0.0, b_l)

    T = _chol_inv_sqrt3(Hll_d)  # (P,3,3), T T^T = Hll^{-1}

    # per-observation U_o = (Jp^T w Jl) @ T_j   (6,3)
    W_o = jnp.einsum("oia,oib->oab", JpW, Jl)  # (O,6,3)
    U_o = W_o @ T[prob.lm_idx]  # (O,6,3)

    # dense Z (6M, 3P) by scatter-add of U blocks
    Z = jnp.zeros((M * 6, P * 3), dtype)
    row = (prob.kf_idx[:, None, None] * 6 + jnp.arange(6)[None, :, None])
    col = (prob.lm_idx[:, None, None] * 3 + jnp.arange(3)[None, None, :])
    row = jnp.broadcast_to(row, (O, 6, 3))
    col = jnp.broadcast_to(col, (O, 6, 3))
    Z = Z.at[row.reshape(-1), col.reshape(-1)].add(U_o.reshape(-1))

    # Schur complement on the MXU
    S = _block_diag_embed(Hpp_d) - Z @ Z.T
    y = jnp.einsum("pab,pb->pa", jnp.swapaxes(T, -1, -2), b_l)  # T^T b_l
    b_schur = b_p.reshape(-1) - Z @ y.reshape(-1)

    # fix gauge: rows/cols of fixed keyframes -> identity
    fixed6 = jnp.repeat(prob.fixed_kf, 6)
    S = jnp.where(fixed6[:, None] | fixed6[None, :],
                  jnp.eye(M * 6, dtype=dtype), S)
    b_schur = jnp.where(fixed6, 0.0, b_schur)
    return S, b_schur, T, b_l, W_o, empty_lm, chi2, w


def _block_diag_embed(blocks: jax.Array) -> jax.Array:
    """(M,6,6) -> (6M,6M) block-diagonal dense matrix."""
    M = blocks.shape[0]
    out = jnp.zeros((M * 6, M * 6), blocks.dtype)
    idx = jnp.arange(M)[:, None, None]
    r = idx * 6 + jnp.arange(6)[None, :, None]
    c = idx * 6 + jnp.arange(6)[None, None, :]
    r = jnp.broadcast_to(r, (M, 6, 6))
    c = jnp.broadcast_to(c, (M, 6, 6))
    return out.at[r.reshape(-1), c.reshape(-1)].add(blocks.reshape(-1))


def ba_solve_iteration(prob: BAProblem, camera, lm_lambda):
    """One damped-GN iteration: solve reduced system, back-substitute, update."""
    M = prob.R.shape[0]
    P = prob.points.shape[0]
    S, b_schur, T, b_l, W_o, empty_lm, chi2, w = ba_normal_equations(
        prob, camera, lm_lambda
    )
    dp = -jnp.linalg.solve(S, b_schur).reshape(M, 6)
    dp = jnp.where(prob.fixed_kf[:, None], 0.0, dp)

    # back-substitution: dl_j = -Hll^{-1} (b_l_j + sum_o W_o^T dp_{k(o)})
    Wt_dp = jnp.einsum("oab,oa->ob", W_o, dp[prob.kf_idx])  # (O,3)
    rhs = b_l + jnp.zeros((P, 3), b_l.dtype).at[prob.lm_idx].add(Wt_dp)
    Hll_inv = T @ jnp.swapaxes(T, -1, -2)
    dl = -jnp.einsum("pab,pb->pa", Hll_inv, rhs)
    dl = jnp.where((empty_lm | prob.fixed_lm)[:, None], 0.0, dl)

    dRs, dts = lie.se3_exp(dp)
    # renormalize onto SO(3): repeated fp32 compositions otherwise accumulate
    # scale/shear that bakes a zoom distortion into the map (see pose_gn.py)
    R_new = lie.so3_normalize(dRs @ prob.R)
    t_new = jnp.einsum("mij,mj->mi", dRs, prob.t) + dts
    pts_new = prob.points + dl
    cost = jnp.sum(robust.huber_rho(chi2, _huber_delta(prob)) * (w > 0))
    return prob._replace(R=R_new, t=t_new, points=pts_new), cost


def _lm_scan(prob: BAProblem, camera, n_iters: int, lambda0: float):
    def body(carry, _):
        prob, lam, cost_prev = carry
        prob_new, cost = ba_solve_iteration(prob, camera, lam)
        # evaluate new cost for accept/reject
        _, _, _, chi2_new = _eval_residuals(prob_new, camera)
        w_new = _weights(prob_new, chi2_new, jnp.zeros_like(chi2_new, bool))
        cost_new = jnp.sum(
            robust.huber_rho(chi2_new, _huber_delta(prob_new)) * (w_new > 0))
        # NaN guard: a diverged step (tiny lambda along the mono scale-gauge
        # null direction) yields NaN chi2, which would zero every weight and
        # make cost_new == 0 "win" the accept test — treat as +inf instead
        diverged = ~jnp.isfinite(
            jnp.where(prob_new.valid, chi2_new, 0.0)).all()
        cost_new = jnp.where(diverged, jnp.inf, cost_new)
        accept = cost_new < cost
        prob_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), a, b
            ) if a.dtype in (jnp.float32, jnp.float64) else b,
            prob_new, prob,
        )
        lam_next = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam_next = jnp.clip(lam_next, 1e-7, 1e2)
        return (prob_next, lam_next, jnp.where(accept, cost_new, cost)), cost

    (prob, _, _), costs = jax.lax.scan(
        body,
        (prob, jnp.asarray(lambda0, prob.points.dtype),
         jnp.asarray(jnp.inf, prob.points.dtype)),
        None, length=n_iters,
    )
    return prob, costs


@partial(jax.jit, static_argnames=("n_iters",))
def bundle_adjust(prob: BAProblem, camera, n_iters: int = 10,
                  lambda0: float = 1e-4):
    """Fixed-iteration two-phase LM bundle adjustment.

    Matches the reference's LocalBundleAdjustment semantics
    (Optimizer.cc:1116-1499): a first Huber-weighted phase, then HARD
    rejection of observations with chi2 > 5.991 (the reference sets edge
    level 1 after 5 iterations and later erases those observations from the
    map), then a second phase on the surviving inliers. Without the hard cut,
    geometrically-consistent mismatches (repeated texture) pull the map into
    a low-frequency bend that Huber alone cannot resist.

    Returns (prob, costs, outlier_mask) — outlier_mask marks observations
    rejected at the chi2 gate so the caller can erase them from the map
    (Optimizer.cc vToErase, :1446-1499).
    """
    n1 = max(n_iters // 3, 2)
    prob, costs1 = _lm_scan(prob, camera, n1, lambda0)
    # chi2 gate on the intermediate solution
    _, _, _, chi2 = _eval_residuals(prob, camera)
    xc_z = lie.se3_apply(prob.R[prob.kf_idx], prob.t[prob.kf_idx],
                         prob.points[prob.lm_idx])[..., 2]
    outlier = prob.valid & ((chi2 > _chi2_gate(prob)) | (xc_z <= 0.0))
    prob = prob._replace(valid=prob.valid & ~outlier)
    prob, costs2 = _lm_scan(prob, camera, n_iters - n1, lambda0)
    return prob, jnp.concatenate([costs1, costs2]), outlier
