"""Distributed bundle adjustment: landmark-sharded Schur complement.

TPU-native replacement for the reference's single-threaded g2o global/local BA
(`/root/reference/src/Optimizer.cc`: `GlobalBundleAdjustemnt` 52,
`RunGlobalBundleAdjustment` at `src/LoopClosing.cc:2272` — a transient CPU
thread). The reference has no multi-device story at all; this module is the
scaling axis the TPU design adds.

Sharding layout (the "how to scale your model" recipe applied to BA):

  * poses (M,6 blocks)      — REPLICATED on every device: the reduced camera
                              system is tiny (local windows <= ~60 KFs) and
                              every landmark touches many cameras.
  * landmarks (P,3 blocks)  — SHARDED over mesh axis "lm". Landmark Hessian
                              blocks Hll are block-diagonal, so elimination is
                              embarrassingly parallel per shard.
  * observations (COO)      — routed to the shard that OWNS their landmark
                              (host-side `route_observations`), so each
                              device's Schur contribution
                              S_d = Z_d Z_d^T touches disjoint landmark
                              columns and  S = Hpp - psum_d(S_d)  is exact.

One iteration = per-shard residual/Jacobian batch, per-shard landmark
elimination, ONE psum of the (6M,6M) reduced system + gradient over ICI, a
replicated dense Cholesky solve, and per-shard back-substitution. No
gather/scatter crosses devices; the only collective traffic is S and b
(36 M^2 + 6 M floats).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from orbslam3_tpu.core import lie, robust
from orbslam3_tpu.opt.ba import (
    BAProblem,
    HUBER_MONO,
    _block_diag_embed,
    _chol_inv_sqrt3,
)


def route_observations(prob: BAProblem, n_shards: int) -> BAProblem:
    """Host-side routing: reorder/pad observations so shard s holds exactly
    the observations of landmarks [s*P/n, (s+1)*P/n), padded to a common
    per-shard capacity. Returns a new BAProblem whose obs arrays concatenate
    the shards (total length = n_shards * per_shard_cap)."""
    P_total = prob.points.shape[0]
    assert P_total % n_shards == 0, "pad landmark capacity to n_shards"
    p_loc = P_total // n_shards
    lm = np.asarray(prob.lm_idx)
    kf = np.asarray(prob.kf_idx)
    uv = np.asarray(prob.uv)
    info = np.asarray(prob.info)
    valid = np.asarray(prob.valid)
    shard = lm // p_loc
    counts = np.bincount(shard[valid], minlength=n_shards)
    cap = int(max(counts.max(), 1))
    cap = -(-cap // 8) * 8  # pad to sublane multiple

    O_new = n_shards * cap
    kf_n = np.zeros(O_new, np.int32)
    lm_n = np.zeros(O_new, np.int32)
    uv_n = np.zeros((O_new, 2), np.float32)
    info_n = np.zeros(O_new, np.float32)
    valid_n = np.zeros(O_new, bool)
    for s in range(n_shards):
        sel = np.nonzero(valid & (shard == s))[0]
        base = s * cap
        n = len(sel)
        kf_n[base: base + n] = kf[sel]
        lm_n[base: base + n] = lm[sel]
        uv_n[base: base + n] = uv[sel]
        info_n[base: base + n] = info[sel]
        valid_n[base: base + n] = True
        # padding rows point at the shard's first landmark (masked by valid)
        lm_n[base + n: base + cap] = s * p_loc
    return prob._replace(
        kf_idx=jnp.asarray(kf_n), lm_idx=jnp.asarray(lm_n),
        uv=jnp.asarray(uv_n), info=jnp.asarray(info_n),
        valid=jnp.asarray(valid_n),
    )


def _shard_iteration(R, t, pts, kf_idx, lm_idx, uv, info, valid,
                     fixed_kf, fixed_lm, lam, camera, axis: str):
    """Body run per landmark shard under shard_map. All `pts`/obs arrays are
    the LOCAL shard; R/t/fixed_kf are replicated. Returns the updated
    (R, t) (replicated) and local landmark update + cost."""
    M = R.shape[0]
    p_loc = pts.shape[0]
    dtype = pts.dtype
    shard_id = jax.lax.axis_index(axis)
    lm_local = lm_idx - shard_id * p_loc

    # --- residuals + Jacobians over the local observation batch
    Rk = R[kf_idx]
    tk = t[kf_idx]
    Xw = pts[lm_local]
    xc = lie.se3_apply(Rk, tk, Xw)
    pred = camera.project(xc)
    res = pred - uv
    Jproj = camera.project_jac(xc)
    Jp = jnp.concatenate([Jproj, -Jproj @ lie.hat(xc)], axis=-1)
    Jl = Jproj @ Rk
    chi2 = jnp.sum(res * res, axis=-1) * info
    w = robust.huber_weight(chi2, HUBER_MONO) * info
    w = jnp.where(valid & (xc[:, 2] > 0), w, 0.0)

    JpW = Jp * w[:, None, None]
    JlW = Jl * w[:, None, None]

    # --- pose system (replicated after psum)
    Hpp = jnp.zeros((M, 6, 6), dtype).at[kf_idx].add(
        jnp.einsum("oia,oib->oab", JpW, Jp))
    b_p = jnp.zeros((M, 6), dtype).at[kf_idx].add(
        jnp.einsum("oia,oi->oa", JpW, res))
    Hpp = jax.lax.psum(Hpp, axis)
    b_p = jax.lax.psum(b_p, axis)
    Hpp_d = Hpp + lam * jax.vmap(
        lambda h: jnp.diag(jnp.maximum(jnp.diag(h), 1e-6)))(Hpp)

    # --- local landmark elimination
    eye3 = jnp.eye(3, dtype=dtype)
    Hll = jnp.zeros((p_loc, 3, 3), dtype).at[lm_local].add(
        jnp.einsum("oia,oib->oab", JlW, Jl))
    b_l = jnp.zeros((p_loc, 3), dtype).at[lm_local].add(
        jnp.einsum("oia,oi->oa", JlW, res))
    Hll_d = Hll + lam * jax.vmap(
        lambda h: jnp.diag(jnp.maximum(jnp.diag(h), 1e-6)))(Hll)
    lm_obs = jnp.zeros((p_loc,), dtype).at[lm_local].add(w)
    empty_lm = (lm_obs <= 1e-9) | fixed_lm
    Hll_d = jnp.where(empty_lm[:, None, None],
                      jnp.broadcast_to(eye3, Hll_d.shape), Hll_d)
    b_l = jnp.where(empty_lm[:, None], 0.0, b_l)
    T = _chol_inv_sqrt3(Hll_d)

    # --- Schur contribution: local Z has disjoint landmark columns per shard
    W_o = jnp.einsum("oia,oib->oab", JpW, Jl)          # (O,6,3)
    U_o = W_o @ T[lm_local]                            # (O,6,3)
    O = uv.shape[0]
    Z = jnp.zeros((M * 6, p_loc * 3), dtype)
    row = kf_idx[:, None, None] * 6 + jnp.arange(6)[None, :, None]
    col = lm_local[:, None, None] * 3 + jnp.arange(3)[None, None, :]
    row = jnp.broadcast_to(row, (O, 6, 3))
    col = jnp.broadcast_to(col, (O, 6, 3))
    Z = Z.at[row.reshape(-1), col.reshape(-1)].add(U_o.reshape(-1))

    S_part = Z @ Z.T                                   # (6M,6M) on the MXU
    y = jnp.einsum("pab,pb->pa", jnp.swapaxes(T, -1, -2), b_l)
    by_part = Z @ y.reshape(-1)
    S = _block_diag_embed(Hpp_d) - jax.lax.psum(S_part, axis)
    b_schur = b_p.reshape(-1) - jax.lax.psum(by_part, axis)

    # gauge fixing
    fixed6 = jnp.repeat(fixed_kf, 6)
    S = jnp.where(fixed6[:, None] | fixed6[None, :],
                  jnp.eye(M * 6, dtype=dtype), S)
    b_schur = jnp.where(fixed6, 0.0, b_schur)

    # --- replicated camera solve
    dp = -jnp.linalg.solve(S, b_schur).reshape(M, 6)
    dp = jnp.where(fixed_kf[:, None], 0.0, dp)

    # --- local back-substitution
    Wt_dp = jnp.einsum("oab,oa->ob", W_o, dp[kf_idx])
    rhs = b_l + jnp.zeros((p_loc, 3), dtype).at[lm_local].add(Wt_dp)
    Hll_inv = T @ jnp.swapaxes(T, -1, -2)
    dl = -jnp.einsum("pab,pb->pa", Hll_inv, rhs)
    dl = jnp.where(empty_lm[:, None], 0.0, dl)

    dRs, dts = lie.se3_exp(dp)
    R_new = lie.so3_normalize(dRs @ R)
    t_new = jnp.einsum("mij,mj->mi", dRs, t) + dts
    pts_new = pts + dl
    cost = jax.lax.psum(
        jnp.sum(robust.huber_rho(chi2, HUBER_MONO) * (w > 0)), axis)
    return R_new, t_new, pts_new, cost


def make_sharded_ba(mesh: Mesh, camera, n_iters: int = 8,
                    lambda0: float = 1e-4, axis: str = "lm"):
    """Build the jitted distributed-BA step for a given mesh.

    Expects a `route_observations`-prepared BAProblem. Landmarks and
    observations are sharded over `axis`; poses replicate. Returns
    `(prob_out, costs)` like `opt.ba.bundle_adjust`.
    """
    pspec_obs = P(axis)
    pspec_pts = P(axis)
    rep = P()

    def step(R, t, pts, kf_idx, lm_idx, uv, info, valid, fixed_kf, fixed_lm):
        def body(carry, _):
            R, t, pts, lam = carry
            R2, t2, pts2, cost = _shard_iteration(
                R, t, pts, kf_idx, lm_idx, uv, info, valid,
                fixed_kf, fixed_lm, lam, camera, axis)
            return (R2, t2, pts2, lam * 0.7), cost

        (R, t, pts, _), costs = jax.lax.scan(
            body, (R, t, pts, jnp.asarray(lambda0, pts.dtype)), None,
            length=n_iters)
        return R, t, pts, costs

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, pspec_pts, pspec_obs, pspec_obs, pspec_obs,
                  pspec_obs, pspec_obs, rep, pspec_pts),
        out_specs=(rep, rep, pspec_pts, rep),
    )

    @jax.jit
    def run(prob: BAProblem):
        R, t, pts, costs = sharded(
            prob.R, prob.t, prob.points, prob.kf_idx, prob.lm_idx,
            prob.uv, prob.info, prob.valid, prob.fixed_kf, prob.fixed_lm)
        return prob._replace(R=R, t=t, points=pts), costs

    return run
