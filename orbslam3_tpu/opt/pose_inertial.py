"""Visual-inertial pose-only tracking optimization.

TPU-native redesign of the reference's per-frame VI optimizers
(`/root/reference/src/Optimizer.cc`):
  * `PoseInertialOptimizationLastKeyFrame` (:4491) — current frame state
    (pose, velocity, gyro+acc bias; 15 DoF) against the last keyframe
    (fixed anchor) through the preintegration factor, plus pose-only
    reprojection edges.
  * `PoseInertialOptimizationLastFrame` (:4875) — anchor is the previous
    FRAME, itself held by a marginalization prior (`EdgePriorPoseImu`,
    G2oTypes.h:732); after convergence the previous frame is Schur-
    marginalized out of the joint Hessian (`Optimizer::Marginalize`, :2960)
    to produce the next frame's prior (`ConstraintPoseImu`, Frame.h:132).

Design: one fixed-iteration GN program over the (15 or 30)-dim state with
vmapped reprojection residuals and autodiff Jacobians of the small inertial
terms. Outlier handling matches the reference's 4-round chi2 re-classification
(Optimizer.cc:4600-4700 region).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie, robust

HUBER_MONO = robust.CHI2_MONO ** 0.5
G_VEC = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)


class BodyState(NamedTuple):
    """One frame's IMU-frame state."""

    Rwb: jax.Array   # (3,3)
    p: jax.Array     # (3,) body position (world)
    v: jax.Array     # (3,) body velocity (world)
    bias: jax.Array  # (6,) gyro(3) + acc(3)


class PoseImuPrior(NamedTuple):
    """Marginalization prior on a frame state (ConstraintPoseImu).

    Residual: [Log(R0^T R), R0^T(p - p0), v - v0, b - b0] weighted by the
    15x15 information matrix H (order: phi, p, v, bg, ba).
    """

    state: BodyState
    H: jax.Array  # (15,15)


def _perturb(s: BodyState, d: jax.Array) -> BodyState:
    """Right-perturbation on R; additive p/v/bias. d is (15,)."""
    return BodyState(
        Rwb=s.Rwb @ lie.so3_exp(d[0:3]),
        p=s.p + d[3:6],
        v=s.v + d[6:9],
        bias=s.bias + d[9:15],
    )


def _inertial_residual(si: BodyState, sj: BodyState, pre_dR, pre_dV, pre_dP,
                       JRg, JVg, JVa, JPg, JPa, bias0, dT, W):
    """Whitened 9-dim preintegration residual i -> j (EdgeInertial,
    G2oTypes.h:495)."""
    # bias correction uses the ANCHOR state's bias (reference wires
    # EdgeInertial to VGk/VAk — the anchor's bias vertices, fixed in
    # LastKeyFrame mode; Optimizer.cc PoseInertialOptimization*). Using the
    # free current-frame bias would give this edge a spurious gradient that
    # lets one preintegration window drag the bias, bypassing the
    # random-walk edge that is meant to be the only bias constraint.
    dbg = si.bias[:3] - bias0[:3]
    dba = si.bias[3:] - bias0[3:]
    dR = pre_dR @ lie.so3_exp(JRg @ dbg)
    dV = pre_dV + JVg @ dbg + JVa @ dba
    dP = pre_dP + JPg @ dbg + JPa @ dba
    er = lie.so3_log(dR.T @ si.Rwb.T @ sj.Rwb)
    ev = si.Rwb.T @ (sj.v - si.v - G_VEC * dT) - dV
    ep = si.Rwb.T @ (sj.p - si.p - si.v * dT - 0.5 * G_VEC * dT * dT) - dP
    return W @ jnp.concatenate([er, ev, ep])


def _bias_rw_residual(si: BodyState, sj: BodyState, Ww):
    """Whitened 6-dim bias random walk (EdgeGyroRW/EdgeAccRW)."""
    return Ww @ (sj.bias - si.bias)


def _prior_residual(prior: PoseImuPrior, s: BodyState):
    """15-dim prior residual weighted by sqrt of the information matrix."""
    r = jnp.concatenate([
        lie.so3_log(prior.state.Rwb.T @ s.Rwb),
        prior.state.Rwb.T @ (s.p - prior.state.p),
        s.v - prior.state.v,
        s.bias - prior.state.bias,
    ])
    # H = L L^T => ||L^T r||^2 = r^T H r
    L = jnp.linalg.cholesky(prior.H + 1e-8 * jnp.eye(15, dtype=prior.H.dtype))
    return L.T @ r


def _cam_from_body(s: BodyState, Rcb, tcb):
    R_cw = Rcb @ s.Rwb.T
    t_cw = -R_cw @ s.p + tcb
    return R_cw, t_cw


def _reproj_terms(s: BodyState, Rcb, tcb, points, uv, camera):
    R_cw, t_cw = _cam_from_body(s, Rcb, tcb)
    xc = points @ R_cw.T + t_cw
    pred = camera.project(xc)
    return pred - uv, xc[:, 2]


@partial(jax.jit, static_argnames=("n_rounds", "n_iters",
                                   "use_prior", "anchor_fixed"))
def _optimize(anchor: BodyState, cur: BodyState,
              pre_dR, pre_dV, pre_dP, JRg, JVg, JVa, JPg, JPa, bias0, dT,
              W, Ww, prior_H,
              points, uv, info, valid, Rcb, tcb, camera,
              use_prior: bool, anchor_fixed: bool,
              n_rounds: int = 4, n_iters: int = 8, damping: float = 1e-3):
    N = points.shape[0]
    prior = PoseImuPrior(anchor, prior_H)

    def gn_round(carry, _):
        anchor_c, cur_c, inlier = carry

        def gn_step(_, st):
            a, c = st

            def sr(d):
                sa, scur = _perturb(a, jnp.where(anchor_fixed, 0.0, 1.0)
                                    * d[:15]), _perturb(c, d[15:])
                r_in = _inertial_residual(sa, scur, pre_dR, pre_dV, pre_dP,
                                          JRg, JVg, JVa, JPg, JPa, bias0,
                                          dT, W)
                r_rw = _bias_rw_residual(sa, scur, Ww)
                r_pr = jnp.where(use_prior, 1.0, 0.0) * _prior_residual(
                    prior, sa)
                return jnp.concatenate([r_in, r_rw, r_pr])

            def rr(d):
                scur = _perturb(c, d[15:])
                res, _ = _reproj_terms(scur, Rcb, tcb, points, uv, camera)
                return res.reshape(-1)

            zero = jnp.zeros(30, jnp.float32)
            r_s = sr(zero)
            J_s = jax.jacfwd(sr)(zero)               # (30k,30)
            r_v = rr(zero).reshape(N, 2)
            J_v = jax.jacfwd(rr)(zero).reshape(N, 2, 30)

            chi2 = jnp.sum(r_v * r_v, axis=-1) * info
            w = robust.huber_weight(chi2, HUBER_MONO) * info * inlier
            H = (J_s.T @ J_s
                 + jnp.einsum("nia,nib->ab", J_v * w[:, None, None], J_v))
            b = J_s.T @ r_s + jnp.einsum(
                "nia,ni->a", J_v * w[:, None, None], r_v)
            H = H + damping * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            # freeze anchor block when fixed
            fa = jnp.concatenate([jnp.full(15, anchor_fixed),
                                  jnp.zeros(15, bool)])
            H = jnp.where(fa[:, None] | fa[None, :],
                          jnp.eye(30, dtype=H.dtype), H)
            b = jnp.where(fa, 0.0, b)
            d = -jnp.linalg.solve(H, b)
            a2 = _perturb(a, jnp.where(anchor_fixed, 0.0, 1.0) * d[:15])
            c2 = _perturb(c, d[15:])
            a2 = a2._replace(Rwb=lie.so3_normalize(a2.Rwb))
            c2 = c2._replace(Rwb=lie.so3_normalize(c2.Rwb))
            return (a2, c2)

        anchor_c, cur_c = jax.lax.fori_loop(0, n_iters, gn_step,
                                            (anchor_c, cur_c))
        res, z = _reproj_terms(cur_c, Rcb, tcb, points, uv, camera)
        chi2 = jnp.sum(res * res, axis=-1) * info
        inlier_new = valid & (chi2 <= robust.CHI2_MONO) & (z > 0.0)
        return (anchor_c, cur_c, inlier_new.astype(jnp.float32)), None

    init = (anchor, cur, valid.astype(jnp.float32))
    (anchor_f, cur_f, inlier), _ = jax.lax.scan(gn_round, init, None,
                                                length=n_rounds)

    # joint Hessian at the optimum for marginalization (Optimizer.cc:2960)
    def sr_final(d):
        sa = _perturb(anchor_f, jnp.where(anchor_fixed, 0.0, 1.0) * d[:15])
        sc = _perturb(cur_f, d[15:])
        r_in = _inertial_residual(sa, sc, pre_dR, pre_dV, pre_dP,
                                  JRg, JVg, JVa, JPg, JPa, bias0, dT, W)
        r_rw = _bias_rw_residual(sa, sc, Ww)
        r_pr = jnp.where(use_prior, 1.0, 0.0) * _prior_residual(prior, sa)
        return jnp.concatenate([r_in, r_rw, r_pr])

    def rr_final(d):
        sc = _perturb(cur_f, d[15:])
        res, _ = _reproj_terms(sc, Rcb, tcb, points, uv, camera)
        return res.reshape(-1)

    zero = jnp.zeros(30, jnp.float32)
    J_s = jax.jacfwd(sr_final)(zero)
    J_v = jax.jacfwd(rr_final)(zero).reshape(N, 2, 30)
    res, z = _reproj_terms(cur_f, Rcb, tcb, points, uv, camera)
    chi2 = jnp.sum(res * res, axis=-1) * info
    w = robust.huber_weight(chi2, HUBER_MONO) * info * inlier
    H30 = (J_s.T @ J_s
           + jnp.einsum("nia,nib->ab", J_v * w[:, None, None], J_v))
    # Schur-marginalize the anchor block: Hm = Hcc - Hcp Hpp^-1 Hpc
    Hpp = H30[:15, :15] + 1e-6 * jnp.eye(15)
    Hcp = H30[15:, :15]
    Hm = H30[15:, 15:] - Hcp @ jnp.linalg.solve(Hpp, Hcp.T)
    Hm = jnp.where(anchor_fixed, H30[15:, 15:], Hm)
    Hm = 0.5 * (Hm + Hm.T)

    return (cur_f, inlier.astype(bool), jnp.sum(inlier.astype(jnp.int32)),
            Hm)


def optimize_pose_inertial(anchor: BodyState, cur: BodyState, pre, calib,
                           points, uv, info, valid, camera,
                           prior: PoseImuPrior | None = None,
                           anchor_fixed: bool = True,
                           n_rounds: int = 4, n_iters: int = 8):
    """Public entry. `pre` is the anchor->current Preintegrated; `calib`
    the ImuCalib (camera<->body extrinsics). Returns
    (BodyState, inliers(N,), n_inliers, PoseImuPrior for the next frame).

    anchor_fixed=True is the LastKeyFrame variant (:4491); False with a
    prior is the LastFrame variant (:4875).
    """
    from orbslam3_tpu.opt.inertial import whiten_from_cov

    W = whiten_from_cov(jnp.asarray(pre.cov))
    Ww = whiten_from_cov(jnp.asarray(pre.cov_walk))
    Rbc = jnp.asarray(calib.Rbc)
    tbc = jnp.asarray(calib.tbc)
    Rcb = Rbc.T
    tcb = -Rcb @ tbc
    use_prior = prior is not None
    prior_H = (prior.H if use_prior
               else jnp.zeros((15, 15), jnp.float32))
    anchor_in = prior.state if use_prior else anchor
    cur_f, inliers, n_in, Hm = _optimize(
        anchor_in, cur,
        jnp.asarray(pre.dR), jnp.asarray(pre.dV), jnp.asarray(pre.dP),
        jnp.asarray(pre.JRg), jnp.asarray(pre.JVg), jnp.asarray(pre.JVa),
        jnp.asarray(pre.JPg), jnp.asarray(pre.JPa),
        jnp.asarray(pre.bias), jnp.asarray(pre.dT),
        W, Ww, prior_H,
        jnp.asarray(points), jnp.asarray(uv), jnp.asarray(info),
        jnp.asarray(valid), Rcb, tcb, camera,
        use_prior=use_prior, anchor_fixed=anchor_fixed,
        n_rounds=n_rounds, n_iters=n_iters)
    return cur_f, inliers, int(n_in), PoseImuPrior(cur_f, Hm)
