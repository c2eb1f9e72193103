"""Inertial estimation: inertial-only MAP init and visual-inertial BA.

TPU-native replacement for the reference's inertial optimization suite
(`/root/reference/src/Optimizer.cc`): `InertialOptimization` x3 (3042/3227/3389
— scale+gravity+bias+velocity MAP with poses fixed), `FullInertialBA` (392)
and `LocalInertialBA` (2383); factor types from `src/G2oTypes.cc`
(`EdgeInertial` 495, `EdgeInertialGS` 548, `EdgeGyroRW`/`EdgeAccRW` 635-671,
`EdgePriorAcc/Gyro` 768-792).

Design: factors are pure residual functions over stacked state vectors;
Jacobians come from `jax.jacfwd` (the reference hand-derives them — autodiff
on the same closed forms gives identical values with one source of truth).
The inertial-only problem is a small dense GN (9 + 3M variables); the
visual-inertial BA keeps the landmark Schur trick of `opt/ba.py` with 15-dim
keyframe blocks [pose(6), velocity(3), bias(6)].

State conventions: body poses (Rwb, twb) world<-body; gravity in world is
g = Rwg @ (0,0,-G); monocular scale multiplies translations/landmarks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie, robust
from orbslam3_tpu.imu.preintegration import (
    GRAVITY, Preintegrated, delta_position, delta_rotation, delta_velocity)

G_I = jnp.asarray([0.0, 0.0, -GRAVITY], jnp.float32)


class InertialEdges(NamedTuple):
    """Preintegrated constraints between consecutive keyframes i -> j,
    stacked over E edges (the temporal chain `KeyFrame::mPrevKF`)."""

    i: jax.Array      # (E,) int32 index of earlier KF
    j: jax.Array      # (E,) int32
    dT: jax.Array     # (E,)
    dR: jax.Array     # (E,3,3)
    dV: jax.Array     # (E,3)
    dP: jax.Array     # (E,3)
    JRg: jax.Array    # (E,3,3)
    JVg: jax.Array    # (E,3,3)
    JVa: jax.Array    # (E,3,3)
    JPg: jax.Array    # (E,3,3)
    JPa: jax.Array    # (E,3,3)
    W: jax.Array      # (E,9,9) whitening: cov^{-1/2} (upper-triangular)
    Ww: jax.Array     # (E,6,6) bias random-walk whitening
    bias0: jax.Array  # (E,6) linearization bias of the preintegration
    valid: jax.Array  # (E,) bool


def whiten_from_cov(cov: jax.Array, eps: float = 1e-12) -> jax.Array:
    """W with W^T W = cov^{-1} via Cholesky of the (regularized) covariance."""
    d = cov.shape[-1]
    cov = cov + eps * jnp.eye(d, dtype=cov.dtype)
    L = jnp.linalg.cholesky(cov)
    eye = jnp.broadcast_to(jnp.eye(d, dtype=cov.dtype), cov.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv  # r_white = Linv @ r  =>  ||r_white||^2 = r^T cov^-1 r


def build_edges(pres: list[Preintegrated], pairs: list[tuple[int, int]],
                max_cov_scale: float = 1.0) -> InertialEdges:
    """Stack host-side preintegrations into a padded edge set."""
    import numpy as np

    E = len(pres)
    f = lambda g: jnp.stack([jnp.asarray(g(p)) for p in pres])
    W = jnp.stack([
        whiten_from_cov(jnp.asarray(p.cov) * max_cov_scale) for p in pres])
    Ww = jnp.stack([
        whiten_from_cov(jnp.asarray(p.cov_walk)) for p in pres])
    return InertialEdges(
        i=jnp.asarray(np.asarray([a for a, _ in pairs], np.int32)),
        j=jnp.asarray(np.asarray([b for _, b in pairs], np.int32)),
        dT=f(lambda p: p.dT), dR=f(lambda p: p.dR), dV=f(lambda p: p.dV),
        dP=f(lambda p: p.dP), JRg=f(lambda p: p.JRg), JVg=f(lambda p: p.JVg),
        JVa=f(lambda p: p.JVa), JPg=f(lambda p: p.JPg), JPa=f(lambda p: p.JPa),
        W=W, Ww=Ww, bias0=f(lambda p: p.bias),
        valid=jnp.ones(E, bool),
    )


def _corrected_deltas(e: InertialEdges, bias: jax.Array):
    """First-order bias-corrected deltas for every edge; bias (E,6) or (6,)."""
    if bias.ndim == 1:
        bias = jnp.broadcast_to(bias, e.bias0.shape)
    dbg = bias[:, :3] - e.bias0[:, :3]
    dba = bias[:, 3:] - e.bias0[:, 3:]
    dR = e.dR @ jax.vmap(lie.so3_exp)(jnp.einsum("eab,eb->ea", e.JRg, dbg))
    dV = e.dV + jnp.einsum("eab,eb->ea", e.JVg, dbg) + jnp.einsum(
        "eab,eb->ea", e.JVa, dba)
    dP = e.dP + jnp.einsum("eab,eb->ea", e.JPg, dbg) + jnp.einsum(
        "eab,eb->ea", e.JPa, dba)
    return dR, dV, dP


def inertial_residuals(e: InertialEdges, Rwb, p, v, bias, Rwg, scale):
    """Whitened 9-dim residuals per edge (reference `EdgeInertialGS`,
    G2oTypes.cc:548 — with scale and gravity-direction vertices):

      er = Log(dR(b)^T Rwb_i^T Rwb_j)
      ev = Rwb_i^T (s (v_j - v_i) - g dT) - dV(b)
      ep = Rwb_i^T (s (p_j - p_i - v_i dT) - 0.5 g dT^2) - dP(b)
    """
    g = Rwg @ G_I
    Ri, Rj = Rwb[e.i], Rwb[e.j]
    pi, pj = p[e.i], p[e.j]
    vi, vj = v[e.i], v[e.j]
    dT = e.dT[:, None]
    dR, dV, dP = _corrected_deltas(e, bias)

    er = jax.vmap(lie.so3_log)(
        jnp.swapaxes(dR, -1, -2) @ jnp.swapaxes(Ri, -1, -2) @ Rj)
    ev = jnp.einsum("eba,eb->ea", Ri, scale * (vj - vi) - g[None] * dT) - dV
    ep = jnp.einsum(
        "eba,eb->ea", Ri,
        scale * (pj - pi - vi * dT) - 0.5 * g[None] * dT * dT) - dP
    r = jnp.concatenate([er, ev, ep], axis=-1)  # (E,9)
    return jnp.einsum("eab,eb->ea", e.W, r)


class InertialInit(NamedTuple):
    Rwg: jax.Array     # (3,3) gravity-direction rotation
    scale: jax.Array   # () monocular scale
    bias: jax.Array    # (6,) shared gyro+acc bias
    v: jax.Array       # (M,3) per-KF world velocities (in the SCALED frame)
    cost: jax.Array    # final whitened cost


@partial(jax.jit, static_argnames=("n_iters", "fix_scale", "fix_vel"))
def inertial_only_optimize(
    Rwb: jax.Array,   # (M,3,3) body rotations from vision (fixed)
    p: jax.Array,     # (M,3) body positions from vision (fixed, pre-scale)
    edges: InertialEdges,
    prior_gyro: float | jax.Array = 1e2,
    prior_acc: float | jax.Array = 1e10,
    v0: jax.Array | None = None,
    n_iters: int = 20,
    fix_scale: bool = False,
    fix_vel: bool = False,
) -> InertialInit:
    """Inertial-only MAP (reference `InertialOptimization`,
    Optimizer.cc:3042-3225): poses fixed, solve {Rwg(2), log s(1), bias(6),
    v(3M)} by damped GN on the whitened residuals with bias priors.

    Gravity seed (`LocalMapping::InitializeIMU`, LocalMapping.cc:1232-1256):
    dirG = sum_i Rwb_i dV_i points along -g.
    """
    M = Rwb.shape[0]
    dtype = p.dtype

    dirG = jnp.sum(
        jnp.einsum("eab,eb->ea", Rwb[edges.i], edges.dV)
        * edges.valid[:, None], axis=0)
    dirG = -dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.asarray([0.0, 0.0, -1.0], dtype)
    vaxis = jnp.cross(gI, dirG)
    cosg = jnp.clip(jnp.dot(gI, dirG), -1.0, 1.0)
    ang = jnp.arccos(cosg)
    nv = jnp.linalg.norm(vaxis)
    axis = vaxis / jnp.maximum(nv, 1e-9)
    Rwg0 = lie.so3_exp(axis * ang)
    Rwg0 = jnp.where(nv < 1e-6, jnp.eye(3, dtype=dtype), Rwg0)

    # velocity seed: position finite differences over the chain
    if v0 is None:
        dp = p[edges.j] - p[edges.i]
        v_seed = jnp.zeros((M, 3), dtype)
        v_seed = v_seed.at[edges.i].set(dp / jnp.maximum(edges.dT[:, None], 1e-6))
        v_seed = v_seed.at[edges.j].set(dp / jnp.maximum(edges.dT[:, None], 1e-6))
    else:
        v_seed = v0

    n_var = 2 + 1 + 6 + 3 * M  # theta_g(2), log_s, bias, velocities

    def unpack(x):
        th = jnp.concatenate([x[:2], jnp.zeros(1, dtype)])
        Rwg = Rwg0 @ lie.so3_exp(th)
        s = jnp.exp(x[2]) if not fix_scale else jnp.asarray(1.0, dtype)
        bias = x[3:9]
        v = x[9:].reshape(M, 3)
        return Rwg, s, bias, v

    sqrt_pg = jnp.sqrt(jnp.asarray(prior_gyro, dtype))
    sqrt_pa = jnp.sqrt(jnp.asarray(prior_acc, dtype))

    def residual_vec(x):
        Rwg, s, bias, v = unpack(x)
        r = inertial_residuals(edges, Rwb, p, v, bias, Rwg, s)
        r = r * edges.valid[:, None]
        # bias priors (EdgePriorGyro/EdgePriorAcc)
        r_prior = jnp.concatenate([sqrt_pg * bias[:3], sqrt_pa * bias[3:]])
        return jnp.concatenate([r.reshape(-1), r_prior])

    x0 = jnp.zeros(n_var, dtype).at[9:].set(v_seed.reshape(-1))

    def gn_step(carry, _):
        x, lam = carry
        r = residual_vec(x)
        J = jax.jacfwd(residual_vec)(x)
        H = J.T @ J
        b = J.T @ r
        H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
        dx = -jnp.linalg.solve(H, b)
        if fix_vel:
            # scale-refinement mode (reference InertialOptimization(Map*,
            # Rwg, scale) at Optimizer.cc:3389): only scale + gravity move;
            # free velocities would absorb the very scale error being
            # estimated
            dx = dx.at[9:].set(0.0).at[3:9].set(0.0)
        x_new = x + dx
        better = jnp.sum(residual_vec(x_new) ** 2) < jnp.sum(r ** 2)
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return (x, jnp.clip(lam, 1e-9, 1e3)), None

    (x, _), _ = jax.lax.scan(
        gn_step, (x0, jnp.asarray(1e-4, dtype)), None, length=n_iters)
    Rwg, s, bias, v = unpack(x)
    cost = jnp.sum(residual_vec(x) ** 2)
    return InertialInit(Rwg=Rwg, scale=s, bias=bias, v=v, cost=cost)


# ---------------------------------------------------------------------------
# Visual-inertial bundle adjustment (FullInertialBA / LocalInertialBA)
# ---------------------------------------------------------------------------


class VIBAProblem(NamedTuple):
    """Visual-inertial BA over 15-dim KF blocks [pose(6), vel(3), bias(6)].

    Body poses (Rwb, twb); reprojection goes through the camera extrinsics
    (Rcb, tcb): Tcw = Tcb * Twb^{-1}.
    """

    Rwb: jax.Array      # (M,3,3)
    twb: jax.Array      # (M,3)
    vel: jax.Array      # (M,3)
    bias: jax.Array     # (M,6)
    points: jax.Array   # (P,3)
    # visual observations (COO)
    kf_idx: jax.Array   # (O,)
    lm_idx: jax.Array   # (O,)
    uv: jax.Array       # (O,2)
    info: jax.Array     # (O,)
    valid: jax.Array    # (O,)
    fixed_kf: jax.Array  # (M,) bool
    fixed_lm: jax.Array  # (P,) bool


def body_to_cam(Rwb, twb, Rcb, tcb):
    """Tcw from body pose: Rcw = Rcb Rwb^T, tcw = -Rcb Rwb^T twb + tcb."""
    Rbw = jnp.swapaxes(Rwb, -1, -2)
    Rcw = Rcb @ Rbw
    tcw = -jnp.einsum("...ij,...j->...i", Rcw, twb) + tcb
    return Rcw, tcw


def _vi_reproj(prob: VIBAProblem, camera, Rcb, tcb):
    """Reprojection residuals + Jacobians wrt [dphi, dp] of the BODY pose
    (right perturbation: Rwb <- Rwb Exp(dphi), twb <- twb + Rwb dp — the
    reference's ImuCamPose update, G2oTypes.cc:VertexPose::oplusImpl)."""
    Rwb = prob.Rwb[prob.kf_idx]
    twb = prob.twb[prob.kf_idx]
    Xw = prob.points[prob.lm_idx]

    Rcw, tcw = body_to_cam(Rwb, twb, Rcb, tcb)
    xc = jnp.einsum("oij,oj->oi", Rcw, Xw) + tcw
    pred = camera.project(xc)
    res = pred - prob.uv
    Jproj = camera.project_jac(xc)          # (O,2,3)
    # xb = body coords of the point: xc = Rcb (xb - 0) + tcb with xb = Rwb^T(Xw - twb)
    xb = jnp.einsum("oji,oj->oi", Rwb, Xw - twb)
    # d xc / d dphi = Rcb * (hat(xb))      (right perturbation on Rwb)
    # d xc / d dp   = -Rcb
    Jphi = jnp.einsum("ab,obc->oac", Rcb, jax.vmap(lie.hat)(xb))
    Jp = jnp.broadcast_to(-Rcb, (res.shape[0], 3, 3))
    Jpose = jnp.concatenate([Jproj @ Jphi, Jproj @ Jp], axis=-1)  # (O,2,6)
    Jl = Jproj @ Rcw
    chi2 = jnp.sum(res * res, -1) * prob.info
    return res, Jpose, Jl, chi2, xc


def _vi_inertial_system(prob: VIBAProblem, edges: InertialEdges):
    """Assemble inertial + bias-walk contributions into the (M,15) state.

    Returns H (15M,15M) and b (15M,) from whitened residuals, via per-edge
    jacfwd over the 30-dim [state_i, state_j] stack.
    """
    M = prob.Rwb.shape[0]
    dtype = prob.twb.dtype

    def edge_res(xi, xj, ei):
        """xi/xj: 15-dim perturbations of KF i/j; ei: edge index (traced)."""
        def state(x, k):
            dphi, dp, dv, db = x[:3], x[3:6], x[6:9], x[9:15]
            R = prob.Rwb[k] @ lie.so3_exp(dphi)
            p = prob.twb[k] + prob.Rwb[k] @ dp
            v = prob.vel[k] + dv
            b = prob.bias[k] + db
            return R, p, v, b

        Ri, pi, vi, bi = state(xi, edges.i[ei])
        Rj, pj, vj, bj = state(xj, edges.j[ei])
        e1 = jax.tree_util.tree_map(lambda a: a[ei], edges)
        dbg = bi[:3] - e1.bias0[:3]
        dba = bi[3:] - e1.bias0[3:]
        dR = e1.dR @ lie.so3_exp(e1.JRg @ dbg)
        dV = e1.dV + e1.JVg @ dbg + e1.JVa @ dba
        dP = e1.dP + e1.JPg @ dbg + e1.JPa @ dba
        g = G_I.astype(dtype)
        dT = e1.dT
        er = lie.so3_log(dR.T @ Ri.T @ Rj)
        ev = Ri.T @ (vj - vi - g * dT) - dV
        ep = Ri.T @ (pj - pi - vi * dT - 0.5 * g * dT * dT) - dP
        r9 = e1.W @ jnp.concatenate([er, ev, ep])
        rw = e1.Ww @ (bj - bi)  # bias random walk (EdgeGyroRW/EdgeAccRW)
        return jnp.concatenate([r9, rw])

    E = edges.i.shape[0]
    z15 = jnp.zeros(15, dtype)

    def per_edge(ei):
        r = edge_res(z15, z15, ei)
        Ji = jax.jacfwd(lambda x: edge_res(x, z15, ei))(z15)
        Jj = jax.jacfwd(lambda x: edge_res(z15, x, ei))(z15)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(per_edge)(jnp.arange(E))
    w = edges.valid.astype(dtype)
    r = r * w[:, None]
    Ji = Ji * w[:, None, None]
    Jj = Jj * w[:, None, None]

    H = jnp.zeros((M, M, 15, 15), dtype)
    b = jnp.zeros((M, 15), dtype)
    H = H.at[edges.i, edges.i].add(jnp.einsum("era,erb->eab", Ji, Ji))
    H = H.at[edges.j, edges.j].add(jnp.einsum("era,erb->eab", Jj, Jj))
    H = H.at[edges.i, edges.j].add(jnp.einsum("era,erb->eab", Ji, Jj))
    H = H.at[edges.j, edges.i].add(jnp.einsum("era,erb->eab", Jj, Ji))
    b = b.at[edges.i].add(jnp.einsum("era,er->ea", Ji, r))
    b = b.at[edges.j].add(jnp.einsum("era,er->ea", Jj, r))
    Hd = H.transpose(0, 2, 1, 3).reshape(M * 15, M * 15)
    return Hd, b.reshape(-1)


def vi_ba_iteration(prob: VIBAProblem, edges: InertialEdges, camera,
                    Rcb, tcb, lam, prior_g=0.0, prior_a=0.0):
    """One damped GN iteration of visual-inertial BA with landmark Schur.

    `prior_g`/`prior_a`: zero-mean bias prior weights (the reference's
    EdgePriorGyro/EdgePriorAcc on the shared bias during initialization-
    stage FullInertialBA, Optimizer.cc:569-589). With per-KF biases tied by
    the random-walk edges, a per-KF prior is the equivalent formulation.
    Without these, the early VI-BA lets acc bias absorb residual gravity
    misalignment and velocity/scale run away (measured on the VI golden)."""
    M = prob.Rwb.shape[0]
    P = prob.points.shape[0]
    dtype = prob.points.dtype
    D = 15

    res, Jpose, Jl, chi2, xc = _vi_reproj(prob, camera, Rcb, tcb)
    w = robust.huber_weight(chi2, robust.CHI2_MONO ** 0.5) * prob.info
    w = jnp.where(prob.valid & (xc[:, 2] > 0), w, 0.0)
    JpW = Jpose * w[:, None, None]
    JlW = Jl * w[:, None, None]

    # visual pose blocks land in the first 6 of the 15-dim state
    Hpp_v = jnp.zeros((M, 6, 6), dtype).at[prob.kf_idx].add(
        jnp.einsum("oia,oib->oab", JpW, Jpose))
    b_v = jnp.zeros((M, 6), dtype).at[prob.kf_idx].add(
        jnp.einsum("oia,oi->oa", JpW, res))

    H_in, b_in = _vi_inertial_system(prob, edges)

    H = H_in
    # zero-mean bias priors: quadratic 0.5*pg|bg|^2 + 0.5*pa|ba|^2 per KF
    pg = jnp.asarray(prior_g, dtype)
    pa = jnp.asarray(prior_a, dtype)
    prior_diag = jnp.concatenate([jnp.zeros(9, dtype),
                                  pg * jnp.ones(3, dtype),
                                  pa * jnp.ones(3, dtype)])
    H = H + jnp.diag(jnp.tile(prior_diag, M))
    b_prior = jnp.concatenate(
        [jnp.zeros((M, 9), dtype),
         pg * prob.bias[:, :3], pa * prob.bias[:, 3:]], axis=1)
    b_in = b_in + b_prior.reshape(-1)
    pad = jnp.zeros((M, D, D), dtype).at[:, :6, :6].set(Hpp_v)
    idx = jnp.arange(M)
    rows = (idx[:, None, None] * D + jnp.arange(D)[None, :, None])
    cols = (idx[:, None, None] * D + jnp.arange(D)[None, None, :])
    H = H.at[jnp.broadcast_to(rows, (M, D, D)).reshape(-1),
             jnp.broadcast_to(cols, (M, D, D)).reshape(-1)].add(pad.reshape(-1))
    b = b_in + jnp.zeros((M, D), dtype).at[:, :6].set(b_v).reshape(-1)

    # landmark elimination (same as opt/ba.py, but W couples only pose cols)
    eye3 = jnp.eye(3, dtype=dtype)
    Hll = jnp.zeros((P, 3, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oia,oib->oab", JlW, Jl))
    b_l = jnp.zeros((P, 3), dtype).at[prob.lm_idx].add(
        jnp.einsum("oia,oi->oa", JlW, res))
    Hll_d = Hll + lam * jax.vmap(
        lambda h: jnp.diag(jnp.maximum(jnp.diag(h), 1e-6)))(Hll)
    lm_obs = jnp.zeros((P,), dtype).at[prob.lm_idx].add(w)
    empty_lm = (lm_obs <= 1e-9) | prob.fixed_lm
    Hll_d = jnp.where(empty_lm[:, None, None],
                      jnp.broadcast_to(eye3, Hll_d.shape), Hll_d)
    b_l = jnp.where(empty_lm[:, None], 0.0, b_l)
    from orbslam3_tpu.opt.ba import _chol_inv_sqrt3
    T = _chol_inv_sqrt3(Hll_d)

    W_o = jnp.einsum("oia,oib->oab", JpW, Jl)  # (O,6,3)
    U_o = W_o @ T[prob.lm_idx]
    O = prob.uv.shape[0]
    Z = jnp.zeros((M * D, P * 3), dtype)
    row = prob.kf_idx[:, None, None] * D + jnp.arange(6)[None, :, None]
    col = prob.lm_idx[:, None, None] * 3 + jnp.arange(3)[None, None, :]
    Z = Z.at[jnp.broadcast_to(row, (O, 6, 3)).reshape(-1),
             jnp.broadcast_to(col, (O, 6, 3)).reshape(-1)].add(U_o.reshape(-1))

    # damping on the pose system
    Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
    S = Hd - Z @ Z.T
    y = jnp.einsum("pab,pb->pa", jnp.swapaxes(T, -1, -2), b_l)
    b_schur = b - Z @ y.reshape(-1)

    fixedD = jnp.repeat(prob.fixed_kf, D)
    S = jnp.where(fixedD[:, None] | fixedD[None, :],
                  jnp.eye(M * D, dtype=dtype), S)
    b_schur = jnp.where(fixedD, 0.0, b_schur)

    dx = -jnp.linalg.solve(S, b_schur).reshape(M, D)
    dx = jnp.where(prob.fixed_kf[:, None], 0.0, dx)

    Wt_dx = jnp.einsum("oab,oa->ob", W_o, dx[prob.kf_idx, :6])
    rhs = b_l + jnp.zeros((P, 3), dtype).at[prob.lm_idx].add(Wt_dx)
    Hll_inv = T @ jnp.swapaxes(T, -1, -2)
    dl = -jnp.einsum("pab,pb->pa", Hll_inv, rhs)
    dl = jnp.where(empty_lm[:, None], 0.0, dl)

    dphi, dp, dv, db = dx[:, :3], dx[:, 3:6], dx[:, 6:9], dx[:, 9:15]
    Rwb = lie.so3_normalize(prob.Rwb @ jax.vmap(lie.so3_exp)(dphi))
    twb = prob.twb + jnp.einsum("mij,mj->mi", prob.Rwb, dp)
    out = prob._replace(
        Rwb=Rwb, twb=twb, vel=prob.vel + dv, bias=prob.bias + db,
        points=prob.points + dl)
    cost_vis = jnp.sum(robust.huber_rho(chi2, robust.CHI2_MONO ** 0.5) * (w > 0))
    return out, cost_vis


def _vi_total_cost(prob: VIBAProblem, edges: InertialEdges, camera,
                   Rcb, tcb, prior_g=0.0, prior_a=0.0):
    """Visual Huber cost + whitened inertial/bias-walk squared residuals,
    with a NaN guard (non-finite -> +inf so a diverged step never wins)."""
    res, _, _, chi2, xc = _vi_reproj(prob, camera, Rcb, tcb)
    w = robust.huber_weight(chi2, robust.CHI2_MONO ** 0.5) * prob.info
    w = jnp.where(prob.valid & (xc[:, 2] > 0), w, 0.0)
    c_vis = jnp.sum(robust.huber_rho(chi2, robust.CHI2_MONO ** 0.5)
                    * (w > 0))
    r_in = inertial_residuals(
        edges, prob.Rwb, prob.twb, prob.vel, prob.bias[edges.i],
        jnp.eye(3, dtype=prob.twb.dtype),
        jnp.asarray(1.0, prob.twb.dtype))
    rw = jnp.einsum("eab,eb->ea", edges.Ww,
                    prob.bias[edges.j] - prob.bias[edges.i])
    c_in = jnp.sum((r_in ** 2 + 0.0) * edges.valid[:, None]) + jnp.sum(
        (rw ** 2) * edges.valid[:, None])
    c_prior = (jnp.asarray(prior_g, prob.twb.dtype)
               * jnp.sum(prob.bias[:, :3] ** 2)
               + jnp.asarray(prior_a, prob.twb.dtype)
               * jnp.sum(prob.bias[:, 3:] ** 2))
    total = c_vis + c_in + c_prior
    bad = ~jnp.isfinite(total)
    return jnp.where(bad, jnp.inf, total)


@partial(jax.jit, static_argnames=("n_iters",))
def visual_inertial_ba(prob: VIBAProblem, edges: InertialEdges, camera,
                       Rcb, tcb, n_iters: int = 10, lambda0: float = 1e-4,
                       prior_gyro: float = 0.0, prior_acc: float = 0.0):
    """Fixed-iteration VI bundle adjustment (reference `FullInertialBA`,
    Optimizer.cc:392-813 / `LocalInertialBA` 2383 — window selection is the
    caller's job; here every non-fixed KF optimizes).

    LM accept/reject on the joint (visual + inertial) cost: a diverged step
    (or one that yields NaN, which would otherwise silently poison every
    pose in the map) is rolled back and the damping raised."""

    def body(carry, _):
        prob, lam, cost_prev = carry
        out, _ = vi_ba_iteration(prob, edges, camera, Rcb, tcb, lam,
                                 prior_g=prior_gyro, prior_a=prior_acc)
        cost_new = _vi_total_cost(out, edges, camera, Rcb, tcb,
                                  prior_g=prior_gyro, prior_a=prior_acc)
        accept = cost_new < cost_prev
        prob_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), a, b)
            if a.dtype in (jnp.float32, jnp.float64) else b,
            out, prob)
        lam_next = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                            1e-7, 1e2)
        return (prob_next, lam_next,
                jnp.where(accept, cost_new, cost_prev)), cost_new

    cost0 = _vi_total_cost(prob, edges, camera, Rcb, tcb,
                           prior_g=prior_gyro, prior_a=prior_acc)
    (prob, _, _), costs = jax.lax.scan(
        body, (prob, jnp.asarray(lambda0, prob.points.dtype), cost0), None,
        length=n_iters)
    return prob, costs
