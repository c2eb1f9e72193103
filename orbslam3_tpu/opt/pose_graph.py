"""Essential-graph / pose-graph optimization over Sim(3) and SE(3).

TPU-native replacement for the reference's `Optimizer::OptimizeEssentialGraph`
(two overloads, `/root/reference/src/Optimizer.cc:1501,1785`) and
`OptimizeEssentialGraph4DoF` (`Optimizer.cc:5292`), the g2o Levenberg solve
over the spanning tree + high-covisibility + loop edges run after every loop
closure / map merge (`src/LoopClosing.cc:1182-1187,1721`).

Formulation (matches g2o's `EdgeSim3`): vertices are world->camera similarity
transforms S_iw; an edge (i, j) carries the measured relative transform
S_ji = S_jw * S_iw^-1 captured *before* correction; residual
r = log(S_ji * S_iw * S_jw^-1) in sim(3). Vertices are perturbed on the left
(S <- exp(xi) * S). Per-edge 7x7 Jacobians come from `jax.jacfwd` (vmapped
over all edges at once); the normal equations are assembled with scatter-adds
into a dense (7M, 7M) system and solved with one Cholesky — local/essential
graphs are <= a few hundred vertices, so the dense solve sits comfortably on
the MXU and beats a sparse host solver.

Degrees of freedom are controlled per-vertex with a (M, 7) dof mask:
  * full Sim3 (monocular loops): all 7
  * SE(3) / fixed-scale (stereo/RGBD/inertial merges): sigma frozen
  * 4DoF (inertial loops, `Edge4DoF` G2oTypes.h:817): translation + yaw only
Fixed vertices (the loop KF and its neighbours) get an all-zero mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie

# dof layout follows lie.sim3_exp: xi = (rho[3], phi[3], sigma)
DOF_SIM3 = jnp.ones(7)
DOF_SE3 = jnp.asarray([1, 1, 1, 1, 1, 1, 0], jnp.float32)
DOF_4DOF = jnp.asarray([1, 1, 1, 0, 0, 1, 0], jnp.float32)  # t + yaw(phi_z)


class PoseGraph(NamedTuple):
    s: jax.Array       # (M,)   scales of S_iw
    R: jax.Array       # (M,3,3)
    t: jax.Array       # (M,3)
    e_i: jax.Array     # (E,) int32 edge tail
    e_j: jax.Array     # (E,) int32 edge head
    m_s: jax.Array     # (E,)   measured S_ji scale
    m_R: jax.Array     # (E,3,3)
    m_t: jax.Array     # (E,3)
    w: jax.Array       # (E,) edge weight (0 disables; loop edges can be >1)
    dof: jax.Array     # (M,7) per-vertex dof mask (0 rows = fixed vertex)


def _edge_residual(si, Ri, ti, sj, Rj, tj, ms, mR, mt):
    """log(S_ji * S_iw * S_jw^-1) in sim(3), (7,)."""
    sji, Rji, tji = lie.sim3_compose(si, Ri, ti,
                                     *lie.sim3_inverse(sj, Rj, tj))
    es, eR, et = lie.sim3_compose(ms, mR, mt, sji, Rji, tji)
    return lie.sim3_log(es, eR, et)


def _edge_residual_perturbed(xi_i, xi_j, si, Ri, ti, sj, Rj, tj, ms, mR, mt):
    dsi, dRi, dti = lie.sim3_exp(xi_i)
    dsj, dRj, dtj = lie.sim3_exp(xi_j)
    si2, Ri2, ti2 = lie.sim3_compose(dsi, dRi, dti, si, Ri, ti)
    sj2, Rj2, tj2 = lie.sim3_compose(dsj, dRj, dtj, sj, Rj, tj)
    return _edge_residual(si2, Ri2, ti2, sj2, Rj2, tj2, ms, mR, mt)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(g: PoseGraph, n_iters: int = 20,
                        damping: float = 1e-6):
    """Gauss-Newton over the pose graph; returns corrected (s, R, t).

    The reference runs 20 LM iterations (`Optimizer.cc:1772`); GN with light
    diagonal damping converges identically on these well-conditioned graphs.
    """
    M = g.s.shape[0]

    def gn_iter(_, state):
        s, R, t = state
        si, Ri, ti = s[g.e_i], R[g.e_i], t[g.e_i]
        sj, Rj, tj = s[g.e_j], R[g.e_j], t[g.e_j]
        zero = jnp.zeros(7)

        def one(si_, Ri_, ti_, sj_, Rj_, tj_, ms, mR, mt):
            f = lambda xi, xj: _edge_residual_perturbed(
                xi, xj, si_, Ri_, ti_, sj_, Rj_, tj_, ms, mR, mt)
            r = f(zero, zero)
            Ji = jax.jacfwd(f, argnums=0)(zero, zero)
            Jj = jax.jacfwd(f, argnums=1)(zero, zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(one)(si, Ri, ti, sj, Rj, tj,
                                  g.m_s, g.m_R, g.m_t)
        wJi = Ji * g.w[:, None, None]
        wJj = Jj * g.w[:, None, None]
        H = jnp.zeros((M, 7, M, 7))
        H = H.at[g.e_i, :, g.e_i, :].add(jnp.einsum("eai,eaj->eij", wJi, Ji))
        H = H.at[g.e_i, :, g.e_j, :].add(jnp.einsum("eai,eaj->eij", wJi, Jj))
        H = H.at[g.e_j, :, g.e_i, :].add(jnp.einsum("eai,eaj->eij", wJj, Ji))
        H = H.at[g.e_j, :, g.e_j, :].add(jnp.einsum("eai,eaj->eij", wJj, Jj))
        b = jnp.zeros((M, 7))
        b = b.at[g.e_i].add(jnp.einsum("eai,ea->ei", wJi, r))
        b = b.at[g.e_j].add(jnp.einsum("eai,ea->ei", wJj, r))

        # apply dof mask: zero rows/cols of frozen dofs, unit diagonal
        m = g.dof.reshape(M * 7)
        Hf = H.reshape(M * 7, M * 7) * m[:, None] * m[None, :]
        Hf = Hf + jnp.diag(jnp.where(m > 0, damping, 1.0)
                           + damping * jnp.abs(jnp.diag(Hf)))
        bf = b.reshape(M * 7) * m
        dx = -jnp.linalg.solve(Hf, bf).reshape(M, 7) * g.dof

        ds, dR, dt = jax.vmap(lie.sim3_exp)(dx)
        s2, R2, t2 = jax.vmap(lie.sim3_compose)(ds, dR, dt, s, R, t)
        return s2, jax.vmap(lie.so3_normalize)(R2), t2

    s, R, t = jax.lax.fori_loop(0, n_iters, gn_iter, (g.s, g.R, g.t))
    return s, R, t


def correct_points(points, old_s, old_R, old_t, new_s, new_R, new_t):
    """Re-express landmarks after their reference KF's Siw was corrected:
    p' = S_new^-1(S_old(p)) (the reference's loop-point correction,
    `LoopClosing.cc:CorrectLoop` eigP3Dw -> cvCorrectedP3Dw)."""
    p_cam = lie.sim3_apply(old_s, old_R, old_t, points)
    return lie.sim3_apply(*lie.sim3_inverse(new_s, new_R, new_t), p_cam)
