"""Monocular two-view initialization: batched H/F RANSAC + motion recovery.

TPU-native replacement for `TwoViewReconstruction`
(`/root/reference/src/TwoViewReconstruction.cc`): the reference launches two
CPU threads computing H and F over 200 RANSAC iterations each, then picks a
model by score ratio and decomposes it (`Reconstruct` at
TwoViewReconstruction.h:42-60).

Re-design: RANSAC becomes *batched hypothesize-and-verify* — all 200 minimal
samples are solved as one vmapped batch of tiny SVDs and scored against all
matches in one (hypotheses x matches) broadcast; model selection, E/H
decomposition (4 + 8 motion candidates), cheirality counting and parallax
checks are all fixed-shape device code. No loops over hypotheses, no early
exit — exactly the fixed-iteration structure the reference already uses, but
data-parallel.

All geometry runs in *normalized camera coordinates* (pixels pre-mapped
through cam.unproject) so one code path serves pinhole and fisheye — the
reference reaches this via GeometricCamera virtual dispatch
(Pinhole::ReconstructWithTwoViews / KannalaBrandt8::TriangulateMatches).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie
from orbslam3_tpu.vision.triangulate import triangulate_points, projection_matrix

# chi2 thresholds at sigma=1 in normalized coords scaled by focal — we score
# in normalized coords with sigma = 1px / focal (caller passes sigma2).
CHI2_F = 3.841
CHI2_H = 5.991
SCORE_GAMMA = 5.991  # reference's thScore


class TwoViewResult(NamedTuple):
    success: jax.Array  # bool scalar
    R: jax.Array  # (3,3) cam2<-cam1
    t: jax.Array  # (3,) unit-norm translation
    points: jax.Array  # (N,3) triangulated points in cam1 frame
    inliers: jax.Array  # (N,) bool triangulated-good mask
    used_homography: jax.Array  # bool scalar


def _normalize(pts: jax.Array, mask: jax.Array):
    """Hartley normalization (reference `Normalize`): zero-mean, unit mean
    absolute deviation, masked."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / n
    d = (pts - mean) * w[:, None]
    md = jnp.sum(jnp.abs(d), axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        pts.dtype,
    )
    return (pts - mean) * s, T


def _dlt_F(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """8-point fundamental matrix from (8,2)+(8,2) normalized points."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # (8,9)
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    # rank-2 projection
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _dlt_H(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """4-point homography from (4,2)+(4,2) normalized points."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (8,9)
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def _dlt_F_weighted(p1: jax.Array, p2: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point F over ALL points (inlier re-fit after RANSAC).

    Improves on the reference (which keeps the raw minimal-sample model,
    TwoViewReconstruction.cc FindFundamental): the best hypothesis's inliers
    re-fit one least-squares F, roughly halving the motion error.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    ) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _dlt_H_weighted(p1: jax.Array, p2: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT homography over ALL points (inlier re-fit)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[8].reshape(3, 3)


def _score_F(F: jax.Array, p1: jax.Array, p2: jax.Array, mask, sigma2):
    """Symmetric epipolar transfer score (reference `CheckFundamental`)."""
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = h1 @ F.T  # epipolar line in image 2
    l1 = h2 @ F
    d2 = jnp.square(jnp.sum(h2 * l2, axis=-1)) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = jnp.square(jnp.sum(h1 * l1, axis=-1)) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    chi1 = d1 / sigma2
    chi2 = d2 / sigma2
    ok = (chi1 < CHI2_F) & (chi2 < CHI2_F) & mask
    score = jnp.sum(
        jnp.where(chi1 < CHI2_F, SCORE_GAMMA - chi1, 0.0) * mask
        + jnp.where(chi2 < CHI2_F, SCORE_GAMMA - chi2, 0.0) * mask
    )
    return score, ok


def _score_H(H: jax.Array, p1: jax.Array, p2: jax.Array, mask, sigma2):
    """Symmetric reprojection score (reference `CheckHomography`)."""
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    q2 = h1 @ H.T
    q1 = h2 @ Hinv.T
    q2 = q2[:, :2] / jnp.where(jnp.abs(q2[:, 2:]) < 1e-12, 1e-12, q2[:, 2:])
    q1 = q1[:, :2] / jnp.where(jnp.abs(q1[:, 2:]) < 1e-12, 1e-12, q1[:, 2:])
    chi1 = jnp.sum(jnp.square(p1 - q1), axis=-1) / sigma2
    chi2 = jnp.sum(jnp.square(p2 - q2), axis=-1) / sigma2
    ok = (chi1 < CHI2_H) & (chi2 < CHI2_H) & mask
    score = jnp.sum(
        jnp.where(chi1 < CHI2_H, CHI2_H - chi1, 0.0) * mask
        + jnp.where(chi2 < CHI2_H, CHI2_H - chi2, 0.0) * mask
    )
    return score, ok


def _check_rt(R, t, p1, p2, mask, sigma2, min_parallax_cos=0.99998):
    """Triangulate all matches under (R,t) and count the good ones
    (reference `CheckRT`): positive depth in both views, finite, low
    reprojection error, sufficient parallax.
    Returns (n_good, parallax_ok, points, good_mask).
    """
    P1 = projection_matrix(jnp.eye(3, dtype=R.dtype), jnp.zeros(3, R.dtype))
    P2 = projection_matrix(R, t)
    X, _ = triangulate_points(P1, P2, p1, p2)
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    Xs = jnp.where(finite[:, None], X, 0.0)

    z1 = Xs[:, 2]
    Xc2 = Xs @ R.T + t
    z2 = Xc2[:, 2]
    # parallax between the two rays
    r1 = Xs
    r2 = Xs - (-R.T @ t)
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    # reprojection errors in normalized coords
    pr1 = Xs[:, :2] / jnp.where(jnp.abs(z1[:, None]) < 1e-12, 1e-12, z1[:, None])
    pr2 = Xc2[:, :2] / jnp.where(jnp.abs(z2[:, None]) < 1e-12, 1e-12, z2[:, None])
    e1 = jnp.sum(jnp.square(pr1 - p1), axis=-1) / sigma2
    e2 = jnp.sum(jnp.square(pr2 - p2), axis=-1) / sigma2
    good = (
        mask & finite & (z1 > 0) & (z2 > 0)
        & (cosp < min_parallax_cos)
        & (e1 < 4.0 * CHI2_H) & (e2 < 4.0 * CHI2_H)
    )
    n_good = jnp.sum(good)
    # parallax of the 50th-best (reference takes 50th-smallest cos) — use
    # median of good cosines as the robust stand-in
    cos_good = jnp.where(good, cosp, 1.0)
    k = jnp.minimum(50, jnp.maximum(n_good, 1)) - 1
    sorted_cos = jnp.sort(cos_good)
    parallax_cos = sorted_cos[k]
    return n_good, parallax_cos, Xs, good


def _decompose_E(E: jax.Array):
    """E -> 4 motion hypotheses (R, t) (reference `DecomposeE`)."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(H: jax.Array):
    """H -> 8 motion hypotheses (Faugeras SVD method, reference
    `ReconstructH` TwoViewReconstruction.cc:~560-700)."""
    u, s, vt = jnp.linalg.svd(H)
    d1, d2, d3 = s[0], s[1], s[2]
    V = vt.T
    detUV = jnp.linalg.det(u) * jnp.linalg.det(V)

    # normalized H' = H/d2 case: x1/x3 terms
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    stheta = jnp.stack([sin_t, -sin_t, -sin_t, sin_t])

    def make_pos(i):
        Rp = jnp.array(
            [
                [cos_t, 0.0, -stheta[i]],
                [0.0, 1.0, 0.0],
                [stheta[i], 0.0, cos_t],
            ]
        )
        tp = (d1 - d3) * jnp.stack([x1s[i], 0.0, -x3s[i]])
        R = detUV * (u @ Rp @ vt)
        t = u @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # case d' < 0
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphi = jnp.stack([sin_p, -sin_p, -sin_p, sin_p])

    def make_neg(i):
        Rp = jnp.array(
            [
                [cos_p, 0.0, sphi[i]],
                [0.0, -1.0, 0.0],
                [sphi[i], 0.0, -cos_p],
            ]
        )
        tp = (d1 + d3) * jnp.stack([x1s[i], 0.0, x3s[i]])
        R = detUV * (u @ Rp @ vt)
        t = u @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(i)
        Rs.append(R); ts.append(t)
    for i in range(4):
        R, t = make_neg(i)
        Rs.append(R); ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


@partial(jax.jit, static_argnames=("n_iters",))
def reconstruct_two_views(
    key: jax.Array,
    p1: jax.Array,  # (N,2) normalized (z=1) coords in frame 1
    p2: jax.Array,  # (N,2) matched normalized coords in frame 2
    mask: jax.Array,  # (N,) bool valid-match mask
    sigma2: jax.Array,  # scalar: (1px/f)^2 measurement variance
    n_iters: int = 200,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Full two-view init (reference `TwoViewReconstruction::Reconstruct`)."""
    n = p1.shape[0]
    dtype = p1.dtype

    # Hartley-normalize for DLT conditioning
    p1n, T1 = _normalize(p1, mask)
    p2n, T2 = _normalize(p2, mask)

    # ---- batched minimal samples -------------------------------------------
    probs = mask.astype(dtype) / jnp.maximum(jnp.sum(mask), 1.0)
    samples = jax.random.choice(
        key, n, shape=(n_iters, 8), replace=True, p=probs
    )  # occasional duplicate indices => degenerate sample => low score; fine

    s1 = p1n[samples]  # (B,8,2)
    s2 = p2n[samples]

    Fs_n = jax.vmap(_dlt_F)(s1, s2)
    Hs_n = jax.vmap(_dlt_H)(s1[:, :4], s2[:, :4])
    # denormalize: F = T2' Fn T1 ; H = T2^-1 Hn T1
    Fs = jnp.einsum("ji,bjk,kl->bil", T2, Fs_n, T1)
    Hs = jnp.einsum("ij,bjk,kl->bil", jnp.linalg.inv(T2), Hs_n, T1)

    score_F, _ = jax.vmap(lambda F: _score_F(F, p1, p2, mask, sigma2))(Fs)
    score_H, _ = jax.vmap(lambda H: _score_H(H, p1, p2, mask, sigma2))(Hs)

    bF = jnp.argmax(score_F)
    bH = jnp.argmax(score_H)
    # inlier re-fit: take the best hypothesis's inliers, solve one
    # least-squares model over them, re-score (picks whichever is better)
    _, inl_F = _score_F(Fs[bF], p1, p2, mask, sigma2)
    _, inl_H = _score_H(Hs[bH], p1, p2, mask, sigma2)
    F_refit_n = _dlt_F_weighted(p1n, p2n, inl_F.astype(dtype))
    H_refit_n = _dlt_H_weighted(p1n, p2n, inl_H.astype(dtype))
    F_refit = T2.T @ F_refit_n @ T1
    H_refit = jnp.linalg.inv(T2) @ H_refit_n @ T1
    sFr, _ = _score_F(F_refit, p1, p2, mask, sigma2)
    sHr, _ = _score_H(H_refit, p1, p2, mask, sigma2)
    SF = jnp.maximum(score_F[bF], sFr)
    SH = jnp.maximum(score_H[bH], sHr)
    F_best = jnp.where(sFr >= score_F[bF], F_refit, Fs[bF])
    H_best = jnp.where(sHr >= score_H[bH], H_refit, Hs[bH])
    use_H = SH / jnp.maximum(SH + SF, 1e-12) > 0.40  # reference RH>0.40 gate

    # ---- motion candidates from both models, pick by cheirality ------------
    # (computing both costs one extra tiny batch and keeps control flow static)
    Rs_F, ts_F = _decompose_E(F_best)  # E == F in normalized coords
    Rs_H, ts_H = _decompose_H(H_best)
    Rs = jnp.concatenate([Rs_F, Rs_H])  # (12,3,3)
    ts = jnp.concatenate([ts_F, ts_H])
    from_H = jnp.arange(12) >= 4

    n_good, par_cos, Xs, good = jax.vmap(
        lambda R, t: _check_rt(R, t, p1, p2, mask, sigma2)
    )(Rs, ts)

    # candidates must come from the selected model
    sel = jnp.where(use_H, from_H, ~from_H)
    n_good_sel = jnp.where(sel, n_good, -1)
    best = jnp.argmax(n_good_sel)
    n_best = n_good_sel[best]
    # clear-winner test (reference: nsimilar<=1 with 0.75 factor)
    second = jnp.sort(n_good_sel)[-2]
    clear = n_best > 1.33 * jnp.maximum(second, 1)
    n_matches = jnp.sum(mask)
    enough = n_best >= jnp.minimum(
        jnp.maximum((0.7 * n_matches).astype(jnp.int32), min_triangulated), n_matches
    )
    parallax_ok = par_cos[best] < 0.9998  # ~1 degree at the 50th point

    success = clear & enough & parallax_ok
    return TwoViewResult(
        success=success,
        R=Rs[best],
        t=ts[best],
        points=Xs[best],
        inliers=good[best] & success,
        used_homography=use_H,
    )
