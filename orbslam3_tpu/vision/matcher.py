"""Data-association policies over the Hamming distance matrix.

TPU-native replacement for `ORBmatcher`'s Search* family
(`/root/reference/src/ORBmatcher.cc`: `SearchByProjection` overloads,
`SearchForInitialization`, `SearchForTriangulation`, `Fuse`). The reference
walks per-feature candidate lists from a 64x48 image grid; here every policy
is "full distance matrix + masks" — the MXU makes the full matrix cheaper
than gather-heavy candidate lists, and the grid becomes a pixel-window mask.

All functions are jitted device code over fixed-capacity arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie
from orbslam3_tpu.kernels import hamming as ham
from orbslam3_tpu.kernels import orb_descriptor as desc_k

BIG = jnp.int32(1 << 20)


def project_points(R, t, camera, pts, margin: float = 0.0):
    """Project world points; returns (uv, depth, visible mask)."""
    xc = lie.se3_apply(R, t, pts)
    uv = camera.project(xc)
    w, h = camera.width, camera.height
    vis = (
        (xc[..., 2] > 0.05)
        & (uv[..., 0] >= -margin) & (uv[..., 0] < w + margin)
        & (uv[..., 1] >= -margin) & (uv[..., 1] < h + margin)
    )
    return uv, xc[..., 2], vis


def _resolve_duplicates(best_feat, best_dist, ok, n_feats):
    """Keep at most one map point per feature (the closest in descriptor
    space) — the reference does this with per-feature bookkeeping in its
    candidate loops."""
    dist_f = jnp.where(ok, best_dist, BIG)
    per_feat = jnp.full((n_feats,), BIG, best_dist.dtype).at[best_feat].min(dist_f)
    keep = ok & (dist_f <= per_feat[best_feat])
    # break exact-distance ties: first point index wins
    order = jnp.arange(best_feat.shape[0])
    first = jnp.full((n_feats,), 1 << 30).at[best_feat].min(
        jnp.where(keep, order, 1 << 30)
    )
    keep = keep & (first[best_feat] == order)
    return keep


@partial(jax.jit, static_argnames=("max_dist", "ratio"))
def search_by_projection(
    mp_pos: jax.Array,       # (K,3) candidate map points (world)
    mp_planes: jax.Array,    # (K,256) +/-1 descriptor planes
    mp_valid: jax.Array,     # (K,) bool
    R: jax.Array, t: jax.Array,
    camera,
    f_uv: jax.Array,         # (N,2) frame keypoints
    f_planes: jax.Array,     # (N,256)
    f_octave: jax.Array,     # (N,) int32
    f_valid: jax.Array,      # (N,) bool
    radius: jax.Array,       # scalar px search window (scaled per octave)
    max_dist: int = ham.TH_HIGH,
    ratio: float = 0.9,
    mp_normal: jax.Array | None = None,    # (K,3) mean viewing directions
    mp_min_dist: jax.Array | None = None,  # (K,) scale-invariance band
    mp_max_dist: jax.Array | None = None,  # (K,)
):
    """Project map points into the frame and associate to keypoints within a
    window (reference `SearchByProjection` for tracking,
    ORBmatcher.cc tracking overload).

    When the point statistics are given, applies the reference's
    `Frame::isInFrustum` gates (Frame.cc): view distance within
    [0.8 min, 1.2 max], viewing angle cos > 0.5, and the predicted scale
    level (`MapPoint::PredictScale`) restricting candidate keypoint octaves
    to [pred-1, pred+1]. These kill repeated-texture mismatches that a pure
    descriptor+window search lets through.

    Returns (feat_idx (K,), dist (K,), matched (K,), n_matches, in_frustum (K,)).
    """
    uv, depth, vis = project_points(R, t, camera, mp_pos)
    vis = vis & mp_valid

    d2 = jnp.sum(jnp.square(uv[:, None, :] - f_uv[None, :, :]), axis=-1)
    r = radius * (1.2 ** f_octave.astype(jnp.float32))  # octave-scaled window
    window = d2 <= jnp.square(r)[None, :]

    oct_ok = True
    if mp_max_dist is not None:
        center = -jnp.einsum("ji,j->i", R, t)
        pw = mp_pos - center
        dist = jnp.linalg.norm(pw, axis=-1)
        in_band = (dist >= 0.8 * mp_min_dist) & (dist <= 1.2 * mp_max_dist) \
            & (mp_max_dist > 0)
        vis = vis & in_band
        if mp_normal is not None:
            cosang = jnp.einsum("ki,ki->k", pw, mp_normal) / jnp.maximum(
                dist, 1e-9)
            has_n = jnp.linalg.norm(mp_normal, axis=-1) > 1e-6
            vis = vis & (~has_n | (cosang > 0.5))
        # PredictScale: level = ceil(log(maxDist/dist) / log 1.2); the stored
        # band edge is the RAW mfMaxDistance (no tolerance factor baked in)
        lvl = jnp.ceil(jnp.log(jnp.maximum(mp_max_dist, 1e-9)
                               / jnp.maximum(dist, 1e-9)) / jnp.log(1.2))
        lvl = jnp.clip(lvl, 0, 7).astype(jnp.int32)
        oct_ok = jnp.abs(lvl[:, None] - f_octave[None, :]) <= 1

    mask = window & oct_ok & vis[:, None] & f_valid[None, :]
    idx, best, ok = ham.masked_match_ratio(
        mp_planes, f_planes, mask, max_dist=max_dist, ratio=ratio)
    ok = ok & vis
    keep = _resolve_duplicates(idx, best, ok, f_uv.shape[0])
    return idx, best, keep, jnp.sum(keep), vis


HISTO_LENGTH = 30  # reference ORBmatcher.cc:41 rotation histogram bins


@partial(jax.jit, static_argnames=("n_bins", "top"))
def rotation_consistency(ang1: jax.Array, ang2: jax.Array,
                         idx: jax.Array, ok: jax.Array,
                         n_bins: int = HISTO_LENGTH, top: int = 3):
    """Dominant-orientation voting (reference `CheckOrientation` blocks +
    `ComputeThreeMaxima`, ORBmatcher.cc:83-85 and per-Search* epilogues):
    histogram the per-match keypoint-angle difference, keep only matches in
    the top-3 bins (a bin also needs >= 10% of the max bin's votes). Cheap
    global-motion outlier filter the reference relies on in low texture.

    ang* are RADIANS; idx maps set-1 entries to set-2 features."""
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(ang1 - ang2[idx], two_pi)
    b = jnp.round(rot * (n_bins / two_pi)).astype(jnp.int32) % n_bins
    hist = jnp.zeros(n_bins, jnp.int32).at[b].add(ok.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(hist, top)
    good = top_vals.astype(jnp.float32) >= 0.1 * top_vals[0].astype(
        jnp.float32)
    keep_bin = jnp.zeros(n_bins, bool).at[top_idx].set(good)
    return ok & keep_bin[b]


@partial(jax.jit, static_argnames=("max_dist", "ratio", "check_rotation"))
def search_for_initialization(
    uv1, planes1, valid1, uv2, planes2, valid2,
    radius: float = 100.0, max_dist: int = ham.TH_LOW, ratio: float = 0.9,
    ang1=None, ang2=None, check_rotation: bool = False,
):
    """Frame-1 -> frame-2 matching in a wide window with mutual check
    (reference `SearchForInitialization`, ORBmatcher.cc), plus the
    rotation-consistency histogram when angles are given."""
    d2 = jnp.sum(jnp.square(uv1[:, None, :] - uv2[None, :, :]), axis=-1)
    window = d2 <= radius * radius
    mask = window & valid1[:, None] & valid2[None, :]
    idx, best, ok = ham.masked_match_ratio(
        planes1, planes2, mask, max_dist=max_dist, ratio=ratio)
    idx_ba, _, _ = ham.masked_match_ratio(
        planes2, planes1, mask.T, max_dist=max_dist, ratio=ratio)
    ok = ham.mutual_filter(idx, ok, idx_ba)
    if check_rotation:
        ok = rotation_consistency(ang1, ang2, idx, ok)
    return idx, best, ok, jnp.sum(ok)


@partial(jax.jit, static_argnames=("k", "max_dist", "ratio"))
def search_by_bow(
    words1: jax.Array,   # (N1,) leaf word id per feature (vocab.descend)
    planes1: jax.Array, valid1: jax.Array, ang1: jax.Array,
    words2: jax.Array,
    planes2: jax.Array, valid2: jax.Array, ang2: jax.Array,
    k: int,              # vocabulary branching factor
    max_dist: int = ham.TH_LOW, ratio: float = 0.7,
):
    """Vocabulary-bucketed matching (reference `SearchByBoW`,
    ORBmatcher.cc:~150: features are only compared within the same
    FeatureVector node). The DBoW2 node-at-level-up bucket becomes a
    parent-node equality mask over the leaf words — one masked distance
    matrix instead of per-node list walks — followed by the reference's
    0.7 ratio test, mutual check, and rotation histogram.

    Returns (idx (N1,), dist (N1,), ok (N1,), n)."""
    parent1 = words1 // k
    parent2 = words2 // k
    same_node = parent1[:, None] == parent2[None, :]
    mask = same_node & valid1[:, None] & valid2[None, :] \
        & (words1 >= 0)[:, None] & (words2 >= 0)[None, :]
    idx, best, ok = ham.masked_match_ratio(
        planes1, planes2, mask, max_dist=max_dist, ratio=ratio)
    idx_ba, _, _ = ham.masked_match_ratio(
        planes2, planes1, mask.T, max_dist=max_dist, ratio=ratio)
    ok = ham.mutual_filter(idx, ok, idx_ba)
    ok = rotation_consistency(ang1, ang2, idx, ok)
    return idx, best, ok, jnp.sum(ok)


@partial(jax.jit, static_argnames=("max_dist",))
def search_for_triangulation(
    uv1, planes1, avail1,      # KF1 unmatched features
    uv2, planes2, avail2,      # KF2 unmatched features
    R1, t1, R2, t2,            # Tcw poses
    camera,
    epi_sigma: float = 2.0,    # wider than the reference's 1.0: tolerates
                               # small window-pose errors; the triangulation
                               # acceptance gates filter false pairs
    max_dist: int = ham.TH_LOW,
):
    """Match unassigned features across two keyframes under the epipolar
    constraint (reference `SearchForTriangulation`, ORBmatcher.cc — BoW
    buckets replaced by the full masked distance matrix).

    Returns (idx (N1,), ok (N1,)) mapping KF1 features to KF2 features.
    """
    # relative pose cam2<-cam1 and essential matrix
    R12 = R2 @ R1.T
    t12 = t2 - R12 @ t1
    E = lie.hat(t12) @ R12
    # normalized coords
    x1 = camera.unproject(uv1)  # (N1,3) z=1
    x2 = camera.unproject(uv2)
    # epipolar distance of x2 to line E x1 (in normalized units)
    l2 = x1 @ E.T  # (N1,3)
    num = jnp.abs(jnp.einsum("mj,nj->mn", l2, x2))
    den = jnp.sqrt(jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12))[:, None]
    focal = camera.params[0]
    epi_px = num / den * focal
    epi_ok = epi_px < 3.84 * epi_sigma

    mask = epi_ok & avail1[:, None] & avail2[None, :]
    idx, best, ok = ham.masked_match_ratio(
        planes1, planes2, mask, max_dist=max_dist, ratio=0.8)
    idx_ba, _, _ = ham.masked_match_ratio(
        planes2, planes1, mask.T, max_dist=max_dist, ratio=0.8)
    ok = ham.mutual_filter(idx, ok, idx_ba)
    return idx, ok


@partial(jax.jit, static_argnames=("max_dist",))
def fuse_by_projection(
    mp_pos, mp_planes, mp_valid,
    R, t, camera,
    f_uv, f_planes, f_octave, f_valid,
    radius: float = 3.0,
    max_dist: int = ham.TH_LOW,
):
    """Project candidate map points into a keyframe and associate them with
    nearby features (reference `Fuse`, ORBmatcher.cc:~1470). The caller binds
    free features and MERGES when the feature already carries another map
    point — the merge is what prevents duplicate landmarks from accumulating.

    Returns (feat_idx (K,), matched (K,)).
    """
    uv, depth, vis = project_points(R, t, camera, mp_pos)
    vis = vis & mp_valid
    d2 = jnp.sum(jnp.square(uv[:, None, :] - f_uv[None, :, :]), axis=-1)
    r = radius * (1.2 ** f_octave.astype(jnp.float32))
    window = d2 <= jnp.square(r)[None, :]
    mask = window & vis[:, None] & f_valid[None, :]
    idx, best, ok = ham.masked_match_ratio(
        mp_planes, f_planes, mask, max_dist=max_dist, ratio=1.0)
    ok = ok & vis
    keep = _resolve_duplicates(idx, best, ok, f_uv.shape[0])
    return idx, keep


def mp_descriptor_planes(mp_desc_packed: jax.Array) -> jax.Array:
    return desc_k.descriptor_planes(mp_desc_packed)
