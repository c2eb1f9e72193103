"""Frame feature-extraction pipeline: image -> fixed-capacity ORB features.

TPU-native equivalent of the reference's `Frame` construction with
`ORBextractor::operator()` (`/root/reference/src/Frame.cc:200-392`,
`src/ORBextractor.cc:57-89`): 8-level pyramid, per-level FAST with uniform
spatial distribution, intensity-centroid orientation, steered BRIEF, keypoint
undistortion — all as one jitted device program per static image shape.

The result is a `FrameFeatures` pytree of *fixed-capacity padded tensors*
(the framework's Frame data model, replacing the reference's
std::vector<cv::KeyPoint> + cv::Mat descriptors): every downstream consumer
(matcher, tracker, BA) masks with `valid`.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from orbslam3_tpu.kernels import fast as fast_k
from orbslam3_tpu.kernels import image as image_k
from orbslam3_tpu.kernels import orb_descriptor as desc_k


@struct.dataclass
class FrameFeatures:
    """Padded per-frame feature set (capacity N = requested nfeatures)."""

    uv: jax.Array        # (N, 2) float32 level-0 pixel coords (undistorted if cam given)
    uv_raw: jax.Array    # (N, 2) float32 raw (distorted) coords
    response: jax.Array  # (N,) float32
    angle: jax.Array     # (N,) float32 radians
    octave: jax.Array    # (N,) int32 pyramid level
    desc: jax.Array      # (N, 8) uint32 packed 256-bit descriptors
    valid: jax.Array     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


def level_quotas(n_features: int, n_levels: int, scale: float) -> Sequence[int]:
    """Per-level feature budget, matching the reference's geometric split
    (`ORBextractor.cc` ctor: nfeatures*(1-f)/(1-f^L) * f^l with f=1/scale)."""
    f = 1.0 / scale
    total = (1.0 - f ** n_levels) / (1.0 - f)
    quotas = [int(round(n_features * (f ** l) / total)) for l in range(n_levels)]
    quotas[-1] += n_features - sum(quotas)
    return quotas


def extract_features(
    img: jax.Array,  # (H, W) float32 grayscale in [0, 255]
    n_features: int = 1000,
    n_levels: int = image_k.DEFAULT_LEVELS,
    scale: float = image_k.DEFAULT_SCALE,
    cell: int = 32,
    ini_th: float = fast_k.INI_TH,
    min_th: float = fast_k.MIN_TH,
    wbin: jax.Array | None = None,
) -> FrameFeatures:
    """Public entry: threads the (large) BRIEF pattern matrix as an argument
    so it never becomes an inline XLA constant (see brief_weight_matrix)."""
    if wbin is None:
        wbin = desc_k.brief_weight_matrix()
    return _extract_features_impl(img, wbin, n_features, n_levels, scale,
                                  cell, ini_th, min_th)


@partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale", "cell", "ini_th", "min_th"),
)
def _extract_features_impl(
    img: jax.Array,
    wbin: jax.Array,
    n_features: int = 1000,
    n_levels: int = image_k.DEFAULT_LEVELS,
    scale: float = image_k.DEFAULT_SCALE,
    cell: int = 32,
    ini_th: float = fast_k.INI_TH,
    min_th: float = fast_k.MIN_TH,
) -> FrameFeatures:
    """Full ORB extraction. One compiled program per image shape.

    TPU-first structure ("pyramid atlas"): all levels are packed into one
    image with zero-row gaps (kernels/image.py:build_atlas), so FAST, NMS,
    orientation moments and Gaussian blur each run ONCE over a single big
    tensor instead of once per level, and orientation + BRIEF for ALL levels'
    keypoints happen in one batched pass. The ATLAS_MARGIN keep-out mirrors
    the reference's EDGE_THRESHOLD=19 border (src/ORBextractor.cc) and also
    guarantees no patch/blur read crosses a level seam.
    """
    h, w = img.shape
    quotas = level_quotas(n_features, n_levels, scale)
    rows, ah, aw = image_k.atlas_layout(h, w, n_levels, scale)
    margin = image_k.ATLAS_MARGIN

    atlas = image_k.build_atlas(img, n_levels, scale)
    score, raw_score = fast_k.detect_with_raw(atlas, ini_th, min_th)

    ys_parts, xs_parts, y0_parts, sx_parts, sy_parts = [], [], [], [], []
    resps, octs, valids = [], [], []
    for lvl, ((y0, lh, lw), quota) in enumerate(zip(rows, quotas)):
        if quota <= 0:
            continue
        s_lvl = jax.lax.slice(score, (y0, 0), (y0 + lh, lw))
        yy = jnp.arange(lh)[:, None]
        xx = jnp.arange(lw)[None, :]
        interior = (
            (yy >= margin) & (yy < lh - margin)
            & (xx >= margin) & (xx < lw - margin)
        )
        s_lvl = jnp.where(interior, s_lvl, 0.0)
        ys, xs, resp, valid = fast_k.select_uniform(s_lvl, quota, cell=cell)
        # EXACT level->level-0 mapping: jax.image.resize (like cv::resize)
        # is center-aligned with the TRUE ratio w/lw (level sizes are
        # rounded), so x0 = (x + 0.5) * (w/lw) - 0.5. The naive x * 1.2^l
        # carries a position-dependent systematic error up to ~1 px at
        # coarse octaves — it cancels in pairwise residuals but deforms the
        # map (low-residual, biased geometry).
        ys_parts.append(ys + y0)  # atlas coords
        xs_parts.append(xs)
        y0_parts.append(jnp.full((quota,), y0, jnp.int32))
        sx_parts.append(jnp.full((quota,), w / lw, jnp.float32))
        sy_parts.append(jnp.full((quota,), h / lh, jnp.float32))
        resps.append(resp)
        octs.append(jnp.full((quota,), lvl, jnp.int32))
        valids.append(valid)

    ys_a = jnp.concatenate(ys_parts)
    xs_a = jnp.concatenate(xs_parts)
    sx = jnp.concatenate(sx_parts)
    sy = jnp.concatenate(sy_parts)
    # sub-pixel peak refinement on the raw response atlas: one batched
    # gather for all levels' keypoints; offsets scale with the level so the
    # level-0 coordinate keeps sub-pixel precision at every octave
    dy_sp, dx_sp = fast_k.subpixel_offsets(raw_score, ys_a, xs_a)
    y_lvl = (ys_a - jnp.concatenate(y0_parts)).astype(jnp.float32)
    uv = jnp.stack(
        [(xs_a.astype(jnp.float32) + dx_sp + 0.5) * sx - 0.5,
         (y_lvl + dy_sp + 0.5) * sy - 0.5],
        axis=-1)

    # orientation for all keypoints: dense moment maps + tiny gathers
    m10, m01 = desc_k.orientation_maps(atlas)
    flat_idx = ys_a * aw + xs_a
    ang = jnp.arctan2(
        jnp.take(m01.reshape(-1), flat_idx),
        jnp.take(m10.reshape(-1), flat_idx),
    )

    # descriptors for all keypoints in one batched MXU pass
    blurred = image_k.gaussian_blur(atlas)
    desc = desc_k.brief_descriptors(blurred, ys_a, xs_a, ang, wbin)

    return FrameFeatures(
        uv=uv,
        uv_raw=uv,
        response=jnp.concatenate(resps),
        angle=ang,
        octave=jnp.concatenate(octs),
        desc=desc,
        valid=jnp.concatenate(valids),
    )


def undistort(features: FrameFeatures, camera) -> FrameFeatures:
    """Undistort keypoint coords (reference `Frame::UndistortKeyPoints`,
    src/Frame.cc:322). KB8 cameras keep raw coords (distortion stays in the
    projection model)."""
    return features.replace(uv=camera.undistort_points(features.uv_raw))


def features_from_wire(uv, desc, n_capacity: int):
    """Build FrameFeatures from edge-client keypoints+descriptors (the fork's
    Frame-from-wire ctor, `src/Frame.cc:384-392`): pad/clip to capacity."""
    n = uv.shape[0]
    m = min(n, n_capacity)
    uv_p = jnp.zeros((n_capacity, 2), jnp.float32).at[:m].set(uv[:m])
    d_p = jnp.zeros((n_capacity, 8), jnp.uint32).at[:m].set(desc[:m])
    valid = (jnp.arange(n_capacity) < m)
    return FrameFeatures(
        uv=uv_p, uv_raw=uv_p,
        response=jnp.zeros(n_capacity, jnp.float32),
        angle=jnp.zeros(n_capacity, jnp.float32),
        octave=jnp.zeros(n_capacity, jnp.int32),
        desc=d_p, valid=valid,
    )


def features_from_arrays(uv: "np.ndarray", desc_bytes: "np.ndarray",
                         capacity: int) -> FrameFeatures:
    """Wire-format adapter: (n, 32) uint8 ORB descriptors (SlamPktVI layout)
    -> packed (n, 8) uint32 words -> padded FrameFeatures."""
    import numpy as np
    d = np.ascontiguousarray(np.asarray(desc_bytes, np.uint8))
    packed = d.view('<u4').reshape(d.shape[0], 8)
    return features_from_wire(jnp.asarray(np.asarray(uv), jnp.float32),
                              jnp.asarray(packed), capacity)
