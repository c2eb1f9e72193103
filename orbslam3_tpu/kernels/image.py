"""Image-space device kernels: Gaussian blur, pyramid construction.

TPU-native analog of the reference's `ORBextractor::ComputePyramid`
(`/root/reference/src/ORBextractor.cc:87` region) which uses cv::resize +
copyMakeBorder per level on the CPU. Here the whole pyramid lives on device:
bilinear resize via XLA (jax.image.resize lowers to convs/gathers that fuse
well) and separable Gaussian blur as two depthwise 1-D convolutions (VPU
friendly; XLA fuses the pad+conv chain).

All functions are shape-static: pyramid level sizes are computed at trace time
from the base resolution and scale factor (1.2, 8 levels — the reference's
defaults from e.g. `Examples/Monocular/EuRoC.yaml` ORBextractor.scaleFactor /
nLevels).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

DEFAULT_SCALE = 1.2
DEFAULT_LEVELS = 8


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur of (H, W) image (OpenCV 7x7 sigma=2 equivalent
    used before BRIEF sampling in the reference extractor).

    Implemented as 2*(2r+1) shifted adds (static pad+slice) rather than
    single-channel convs — XLA lowers C=1 spatial convolutions very poorly on
    TPU, while slice+multiply+add chains fuse into a couple of VPU passes.
    """
    import numpy as np
    kv = np.arange(-radius, radius + 1, dtype=np.float64)
    kv = np.exp(-0.5 * (kv / sigma) ** 2)
    kv = (kv / kv.sum()).astype(np.float32)
    h, w = img.shape
    P = jnp.pad(img, radius)
    rowacc = jnp.zeros((h + 2 * radius, w), img.dtype)
    for i, c in enumerate(kv):
        rowacc = rowacc + c * jax.lax.slice(P, (0, i), (h + 2 * radius, i + w))
    out = jnp.zeros((h, w), img.dtype)
    for i, c in enumerate(kv):
        out = out + c * jax.lax.slice(rowacc, (i, 0), (i + h, w))
    return out


def pyramid_shapes(h: int, w: int, n_levels: int = DEFAULT_LEVELS,
                   scale: float = DEFAULT_SCALE):
    """Static per-level (h, w) sizes, mirroring mvScaleFactor construction."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale ** lvl)
        shapes.append((max(8, int(round(h * s))), max(8, int(round(w * s)))))
    return shapes


@partial(jax.jit, static_argnames=("n_levels", "scale"))
def build_pyramid(img: jax.Array, n_levels: int = DEFAULT_LEVELS,
                  scale: float = DEFAULT_SCALE):
    """(H, W) image -> list of per-level images (bilinear, like cv::resize).

    Returns a python list of arrays (static length) — each level feeds an
    independent FAST + descriptor pass that is later concatenated into the
    fixed-capacity keypoint set.
    """
    h, w = img.shape
    levels = [img]
    for lh, lw in pyramid_shapes(h, w, n_levels, scale)[1:]:
        levels.append(jax.image.resize(img, (lh, lw), method="bilinear"))
    return levels


# ---------------------------------------------------------------------------
# Pyramid atlas: all levels packed into ONE image so every dense stage
# (FAST, NMS, moments, blur) runs once instead of n_levels times.
# ---------------------------------------------------------------------------

ATLAS_GAP = 8     # zero rows between levels (isolates blur/NMS across seams)
ATLAS_MARGIN = 17 # no keypoints within this distance of a level edge:
                  # covers orientation patch (15), BRIEF samples (<=14) plus
                  # their blur radius (3) — reference EDGE_THRESHOLD=19 has
                  # the same role (src/ORBextractor.cc border handling).


def atlas_layout(h: int, w: int, n_levels: int = DEFAULT_LEVELS,
                 scale: float = DEFAULT_SCALE):
    """Static packing: returns ((y0, lh, lw) per level, atlas_h, atlas_w).

    Levels are stacked vertically, separated by ATLAS_GAP zero rows; width is
    padded to a multiple of 128 (TPU lane count), height to a multiple of 8.
    """
    shapes = pyramid_shapes(h, w, n_levels, scale)
    rows = []
    y = 0
    for lh, lw in shapes:
        rows.append((y, lh, lw))
        y += lh + ATLAS_GAP
    ah = -(-(y - ATLAS_GAP) // 8) * 8
    aw = -(-w // 128) * 128
    return tuple(rows), ah, aw


@partial(jax.jit, static_argnames=("n_levels", "scale"))
def build_atlas(img: jax.Array, n_levels: int = DEFAULT_LEVELS,
                scale: float = DEFAULT_SCALE) -> jax.Array:
    """(H, W) image -> (AH, AW) pyramid atlas (levels stacked with gaps)."""
    h, w = img.shape
    rows, ah, aw = atlas_layout(h, w, n_levels, scale)
    atlas = jnp.zeros((ah, aw), img.dtype)
    for lvl_img, (y0, lh, lw) in zip(build_pyramid(img, n_levels, scale), rows):
        atlas = jax.lax.dynamic_update_slice(atlas, lvl_img, (y0, 0))
    return atlas
