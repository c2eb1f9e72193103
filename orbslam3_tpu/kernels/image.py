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
    used before BRIEF sampling in the reference extractor)."""
    k = gaussian_kernel1d(sigma, radius).astype(img.dtype)
    # rows
    x = img[None, None]  # NCHW
    kr = k.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(
        x, kr, window_strides=(1, 1), padding=((0, 0), (radius, radius)),
    )
    kc = k.reshape(1, 1, -1, 1)
    x = jax.lax.conv_general_dilated(
        x, kc, window_strides=(1, 1), padding=((radius, radius), (0, 0)),
    )
    return x[0, 0]


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
