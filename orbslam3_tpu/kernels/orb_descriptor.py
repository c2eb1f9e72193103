"""Keypoint orientation + steered BRIEF (rBRIEF) descriptors.

TPU-native replacement for the reference's intensity-centroid `IC_Angle` and
`computeOrbDescriptor` (`/root/reference/src/ORBextractor.cc`, orientation and
descriptor loops; learned pattern table `bit_pattern_31_`).

Re-design rationale:
  * Orientation: instead of per-keypoint circular-patch loops, the centroid
    moments m10/m01 are computed *densely* as two 31x31 convolutions over the
    whole level image (MXU/conv work), then each keypoint just gathers two
    values and takes atan2 — no per-keypoint patch extraction at all.
  * Descriptor: 256 test pairs are *generated* (seeded isotropic Gaussian,
    the original BRIEF recipe) rather than copying OpenCV's learned table —
    this framework builds its own vocabulary, so there is no bit-compat
    constraint. Pair endpoints are rotated by the keypoint angle (steered
    BRIEF) and sampled from the Gaussian-blurred image with one big gather.
  * Bits are packed 256 -> 8x uint32 words for storage; the matcher expands
    to +/-1 planes for MXU matmul distances (see kernels/hamming.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius (reference HALF_PATCH_SIZE)
PATTERN_SIGMA = 13.0 / 2.5  # BRIEF pair spread; coords clipped to |r|<=13
PATTERN_SEED = 31
N_BITS = 256


def _make_pattern(seed: int = PATTERN_SEED) -> np.ndarray:
    """Deterministic 256x4 (y1,x1,y2,x2) BRIEF test pattern.

    Isotropic Gaussian sampling (BRIEF GII) clipped to radius 13 so rotated
    samples stay within a 19-px border, matching the reference's
    EDGE_THRESHOLD=19 margin.
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=PATTERN_SIGMA, size=(N_BITS, 2, 2))
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    too_far = norms > 13.0
    pts = np.where(too_far, pts * (13.0 / norms), pts)
    return np.round(pts).astype(np.float32).reshape(N_BITS, 4)


PATTERN = jnp.asarray(_make_pattern())  # (256, 4) = (y1, x1, y2, x2)


def _circular_mask(radius: int) -> np.ndarray:
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


_MASK = _circular_mask(HALF_PATCH)
_MX = jnp.asarray(_MASK * np.mgrid[-HALF_PATCH : HALF_PATCH + 1,
                                   -HALF_PATCH : HALF_PATCH + 1][1])
_MY = jnp.asarray(_MASK * np.mgrid[-HALF_PATCH : HALF_PATCH + 1,
                                   -HALF_PATCH : HALF_PATCH + 1][0])


@jax.jit
def orientation_maps(img: jax.Array):
    """Dense (m10, m01) moment maps via two 31x31 convolutions."""
    x = img[None, None]
    kx = _MX[None, None].astype(img.dtype)
    ky = _MY[None, None].astype(img.dtype)
    pad = ((HALF_PATCH, HALF_PATCH), (HALF_PATCH, HALF_PATCH))
    m10 = jax.lax.conv_general_dilated(x, kx, (1, 1), pad)[0, 0]
    m01 = jax.lax.conv_general_dilated(x, ky, (1, 1), pad)[0, 0]
    return m10, m01


def keypoint_angles(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Orientation angle (radians) per keypoint via the dense moment maps."""
    m10, m01 = orientation_maps(img)
    return jnp.arctan2(m01[ys, xs], m10[ys, xs])


@jax.jit
def brief_descriptors(
    blurred: jax.Array,  # (H, W) Gaussian-blurred level image
    ys: jax.Array,  # (N,) int keypoint rows
    xs: jax.Array,  # (N,) int keypoint cols
    angles: jax.Array,  # (N,) radians
) -> jax.Array:
    """Steered BRIEF: (N, 8) uint32 packed 256-bit descriptors.

    Pair endpoints rotate by the keypoint angle (nearest-neighbor sampling of
    the blurred image, like the reference's cvRound pattern sampling).
    """
    h, w = blurred.shape
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (N,)
    p = PATTERN.astype(blurred.dtype)  # (256, 4)
    y1, x1, y2, x2 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]

    def rot(y, x):
        # rotated coords per (keypoint, bit): (N, 256)
        ry = sa[:, None] * x[None, :] + ca[:, None] * y[None, :]
        rx = ca[:, None] * x[None, :] - sa[:, None] * y[None, :]
        return ry, rx

    ry1, rx1 = rot(y1, x1)
    ry2, rx2 = rot(y2, x2)
    iy1 = jnp.clip(jnp.round(ys[:, None] + ry1).astype(jnp.int32), 0, h - 1)
    ix1 = jnp.clip(jnp.round(xs[:, None] + rx1).astype(jnp.int32), 0, w - 1)
    iy2 = jnp.clip(jnp.round(ys[:, None] + ry2).astype(jnp.int32), 0, h - 1)
    ix2 = jnp.clip(jnp.round(xs[:, None] + rx2).astype(jnp.int32), 0, w - 1)
    v1 = blurred[iy1, ix1]
    v2 = blurred[iy2, ix2]
    bits = (v1 < v2).astype(jnp.uint32)  # (N, 256)
    return pack_bits(bits)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} -> (N, 8) uint32 (bit b of word w = bit 32*w+b)."""
    n = bits.shape[0]
    words = bits.reshape(n, 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) {0,1} uint8."""
    n = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(n, 256).astype(jnp.uint8)


@partial(jax.jit, static_argnames=())
def descriptor_planes(packed: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) bf16 in {-1, +1} for MXU matmul matching."""
    bits = unpack_bits(packed).astype(jnp.bfloat16)
    return bits * 2.0 - 1.0
