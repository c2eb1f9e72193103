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

import math
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
    """Dense (m10, m01) circular-patch moment maps.

    TPU-fast formulation: a naive dense 31x31 single-channel convolution
    lowers terribly on TPU (~900 ms/level measured). Instead the circle is
    decomposed into 31 rows; per-row sums come from x-prefix-sums (two
    cumsums for I and x*I), so each output is 31 slices + mul/adds — pure
    VPU work, ~0.04 ms for 480x752. Matches the conv result to ~1e-4 rel.

    m10(y,x) = sum_{dy,dx in circle} dx * I(y+dy, x+dx)
    m01(y,x) = sum_{dy,dx in circle} dy * I(y+dy, x+dx)
    """
    h, w = img.shape
    R = HALF_PATCH
    P = jnp.pad(img, R)
    wp = w + 2 * R
    # centered column coordinate keeps cumsum(T) magnitudes small (f32 safety)
    c = wp * 0.5
    u = jnp.arange(wp, dtype=img.dtype) - c
    S = jnp.pad(jnp.cumsum(P, axis=1), ((0, 0), (1, 0)))
    T = jnp.pad(jnp.cumsum(P * u[None, :], axis=1), ((0, 0), (1, 0)))
    xs = jnp.arange(w, dtype=img.dtype) + R - c  # keypoint col in centered coords
    m10 = jnp.zeros((h, w), img.dtype)
    m01 = jnp.zeros((h, w), img.dtype)
    for dy in range(-R, R + 1):
        ww = int(math.floor(math.sqrt(R * R - dy * dy)))
        rowS = jax.lax.slice(S, (R + dy, 0), (R + dy + h, S.shape[1]))
        rowT = jax.lax.slice(T, (R + dy, 0), (R + dy + h, T.shape[1]))
        # box sum over padded cols [x-ww, x+ww] (x in padded coords = x+R)
        bS = (jax.lax.slice(rowS, (0, R + ww + 1), (h, R + ww + 1 + w))
              - jax.lax.slice(rowS, (0, R - ww), (h, R - ww + w)))
        bT = (jax.lax.slice(rowT, (0, R + ww + 1), (h, R + ww + 1 + w))
              - jax.lax.slice(rowT, (0, R - ww), (h, R - ww + w)))
        m10 = m10 + (bT - xs[None, :] * bS)
        m01 = m01 + dy * bS
    return m10, m01


def keypoint_angles(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Orientation angle (radians) per keypoint via the dense moment maps."""
    m10, m01 = orientation_maps(img)
    return jnp.arctan2(m01[ys, xs], m10[ys, xs])


PATCH_R = 16  # patch half-size: rotated pattern radius <= 13*1 + rounding < 16


@jax.jit
def brief_descriptors(
    blurred: jax.Array,  # (H, W) Gaussian-blurred level image
    ys: jax.Array,  # (N,) int keypoint rows
    xs: jax.Array,  # (N,) int keypoint cols
    angles: jax.Array,  # (N,) radians
) -> jax.Array:
    """Steered BRIEF: (N, 8) uint32 packed 256-bit descriptors.

    Pair endpoints rotate by the exact keypoint angle with nearest-neighbor
    sampling (like the reference's cvRound pattern sampling,
    src/ORBextractor.cc computeOrbDescriptor), but the TPU path avoids
    scalar gathers entirely:
      1. a 32-row strip per keypoint is fetched with one contiguous row-take,
      2. the 32x32 patch is cut out with a per-keypoint column one-hot matmul
         (MXU),
      3. all 512 rotated sample positions are read with two more one-hot
         matmuls P[ry, rx] = sum_rc P[r,c] * YOH[k,r] * XOH[k,c] (MXU).
    3.5x faster than the XLA gather path at 1k keypoints and bit-identical
    up to bf16 sampling ties (~0.1% of bits).
    """
    h, w = blurred.shape
    n = ys.shape[0]
    PR = PATCH_R
    # 1. row strips: (n*32,) contiguous row gather -> (n, 32, w)
    rows_idx = jnp.clip(
        (ys[:, None] + jnp.arange(-PR, PR)[None, :]).reshape(-1), 0, h - 1
    )
    strips = jnp.take(blurred, rows_idx, axis=0).reshape(n, 2 * PR, w)
    # 2. column cut via one-hot matmul: (n, 32, 32) patches
    cols = jnp.clip(xs[:, None] + jnp.arange(-PR, PR)[None, :], 0, w - 1)
    col_oh = (cols[:, None, :] == jnp.arange(w)[None, :, None]).astype(jnp.bfloat16)
    patch = jnp.einsum(
        "nrw,nwc->nrc", strips.astype(jnp.bfloat16), col_oh,
        preferred_element_type=jnp.float32,
    )
    # 3. rotated in-patch sampling via separable one-hot matmuls
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    p = PATTERN
    yy = jnp.concatenate([p[:, 0], p[:, 2]])  # (512,) endpoint rows
    xx = jnp.concatenate([p[:, 1], p[:, 3]])
    ry = jnp.round(sa[:, None] * xx[None, :] + ca[:, None] * yy[None, :])
    rx = jnp.round(ca[:, None] * xx[None, :] - sa[:, None] * yy[None, :])
    iy = jnp.clip(ry.astype(jnp.int32) + PR, 0, 2 * PR - 1)  # (n, 512)
    ix = jnp.clip(rx.astype(jnp.int32) + PR, 0, 2 * PR - 1)
    yoh = (iy[:, :, None] == jnp.arange(2 * PR)[None, None, :]).astype(jnp.bfloat16)
    xoh = (ix[:, :, None] == jnp.arange(2 * PR)[None, None, :]).astype(jnp.bfloat16)
    tmp = jnp.einsum(
        "nkr,nrc->nkc", yoh, patch.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    v = jnp.sum(tmp * xoh.astype(jnp.float32), axis=2)  # (n, 512)
    bits = (v[:, :N_BITS] < v[:, N_BITS:]).astype(jnp.uint32)
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
