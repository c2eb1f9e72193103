"""Rectified stereo matching + depth recovery.

TPU-native redesign of the reference's stereo feature pipeline:
  * `Frame::ComputeStereoMatches` (`/root/reference/src/Frame.cc`, the
    rectified row-search region): for each left keypoint, right candidates
    within a row band at compatible octaves, best Hamming match, disparity
    in [minD, maxD] -> depth = bf / disparity.
  * `Frame::ComputeStereoFromRGBD` (Frame.cc:~640): depth map lookup,
    synthesized virtual right coordinate uR = u - bf / depth.
  * `KannalaBrandt8::TriangulateMatches` (KannalaBrandt8.h:30-102) analog
    for non-rectified fisheye pairs: descriptor match + two-view midpoint
    triangulation with the known stereo extrinsics.

All of it is batched masked Hamming matching (the MXU plane-matmul kernel)
plus elementwise math — one fused device program per frame pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orbslam3_tpu.kernels import hamming as ham


@partial(jax.jit, static_argnames=("max_dist",))
def stereo_match(
    uvL: jax.Array,       # (N,2) left keypoints (rectified)
    planesL: jax.Array,   # (N,256) +/-1 descriptor planes
    octL: jax.Array,      # (N,) int32
    validL: jax.Array,    # (N,) bool
    uvR: jax.Array,       # (M,2) right keypoints
    planesR: jax.Array,   # (M,256)
    octR: jax.Array,      # (M,) int32
    validR: jax.Array,    # (M,) bool
    bf: jax.Array,        # scalar: baseline * fx
    min_z: jax.Array,     # scalar: closest admissible depth (b * 1.05-ish)
    max_disp: jax.Array,  # scalar: bf / min_z
    max_dist: int = ham.TH_HIGH,
):
    """Row-band stereo association. Returns (u_right (N,), depth (N,),
    has_depth (N,)) with -1 / 0 where unmatched.

    Gates (ComputeStereoMatches parity): row distance <= 2 px * octave
    scale, octave difference <= 1, disparity in (0.1, max_disp], Hamming
    under TH_HIGH with a 0.9 best/second ratio.
    """
    row_tol = 2.0 * (1.2 ** octL.astype(jnp.float32))  # per-left-kp band
    drow = jnp.abs(uvL[:, 1:2] - uvR[None, :, 1])          # (N,M)
    band = drow <= row_tol[:, None]
    oct_ok = jnp.abs(octL[:, None] - octR[None, :]) <= 1
    disp = uvL[:, 0:1] - uvR[None, :, 0]                   # (N,M)
    disp_ok = (disp > 0.1) & (disp <= max_disp)
    mask = band & oct_ok & disp_ok & validL[:, None] & validR[None, :]
    idx, best, ok = ham.masked_match_ratio(planesL, planesR, mask,
                                           max_dist=max_dist, ratio=0.9)
    u_r = uvR[idx, 0]
    d = uvL[:, 0] - u_r
    depth = bf / jnp.maximum(d, 1e-6)
    good = ok & (d > 0.1) & (depth >= min_z)
    return (jnp.where(good, u_r, -1.0),
            jnp.where(good, depth, 0.0),
            good)


def depth_from_rgbd(uv: jax.Array, valid: jax.Array, depth_map: jax.Array,
                    bf: jax.Array, depth_factor: float = 1.0):
    """RGB-D ingestion (ComputeStereoFromRGBD): sample the registered depth
    map at keypoint locations; synthesize uR = u - bf/z for the stereo
    residual machinery. Returns (u_right, depth, has_depth)."""
    h, w = depth_map.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
    z = depth_map[y, x].astype(jnp.float32) * depth_factor
    good = valid & (z > 0.0) & jnp.isfinite(z)
    u_r = uv[:, 0] - bf / jnp.maximum(z, 1e-6)
    return (jnp.where(good, u_r, -1.0), jnp.where(good, z, 0.0), good)


@partial(jax.jit, static_argnames=("max_dist",))
def fisheye_stereo_match(
    uvL, planesL, validL, uvR, planesR, validR,
    camL, camR,
    R_rl: jax.Array,   # (3,3) right<-left rotation (from T_c1_c2^-1)
    t_rl: jax.Array,   # (3,)
    max_dist: int = ham.TH_LOW,
    max_reproj_err: float = 3.0,
):
    """Non-rectified (fisheye) stereo: global descriptor match + midpoint
    triangulation in the left camera frame (KannalaBrandt8::TriangulateMatches
    redesigned batched). Returns (depth (N,), good (N,), idx (N,)).
    """
    mask = validL[:, None] & validR[None, :]
    idx, best, ok = ham.masked_match_ratio(planesL, planesR, mask,
                                           max_dist=max_dist, ratio=0.8)
    rayL = camL.unproject(uvL)                       # (N,3) z=1
    rayR_r = camR.unproject(uvR[idx])                # matched right rays
    rayL = rayL / jnp.linalg.norm(rayL, axis=-1, keepdims=True)
    rayR_r = rayR_r / jnp.linalg.norm(rayR_r, axis=-1, keepdims=True)
    # express right rays in the left frame: x_r = R_rl x_l + t_rl
    rayR = rayR_r @ R_rl                              # R_rl^T applied rowwise
    o2 = -t_rl @ R_rl                                 # right center in left
    # midpoint of closest points between lines (o1=0, d1) and (o2, d2)
    d1, d2 = rayL, rayR
    b_ = jnp.einsum("ni,ni->n", d1, d2)
    denom = jnp.maximum(1.0 - b_ * b_, 1e-9)
    e_ = jnp.einsum("ni,i->n", d1, o2)
    f_ = jnp.einsum("ni,i->n", d2, o2)
    s = (e_ - b_ * f_) / denom
    t = (b_ * e_ - f_) / denom
    p1 = s[:, None] * d1
    p2 = o2[None, :] + t[:, None] * d2
    X = 0.5 * (p1 + p2)
    depth = X[:, 2]
    # verify by reprojection into both cameras
    errL = jnp.linalg.norm(camL.project(X) - uvL, axis=-1)
    X_r = X @ R_rl.T + t_rl
    errR = jnp.linalg.norm(camR.project(X_r) - uvR[idx], axis=-1)
    good = (ok & (s > 0) & (t > 0) & (depth > 0.05)
            & (errL < max_reproj_err) & (errR < max_reproj_err))
    return jnp.where(good, depth, 0.0), good, idx
