"""Pinhole stereo rectification: precomputed inverse maps + jitted remap.

TPU-native equivalent of the reference's rectification pipeline
(`/root/reference/src/Settings.cc:485-528` `precomputeRectificationMaps`,
which calls `cv::stereoRectify` + `cv::initUndistortRectifyMap`, and the
per-frame `cv::remap` in `System::TrackStereo`):

  * The geometry solve and the (H, W, 2) source-coordinate maps are a
    ONE-TIME host-side precompute at Settings load — numpy, double
    precision, like the reference.
  * The per-frame work — two bilinear remaps — is a jitted gather that
    runs on device, fused ahead of the ORB pyramid so the images never
    bounce back to the host.

Geometry (same construction as cv::stereoRectify with CALIB_ZERO_DISPARITY):
split the inter-camera rotation evenly between the two views, then rotate
both so the baseline lies along the image x-axis; build one shared ideal
pinhole P for both views (common focal + principal point) so matching
epipolar lines land on identical rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rodrigues(r: np.ndarray) -> np.ndarray:
    """Rotation vector -> matrix (host-side double precision)."""
    th = float(np.linalg.norm(r))
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _rot_vec(R: np.ndarray) -> np.ndarray:
    """Matrix -> rotation vector."""
    c = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-12:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2.0 * np.sin(th)) * w


def _distort_radtan(x, y, dist):
    """Apply radial-tangential distortion to ideal coords (numpy, vectorized).

    dist = (k1, k2, p1, p2, k3) — reference `Settings::camera1DistortionCoef`.
    """
    k1, k2, p1, p2, k3 = (list(dist) + [0.0] * 5)[:5]
    r2 = x * x + y * y
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def _undistort_points(pts, K, dist, iters=8):
    """Iteratively invert radtan distortion -> ideal normalized coords."""
    x = (pts[:, 0] - K[0, 2]) / K[0, 0]
    y = (pts[:, 1] - K[1, 2]) / K[1, 1]
    x0, y0 = x.copy(), y.copy()
    for _ in range(iters):
        xd, yd = _distort_radtan(x, y, dist)
        x = x + (x0 - xd)
        y = y + (y0 - yd)
    return np.stack([x, y], -1)


def stereo_rectify(K1, d1, K2, d2, size, R12, t12):
    """Compute rectifying rotations + the shared new projection.

    Convention matches what the reference feeds cv::stereoRectify
    (`Settings.cc:493-505`): ``R12, t12`` map LEFT-camera coords to RIGHT
    (x_r = R12 @ x_l + t12, i.e. Trl from the YAML's Tlr^-1).

    Returns (R1, R2, K_new, baseline): per-camera rectifying rotations
    (rectified <- unrectified), the shared pinhole intrinsics, and the
    metric baseline (bf = baseline * K_new[0,0]).
    """
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R12 = np.asarray(R12, np.float64)
    t12 = np.asarray(t12, np.float64).reshape(3)
    nx, ny = int(size[0]), int(size[1])

    # split the rotation evenly between the two cameras
    r_half = _rodrigues(-0.5 * _rot_vec(R12))
    t = r_half @ t12
    # rotate both so the baseline is the x axis (horizontal stereo)
    uu = np.array([1.0 if t[0] > 0 else -1.0, 0.0, 0.0])
    ww = np.cross(t, uu)
    nw = np.linalg.norm(ww)
    if nw > 1e-12:
        ww *= np.arccos(min(1.0, abs(t[0]) / np.linalg.norm(t))) / nw
    wR = _rodrigues(ww)
    R1 = wR @ r_half.T
    R2 = wR @ r_half
    baseline = abs((R2 @ t12)[0])

    # shared focal: min of the two y-focals, shrunk for barrel distortion
    fc_new = np.inf
    for K, d in ((K1, d1), (K2, d2)):
        fc = K[1, 1]
        k1 = d[0] if len(d) else 0.0
        if k1 < 0:
            fc *= 1 + k1 * (nx * nx + ny * ny) / (4 * fc * fc)
        fc_new = min(fc_new, fc)

    # shared principal point: center the undistorted+rectified corner images
    cc = np.zeros((2, 2))
    corners = np.array([[0, 0], [nx - 1, 0], [0, ny - 1], [nx - 1, ny - 1]],
                       np.float64)
    for k, (K, d, Rr) in enumerate(((K1, d1, R1), (K2, d2, R2))):
        und = _undistort_points(corners, K, d)
        h = np.concatenate([und, np.ones((4, 1))], -1) @ Rr.T
        proj = fc_new * h[:, :2] / h[:, 2:3]
        cc[k, 0] = (nx - 1) / 2 - proj[:, 0].mean()
        cc[k, 1] = (ny - 1) / 2 - proj[:, 1].mean()
    cc_shared = cc.mean(axis=0)  # CALIB_ZERO_DISPARITY

    K_new = np.array([[fc_new, 0.0, cc_shared[0]],
                      [0.0, fc_new, cc_shared[1]],
                      [0.0, 0.0, 1.0]])
    return R1, R2, K_new, float(baseline)


def undistort_rectify_map(K, dist, R_rect, K_new, size):
    """Build the (H, W, 2) map of SOURCE pixel coords for each rectified
    pixel (cv::initUndistortRectifyMap, called at `Settings.cc:506-509`)."""
    K = np.asarray(K, np.float64)
    K_new = np.asarray(K_new, np.float64)
    nx, ny = int(size[0]), int(size[1])
    u, v = np.meshgrid(np.arange(nx, dtype=np.float64),
                       np.arange(ny, dtype=np.float64))
    x = (u - K_new[0, 2]) / K_new[0, 0]
    y = (v - K_new[1, 2]) / K_new[1, 1]
    h = np.stack([x, y, np.ones_like(x)], -1) @ R_rect  # == R_rect.T applied
    xs = h[..., 0] / h[..., 2]
    ys = h[..., 1] / h[..., 2]
    xd, yd = _distort_radtan(xs, ys, dist)
    us = K[0, 0] * xd + K[0, 2]
    vs = K[1, 1] * yd + K[1, 2]
    return np.stack([us, vs], -1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jax.Array, src_map: jax.Array) -> jax.Array:
    """Jitted bilinear remap: sample ``img`` (H, W) at ``src_map`` (H, W, 2)
    source pixel coords; out-of-bounds samples are 0 (cv::remap
    BORDER_CONSTANT). Runs per frame on device ahead of ORB extraction."""
    H, W = img.shape
    u = src_map[..., 0]
    v = src_map[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def tap(vi, ui):
        ok = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        val = img[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        return jnp.where(ok, val, 0.0)

    out = ((1 - fu) * (1 - fv) * tap(v0i, u0i)
           + fu * (1 - fv) * tap(v0i, u0i + 1)
           + (1 - fu) * fv * tap(v0i + 1, u0i)
           + fu * fv * tap(v0i + 1, u0i + 1))
    return out.astype(img.dtype)


class RectifyMaps:
    """Precomputed stereo rectification state, built once at Settings load.

    Mirrors the reference's M1l_/M2l_/M1r_/M2r_ + updated calibration
    (`include/Settings.h:53-125`): ``K_new`` replaces both cameras'
    intrinsics, ``bf`` is baseline * new focal, ``R1`` corrects the
    camera1<->IMU extrinsic for inertial-stereo.
    """

    def __init__(self, K1, d1, K2, d2, size, R12, t12):
        R1, R2, K_new, baseline = stereo_rectify(K1, d1, K2, d2, size,
                                                 R12, t12)
        self.R1, self.R2, self.K_new = R1, R2, K_new
        self.baseline = baseline
        self.bf = baseline * K_new[0, 0]
        self.map_l = jnp.asarray(
            undistort_rectify_map(K1, d1, R1, K_new, size))
        self.map_r = jnp.asarray(
            undistort_rectify_map(K2, d2, R2, K_new, size))

    def __call__(self, img_l, img_r):
        return (remap_bilinear(jnp.asarray(img_l, jnp.float32), self.map_l),
                remap_bilinear(jnp.asarray(img_r, jnp.float32), self.map_r))
