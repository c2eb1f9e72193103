"""Camera projection models: pinhole and Kannala-Brandt-8 fisheye.

TPU-native replacement for the reference's `GeometricCamera` hierarchy
(`/root/reference/include/CameraModels/GeometricCamera.h:61-89`,
`src/CameraModels/Pinhole.cpp`, `src/CameraModels/KannalaBrandt8.cpp`).

Design differences from the reference:
  * No virtual dispatch — the camera ``kind`` is a *static* pytree field, so
    each jitted pipeline specializes to one model and the projection math
    fuses into surrounding kernels; all functions broadcast over leading
    point-batch dimensions.
  * Like the reference, pinhole distortion is applied once when building a
    frame (`Frame::UndistortKeyPoints`, `src/Frame.cc:322`) and the optimizer
    works in ideal-pinhole coordinates, while KB8 keeps its distortion inside
    the projection (fisheye keypoints are never undistorted,
    `src/Frame.cc` fisheye ctor path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

PINHOLE = "pinhole"
KB8 = "kb8"

# Max parameter slots: fx fy cx cy + (k1 k2 p1 p2 k3) or (k1..k4).
_NPARAMS = 9


@struct.dataclass
class Camera:
    """A camera model: static ``kind`` + padded parameter vector.

    ``params`` layout:
      pinhole: [fx, fy, cx, cy, k1, k2, p1, p2, k3]   (distortion may be 0)
      kb8:     [fx, fy, cx, cy, k1, k2, k3, k4, 0]
    """

    kind: str = struct.field(pytree_node=False)
    params: jax.Array
    width: int = struct.field(pytree_node=False, default=752)
    height: int = struct.field(pytree_node=False, default=480)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def pinhole(fx, fy, cx, cy, dist=(0.0, 0.0, 0.0, 0.0, 0.0), width=752, height=480):
        d = tuple(dist) + (0.0,) * (5 - len(dist))
        p = jnp.asarray([fx, fy, cx, cy, *d], dtype=jnp.float32)
        return Camera(kind=PINHOLE, params=p, width=width, height=height)

    @staticmethod
    def kb8(fx, fy, cx, cy, k1, k2, k3, k4, width=512, height=512):
        p = jnp.asarray([fx, fy, cx, cy, k1, k2, k3, k4, 0.0], dtype=jnp.float32)
        return Camera(kind=KB8, params=p, width=width, height=height)

    # -- core API (mirrors GeometricCamera::project/unproject) ---------------
    def project(self, xc: jax.Array) -> jax.Array:
        """Camera-frame 3D points (...,3) -> pixel coords (...,2).

        Pinhole projection is *ideal* (no distortion) — matching how the
        reference optimizes over pre-undistorted keypoints. KB8 includes the
        equidistant distortion polynomial (KannalaBrandt8.cpp:44-59).
        """
        if self.kind == PINHOLE:
            return pinhole_project(self.params, xc)
        return kb8_project(self.params, xc)

    def unproject(self, uv: jax.Array) -> jax.Array:
        """Pixels (...,2) -> unit-depth rays (...,3) with z=1."""
        if self.kind == PINHOLE:
            return pinhole_unproject(self.params, uv)
        return kb8_unproject(self.params, uv)

    def project_jac(self, xc: jax.Array) -> jax.Array:
        """d(uv)/d(xc): (...,2,3) analytic Jacobian (projectJac equivalent)."""
        if self.kind == PINHOLE:
            return pinhole_project_jac(self.params, xc)
        return kb8_project_jac(self.params, xc)

    def distort_points(self, uv: jax.Array) -> jax.Array:
        """Ideal pixel coords -> distorted pixel coords (pinhole rad-tan)."""
        if self.kind == PINHOLE:
            fx, fy, cx, cy = (self.params[i] for i in range(4))
            xn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
            xd = radtan_distort(self.params[4:9], xn)
            return jnp.stack([xd[..., 0] * fx + cx, xd[..., 1] * fy + cy], axis=-1)
        return uv

    def undistort_points(self, uv: jax.Array) -> jax.Array:
        """Distorted pixel coords -> ideal pixel coords.

        Equivalent of `Frame::UndistortKeyPoints` (src/Frame.cc:322): fixed
        point iteration on the rad-tan model (branch-free, jit-safe).
        """
        if self.kind == PINHOLE:
            fx, fy, cx, cy = (self.params[i] for i in range(4))
            xn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)
            xu = radtan_undistort(self.params[4:9], xn)
            return jnp.stack([xu[..., 0] * fx + cx, xu[..., 1] * fy + cy], axis=-1)
        return uv

    @property
    def K(self) -> jax.Array:
        fx, fy, cx, cy = (self.params[i] for i in range(4))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx]),
                jnp.stack([z, fy, cy]),
                jnp.stack([z, z, o]),
            ]
        )


# ----------------------------------------------------------------------------
# Pinhole
# ----------------------------------------------------------------------------


def pinhole_project(params: jax.Array, xc: jax.Array) -> jax.Array:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    u = fx * xc[..., 0] / z_safe + cx
    v = fy * xc[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(params: jax.Array, uv: jax.Array) -> jax.Array:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(params: jax.Array, xc: jax.Array) -> jax.Array:
    """Analytic d(uv)/d(xc), matches Pinhole::projectJac (Pinhole.cpp:84-97)."""
    fx, fy = params[0], params[1]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def radtan_distort(dist: jax.Array, xn: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (...,2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(dist: jax.Array, xd: jax.Array, iters: int = 8) -> jax.Array:
    """Invert rad-tan distortion by fixed-point iteration (OpenCV-style)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x_new = (xd[..., 0] - dx) / radial
        y_new = (xd[..., 1] - dy) / radial
        return jnp.stack([x_new, y_new], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


# ----------------------------------------------------------------------------
# Kannala-Brandt 8 (fisheye, equidistant model with theta-polynomial)
# r(theta) = theta + k1 theta^3 + k2 theta^5 + k3 theta^7 + k4 theta^9
# Reference: KannalaBrandt8::project (KannalaBrandt8.cpp:44-59),
# unproject via Newton (KannalaBrandt8.cpp:95-135).
# ----------------------------------------------------------------------------


def _kb8_theta_poly(k: jax.Array, theta: jax.Array) -> jax.Array:
    t2 = theta * theta
    return theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))


def kb8_project(params: jax.Array, xc: jax.Array) -> jax.Array:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    r = jnp.sqrt(x * x + y * y)
    r_safe = jnp.maximum(r, 1e-12)
    theta = jnp.arctan2(r, z)
    d = _kb8_theta_poly(k, theta)
    scale = d / r_safe
    # r -> 0 limit: d/r -> (z>0 ? 1/z-style pinhole limit) — use theta/r -> 1/z
    # approximation: for tiny r, d ~= theta ~= r/z so scale ~= 1/z.
    z_safe = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    scale = jnp.where(r < 1e-8, 1.0 / z_safe, scale)
    u = fx * x * scale + cx
    v = fy * y * scale + cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(params: jax.Array, uv: jax.Array, iters: int = 10) -> jax.Array:
    """Pixels -> z=1 rays via Newton inversion of the theta polynomial."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:8]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    d = jnp.sqrt(mx * mx + my * my)  # = r(theta)
    d_clip = jnp.minimum(d, jnp.asarray(jnp.pi / 2.0 * 1.5, uv.dtype))

    def newton(_, theta):
        t2 = theta * theta
        f = _kb8_theta_poly(k, theta) - d_clip
        fp = 1.0 + t2 * (3.0 * k[0] + t2 * (5.0 * k[1] + t2 * (7.0 * k[2] + 9.0 * t2 * k[3])))
        return theta - f / jnp.where(jnp.abs(fp) < 1e-9, jnp.ones_like(fp), fp)

    theta = jax.lax.fori_loop(0, iters, newton, d_clip)
    scale = jnp.where(d < 1e-9, jnp.ones_like(d), jnp.tan(theta) / jnp.maximum(d, 1e-12))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(params: jax.Array, xc: jax.Array) -> jax.Array:
    """d(uv)/d(xc) for KB8 via forward-mode autodiff (fuses fine under jit).

    The reference hand-derives this (KannalaBrandt8.cpp:300-350); jacfwd on
    the closed-form projection yields the same 2x3 and keeps one source of
    truth.
    """
    flat = xc.reshape(-1, 3)
    jac = jax.vmap(jax.jacfwd(lambda p: kb8_project(params, p)))(flat)
    return jac.reshape(xc.shape[:-1] + (2, 3))
