"""Unit tests for core/camera.py, cross-checked against OpenCV."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from orbslam3_tpu.core.camera import Camera

RNG = np.random.default_rng(1)

# EuRoC cam0 intrinsics (same values as the reference's EuRoC.yaml)
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375
DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0)
# TUM-VI 512 fisheye intrinsics (reference TUM-VI.yaml ballpark)
KB = dict(fx=190.97847715128717, fy=190.9733070521226,
          cx=254.93170605935475, cy=256.8974428996504,
          k1=0.0034823894022493434, k2=0.0007150348452162257,
          k3=-0.0020532361418706202, k4=0.00020293673591811182)


def sample_points(n=256):
    x = RNG.uniform(-1.5, 1.5, size=(n,))
    y = RNG.uniform(-1.0, 1.0, size=(n,))
    z = RNG.uniform(0.5, 6.0, size=(n,))
    return np.stack([x * z / 3, y * z / 3, z], axis=-1).astype(np.float32)


class TestPinhole:
    cam = Camera.pinhole(FX, FY, CX, CY, DIST)

    def test_project_unproject_roundtrip(self):
        pts = sample_points()
        uv = np.asarray(self.cam.project(jnp.asarray(pts)))
        rays = np.asarray(self.cam.unproject(jnp.asarray(uv)))
        np.testing.assert_allclose(rays, pts / pts[:, 2:3], atol=1e-4)

    def test_project_matches_opencv(self):
        pts = sample_points(64).astype(np.float64)
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
        # ideal projection (no distortion), OpenCV with zero dist
        uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, np.zeros(5))
        uv = np.asarray(self.cam.project(jnp.asarray(pts, jnp.float32)))
        np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=1e-2)

    def test_distort_matches_opencv(self):
        pts = sample_points(64).astype(np.float64)
        K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]])
        d = np.asarray(DIST[:4])
        uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, d)
        ideal = np.asarray(self.cam.project(jnp.asarray(pts, jnp.float32)))
        uv = np.asarray(self.cam.distort_points(jnp.asarray(ideal)))
        np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=0.05)

    def test_undistort_matches_opencv(self):
        # distort ideal pixels, then undo; compare with cv2.undistortPoints
        pts = sample_points(64)
        ideal = np.asarray(self.cam.project(jnp.asarray(pts)))
        dist_px = np.asarray(self.cam.distort_points(jnp.asarray(ideal)))
        undist = np.asarray(self.cam.undistort_points(jnp.asarray(dist_px)))
        np.testing.assert_allclose(undist, ideal, atol=0.05)

    def test_jacobian_fd(self):
        pts = sample_points(32)
        J = np.asarray(self.cam.project_jac(jnp.asarray(pts)))
        J_ad = np.asarray(
            jax.vmap(jax.jacfwd(lambda p: self.cam.project(p)))(jnp.asarray(pts))
        )
        np.testing.assert_allclose(J, J_ad, atol=1e-3)


class TestKB8:
    cam = Camera.kb8(**KB, width=512, height=512)

    def test_project_matches_opencv_fisheye(self):
        pts = sample_points(64).astype(np.float64)
        K = np.array([[KB["fx"], 0, KB["cx"]], [0, KB["fy"], KB["cy"]], [0, 0, 1]])
        D = np.array([KB["k1"], KB["k2"], KB["k3"], KB["k4"]])
        uv_cv, _ = cv2.fisheye.projectPoints(
            pts.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, D
        )
        uv = np.asarray(self.cam.project(jnp.asarray(pts, jnp.float32)))
        np.testing.assert_allclose(uv, uv_cv[:, 0, :], atol=0.05)

    def test_unproject_roundtrip(self):
        pts = sample_points(128)
        uv = np.asarray(self.cam.project(jnp.asarray(pts)))
        rays = np.asarray(self.cam.unproject(jnp.asarray(uv)))
        np.testing.assert_allclose(rays, pts / pts[:, 2:3], atol=2e-3)

    def test_wide_angle(self):
        # fisheye handles >90deg off-axis points (z near 0)
        pts = np.array([[1.0, 0.0, 0.1], [0.0, 1.0, 0.05]], np.float32)
        uv = np.asarray(self.cam.project(jnp.asarray(pts)))
        assert np.isfinite(uv).all()
        rays = np.asarray(self.cam.unproject(jnp.asarray(uv)))
        ref = pts / pts[:, 2:3]
        np.testing.assert_allclose(rays, ref, rtol=2e-2)

    def test_jacobian_fd(self):
        pts = sample_points(16)
        J = np.asarray(self.cam.project_jac(jnp.asarray(pts)))
        eps = 1e-3
        for k in range(3):
            dp = np.zeros(3, np.float32)
            dp[k] = eps
            up = np.asarray(self.cam.project(jnp.asarray(pts + dp)))
            um = np.asarray(self.cam.project(jnp.asarray(pts - dp)))
            fd = (up - um) / (2 * eps)
            np.testing.assert_allclose(J[:, :, k], fd, atol=5e-2)


def test_camera_is_pytree():
    cam = Camera.pinhole(FX, FY, CX, CY)
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 1  # params only; kind/width/height static

    @jax.jit
    def f(c, p):
        return c.project(p)

    out = f(cam, jnp.ones((4, 3)))
    assert out.shape == (4, 2)
