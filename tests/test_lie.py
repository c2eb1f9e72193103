"""Unit tests for core/lie.py against scipy.spatial.transform references."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from orbslam3_tpu.core import lie

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=2.0):
    v = RNG.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    mags = RNG.uniform(0, scale, size=(n, 1))
    return (v * mags).astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        w = random_rotvecs(64)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angle(self):
        w = np.asarray([[1e-9, -1e-9, 1e-10], [0, 0, 0]], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)

    def test_log_roundtrip(self):
        w = random_rotvecs(64, scale=3.0)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
        np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_log_near_pi(self):
        # theta very close to pi: log must stay stable and return a valid log
        axes = RNG.normal(size=(32, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = axes * (np.pi - 1e-5)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
        R2 = Rotation.from_rotvec(np.asarray(w2, np.float64)).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-3)

    def test_right_jacobian_fd(self):
        # J_r: exp(w + dw) ~= exp(w) exp(J_r dw)
        w = random_rotvecs(16, scale=2.5).astype(np.float64)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        eps = 1e-6
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            Rp = Rotation.from_rotvec(w + dw).as_matrix()
            R0 = Rotation.from_rotvec(w).as_matrix()
            dlog = Rotation.from_matrix(
                np.einsum("nij,njk->nik", R0.transpose(0, 2, 1), Rp)
            ).as_rotvec() / eps
            np.testing.assert_allclose(Jr[:, :, k], dlog, atol=1e-4)

    def test_right_jacobian_inverse(self):
        w = random_rotvecs(32, scale=2.5)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        Jri = np.asarray(lie.so3_right_jacobian_inv(jnp.asarray(w)))
        prod = np.einsum("nij,njk->nik", Jr, Jri)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)

    def test_normalize(self):
        R = Rotation.from_rotvec(random_rotvecs(8)).as_matrix().astype(np.float32)
        noisy = R + RNG.normal(scale=1e-3, size=R.shape).astype(np.float32)
        Rn = np.asarray(lie.so3_normalize(jnp.asarray(noisy)))
        err = np.einsum("nij,nkj->nik", Rn, Rn) - np.eye(3)
        assert np.abs(err).max() < 1e-5
        assert np.allclose(np.linalg.det(Rn), 1.0, atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        w = random_rotvecs(128, scale=3.1)
        R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
        q = np.asarray(lie.quat_from_matrix(jnp.asarray(R)))
        q_ref = Rotation.from_matrix(R).as_quat()  # scalar-last, same convention
        # quaternions are sign-ambiguous
        dot = np.abs(np.sum(q * q_ref, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)
        R2 = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(scale=1.0, size=(64, 6)).astype(np.float32)
        # keep |phi| < pi so the log is the principal branch
        xi[:, 3:] = random_rotvecs(64, scale=3.0)
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=3e-4)

    def test_compose_inverse(self):
        xi = RNG.normal(scale=1.0, size=(16, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        xi = RNG.normal(scale=1.0, size=(8, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        p = RNG.normal(size=(8, 3)).astype(np.float32)
        out = np.asarray(lie.se3_apply(R, t, jnp.asarray(p)))
        T = np.asarray(lie.se3_matrix(R, t))
        hom = np.concatenate([p, np.ones((8, 1), np.float32)], axis=-1)
        ref = np.einsum("nij,nj->ni", T, hom)[:, :3]
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = RNG.normal(scale=0.8, size=(64, 7)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=5e-4)

    def test_compose_inverse(self):
        xi = RNG.normal(scale=0.8, size=(16, 7)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        si, Ri, ti = lie.sim3_inverse(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-4)

    def test_pure_scale(self):
        xi = np.zeros((4, 7), np.float32)
        xi[:, 6] = [0.5, -0.5, 1e-7, 0.0]
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(s), np.exp(xi[:, 6]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)

    def test_apply(self):
        xi = RNG.normal(scale=0.5, size=(8, 7)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        p = RNG.normal(size=(8, 3)).astype(np.float32)
        out = np.asarray(lie.sim3_apply(s, R, t, jnp.asarray(p)))
        ref = np.asarray(s)[:, None] * np.einsum("nij,nj->ni", np.asarray(R), p) + np.asarray(t)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_jit_and_vmap_compatible():
    """All ops must be jittable and vmappable (the framework contract)."""
    w = jnp.asarray(random_rotvecs(4))
    f = jax.jit(jax.vmap(lambda x: lie.so3_log(lie.so3_exp(x))))
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=2e-4)
