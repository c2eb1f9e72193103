"""Tests for triangulation, two-view init, pose GN, and bundle adjustment
against synthetic ground-truth scenes."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from orbslam3_tpu.core import lie
from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.opt.pose_gn import optimize_pose
from orbslam3_tpu.opt.ba import BAProblem, bundle_adjust
from orbslam3_tpu.vision.triangulate import triangulate_points, projection_matrix
from orbslam3_tpu.vision.twoview import reconstruct_two_views

RNG = np.random.default_rng(11)
CAM = Camera.pinhole(458.0, 457.0, 376.0, 240.0)


def make_scene(n_pts=200, depth=(4.0, 10.0), spread=4.0):
    pts = np.stack(
        [
            RNG.uniform(-spread, spread, n_pts),
            RNG.uniform(-spread * 0.6, spread * 0.6, n_pts),
            RNG.uniform(*depth, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    return pts


def pose(rotvec, trans):
    R = Rotation.from_rotvec(rotvec).as_matrix().astype(np.float32)
    return jnp.asarray(R), jnp.asarray(np.asarray(trans, np.float32))


class TestTriangulate:
    def test_exact(self):
        pts = make_scene(64)
        R2, t2 = pose([0.02, -0.3, 0.01], [1.0, 0.1, 0.0])
        P1 = projection_matrix(jnp.eye(3), jnp.zeros(3))
        P2 = projection_matrix(R2, t2)
        x1 = pts[:, :2] / pts[:, 2:3]
        pc2 = np.asarray(lie.se3_apply(R2, t2, jnp.asarray(pts)))
        x2 = pc2[:, :2] / pc2[:, 2:3]
        X, _ = triangulate_points(P1, P2, jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(np.asarray(X), pts, atol=1e-2)


class TestTwoView:
    def _run(self, rotvec, trans, noise_px=0.5, n_out=20):
        pts = make_scene(250)
        R2, t2 = pose(rotvec, trans)
        pc2 = np.asarray(lie.se3_apply(R2, t2, jnp.asarray(pts)))
        x1 = pts[:, :2] / pts[:, 2:3]
        x2 = pc2[:, :2] / pc2[:, 2:3]
        f = 458.0
        x1 += RNG.normal(scale=noise_px / f, size=x1.shape)
        x2 += RNG.normal(scale=noise_px / f, size=x2.shape)
        # outliers
        x2[:n_out] = RNG.uniform(-0.5, 0.5, (n_out, 2))
        mask = np.ones(len(pts), bool)
        res = reconstruct_two_views(
            jax.random.PRNGKey(0),
            jnp.asarray(x1, jnp.float32),
            jnp.asarray(x2, jnp.float32),
            jnp.asarray(mask),
            jnp.asarray((1.0 / f) ** 2, jnp.float32),
        )
        return res, np.asarray(R2), np.asarray(t2), pts

    def test_translation_dominant(self):
        res, R_gt, t_gt, pts = self._run([0.02, -0.05, 0.01], [1.0, 0.0, 0.1])
        assert bool(res.success)
        # rotation error
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 1.0, ang
        # translation direction (scale-free)
        t_est = np.asarray(res.t)
        cos = abs(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt)))
        assert cos > 0.995
        assert int(np.asarray(res.inliers).sum()) > 150
        # triangulated structure correct up to scale (excluding the injected
        # outlier matches — ones near their epipolar line can survive RANSAC,
        # as in the reference; downstream BA prunes them)
        X = np.asarray(res.points)
        inl = np.asarray(res.inliers).copy()
        inl[:20] = False
        scale = np.median(X[inl, 2] / pts[inl, 2])
        err = np.linalg.norm(X[inl] / scale - pts[inl], axis=-1)
        assert np.median(err) < 0.2 and (err < 1.0).all(), (np.median(err), err.max())

    def test_planar_scene_uses_homography(self):
        # points on a plane => H model must win and still reconstruct
        pts = make_scene(250)
        pts[:, 2] = 6.0 + 0.15 * pts[:, 0]  # nearly planar
        R2, t2 = pose([0.0, -0.04, 0.01], [0.8, 0.0, 0.05])
        pc2 = np.asarray(lie.se3_apply(R2, t2, jnp.asarray(pts)))
        x1 = pts[:, :2] / pts[:, 2:3]
        x2 = pc2[:, :2] / pc2[:, 2:3]
        f = 458.0
        x1 += RNG.normal(scale=0.4 / f, size=x1.shape)
        x2 += RNG.normal(scale=0.4 / f, size=x2.shape)
        res = reconstruct_two_views(
            jax.random.PRNGKey(1),
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            jnp.ones(len(pts), bool),
            jnp.asarray((1.0 / f) ** 2, jnp.float32),
        )
        assert bool(res.used_homography)
        assert bool(res.success)
        dR = np.asarray(res.R) @ np.asarray(R2).T
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 1.5, ang

    def test_pure_rotation_rejected(self):
        # no translation => no parallax => init must fail
        res, *_ = self._run([0.1, -0.2, 0.05], [0.0, 0.0, 0.0], noise_px=0.3, n_out=0)
        assert not bool(res.success)


class TestPoseGN:
    def test_converges_with_outliers(self):
        pts = make_scene(300)
        R_gt, t_gt = pose([0.1, -0.2, 0.05], [0.4, -0.2, 0.3])
        uv = np.array(CAM.project(lie.se3_apply(R_gt, t_gt, jnp.asarray(pts))))
        uv += RNG.normal(scale=0.5, size=uv.shape)
        uv[:40] += RNG.uniform(20, 80, (40, 2))  # gross outliers
        # perturbed init
        R0, t0 = pose([0.13, -0.17, 0.03], [0.5, -0.1, 0.2])
        R, t, inliers, n_in = optimize_pose(
            R0, t0, jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
            jnp.ones(len(pts), jnp.float32), jnp.ones(len(pts), bool), CAM,
        )
        dR = np.asarray(R) @ np.asarray(R_gt).T
        ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
        assert ang < 0.1, ang
        assert np.linalg.norm(np.asarray(t) - np.asarray(t_gt)) < 0.02
        assert int(n_in) > 230
        assert not np.asarray(inliers)[:40].all()  # outliers detected


class TestBA:
    def test_local_ba_reduces_error(self):
        n_kf, n_pts = 6, 150
        pts_gt = make_scene(n_pts)
        Rs, ts, uvs = [], [], []
        for k in range(n_kf):
            R, t = pose([0.01 * k, -0.02 * k, 0.0], [0.3 * k, 0.0, 0.0])
            Rs.append(np.asarray(R)); ts.append(np.asarray(t))
            uv = np.asarray(CAM.project(lie.se3_apply(R, t, jnp.asarray(pts_gt))))
            uvs.append(uv + RNG.normal(scale=0.4, size=uv.shape))
        kf_idx = np.repeat(np.arange(n_kf), n_pts).astype(np.int32)
        lm_idx = np.tile(np.arange(n_pts), n_kf).astype(np.int32)
        uv_all = np.concatenate(uvs).astype(np.float32)

        # perturb everything except the two gauge keyframes
        Rs_n, ts_n = [], []
        for k in range(n_kf):
            if k < 2:
                Rs_n.append(Rs[k]); ts_n.append(ts[k])
            else:
                dR = Rotation.from_rotvec(RNG.normal(scale=0.01, size=3)).as_matrix()
                Rs_n.append((dR @ Rs[k]).astype(np.float32))
                ts_n.append(ts[k] + RNG.normal(scale=0.05, size=3).astype(np.float32))
        pts_n = pts_gt + RNG.normal(scale=0.08, size=pts_gt.shape).astype(np.float32)

        prob = BAProblem(
            R=jnp.asarray(np.stack(Rs_n)), t=jnp.asarray(np.stack(ts_n)),
            points=jnp.asarray(pts_n),
            kf_idx=jnp.asarray(kf_idx), lm_idx=jnp.asarray(lm_idx),
            uv=jnp.asarray(uv_all),
            info=jnp.ones(len(uv_all), jnp.float32),
            valid=jnp.ones(len(uv_all), bool),
            fixed_kf=jnp.asarray([True, True] + [False] * (n_kf - 2)),
            fixed_lm=jnp.zeros(n_pts, bool),
        )
        out, costs, _ = bundle_adjust(prob, CAM, n_iters=12)
        # pose error after
        err_t = [np.linalg.norm(np.asarray(out.t[k]) - ts[k]) for k in range(2, n_kf)]
        err_t0 = [np.linalg.norm(ts_n[k] - ts[k]) for k in range(2, n_kf)]
        assert np.mean(err_t) < 0.2 * np.mean(err_t0), (err_t, err_t0)
        err_p = np.linalg.norm(np.asarray(out.points) - pts_gt, axis=-1).mean()
        err_p0 = np.linalg.norm(pts_n - pts_gt, axis=-1).mean()
        assert err_p < 0.3 * err_p0
        # final reprojection RMS ~ noise level
        xc = np.asarray(lie.se3_apply(out.R[kf_idx], out.t[kf_idx], out.points[lm_idx]))
        uv_pred = np.asarray(CAM.project(jnp.asarray(xc)))
        rms = np.sqrt(np.mean(np.sum((uv_pred - uv_all) ** 2, -1)))
        assert rms < 1.0, rms

    def test_fixed_kf_unchanged(self):
        # gauge KFs must not move
        n_pts = 50
        pts_gt = make_scene(n_pts)
        R0, t0 = pose([0, 0, 0], [0, 0, 0])
        R1, t1 = pose([0.0, -0.05, 0.0], [0.5, 0, 0])
        uv0 = np.asarray(CAM.project(lie.se3_apply(R0, t0, jnp.asarray(pts_gt))))
        uv1 = np.asarray(CAM.project(lie.se3_apply(R1, t1, jnp.asarray(pts_gt))))
        prob = BAProblem(
            R=jnp.stack([R0, R1]), t=jnp.stack([t0, t1]),
            points=jnp.asarray(pts_gt + RNG.normal(scale=0.05, size=pts_gt.shape).astype(np.float32)),
            kf_idx=jnp.asarray(np.repeat([0, 1], n_pts), jnp.int32),
            lm_idx=jnp.asarray(np.tile(np.arange(n_pts), 2), jnp.int32),
            uv=jnp.asarray(np.concatenate([uv0, uv1]), jnp.float32),
            info=jnp.ones(2 * n_pts, jnp.float32),
            valid=jnp.ones(2 * n_pts, bool),
            fixed_kf=jnp.asarray([True, False]),
            fixed_lm=jnp.zeros(n_pts, bool),
        )
        out, _, _ = bundle_adjust(prob, CAM, n_iters=8)
        np.testing.assert_array_equal(np.asarray(out.R[0]), np.asarray(R0))
        np.testing.assert_array_equal(np.asarray(out.t[0]), np.asarray(t0))
