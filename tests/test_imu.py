"""IMU stack tests: preintegration vs dense f64 integration, covariance,
bias Jacobians, merge, state prediction, inertial-only init, chain walking.

Verifies the framework equivalents of the reference's `IMU::Preintegrated`
(/root/reference/src/ImuTypes.cc:106-390), `Tracking::PredictStateIMU`
(src/Tracking.cc:1863-1911), `InertialOptimization` (src/Optimizer.cc:3042)
and the `mPrevKF` temporal chain semantics — math the reference never unit
tests (it relies on dataset runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3_tpu.imu import preintegration as pre_k
from orbslam3_tpu.imu import init as imu_init
from orbslam3_tpu.opt import inertial as iopt
from orbslam3_tpu.utils.synth import simulate_imu

CALIB = pre_k.ImuCalib.create(noise_gyro=1.7e-4, noise_acc=2e-3)


def _preintegrate(traj, i, j, bias=np.zeros(6)):
    return pre_k.preintegrate(
        jnp.asarray(traj.acc[i:j], jnp.float32),
        jnp.asarray(traj.gyro[i:j], jnp.float32),
        jnp.asarray(traj.dt[i:j], jnp.float32),
        jnp.asarray(bias, jnp.float32),
        CALIB,
    )


class TestPreintegration:
    def test_matches_dense_f64_integration(self):
        traj = simulate_imu(duration=1.5, seed=1)
        p = _preintegrate(traj, 0, len(traj.dt))
        dR_gt, dV_gt, dP_gt, dT_gt = traj.gt_deltas(0, len(traj.dt))
        assert abs(float(p.dT) - dT_gt) < 1e-5
        # rotation: angle of dR_est^T dR_gt
        err_R = np.arccos(np.clip(
            (np.trace(np.asarray(p.dR).T @ dR_gt) - 1) / 2, -1, 1))
        assert err_R < 2e-3, err_R
        # 200 Hz piecewise-constant sampling leaves O(dt^2) discretization
        # error; require agreement to ~0.2% of the delta magnitude
        assert (np.linalg.norm(np.asarray(p.dV) - dV_gt)
                < 2e-3 * (1 + np.linalg.norm(dV_gt))), (p.dV, dV_gt)
        assert (np.linalg.norm(np.asarray(p.dP) - dP_gt)
                < 2e-3 * (1 + np.linalg.norm(dP_gt))), (p.dP, dP_gt)

    def test_covariance_psd_and_monotone(self):
        traj = simulate_imu(duration=1.0, seed=2)
        c_half = np.asarray(_preintegrate(traj, 0, 100).cov, np.float64)
        c_full = np.asarray(_preintegrate(traj, 0, 200).cov, np.float64)
        for c in (c_half, c_full):
            w = np.linalg.eigvalsh(0.5 * (c + c.T))
            assert w.min() > -1e-12 * max(w.max(), 1e-30)
        assert np.trace(c_full) > np.trace(c_half) > 0

    def test_bias_jacobians_first_order(self):
        traj = simulate_imu(duration=0.8, seed=3)
        n = len(traj.dt)
        p0 = _preintegrate(traj, 0, n, bias=np.zeros(6))
        db = np.array([2e-3, -1e-3, 1.5e-3, 8e-3, -6e-3, 4e-3])
        # reintegrated at the new bias = ground truth of the correction
        p1 = _preintegrate(traj, 0, n, bias=db)
        b = jnp.asarray(db, jnp.float32)
        dR_lin = np.asarray(pre_k.delta_rotation(p0, b))
        dV_lin = np.asarray(pre_k.delta_velocity(p0, b))
        dP_lin = np.asarray(pre_k.delta_position(p0, b))
        err_R = np.arccos(np.clip(
            (np.trace(dR_lin.T @ np.asarray(p1.dR)) - 1) / 2, -1, 1))
        assert err_R < 5e-5, err_R  # second-order in |db|
        assert np.linalg.norm(dV_lin - np.asarray(p1.dV)) < 2e-3
        assert np.linalg.norm(dP_lin - np.asarray(p1.dP)) < 2e-3

    def test_merge_equals_full_window(self):
        traj = simulate_imu(duration=1.0, seed=4)
        n = len(traj.dt)
        full = _preintegrate(traj, 0, n)
        a = _preintegrate(traj, 0, n // 2)
        b = _preintegrate(traj, n // 2, n)
        m = pre_k.merge(a, b)
        assert abs(float(m.dT) - float(full.dT)) < 1e-6
        np.testing.assert_allclose(np.asarray(m.dR), np.asarray(full.dR),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.dV), np.asarray(full.dV),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.dP), np.asarray(full.dP),
                                   atol=1e-4)
        # merged bias Jacobians stay first-order accurate
        db = np.full(6, 2e-3)
        pb = _preintegrate(traj, 0, n, bias=db)
        bj = jnp.asarray(db, jnp.float32)
        assert np.linalg.norm(
            np.asarray(pre_k.delta_position(m, bj)) - np.asarray(pb.dP)) < 5e-3

    def test_padding_invariance(self):
        traj = simulate_imu(duration=0.5, seed=5)
        n = len(traj.dt)
        p = _preintegrate(traj, 0, n)
        acc = np.concatenate([traj.acc[:n], np.zeros((32, 3))])
        gyr = np.concatenate([traj.gyro[:n], np.zeros((32, 3))])
        dts = np.concatenate([traj.dt[:n], np.zeros(32) - 1.0])
        pp = pre_k.preintegrate(
            jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(dts, jnp.float32), jnp.zeros(6, jnp.float32), CALIB)
        np.testing.assert_allclose(np.asarray(pp.dP), np.asarray(p.dP),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pp.cov), np.asarray(p.cov),
                                   atol=1e-12)

    def test_predict_state(self):
        traj = simulate_imu(duration=1.0, seed=6)
        n = len(traj.dt)
        p = _preintegrate(traj, 0, n)
        R2, p2, v2 = pre_k.predict_state(
            jnp.asarray(traj.R_wb[0], jnp.float32),
            jnp.asarray(traj.p_wb[0], jnp.float32),
            jnp.asarray(traj.v_wb[0], jnp.float32),
            p, jnp.zeros(6, jnp.float32))
        assert (np.linalg.norm(np.asarray(p2) - traj.p_wb[n])
                < 5e-3 * (1 + np.linalg.norm(traj.p_wb[n])))
        assert (np.linalg.norm(np.asarray(v2) - traj.v_wb[n])
                < 7e-3 * (1 + np.linalg.norm(traj.v_wb[n])))
        err_R = np.arccos(np.clip(
            (np.trace(np.asarray(R2).T @ traj.R_wb[n]) - 1) / 2, -1, 1))
        assert err_R < 2e-3


class TestInertialInit:
    def _make_problem(self, s_true=2.5, n_kf=11, kf_dt=0.5,
                      bias_g=(0.01, -0.02, 0.015), bias_a=(0.05, 0.08, -0.06),
                      seed=7):
        """Vision poses in a rotated, mis-scaled world + true-bias IMU."""
        from scipy.spatial.transform import Rotation as Rot
        traj = simulate_imu(duration=n_kf * kf_dt + 0.1, seed=seed,
                            gyro_bias=bias_g, acc_bias=bias_a)
        rate = 200
        step = int(kf_dt * rate)
        idx = [k * step for k in range(n_kf)]
        Rp = Rot.from_rotvec([0.3, -0.2, 0.9]).as_matrix()  # world perturb
        Rwb_vis = np.einsum("ij,njk->nik", Rp, traj.R_wb[idx])
        p_vis = (traj.p_wb[idx] @ Rp.T) / s_true
        pres = [_preintegrate(traj, idx[k], idx[k + 1])
                for k in range(n_kf - 1)]
        pairs = [(k, k + 1) for k in range(n_kf - 1)]
        edges = iopt.build_edges(pres, pairs)
        return traj, idx, Rp, Rwb_vis, p_vis, edges

    def test_recovers_scale_gravity_bias(self):
        s_true = 2.5
        bias_g = (0.01, -0.02, 0.015)
        traj, idx, Rp, Rwb_vis, p_vis, edges = self._make_problem(s_true)
        init = iopt.inertial_only_optimize(
            jnp.asarray(Rwb_vis, jnp.float32), jnp.asarray(p_vis, jnp.float32),
            edges, prior_gyro=1.0, prior_acc=1e3, n_iters=30)
        s = float(init.scale)
        assert abs(s - s_true) / s_true < 0.03, s
        # gravity direction: Rwg @ (0,0,-1) must match the vision-world
        # gravity Rp @ (0,0,-1)
        g_est = np.asarray(init.Rwg) @ np.array([0, 0, -1.0])
        g_true = Rp @ np.array([0, 0, -1.0])
        ang = np.arccos(np.clip(np.dot(g_est, g_true), -1, 1))
        assert ang < np.deg2rad(1.0), np.rad2deg(ang)
        assert np.linalg.norm(np.asarray(init.bias[:3]) - bias_g) < 5e-3
        # velocities: s * v_est = Rp @ v_true
        v_scaled = s * np.asarray(init.v)
        v_true = traj.v_wb[idx] @ Rp.T
        assert np.abs(v_scaled - v_true).max() < 0.1

    def test_fix_scale_mode(self):
        traj, idx, Rp, Rwb_vis, p_vis, edges = self._make_problem(s_true=1.0)
        init = iopt.inertial_only_optimize(
            jnp.asarray(Rwb_vis, jnp.float32), jnp.asarray(p_vis, jnp.float32),
            edges, prior_gyro=1.0, prior_acc=1e3, n_iters=30, fix_scale=True)
        assert float(init.scale) == 1.0
        g_est = np.asarray(init.Rwg) @ np.array([0, 0, -1.0])
        g_true = Rp @ np.array([0, 0, -1.0])
        assert np.arccos(np.clip(np.dot(g_est, g_true), -1, 1)) < np.deg2rad(1.5)


class TestMapIntegration:
    def _make_map(self, n_kf=11, kf_dt=0.5, s_true=2.5, seed=9):
        from scipy.spatial.transform import Rotation as Rot
        from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
        traj = simulate_imu(duration=n_kf * kf_dt + 0.1, seed=seed,
                            gyro_bias=(0.01, -0.02, 0.015),
                            acc_bias=(0.05, 0.08, -0.06))
        rate, step = 200, int(kf_dt * 200)
        idx = [k * step for k in range(n_kf)]
        Rp = Rot.from_rotvec([0.25, -0.15, 0.7]).as_matrix()
        m = MapState(MapConfig(max_keyframes=32, max_points=64,
                               features_per_frame=8))
        N = 8
        prev = -1
        for k in range(n_kf):
            R_wb = Rp @ traj.R_wb[idx[k]]
            p_wb = Rp @ traj.p_wb[idx[k]] / s_true
            R_cw = R_wb.T  # camera == body (Tbc = I)
            t_cw = -R_wb.T @ p_wb
            pre = (_preintegrate(traj, idx[k - 1], idx[k]) if k > 0 else None)
            prev = m.add_keyframe(
                R_cw.astype(np.float32), t_cw.astype(np.float32),
                traj.t[idx[k]], k, np.zeros((N, 2), np.float32),
                np.zeros(N, np.int32), np.zeros(N, np.float32),
                np.zeros((N, 8), np.uint32), np.zeros(N, bool),
                np.full(N, -1, np.int32), prev_kf=prev, preint=pre)
        return traj, idx, Rp, m, s_true

    def test_initialize_imu_regauges_map(self):
        traj, idx, Rp, m, s_true = self._make_map()
        calib = CALIB
        out = imu_init.initialize_imu(m, calib, prior_gyro=1.0, prior_acc=1e3,
                                      min_kfs=6)
        assert out is not None and m.imu_initialized
        ks = m.keyframe_ids()
        # after re-gauge: metric scale — camera center distances match truth
        c = -np.einsum("kji,kj->ki", m.kf_R[ks], m.kf_t[ks])
        d_est = np.linalg.norm(np.diff(c, axis=0), axis=1)
        d_true = np.linalg.norm(np.diff(traj.p_wb[idx], axis=0), axis=1)
        np.testing.assert_allclose(d_est, d_true, rtol=0.05, atol=5e-3)
        # gravity aligned: camera-z world positions should match truth up to
        # a yaw-only rotation about z => z components of centers match
        np.testing.assert_allclose(
            c[:, 2] - c[0, 2],
            traj.p_wb[idx][:, 2] - traj.p_wb[idx[0]][2],
            rtol=0.02, atol=0.05)

    def test_chain_with_preint_multilane(self):
        """Two interleaved lanes on one map: the chain must follow kf_prev
        links, never a global timestamp sort (ADVICE round-1 item 2)."""
        from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
        traj = simulate_imu(duration=3.0, seed=11)
        m = MapState(MapConfig(max_keyframes=32, max_points=64,
                               features_per_frame=4))
        N = 4
        zargs = (np.zeros((N, 2), np.float32), np.zeros(N, np.int32),
                 np.zeros(N, np.float32), np.zeros((N, 8), np.uint32),
                 np.zeros(N, bool), np.full(N, -1, np.int32))
        # lane A: KFs at t=0.0, 1.0, 2.0 ; lane B interleaved at 0.5, 1.5
        step = 200
        prev_a = m.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), 0.0, 0, *zargs)
        prev_b = m.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), 0.5, 1, *zargs)
        a1 = m.add_keyframe(np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32), 1.0, 2, *zargs,
                            prev_kf=prev_a,
                            preint=_preintegrate(traj, 0, step))
        b1 = m.add_keyframe(np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32), 1.5, 3, *zargs,
                            prev_kf=prev_b,
                            preint=_preintegrate(traj, step // 2,
                                                 step // 2 + step))
        a2 = m.add_keyframe(np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32), 2.0, 4, *zargs,
                            prev_kf=a1,
                            preint=_preintegrate(traj, step, 2 * step))
        kfs, pres = imu_init.chain_with_preint(m)
        assert kfs == [prev_a, a1, a2]  # lane A only, in order
        assert len(pres) == 2
        # each edge really spans its pair's interval (1.0 s here)
        for p in pres:
            assert abs(float(p.dT) - 1.0) < 1e-3

    def test_cull_merges_preintegration(self):
        """KeyFrameCulling must keep the inertial chain contiguous by merging
        the culled KF's preintegration into its successor (ADVICE item 1)."""
        traj, idx, Rp, m, s_true = self._make_map()
        from orbslam3_tpu.engine.local_mapping import LocalMapper
        from orbslam3_tpu.core.camera import Camera
        cam = Camera.pinhole(450.0, 450.0, 376.0, 240.0)
        lm = LocalMapper(cam, m, imu_calib=CALIB)
        m.iba_stage = 2
        ks = list(m.keyframe_ids())
        kf = ks[3]
        prev, nxt = ks[2], ks[4]
        # emulate the cull bookkeeping the engine performs
        pre_kf, pre_nxt = m.kf_pre[kf], m.kf_pre[nxt]
        merged = pre_k.merge(pre_kf, pre_nxt)
        m.kf_pre[nxt] = merged
        m.kf_prev[nxt] = prev
        m.remove_keyframe(kf)
        kfs, pres = imu_init.chain_with_preint(m)
        assert kf not in kfs
        # merged edge spans prev -> nxt (1.0 s), not 0.5 s
        i = kfs.index(nxt) - 1
        assert abs(float(pres[i].dT) - 1.0) < 1e-3
        # and the merged delta matches a direct preintegration of the union
        direct = _preintegrate(traj, idx[2], idx[4])
        np.testing.assert_allclose(np.asarray(merged.dP),
                                   np.asarray(direct.dP), atol=2e-3)
