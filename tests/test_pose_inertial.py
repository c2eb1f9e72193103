"""VI pose-only tracking optimization tests (reference
PoseInertialOptimizationLastKeyFrame/LastFrame + Marginalize,
Optimizer.cc:4491/4875/2960)."""

import numpy as np
import pytest
import jax.numpy as jnp

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.imu.preintegration import ImuCalib, preintegrate
from orbslam3_tpu.opt.pose_inertial import (BodyState, PoseImuPrior,
                                            optimize_pose_inertial)
from orbslam3_tpu.utils.synth import simulate_imu

CAM = Camera.pinhole(400.0, 400.0, 320.0, 240.0, width=640, height=480)
RNG = np.random.default_rng(3)


def _make_case(i, j, traj, n_pts=200, uv_noise=0.3, n_out=12):
    """World points seen at sample j (body==camera frame, Tbc=I)."""
    Rj = traj.R_wb[j]
    pj = traj.p_wb[j]
    # points in front of the camera at frame j
    xc = np.stack([RNG.uniform(-2, 2, n_pts), RNG.uniform(-1.5, 1.5, n_pts),
                   RNG.uniform(3, 9, n_pts)], -1)
    pts = xc @ Rj.T + pj  # world (camera == body)
    uv = np.asarray(CAM.project(jnp.asarray(xc)))
    uv = uv + RNG.normal(0, uv_noise, uv.shape)
    uv[:n_out] += RNG.uniform(12, 40, (n_out, 2))  # gross outliers
    info = np.ones(n_pts, np.float32)
    valid = np.ones(n_pts, bool)
    return pts.astype(np.float32), uv.astype(np.float32), info, valid


@pytest.fixture(scope="module")
def setup():
    calib = ImuCalib.create()
    traj = simulate_imu(duration=1.0, rate=200.0, seed=7)
    return calib, traj


def _pre_between(traj, i, j, calib):
    bias = jnp.zeros(6, jnp.float32)
    return preintegrate(jnp.asarray(traj.acc[i:j], jnp.float32),
                        jnp.asarray(traj.gyro[i:j], jnp.float32),
                        jnp.asarray(traj.dt[i:j], jnp.float32), bias, calib)


def test_last_keyframe_recovers_pose(setup):
    calib, traj = setup
    i, j = 60, 100
    pre = _pre_between(traj, i, j, calib)
    pts, uv, info, valid = _make_case(i, j, traj)
    anchor = BodyState(jnp.asarray(traj.R_wb[i], jnp.float32),
                       jnp.asarray(traj.p_wb[i], jnp.float32),
                       jnp.asarray(traj.v_wb[i], jnp.float32),
                       jnp.zeros(6, jnp.float32))
    # perturbed initial guess of the current state
    from orbslam3_tpu.core import lie
    dR = np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.02, 0.04])))
    cur0 = BodyState(jnp.asarray(traj.R_wb[j] @ dR, jnp.float32),
                     jnp.asarray(traj.p_wb[j] + [0.08, -0.05, 0.06],
                                 jnp.float32),
                     jnp.asarray(traj.v_wb[j] + [0.2, -0.1, 0.15],
                                 jnp.float32),
                     jnp.zeros(6, jnp.float32))
    out, inliers, n_in, prior = optimize_pose_inertial(
        anchor, cur0, pre, calib, pts, uv, info, valid, CAM,
        anchor_fixed=True)
    R_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(out.Rwb).T @ traj.R_wb[j]) - 1) / 2, -1, 1)))
    p_err = np.linalg.norm(np.asarray(out.p) - traj.p_wb[j])
    v_err = np.linalg.norm(np.asarray(out.v) - traj.v_wb[j])
    assert R_err < 0.2, R_err
    assert p_err < 0.02, p_err
    assert v_err < 0.15, v_err
    assert n_in > 150  # outliers rejected, inliers kept
    assert not np.asarray(inliers)[:5].any()  # gross outliers flagged


def test_last_frame_with_prior_chain(setup):
    """Marginalization chain: optimize j1 against KF, then j2 against j1
    using the produced prior; both must stay near GT."""
    calib, traj = setup
    k, j1, j2 = 40, 80, 120
    pre1 = _pre_between(traj, k, j1, calib)
    pre2 = _pre_between(traj, j1, j2, calib)
    kf = BodyState(jnp.asarray(traj.R_wb[k], jnp.float32),
                   jnp.asarray(traj.p_wb[k], jnp.float32),
                   jnp.asarray(traj.v_wb[k], jnp.float32),
                   jnp.zeros(6, jnp.float32))
    pts1, uv1, info1, valid1 = _make_case(k, j1, traj)
    cur1 = BodyState(jnp.asarray(traj.R_wb[j1], jnp.float32),
                     jnp.asarray(traj.p_wb[j1] + [0.05, 0, -0.04],
                                 jnp.float32),
                     jnp.asarray(traj.v_wb[j1], jnp.float32),
                     jnp.zeros(6, jnp.float32))
    out1, _, n1, prior1 = optimize_pose_inertial(
        kf, cur1, pre1, calib, pts1, uv1, info1, valid1, CAM,
        anchor_fixed=True)
    assert np.linalg.norm(np.asarray(out1.p) - traj.p_wb[j1]) < 0.02

    pts2, uv2, info2, valid2 = _make_case(j1, j2, traj)
    cur2 = BodyState(jnp.asarray(traj.R_wb[j2], jnp.float32),
                     jnp.asarray(traj.p_wb[j2] + [-0.06, 0.04, 0.05],
                                 jnp.float32),
                     jnp.asarray(traj.v_wb[j2] + [0.1, 0, -0.1], jnp.float32),
                     jnp.zeros(6, jnp.float32))
    out2, _, n2, prior2 = optimize_pose_inertial(
        out1, cur2, pre2, calib, pts2, uv2, info2, valid2, CAM,
        prior=prior1, anchor_fixed=False)
    p_err = np.linalg.norm(np.asarray(out2.p) - traj.p_wb[j2])
    v_err = np.linalg.norm(np.asarray(out2.v) - traj.v_wb[j2])
    assert p_err < 0.03, p_err
    assert v_err < 0.2, v_err
    # the new prior's information must be positive semidefinite and usable
    ev = np.linalg.eigvalsh(np.asarray(prior2.H))
    assert ev.min() > -1e-2 * max(ev.max(), 1.0)


def test_inertial_residual_zero_at_gt(setup):
    """Preintegration residual vanishes on the exact trajectory."""
    calib, traj = setup
    i, j = 10, 50
    pre = _pre_between(traj, i, j, calib)
    from orbslam3_tpu.opt.pose_inertial import _inertial_residual
    from orbslam3_tpu.opt.inertial import whiten_from_cov
    si = BodyState(jnp.asarray(traj.R_wb[i], jnp.float32),
                   jnp.asarray(traj.p_wb[i], jnp.float32),
                   jnp.asarray(traj.v_wb[i], jnp.float32),
                   jnp.zeros(6, jnp.float32))
    sj = BodyState(jnp.asarray(traj.R_wb[j], jnp.float32),
                   jnp.asarray(traj.p_wb[j], jnp.float32),
                   jnp.asarray(traj.v_wb[j], jnp.float32),
                   jnp.zeros(6, jnp.float32))
    W = jnp.eye(9, dtype=jnp.float32)  # unwhitened residual magnitude
    r = _inertial_residual(si, sj, pre.dR, pre.dV, pre.dP, pre.JRg, pre.JVg,
                           pre.JVa, pre.JPg, pre.JPa, pre.bias, pre.dT, W)
    assert np.abs(np.asarray(r)).max() < 5e-3, np.asarray(r)
