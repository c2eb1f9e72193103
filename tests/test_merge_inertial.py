"""MergeInertialBA: the seam-windowed VI welding BA (VERDICT r3 next #4).

Reference: `Optimizer::MergeInertialBA` (/root/reference/src/Optimizer.cc:3948)
called from `LoopClosing::MergeLocal2` (LoopClosing.cc:1787+) — after an
inertial weld, TWO temporal windows (current-map chain + welded-map chain),
each with its own preintegration factors, are optimized jointly against the
fused seam landmarks.

The test constructs a post-weld map shape directly: two kf_prev chains over
one simulated IMU trajectory, shared landmarks, perturbed second chain —
and asserts the seam BA (a) actually uses inertial residuals on BOTH chains,
(b) pulls the perturbed chain back to ground truth, (c) preserves metric
scale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.imu import init as imu_init
from orbslam3_tpu.imu.preintegration import ImuCalib, preintegrate
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils.synth import simulate_imu

RNG = np.random.default_rng(31)
CAM = Camera.pinhole(400.0, 400.0, 320.0, 240.0, width=640, height=480)
N_FEAT = 128


def _build_two_chain_map(perturb=0.05):
    """One IMU trajectory, two temporal chains (as after Atlas.weld):
    chain A = samples 0..100, chain B = samples 120..220."""
    calib = ImuCalib.create()
    traj = simulate_imu(duration=1.5, rate=200.0, seed=13)
    m = MapState(MapConfig(64, 4096, N_FEAT))

    # landmarks in front of the mid-trajectory camera
    mid = 110
    Rm, pm = traj.R_wb[mid], traj.p_wb[mid]
    xc = np.stack([RNG.uniform(-2, 2, 256), RNG.uniform(-1.5, 1.5, 256),
                   RNG.uniform(4, 10, 256)], -1)
    pts_w = (xc @ Rm.T + pm).astype(np.float32)
    desc = RNG.integers(0, 2 ** 32, (256, 8), dtype=np.uint32)
    mp_ids = m.add_points(pts_w, desc, first_kf=0)

    def add_chain(samples, prev=-1):
        slots = []
        for si, s in enumerate(samples):
            R_wb, p = traj.R_wb[s], traj.p_wb[s]
            R_cw = R_wb.T.astype(np.float32)       # body == camera (Tbc=I)
            t_cw = (-R_cw @ p).astype(np.float32)
            xc_s = pts_w @ R_cw.T + t_cw
            uv = np.asarray(CAM.project(jnp.asarray(xc_s)))
            vis = ((xc_s[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640)
                   & (uv[:, 1] > 0) & (uv[:, 1] < 480))
            sel = np.nonzero(vis)[0][:N_FEAT]
            obs = np.full(N_FEAT, -1, np.int32)
            obs[:len(sel)] = mp_ids[sel]
            kf_uv = np.zeros((N_FEAT, 2), np.float32)
            kf_uv[:len(sel)] = uv[sel] + RNG.normal(0, 0.2, (len(sel), 2))
            pre = None
            if prev >= 0:
                p0 = samples[si - 1]
                pre = preintegrate(
                    jnp.asarray(traj.acc[p0:s], jnp.float32),
                    jnp.asarray(traj.gyro[p0:s], jnp.float32),
                    jnp.asarray(traj.dt[p0:s], jnp.float32),
                    jnp.zeros(6, jnp.float32), calib)
            k = m.add_keyframe(
                R_cw, t_cw, float(s) / 200.0, s,
                kf_uv, np.zeros(N_FEAT, np.int32),
                np.zeros(N_FEAT, np.float32), desc[:N_FEAT],
                obs >= 0, obs, prev_kf=prev,
                vel=traj.v_wb[s].astype(np.float32),
                preint=pre)
            prev = k
            slots.append(k)
        return slots

    chain_a = add_chain(list(range(0, 101, 20)))           # 6 KFs
    chain_b = add_chain(list(range(120, 221, 20)))         # 6 KFs, new chain
    # perturb chain B (the "welded" half) except its border
    for k in chain_b[1:]:
        m.kf_t[k] += RNG.normal(0, perturb, 3).astype(np.float32)
        m.kf_vel[k] += RNG.normal(0, 2 * perturb, 3).astype(np.float32)
    return m, calib, traj, chain_a, chain_b


def _chain_pos_err(m, traj, slots):
    errs = []
    for k in slots:
        c = -m.kf_R[k].T @ m.kf_t[k]
        errs.append(np.linalg.norm(c - traj.p_wb[int(m.kf_frame_id[k])]))
    return float(np.mean(errs))


def test_merge_inertial_ba_pulls_seam_together():
    m, calib, traj, ca, cb = _build_two_chain_map(perturb=0.05)
    err_before = _chain_pos_err(m, traj, cb)
    out = imu_init.merge_inertial_ba(m, calib, CAM, cur_kf=cb[-1],
                                     merge_kf=ca[-1], window=5)
    assert out is not None, "seam BA must find inertial chains on both sides"
    err_after = _chain_pos_err(m, traj, cb)
    assert err_after < 0.4 * err_before, (
        f"seam BA did not converge: {err_before:.4f} -> {err_after:.4f}")
    # metric scale survives: KF-to-KF distances match ground truth
    c0 = -m.kf_R[cb[0]].T @ m.kf_t[cb[0]]
    c1 = -m.kf_R[cb[-1]].T @ m.kf_t[cb[-1]]
    d_est = np.linalg.norm(c1 - c0)
    d_gt = np.linalg.norm(traj.p_wb[int(m.kf_frame_id[cb[-1]])]
                          - traj.p_wb[int(m.kf_frame_id[cb[0]])])
    assert abs(d_est / d_gt - 1.0) < 0.03


def test_merge_inertial_ba_uses_both_chains():
    """Both windows must contribute inertial edges (the r3 failure mode was
    zero inertial residuals on the welded half)."""
    m, calib, traj, ca, cb = _build_two_chain_map(perturb=0.0)
    chains = []
    for root in (cb[-1], ca[-1]):
        kfs, pres = imu_init._window_back(m, root, 5)
        chains.append((kfs, pres))
    assert len(chains[0][1]) == 5 and len(chains[1][1]) == 5
    assert set(chains[0][0]).isdisjoint(chains[1][0])


def test_merge_falls_back_on_overlapping_windows():
    """cur and merge roots on the SAME chain -> single-chain solve, not a
    double-counted one."""
    m, calib, traj, ca, cb = _build_two_chain_map(perturb=0.02)
    out = imu_init.merge_inertial_ba(m, calib, CAM, cur_kf=cb[-1],
                                     merge_kf=cb[-2], window=5)
    assert out is not None
