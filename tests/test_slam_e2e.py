"""End-to-end monocular SLAM on a synthetic sequence: init -> track -> map ->
local BA -> trajectory ATE. The framework's equivalent of the reference's
dataset example binaries (SURVEY.md section 4)."""

import numpy as np
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig, TrackingState
from orbslam3_tpu.evaluation import ate_rmse, umeyama_alignment
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)


@pytest.fixture(scope="module")
def slam_run():
    world = synth.make_world(n_points=3000, seed=4)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=80, radius=3.0, arc=1.0)
    ts = np.arange(len(R_gt)) * 0.05

    m = MapState(MapConfig(max_keyframes=64, max_points=8192,
                           features_per_frame=600))
    mapper = LocalMapper(CAM, m)
    tracker = Tracker(CAM, m, TrackerConfig(n_features=600), local_mapper=mapper)

    poses = []
    for i in range(len(R_gt)):
        feats, _ = synth.render_features(
            world, R_gt[i], t_gt[i], CAM, capacity=600, seed=100 + i
        )
        out = tracker.process_features(feats, float(ts[i]))
        poses.append(out)
    return world, R_gt, t_gt, ts, m, tracker, poses


def test_initializes_and_tracks(slam_run):
    _, R_gt, t_gt, ts, m, tracker, poses = slam_run
    assert tracker.state == TrackingState.OK
    n_tracked = sum(p is not None for p in poses)
    assert n_tracked > 60, n_tracked
    assert m.n_keyframes >= 5
    assert m.n_points > 300


def test_trajectory_ate(slam_run):
    _, R_gt, t_gt, ts, m, tracker, poses = slam_run
    est_ts, est_centers = tracker.export_trajectory()
    # ground-truth centers for the frames we tracked
    lut = {round(float(t), 6): i for i, t in enumerate(ts)}
    gt_centers = []
    keep = []
    for j, t in enumerate(est_ts):
        i = lut[round(float(t), 6)]
        gt_centers.append(-R_gt[i].T @ t_gt[i])
        keep.append(j)
    gt_centers = np.asarray(gt_centers)
    est = est_centers[keep]
    ate = ate_rmse(est, gt_centers, with_scale=True)
    # trajectory span is ~3 m; sub-2% ATE expected from feature-level sim
    assert ate < 0.06, ate


def test_map_structure_consistent(slam_run):
    world, R_gt, t_gt, ts, m, tracker, poses = slam_run
    # map points should align to GT landmarks under the same similarity that
    # aligns the trajectory
    est_ts, est_centers = tracker.export_trajectory()
    lut = {round(float(t), 6): i for i, t in enumerate(ts)}
    gt_centers = np.asarray(
        [-R_gt[lut[round(float(t), 6)]].T @ t_gt[lut[round(float(t), 6)]] for t in est_ts]
    )
    s, R, tr = umeyama_alignment(est_centers, gt_centers, with_scale=True)

    # each map point was created from GT landmarks; verify reprojection
    # residuals in the map are small
    ids = np.nonzero(m.mp_valid)[0]
    kfs = m.keyframe_ids()
    kk, slots, mm = m.observations_of(ids)
    import jax.numpy as jnp
    from orbslam3_tpu.core import lie as lie_mod
    xc = np.einsum("oij,oj->oi", m.kf_R[kk], m.mp_pos[mm]) + m.kf_t[kk]
    uv_pred = np.asarray(CAM.project(jnp.asarray(xc)))
    err = np.linalg.norm(uv_pred - m.kf_uv[kk, slots], axis=-1)
    assert np.median(err) < 1.0, np.median(err)


def test_observation_graph_valid(slam_run):
    *_, m, tracker, poses = slam_run
    obs = m.kf_obs_mp[m.kf_valid]
    referenced = obs[obs >= 0]
    assert m.mp_valid[referenced].all()  # no dangling observations
