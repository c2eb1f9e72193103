"""Debug harness: run the synthetic e2e SLAM loop with verbose per-frame logs."""

import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig, TrackingState
from orbslam3_tpu.evaluation import ate_rmse
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)

world = synth.make_world(n_points=3000, seed=4)
R_gt, t_gt = synth.orbit_trajectory(n_frames=80, radius=3.0, arc=1.0)
ts = np.arange(len(R_gt)) * 0.05

m = MapState(MapConfig(max_keyframes=64, max_points=8192, features_per_frame=600))
mapper = LocalMapper(CAM, m)
tracker = Tracker(CAM, m, TrackerConfig(n_features=600), local_mapper=mapper)
tracker.debug = True

poses = []
for i in range(len(R_gt)):
    feats, gt_ids = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                          capacity=600, seed=100 + i)
    out = tracker.process_features(feats, float(ts[i]))
    poses.append(out)
    print(f"frame {i:3d} state={tracker.state.name:15s} inliers={tracker.n_inliers:4d} "
          f"KFs={m.n_keyframes:3d} MPs={m.n_points:5d} ref_kf={tracker.ref_kf}")
    if tracker.state == TrackingState.LOST:
        break

est_ts, est_centers = tracker.export_trajectory()
if len(est_ts) > 10:
    lut = {round(float(t), 6): i for i, t in enumerate(ts)}
    gt_centers = np.asarray([
        -R_gt[lut[round(float(t), 6)]].T @ t_gt[lut[round(float(t), 6)]]
        for t in est_ts])
    print("ATE:", ate_rmse(est_centers, gt_centers, with_scale=True))
