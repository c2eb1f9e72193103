"""Instrumented replica of tests/test_soak.py to root-cause the LOST ending.

Logs per-frame state transitions, inlier counts, KF insert/cull activity and
map occupancy around any tracking degradation.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig, TrackingState
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
world = synth.make_world(n_points=4000, seed=11, min_center_dist=5.5)
R_gt, t_gt = synth.orbit_trajectory(
    n_frames=n_frames, radius=3.0, arc=6.0 * np.pi * (n_frames / 3000.0))
ts = np.arange(n_frames) * 0.05

m = MapState(MapConfig(max_keyframes=16, max_points=2048,
                       features_per_frame=500))
mapper = LocalMapper(CAM, m)
tracker = Tracker(CAM, m, TrackerConfig(n_features=500),
                  local_mapper=mapper)

last_state = tracker.state
last_uid = 0
for i in range(n_frames):
    feats, _ = synth.render_features(
        world, R_gt[i], t_gt[i], CAM, capacity=500, seed=10_000 + i)
    out = tracker.process_features(feats, float(ts[i]))
    st = tracker.state
    if st != last_state:
        print(f"[{i}] state {last_state.name} -> {st.name} "
              f"n_in={tracker.n_inliers} live_kf={m.n_keyframes} "
              f"live_mp={int(m.mp_valid.sum())} ref={tracker.ref_kf}")
        last_state = st
    if st in (TrackingState.RECENTLY_LOST, TrackingState.LOST):
        if tracker._lost_count <= 3 or tracker._lost_count % 5 == 0:
            tracker.debug = True
        else:
            tracker.debug = False
    else:
        tracker.debug = False
    if i % 200 == 0:
        print(f"[{i}] {st.name} n_in={tracker.n_inliers} "
              f"kf_live={m.n_keyframes} uid={m._next_uid} "
              f"mp_live={int(m.mp_valid.sum())}")
    if st == TrackingState.LOST:
        print(f"LOST at frame {i}; created {m._next_uid} KFs")
        break
print("final:", tracker.state.name, "kf_live", m.n_keyframes,
      "created", m._next_uid)
for e in m.events[-10:]:
    print("event:", e)
