"""Instrument new-point creation + new-point survival in the soak.

Runs the soak prefix; every keyframe insertion reports triangulation gate
counts (monkeypatched mapper), and a cohort of newly created points is
tracked for found/visible survival.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine import local_mapping as LM
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth
from orbslam3_tpu.kernels import orb_descriptor as desc_k
from orbslam3_tpu.vision import matcher

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
n_run = int(sys.argv[1]) if len(sys.argv) > 1 else 320

world = synth.make_world(n_points=4000, seed=11, min_center_dist=5.5)
R_gt, t_gt = synth.orbit_trajectory(n_frames=3000, radius=3.0, arc=6.0 * np.pi)
ts = np.arange(3000) * 0.05
m = MapState(MapConfig(max_keyframes=16, max_points=2048,
                       features_per_frame=500))
mapper = LocalMapper(CAM, m)
tr = Tracker(CAM, m, TrackerConfig(n_features=500), local_mapper=mapper)

orig_create = mapper._create_new_map_points
stats = {"kf": 0}


def create_instrumented(k):
    mp_before = int(m.mp_valid.sum())
    avail = int((m.kf_feat_valid[k] & (m.kf_obs_mp[k] < 0)).sum())
    neighbors = m.covisibility(k, min_shared=10)[:mapper.cfg.triangulate_neighbors]
    bases = []
    for nb in neighbors:
        b = np.linalg.norm(-m.kf_R[nb].T @ m.kf_t[nb]
                           - (-m.kf_R[k].T @ m.kf_t[k]))
        bases.append(round(float(b), 3))
    md = mapper._median_depth(k)
    orig_create(k)
    mp_after = int(m.mp_valid.sum())
    stats["kf"] += 1
    if stats["kf"] % 5 == 0 or mp_after - mp_before < 10:
        print(f"  KF{k} avail={avail} nb={len(neighbors)} bases={bases} "
              f"med_depth={md:.2f} new_pts={mp_after - mp_before}")


mapper._create_new_map_points = create_instrumented

cull_counts = {"mp": 0}
orig_cull = mapper._cull_map_points


def cull_instrumented():
    before = int(m.mp_valid.sum())
    orig_cull()
    cull_counts["mp"] += before - int(m.mp_valid.sum())


mapper._cull_map_points = cull_instrumented

last_report = 0
for i in range(n_run):
    feats, gt_ids = synth.render_features(
        world, R_gt[i], t_gt[i], CAM, capacity=500, seed=10_000 + i)
    tr.process_features(feats, float(ts[i]))
    if i % 50 == 0:
        print(f"[{i}] {tr.state.name} n_in={tr.n_inliers} "
              f"kf={m.n_keyframes}/{m._next_uid} mp={int(m.mp_valid.sum())} "
              f"culled_mp_since={cull_counts['mp']}")
        cull_counts["mp"] = 0
print("final", tr.state.name, "n_in", tr.n_inliers)
