"""Dev probe: run the three accuracy goldens inline and print their ATEs.

Mirrors tests/test_datasets.py::{test_golden_trajectory_ate,
test_golden_stereo_metric_ate} and tests/test_vi_golden.py, but prints the
metrics instead of asserting, renders each sequence once into a cache dir,
and reuses the persistent XLA compile cache so a full probe cycle is fast
enough to bisect behavior changes.

Usage: python scripts/golden_probe.py [mono] [stereo] [vi] [soak]
"""

import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/orb_probe_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orbslam3_tpu.config import Settings
from orbslam3_tpu.datasets import imu_batches, load_euroc
from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc
from orbslam3_tpu.engine.system import Slam
from orbslam3_tpu.evaluation import ate_rmse, umeyama_alignment
from orbslam3_tpu.slam_map.map_state import MapConfig

CACHE = "/tmp/golden_probe_seqs"


def seq_cached(name, **kw):
    d = os.path.join(CACHE, name)
    if not os.path.exists(os.path.join(d, "config.yaml")):
        os.makedirs(d, exist_ok=True)
        write_synth_euroc(d, **kw)
    return d


def run_mono():
    d = seq_cached("mono", n_frames=28, width=400, height=304, fx=290.0,
                   fy=290.0, seed=7, n_features=600, arc=1.0,
                   excitation=0.02)
    seq = load_euroc(d)
    st = Settings.from_yaml(os.path.join(d, "config.yaml"))
    slam = Slam(st.camera(), st.system_config(
        map_cfg=MapConfig(64, 8192, st.n_features)))
    for i in range(len(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))
    poses = slam._full_poses(0)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = seq.gt_positions_at(ts)
    ate = ate_rmse(est, gt, with_scale=True)
    print(f"MONO   frames={len(poses)}/{len(seq)} "
          f"ATE={ate * 1e3:.1f} mm (limit 50)")


def run_stereo():
    d = seq_cached("stereo", n_frames=22, width=400, height=304, fx=290.0,
                   fy=290.0, seed=13, n_features=600, arc=0.8,
                   stereo_baseline=0.11)
    seq = load_euroc(d, stereo=True)
    st = Settings.from_yaml(os.path.join(d, "config.yaml"), sensor="stereo")
    slam = Slam(st.camera(), st.system_config(
        map_cfg=MapConfig(64, 8192, st.n_features)))
    for i in range(len(seq)):
        slam.track_stereo(seq.read_image(i), seq.read_image(i, right=True),
                          float(seq.image_ts[i]))
    poses = slam._full_poses(0)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    ate = ate_rmse(est, seq.gt_positions_at(ts), with_scale=False)
    print(f"STEREO frames={len(poses)}/{len(seq)} "
          f"ATE={ate * 1e3:.1f} mm (limit 60)")


def run_vi():
    d = seq_cached("vi", n_frames=180, width=320, height=240, fx=240.0,
                   fy=240.0, seed=3, n_features=500, arc=1.0, fps=20.0,
                   excitation=0.05, rot_excitation=0.06)
    seq = load_euroc(d)
    st = Settings.from_yaml(os.path.join(d, "config.yaml"),
                            sensor="imu-monocular")
    cfg = st.system_config(map_cfg=MapConfig(128, 8192, st.n_features))
    cfg.mapper.viba1_after_s = 3.0
    cfg.mapper.viba2_after_s = 6.0
    cfg.mapper.scale_refine_every_s = 3.0
    slam = Slam(st.camera(), cfg)
    for i, imu in zip(range(len(seq)), imu_batches(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]),
                             imu=imu)
    m = slam.atlas.active
    poses = slam._full_poses(0)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    ate_metric = ate_rmse(est, seq.gt_positions_at(ts), with_scale=False)
    kfs = m.keyframe_ids()
    cen = np.array([-m.kf_R[k].T @ m.kf_t[k] for k in kfs])
    gt_kf = seq.gt_positions_at(m.kf_ts[kfs])
    kf_metric = ate_rmse(cen, gt_kf, with_scale=False)
    s_kf, _, _ = umeyama_alignment(cen, gt_kf, with_scale=True)
    print(f"VI     frames={len(poses)}/{len(seq)} stage={m.iba_stage} "
          f"frameATE={ate_metric * 1e3:.1f} mm (limit 100) "
          f"kfATE={kf_metric * 1e3:.1f} mm (limit 50) scale={s_kf:.4f}")


def run_soak(n_frames=3000):
    from orbslam3_tpu.core.camera import Camera
    from orbslam3_tpu.engine.local_mapping import LocalMapper
    from orbslam3_tpu.engine.tracking import (Tracker, TrackerConfig,
                                              TrackingState)
    from orbslam3_tpu.slam_map.map_state import MapState
    from orbslam3_tpu.utils import synth
    cam = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
    world = synth.make_world(n_points=4000, seed=11)
    R_gt, t_gt = synth.orbit_trajectory(
        n_frames=n_frames, radius=3.0, arc=6.0 * np.pi * (n_frames / 3000))
    ts = np.arange(n_frames) * 0.05
    m = MapState(MapConfig(max_keyframes=16, max_points=2048,
                           features_per_frame=500))
    mapper = LocalMapper(cam, m)
    tracker = Tracker(cam, m, TrackerConfig(n_features=500),
                      local_mapper=mapper)
    tracked = 0
    lost_at = -1
    for i in range(n_frames):
        feats, _ = synth.render_features(
            world, R_gt[i], t_gt[i], cam, capacity=500, seed=10_000 + i)
        out = tracker.process_features(feats, float(ts[i]))
        tracked += out is not None
        if tracker.state != TrackingState.OK and lost_at < 0 and i > 10:
            lost_at = i
            print(f"  first non-OK state {tracker.state} at frame {i}")
        if i % 500 == 499:
            print(f"  frame {i + 1}: live KFs={m.n_keyframes} "
                  f"created={m._next_uid} state={tracker.state}")
    est_ts, est_centers = tracker.export_trajectory()
    lut = {round(float(t), 6): i for i, t in enumerate(ts)}
    idx = np.array([lut[round(float(t), 6)] for t in est_ts])
    gt_centers = np.array([-R_gt[i].T @ t_gt[i] for i in idx])
    ate_all = ate_rmse(est_centers, gt_centers, with_scale=True)
    last = idx >= 2 * n_frames // 3
    ate_last = ate_rmse(est_centers[last], gt_centers[last], with_scale=True)
    print(f"SOAK   tracked={tracked}/{n_frames} state={tracker.state} "
          f"liveKF={m.n_keyframes} created={m._next_uid} "
          f"ATE={ate_all * 1e3:.1f} mm lastlap={ate_last * 1e3:.1f} mm")


if __name__ == "__main__":
    which = sys.argv[1:] or ["mono", "stereo", "vi"]
    for w in which:
        if w == "mono":
            run_mono()
        elif w == "stereo":
            run_stereo()
        elif w == "vi":
            run_vi()
        elif w.startswith("soak"):
            n = int(w.split(":")[1]) if ":" in w else 3000
            run_soak(n)
