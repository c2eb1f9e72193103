"""Debug harness for the golden mono ATE regression: run the golden
sequence, print per-frame position error after scale alignment."""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
from orbslam3_tpu.config import Settings
from orbslam3_tpu.datasets import load_euroc
from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc
from orbslam3_tpu.engine.system import Slam
from orbslam3_tpu.evaluation import ate_rmse, umeyama_alignment
from orbslam3_tpu.slam_map.map_state import MapConfig

d = tempfile.mkdtemp(prefix="goldseq")
write_synth_euroc(d, n_frames=28, width=400, height=304, fx=290.0,
                  fy=290.0, seed=7, n_features=600, arc=1.0, excitation=0.02)
seq = load_euroc(d)
st = Settings.from_yaml(os.path.join(d, "config.yaml"))
slam = Slam(st.camera(), st.system_config(
    map_cfg=MapConfig(64, 8192, st.n_features)))
for i in range(len(seq)):
    slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))

poses = slam._full_poses(0)
print(f"{len(poses)} / {len(seq)} frames exported")
ts = np.array([p[0] for p in poses])
est = np.array([p[2] for p in poses])
gt = seq.gt_positions_at(ts)
ate = ate_rmse(est, gt, with_scale=True)
print(f"ATE (scale-aligned) = {ate * 1e3:.2f} mm")

s, R, t = umeyama_alignment(est, gt, with_scale=True)
aligned = (s * (R @ est.T)).T + t
err = np.linalg.norm(aligned - gt, axis=1)
for i, (tt, e) in enumerate(zip(ts, err)):
    print(f"frame ts={tt:9.3f}  err={e * 1e3:7.2f} mm")
m = slam.atlas.active
print("n_keyframes:", m.n_keyframes, "n_points:", m.n_points)

# keyframe-only ATE: are BA'd keyframe poses good?
kfs = m.keyframe_ids()
kf_ts = m.kf_ts[kfs]
kf_centers = np.array([-m.kf_R[k].T @ m.kf_t[k] for k in kfs])
kf_gt = seq.gt_positions_at(kf_ts)
kf_ate = ate_rmse(kf_centers, kf_gt, with_scale=True)
print(f"KF-only ATE = {kf_ate * 1e3:.2f} mm over {len(kfs)} KFs")
s2, R2, t2 = umeyama_alignment(kf_centers, kf_gt, with_scale=True)
al2 = (s2 * (R2 @ kf_centers.T)).T + t2
for k, tt, e in zip(kfs, kf_ts, np.linalg.norm(al2 - kf_gt, axis=1)):
    print(f"  KF slot={k} ts={tt:9.3f} err={e * 1e3:7.2f} mm")
kf_ts_set = set(np.round(kf_ts, 6))
is_kf = np.array([round(float(t), 6) in kf_ts_set for t in ts])
print(f"frame err at KF ts:     {np.sqrt(np.mean(err[is_kf] ** 2)) * 1e3:.2f} mm")
print(f"frame err at non-KF ts: {np.sqrt(np.mean(err[~is_kf] ** 2)) * 1e3:.2f} mm")
