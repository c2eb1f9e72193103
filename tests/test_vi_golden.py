"""Mono-inertial golden end-to-end: full image pipeline + IMU ladder.

The single highest-value interaction test in the framework (VERDICT r2 #2):
a rendered EuRoC-format sequence with scale-observable synthetic IMU
(translational + rotational excitation) drives
`Slam(sensor=IMU_MONOCULAR)` through the complete ladder —
inertial init -> VIBA1 -> VIBA2 — and the result is checked METRICALLY
(no scale alignment): ATE, recovered scale ~= 1, and gravity alignment.

Reference analogs: `LocalMapping::InitializeIMU` ladder
(/root/reference/src/LocalMapping.cc:1177-1431), `FullInertialBA`
(Optimizer.cc:392), BASELINE config "EuRoC V102 mono-inertial".
"""

import os

import numpy as np
import pytest

from orbslam3_tpu.config import Settings
from orbslam3_tpu.datasets import imu_batches, load_euroc
from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc
from orbslam3_tpu.engine.system import Slam
from orbslam3_tpu.evaluation import ate_rmse, umeyama_alignment
from orbslam3_tpu.slam_map.map_state import MapConfig


@pytest.mark.slow
def test_vi_golden_metric_ate(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("viseq"))
    # 9 s at 20 fps; translational (5 cm) + rotational (0.06 rad) excitation
    # makes monocular scale AND accelerometer bias observable (a pure
    # look-at orbit leaves a common acc bias degenerate with scale)
    write_synth_euroc(d, n_frames=180, width=320, height=240, fx=240.0,
                      fy=240.0, seed=3, n_features=500, arc=1.0, fps=20.0,
                      excitation=0.05, rot_excitation=0.06)
    seq = load_euroc(d)
    st = Settings.from_yaml(os.path.join(d, "config.yaml"),
                            sensor="imu-monocular")
    cfg = st.system_config(map_cfg=MapConfig(128, 8192, st.n_features))
    # shortened ladder cadence so the 9 s clip exercises all three rungs
    cfg.mapper.viba1_after_s = 3.0
    cfg.mapper.viba2_after_s = 6.0
    cfg.mapper.scale_refine_every_s = 3.0
    slam = Slam(st.camera(), cfg)
    for i, imu in zip(range(len(seq)), imu_batches(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]),
                             imu=imu)

    m = slam.atlas.active
    # the full ladder must have run
    assert m.imu_initialized
    assert m.iba_stage == 2, f"ladder stalled at stage {m.iba_stage}"

    # frame-level METRIC accuracy (no scale alignment — the IMU pins scale)
    poses = slam._full_poses(0)
    assert len(poses) >= 0.85 * len(seq)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = seq.gt_positions_at(ts)
    ate_metric = ate_rmse(est, gt, with_scale=False)
    assert ate_metric < 0.10, f"metric ATE {ate_metric * 1e3:.1f} mm"

    # keyframe-level: scale within 5%, gravity within 1 degree
    kfs = m.keyframe_ids()
    cen = np.array([-m.kf_R[k].T @ m.kf_t[k] for k in kfs])
    gt_kf = seq.gt_positions_at(m.kf_ts[kfs])
    kf_metric = ate_rmse(cen, gt_kf, with_scale=False)
    assert kf_metric < 0.05, f"KF metric ATE {kf_metric * 1e3:.1f} mm"
    s_kf, _, _ = umeyama_alignment(cen, gt_kf, with_scale=True)
    assert abs(s_kf - 1.0) < 0.05, f"recovered scale {s_kf:.4f}"

    from scipy.spatial.transform import Rotation
    rows = np.loadtxt(os.path.join(
        d, 'mav0', 'state_groundtruth_estimate0', 'data.csv'),
        delimiter=',', skiprows=1)
    ts_gt = rows[:, 0] * 1e-9
    Rwb_gt = Rotation.from_quat(rows[:, 4:8][:, [1, 2, 3, 0]]).as_matrix()
    tilts = []
    for k in kfs:
        gi = np.argmin(np.abs(ts_gt - m.kf_ts[k]))
        R_align = m.kf_R[k].T @ Rwb_gt[gi].T  # map world <- gt world
        g_map = R_align @ np.array([0, 0, -1.0])
        tilts.append(np.degrees(np.arccos(np.clip(-g_map[2], -1, 1))))
    assert np.median(tilts) < 1.0, f"gravity tilt {np.median(tilts):.2f} deg"
