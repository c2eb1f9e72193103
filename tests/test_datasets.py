"""Dataset layer tests: ASL/EuRoC loader, KITTI loader, and the golden
end-to-end run — full image pipeline (png decode -> pyramid -> FAST -> BRIEF
-> matching -> BA -> trajectory) on a rendered EuRoC-format sequence with
exact ground truth. Framework analog of the reference's dataset example
binaries + evaluate_ate_scale.py system tests (SURVEY.md section 4)."""

import os
import shutil

import numpy as np
import pytest

from orbslam3_tpu.datasets import (imu_batches, load_euroc, load_kitti,
                                   load_tumvi)
from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    # excitation=0.02: the mono pipeline test needs realistic (not
    # IMU-observability-grade) dynamics — the 0.06 shake exists solely to
    # make inertial scale observable and belongs to the VI golden test
    # (test_vi_golden.py), which uses the default.
    d = str(tmp_path_factory.mktemp("synthseq"))
    write_synth_euroc(d, n_frames=28, width=400, height=304, fx=290.0,
                      fy=290.0, seed=7, n_features=600, arc=1.0,
                      excitation=0.02)
    return d


def test_euroc_loader(seq_dir):
    seq = load_euroc(seq_dir)
    assert len(seq) == 28
    assert np.all(np.diff(seq.image_ts) > 0)
    assert seq.image_ts[0] == pytest.approx(100.0)
    img = seq.read_image(0)
    assert img.shape == (304, 400) and img.dtype == np.uint8
    # IMU covers the camera span at ~200 Hz
    assert seq.imu_ts[0] <= seq.image_ts[0]
    assert seq.imu_ts[-1] >= seq.image_ts[-1] - 0.01
    assert len(seq.imu_ts) > 0.9 * 200 * (seq.image_ts[-1] - seq.image_ts[0])
    # GT interpolation hits the stored poses exactly at frame times
    p = seq.gt_positions_at(seq.image_ts[:3])
    assert np.allclose(p, seq.gt_p[:3], atol=1e-9)


def test_imu_batches_partition(seq_dir):
    """Batches partition the IMU stream: each sample in (prev_ts, ts]."""
    seq = load_euroc(seq_dir)
    batches = list(imu_batches(seq))
    assert len(batches) == len(seq)
    total = sum(len(b) for b in batches)
    n_in_span = int(np.sum(seq.imu_ts <= seq.image_ts[-1]))
    assert total == n_in_span
    prev = -np.inf
    for b, t1 in zip(batches, seq.image_ts):
        for ts, gyr, acc in b:
            assert prev < ts <= t1 + 1e-12
            assert gyr.shape == (3,) and acc.shape == (3,)
        prev = t1


def test_tumvi_layout(seq_dir, tmp_path):
    """TUM-VI shares the ASL layout with GT under mocap0."""
    d = str(tmp_path / "tumvi")
    shutil.copytree(seq_dir, d)
    os.rename(os.path.join(d, "mav0", "state_groundtruth_estimate0"),
              os.path.join(d, "mav0", "mocap0"))
    seq = load_tumvi(d)
    assert seq.gt_ts is not None and len(seq.gt_ts) == 28


def test_kitti_loader(seq_dir, tmp_path):
    d = tmp_path / "kitti" / "00"
    img_dir = d / "image_0"
    img_dir.mkdir(parents=True)
    src = load_euroc(seq_dir)
    for i in range(4):
        shutil.copy(src.image_paths[i], str(img_dir / f"{i:06d}.png"))
    np.savetxt(str(d / "times.txt"), np.arange(4) * 0.1, fmt="%.6f")
    poses = np.hstack([np.tile(np.eye(3).reshape(-1), (4, 1)),
                       np.arange(12).reshape(4, 3)])
    pf = str(tmp_path / "00.txt")
    cols = np.zeros((4, 12))
    cols[:, [0, 5, 10]] = 1.0
    cols[:, 3] = np.arange(4)
    np.savetxt(pf, cols, fmt="%.6e")
    seq = load_kitti(str(d), poses_file=pf)
    assert len(seq) == 4
    assert seq.read_image(1).shape == (304, 400)
    assert seq.gt_poses.shape == (4, 3, 4)
    assert np.allclose(seq.gt_poses[2, :, 3], [2, 0, 0])


@pytest.mark.slow
def test_golden_stereo_metric_ate(tmp_path_factory):
    """Stereo pipeline end-to-end on a rendered rectified pair: metric ATE
    (no scale alignment — stereo observes scale through the bf-anchored
    EdgeStereo residuals)."""
    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.slam_map.map_state import MapConfig

    d = str(tmp_path_factory.mktemp("stereoseq"))
    write_synth_euroc(d, n_frames=22, width=400, height=304, fx=290.0,
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
    assert len(poses) >= 0.9 * len(seq)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    ate = ate_rmse(est, seq.gt_positions_at(ts), with_scale=False)
    assert ate < 0.06, f"metric ATE {ate * 1e3:.1f} mm"


@pytest.mark.slow
def test_golden_trajectory_ate(seq_dir):
    """Full real-data path: mono SLAM over rendered pngs, scale-aligned ATE
    within reference-class bounds (BASELINE.md: EuRoC mono ~0.06 m on much
    longer paths; this short clip must be well under that)."""
    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse
    from orbslam3_tpu.slam_map.map_state import MapConfig

    seq = load_euroc(seq_dir)
    st = Settings.from_yaml(os.path.join(seq_dir, "config.yaml"))
    slam = Slam(st.camera(), st.system_config(
        map_cfg=MapConfig(64, 8192, st.n_features)))
    for i in range(len(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))

    poses = slam._full_poses(0)
    assert len(poses) >= 0.8 * len(seq), f"only {len(poses)} frames exported"
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = seq.gt_positions_at(ts)
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.05, f"ATE {ate * 1e3:.1f} mm"
