"""Robustness guards + fault injection (SURVEY §5.3).

Reference behaviors: timestamp-jump map reset/respawn
(`Tracking.cc:1953-1980`), bad-IMU forced reset (`LocalMapping.cc:140-150`),
and the LOST ladder's Atlas respawn. Faults are injected into a live
synthetic run (dropped frames, clock jumps, stationary IMU)."""

import numpy as np

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.system import Slam, Sensor, SystemConfig
from orbslam3_tpu.engine.tracking import TrackerConfig, TrackingState
from orbslam3_tpu.imu.preintegration import ImuCalib
from orbslam3_tpu.slam_map.map_state import MapConfig
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)


def _run_slam(sensor=Sensor.MONOCULAR, n_before_fault=30):
    world = synth.make_world(n_points=3000, seed=4)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=80, radius=3.0, arc=1.0)
    cfg = SystemConfig(sensor=sensor, map=MapConfig(64, 8192, 600),
                       tracker=TrackerConfig(n_features=600))
    if sensor != Sensor.MONOCULAR:
        cfg.imu_calib = ImuCalib.create()
    slam = Slam(CAM, cfg)
    ts = np.arange(len(R_gt)) * 0.05
    for i in range(n_before_fault):
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=100 + i)
        slam.track_features(feats, float(ts[i]))
    return slam, world, R_gt, t_gt, ts


def test_backward_timestamp_respawns_map():
    slam, world, R_gt, t_gt, ts = _run_slam()
    tracker = slam.trackers[0]
    assert tracker.state == TrackingState.OK
    maps_before = len(slam.atlas.maps)
    # clock goes backwards by 5 s
    feats, _ = synth.render_features(world, R_gt[30], t_gt[30], CAM,
                                     capacity=600, seed=990)
    slam.track_features(feats, float(ts[29] - 5.0))
    assert len(slam.atlas.maps) == maps_before + 1
    assert any(e.get('event') == 'timestamp_jump' for e in slam.events)


def test_forward_gap_resets_young_inertial_map():
    slam, world, R_gt, t_gt, ts = _run_slam(sensor=Sensor.IMU_MONOCULAR,
                                            n_before_fault=20)
    m_before = slam.atlas.active
    kfs_before = m_before.n_keyframes
    assert kfs_before > 0 and not m_before.imu_initialized
    feats, _ = synth.render_features(world, R_gt[21], t_gt[21], CAM,
                                     capacity=600, seed=991)
    slam.track_features(feats, float(ts[19] + 3.0))  # 3 s gap, young IMU map
    # young inertial map is RESET in place (not stored)
    assert slam.atlas.active.n_keyframes == 0
    assert any(e.get('event') == 'timestamp_jump' for e in slam.events)


def test_bad_imu_forces_reset():
    slam, world, R_gt, t_gt, ts = _run_slam(sensor=Sensor.IMU_MONOCULAR,
                                            n_before_fault=25)
    slam.atlas.active.bad_imu = True
    feats, _ = synth.render_features(world, R_gt[25], t_gt[25], CAM,
                                     capacity=600, seed=992)
    slam.track_features(feats, float(ts[25]))
    assert not slam.atlas.active.bad_imu  # fresh map
    assert slam.atlas.active.n_keyframes == 0
    assert any(e.get('event') == 'bad_imu_reset' for e in slam.events)


def test_dropped_frames_recover():
    """Fault: 10 consecutive frames dropped mid-run; tracking must survive
    (wide-window fallback) or relocalize without corrupting the map."""
    slam, world, R_gt, t_gt, ts = _run_slam(n_before_fault=30)
    for i in range(40, 60):
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=100 + i)
        slam.track_features(feats, float(ts[i]))
    tracker = slam.trackers[0]
    assert tracker.state in (TrackingState.OK, TrackingState.RECENTLY_LOST)
    assert tracker.n_inliers >= 15
