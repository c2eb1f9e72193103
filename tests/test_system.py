"""System facade: mono session, trajectory savers, checkpoint/resume,
multi-client relocalization, edge packet entry."""

import os

import numpy as np
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.system import (Sensor, Slam, SystemConfig,
                                        rotation_to_quat)
from orbslam3_tpu.engine.tracking import TrackerConfig, TrackingState
from orbslam3_tpu.place.vocab import build_vocabulary
from orbslam3_tpu.slam_map import serialize
from orbslam3_tpu.slam_map.map_state import MapConfig
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
RNG = np.random.default_rng(3)


def _make_system(vocab=None, **kw):
    cfg = SystemConfig(
        sensor=Sensor.MONOCULAR,
        map=MapConfig(max_keyframes=64, max_points=8192,
                      features_per_frame=600),
        tracker=TrackerConfig(n_features=600), **kw)
    return Slam(CAM, cfg, vocab=vocab)


@pytest.fixture(scope="module")
def session():
    world = synth.make_world(n_points=3000, seed=11)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=60, radius=3.0, arc=1.0)
    vocab = build_vocabulary(
        np.packbits(world.desc_bits, axis=1).view(np.uint32).reshape(-1, 8),
        k=6, depth=3, seed=0)
    slam = _make_system(vocab=vocab)
    ts = np.arange(len(R_gt)) * 0.05
    for i in range(len(R_gt)):
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=500 + i)
        slam.track_features(feats, float(ts[i]))
    return world, R_gt, t_gt, ts, slam


def test_quat_roundtrip():
    from scipy.spatial.transform import Rotation
    for _ in range(20):
        R = Rotation.random(random_state=1).as_matrix()
        q = rotation_to_quat(R)
        R2 = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(R, R2, atol=1e-9)


def test_session_tracks(session):
    *_, slam = session
    info = slam.print_info()
    assert info['state'] == 'OK'
    assert info['n_kfs'] >= 5 and info['n_mps'] > 300


def test_trajectory_savers(session, tmp_path):
    *_, slam = session
    p_tum = tmp_path / 't.tum'
    p_eur = tmp_path / 't.euroc'
    p_kit = tmp_path / 't.kitti'
    slam.save_trajectory_tum(str(p_tum))
    slam.save_trajectory_euroc(str(p_eur))
    slam.save_trajectory_kitti(str(p_kit))
    tum = np.loadtxt(p_tum)
    eur = np.loadtxt(p_eur)
    kit = np.loadtxt(p_kit)
    assert tum.shape[1] == 8 and eur.shape[1] == 8 and kit.shape[1] == 12
    assert tum.shape[0] >= 40
    # quaternions are unit
    np.testing.assert_allclose(np.linalg.norm(tum[:, 4:], axis=1), 1.0,
                               atol=1e-5)
    # EuRoC timestamps are the TUM ones in ns
    np.testing.assert_allclose(eur[:, 0] * 1e-9, tum[:, 0], atol=1e-6)
    # KITTI rows are valid rotations
    Rm = kit[0].reshape(3, 4)[:, :3]
    np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-5)


def test_atlas_checkpoint_roundtrip(session, tmp_path):
    *_, slam = session
    path = str(tmp_path / 'atlas.npz')
    slam.save_atlas(path)
    atlas2 = serialize.load_atlas(path, vocab=slam.vocab)
    # stored map contents identical; fresh active map on top
    src = slam.atlas.active
    mid = src.map_id
    dst = atlas2.maps[mid]
    assert atlas2.active_id != mid
    assert atlas2.active.n_keyframes == 0
    np.testing.assert_array_equal(dst.kf_valid, src.kf_valid)
    np.testing.assert_array_equal(dst.kf_R, src.kf_R)
    np.testing.assert_array_equal(dst.mp_pos, src.mp_pos)
    np.testing.assert_array_equal(dst.kf_uid, src.kf_uid)
    assert dst._next_uid == src._next_uid


def test_checkpoint_vocab_guard(session, tmp_path):
    *_, slam = session
    path = str(tmp_path / 'atlas2.npz')
    slam.save_atlas(path)
    other_vocab = build_vocabulary(
        RNG.integers(0, 2**32, (500, 8), dtype=np.uint32), k=4, depth=2)
    with pytest.raises(ValueError, match='vocabulary fingerprint'):
        serialize.load_atlas(path, vocab=other_vocab)


def test_second_client_relocalizes(session):
    world, R_gt, t_gt, ts, slam = session
    slam.add_client(1)
    # client 1 starts at a pose the map has already seen
    i = 20
    feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                     capacity=600, seed=900)
    out = slam.track_features(feats, float(ts[i]) + 10.0, client_id=1)
    t1 = slam.get_tracker(1)
    assert t1.state == TrackingState.OK, t1.state
    assert out is not None
    R_est, t_est = out
    # same-map pose: directly comparable to GT up to map gauge; compare
    # relative to client-0's estimate at that frame instead of raw GT
    c_est = -R_est.T @ t_est
    c_gt = -R_gt[i].T @ t_gt[i]
    # map was initialized from GT-scale synthetic features; centers should
    # be close after the shared-gauge run
    reloc_events = [e for e in slam.events if e['event'] == 'relocalized']
    assert reloc_events, 'no relocalization event logged'


def test_edge_packet_entry(session):
    world, R_gt, t_gt, ts, slam = session
    from orbslam3_tpu.edge.wire import FramePacket
    i = 30
    feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                     capacity=600, seed=901)
    uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
    desc = np.asarray(feats.desc)[np.asarray(feats.valid)]
    desc_bytes = np.ascontiguousarray(desc.astype('<u4')).view(np.uint8)
    desc_bytes = desc_bytes.reshape(desc.shape[0], 32)
    pkt = FramePacket(
        frame_id=0, timestamp_ns=int((ts[i] + 20.0) * 1e9), uv=uv,
        desc=desc_bytes,
        imu_ts_ns=np.zeros(0, np.int64),
        imu_gyro=np.zeros((0, 3), np.float32),
        imu_acc=np.zeros((0, 3), np.float32))
    out = slam.track_edge(2, pkt)   # auto-registers client 2, relocalizes
    assert 2 in slam.trackers
    assert out is not None
    assert slam.get_tracker(2).state == TrackingState.OK


def test_localization_mode(session, tmp_path):
    """Localization-only mode (System::ActivateLocalizationMode,
    System.cc:578+): warm-start from a checkpoint, freeze mapping, and
    track/relocalize against the frozen atlas — the map must not change."""
    world, R_gt, t_gt, ts, slam = session
    path = str(tmp_path / "atlas_loc.npz")
    slam.save_atlas(path)

    slam2 = Slam(CAM, SystemConfig(
        sensor=Sensor.MONOCULAR,
        map=MapConfig(max_keyframes=64, max_points=8192,
                      features_per_frame=600),
        tracker=TrackerConfig(n_features=600)),
        vocab=slam.vocab, load_atlas_from=path)
    slam2.activate_localization_mode()
    m = slam2.atlas.active
    kfs0, mps0 = m.n_keyframes, m.n_points

    est_c, gt_c = [], []
    for i in range(10, 40, 2):
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=900 + i)
        out = slam2.track_features(feats, float(ts[i]))
        if out is not None:
            R, t = out
            est_c.append(-R.T @ t)
            gt_c.append(-R_gt[i].T @ t_gt[i])
    # must relocalize and track; the mono map's gauge is arbitrary, so
    # compare after Sim3 (Umeyama) alignment
    assert len(est_c) >= 8, "localization-only tracking never locked on"
    from orbslam3_tpu.evaluation import ate_rmse
    ate = ate_rmse(np.asarray(est_c), np.asarray(gt_c), with_scale=True)
    assert ate < 0.05, f"aligned ATE {ate:.3f} m"
    # the frozen map must not have changed
    assert m.n_keyframes == kfs0
    assert m.n_points == mps0
