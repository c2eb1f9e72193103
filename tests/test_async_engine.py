"""Async mapping backend tests: KF queue, abortable BA, tracking decoupled
from mapping (reference thread architecture, System.cc:198,215 +
LocalMapping.cc:288-300 mbAbortBA)."""

import time

import numpy as np
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.async_engine import AsyncBackend
from orbslam3_tpu.engine.system import Slam, SystemConfig
from orbslam3_tpu.engine.tracking import TrackerConfig
from orbslam3_tpu.evaluation import ate_rmse
from orbslam3_tpu.slam_map.map_state import MapConfig
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)


def test_backend_queue_and_abort():
    """Worker drains in order; abort flag rises while a burst is queued."""
    seen = []
    aborts = []

    def work(k, abort):
        time.sleep(0.02)
        seen.append(k)
        aborts.append(abort())

    be = AsyncBackend(work)
    for k in range(6):
        be.insert_keyframe(k)
    be.flush()
    assert seen == list(range(6))
    # at least one early item saw "more keyframes waiting" (abort=True) and
    # the last one saw an empty queue (abort=False)
    assert aborts[-1] is False
    assert any(aborts[:-1])
    be.shutdown()


def test_backend_survives_exceptions():
    calls = []

    def work(k, abort):
        calls.append(k)
        if k == 1:
            raise RuntimeError("boom")

    be = AsyncBackend(work)
    for k in range(3):
        be.insert_keyframe(k)
    be.flush()
    assert calls == [0, 1, 2]
    assert len(be.errors) == 1
    with pytest.raises(RuntimeError):
        be.shutdown()


def test_async_slam_e2e():
    """Full SLAM with the mapping worker: same accuracy as synchronous,
    zero backend errors, queue drained at flush."""
    world = synth.make_world(n_points=3000, seed=4)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=60, radius=3.0, arc=1.0)
    ts = np.arange(len(R_gt)) * 0.05

    slam = Slam(CAM, SystemConfig(
        map=MapConfig(64, 8192, 600),
        tracker=TrackerConfig(n_features=600),
        async_mapping=True))
    for i in range(len(R_gt)):
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=100 + i)
        slam.track_features(feats, float(ts[i]))
    slam.flush()
    backend = slam._mappers[0].backend
    assert backend is not None
    assert backend.queue_len() == 0
    assert backend.errors == []

    poses = slam._full_poses(0)
    assert len(poses) >= 0.8 * len(R_gt)
    t_arr = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = {round(float(t), 6): -R_gt[i].T @ t_gt[i] for i, t in enumerate(ts)}
    g = np.array([gt[round(p[0], 6)] for p in poses])
    ate = ate_rmse(est, g, with_scale=True)
    assert ate < 0.05, ate
    slam.shutdown()
