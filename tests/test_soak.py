"""Capacity soak: a 3000-frame multi-lap sequence under deliberately small
starting capacities (VERDICT r3 next-step #3 "Done =" criterion).

The map starts at a tiny tier (16 KFs / 2048 points) so the run MUST exercise
the tier-growth machinery, and runs three full orbits so keyframe culling
(the reference's 90%-redundancy rule, /root/reference/src/LocalMapping.cc:906)
is what bounds the map — not the capacity ceiling. The run must finish with

  * zero silent-drop events (every `drop_*` path is loud and none fire),
  * at least one `grow_*` tier bump,
  * culling holding live keyframes far below both the number ever created
    and the hard ceiling, and
  * a stable trajectory: full-run ATE small AND the final lap no worse than
    the whole (no slow corruption as slots are recycled).

Feature-level frames (utils/synth) keep 3000 frames tractable on the CPU test
mesh; the image pipeline is covered by the rendered goldens.
"""

import numpy as np
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig, TrackingState
from orbslam3_tpu.evaluation import ate_rmse
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)


@pytest.mark.slow
def test_capacity_soak_3000_frames():
    n_frames = 3000
    world = synth.make_world(n_points=4000, seed=11)
    R_gt, t_gt = synth.orbit_trajectory(
        n_frames=n_frames, radius=3.0, arc=6.0 * np.pi)  # three full laps
    ts = np.arange(n_frames) * 0.05

    m = MapState(MapConfig(max_keyframes=16, max_points=2048,
                           features_per_frame=500))
    mapper = LocalMapper(CAM, m)
    tracker = Tracker(CAM, m, TrackerConfig(n_features=500),
                      local_mapper=mapper)

    tracked = 0
    for i in range(n_frames):
        feats, _ = synth.render_features(
            world, R_gt[i], t_gt[i], CAM, capacity=500, seed=10_000 + i)
        out = tracker.process_features(feats, float(ts[i]))
        tracked += out is not None

    assert tracker.state == TrackingState.OK
    assert tracked > 0.9 * n_frames, f"only {tracked}/{n_frames} tracked"

    kinds = [e["kind"] for e in m.events]
    drops = [k for k in kinds if k.startswith("drop")]
    assert not drops, f"silent-capacity contract violated loudly: {drops}"
    assert any(k.startswith("grow") for k in kinds), (
        "soak never exercised a tier bump — starting capacity too large?")

    # culling, not the ceiling, bounds the map
    created = m._next_uid
    assert created > 60, created  # multi-lap run makes many KFs...
    assert m.n_keyframes < 0.7 * created, (
        f"culling ineffective: {m.n_keyframes} live of {created} created")
    assert m.n_keyframes < 0.25 * m.cfg.keyframes_ceil

    est_ts, est_centers = tracker.export_trajectory()
    lut = {round(float(t), 6): i for i, t in enumerate(ts)}
    idx = np.array([lut[round(float(t), 6)] for t in est_ts])
    gt_centers = np.array([-R_gt[i].T @ t_gt[i] for i in idx])
    ate_all = ate_rmse(est_centers, gt_centers, with_scale=True)
    assert ate_all < 0.08, f"full-run ATE {ate_all:.3f} m"
    last = idx >= 2 * n_frames // 3
    ate_last = ate_rmse(est_centers[last], gt_centers[last], with_scale=True)
    assert ate_last < max(0.06, 1.5 * ate_all), (
        f"trajectory degrades late in the soak: last-lap ATE {ate_last:.3f} "
        f"vs full-run {ate_all:.3f}")
