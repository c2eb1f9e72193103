"""Loop-closure golden: end-to-end revisit on a RENDERED sequence
(VERDICT r3 weak #3 — prior loop tests verified the mechanism on
constructed maps, not detection through the full image pipeline).

A full-circle orbit (arc > 2*pi) re-enters its starting view; the system —
image frontend, tracking, local mapping, BoW database, loop detection,
Sim3 solve, essential-graph correction — must fire a loop event on its
own, and the post-loop trajectory must stay consistent end to end.
Reference path: LocalMapping -> LoopClosing queue
(/root/reference/src/LocalMapping.cc:254) -> NewDetectCommonRegions ->
CorrectLoop (LoopClosing.cc:437+).
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_loop_golden_rendered_revisit(tmp_path_factory):
    import jax.numpy as jnp

    from orbslam3_tpu.config import Settings
    from orbslam3_tpu.datasets import load_euroc
    from orbslam3_tpu.datasets.synth_euroc import write_synth_euroc
    from orbslam3_tpu.engine.system import Slam
    from orbslam3_tpu.evaluation import ate_rmse, umeyama_alignment
    from orbslam3_tpu.place.vocab import build_vocabulary
    from orbslam3_tpu.slam_map.map_state import MapConfig
    from orbslam3_tpu.vision.frame import extract_features

    d = str(tmp_path_factory.mktemp("loopseq"))
    # a full revolution plus overlap revisits the opening views
    n = 240
    # tangential gaze: corridor-style views, covisibility breaks behind
    # the camera, and the revisit is only recoverable via place recognition
    write_synth_euroc(d, n_frames=n, width=320, height=240, fx=240.0,
                      fy=240.0, seed=17, n_features=500, arc=6.8, fps=20.0,
                      excitation=0.02, look='tangent')
    seq = load_euroc(d)
    st = Settings.from_yaml(d + "/config.yaml", sensor="monocular")

    # prefer the shipped 100k-word artifact; fall back to a sequence-local
    # vocabulary when it is absent
    from orbslam3_tpu.place.vocab import load_default_vocabulary
    vocab = load_default_vocabulary()
    if vocab is None:
        descs = []
        for i in range(0, n, 24):
            f = extract_features(jnp.asarray(seq.read_image(i), jnp.float32),
                                 n_features=500)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        vocab = build_vocabulary(np.concatenate(descs), k=8, depth=3, seed=0)

    cfg = st.system_config(map_cfg=MapConfig(256, 16384, st.n_features))
    slam = Slam(st.camera(), cfg, vocab=vocab)
    for i in range(len(seq)):
        slam.track_monocular(seq.read_image(i), float(seq.image_ts[i]))

    loop_events = [e for e in slam.events
                   if e.get('event') == 'loop_event']
    assert loop_events, "no loop/merge event fired on a rendered revisit"

    poses = slam._full_poses(0)
    assert len(poses) >= 0.85 * len(seq)
    ts = np.array([p[0] for p in poses])
    est = np.array([p[2] for p in poses])
    gt = seq.gt_positions_at(ts)
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.08, f"post-loop ATE {ate * 1e3:.1f} mm"
    # end-of-loop consistency: the last frames (revisit) must land near the
    # first frames' positions after one global alignment
    s, R, t = umeyama_alignment(est, gt, with_scale=True)
    est_a = s * est @ R.T + t
    tail_err = np.linalg.norm(est_a[-10:] - gt[-10:], axis=1).mean()
    assert tail_err < 0.12, f"revisit tail error {tail_err:.3f} m"
