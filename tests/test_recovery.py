"""Recovery matching parity (VERDICT r3 next #6): rotation-consistency
histograms + the BoW TrackReferenceKeyFrame fallback.

Reference: `ORBmatcher` CheckOrientation/ComputeThreeMaxima
(/root/reference/src/ORBmatcher.cc:83-85 + per-Search* blocks),
`ORBmatcher::SearchByBoW` (~:150), `Tracking::TrackReferenceKeyFrame`
(/root/reference/src/Tracking.cc:2864-2996).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.kernels import orb_descriptor as desc_k
from orbslam3_tpu.vision import matcher

RNG = np.random.default_rng(23)


def test_rotation_consistency_prunes_outliers():
    """Matches with a common rotation survive; random-rotation outliers are
    voted out by the dominant-orientation histogram."""
    N = 200
    ang2 = RNG.uniform(0, 2 * np.pi, N).astype(np.float32)
    idx = np.arange(N, dtype=np.int32)
    common = 0.35
    ang1 = (ang2 + common).astype(np.float32)
    # 40 outliers with random relative rotation (well off the common bin)
    out_sel = RNG.choice(N, 40, replace=False)
    ang1[out_sel] = RNG.uniform(0, 2 * np.pi, 40)
    ok = np.ones(N, bool)
    kept = np.asarray(matcher.rotation_consistency(
        jnp.asarray(ang1), jnp.asarray(ang2), jnp.asarray(idx),
        jnp.asarray(ok)))
    inliers = np.ones(N, bool)
    inliers[out_sel] = False
    assert kept[inliers].mean() > 0.98       # consistent matches survive
    assert kept[~inliers].mean() < 0.25      # most outliers pruned


def test_search_by_bow_pose_free():
    """BoW-bucketed matching finds correspondences with NO pose/window
    information — the property the ref-KF fallback depends on."""
    from orbslam3_tpu.place.vocab import build_vocabulary, descend
    N = 256
    desc = RNG.integers(0, 2 ** 32, (N, 8), dtype=np.uint32)
    vocab = build_vocabulary(desc, k=6, depth=3, seed=1)
    lv, vv, _ = vocab.device_tensors()
    words = np.asarray(descend(jnp.asarray(desc), lv, vv, vocab.k))
    perm = RNG.permutation(N)
    planes1 = desc_k.descriptor_planes(jnp.asarray(desc))
    planes2 = desc_k.descriptor_planes(jnp.asarray(desc[perm]))
    ang = RNG.uniform(0, 2 * np.pi, N).astype(np.float32)
    valid = jnp.ones(N, bool)
    idx, dist, ok, nm = matcher.search_by_bow(
        jnp.asarray(words), planes1, valid, jnp.asarray(ang),
        jnp.asarray(words[perm]), planes2, valid, jnp.asarray(ang[perm]),
        k=vocab.k)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert int(nm) > 0.8 * N
    # every accepted match maps feature i to its permuted copy
    good = ok & (perm[idx] == np.arange(N))
    assert good.sum() == ok.sum()


@pytest.mark.slow
def test_bow_refkf_fallback_recovers_tracking():
    """A catastrophically wrong motion-model prediction (simulated fast
    rotation) fails every projection window; the BoW ref-KF rung must
    recover the SAME frame without relocalization."""
    from orbslam3_tpu.engine.system import Sensor, Slam, SystemConfig
    from orbslam3_tpu.engine.tracking import TrackerConfig, TrackingState
    from orbslam3_tpu.place.vocab import build_vocabulary
    from orbslam3_tpu.slam_map.map_state import MapConfig
    from orbslam3_tpu.utils import synth
    from scipy.spatial.transform import Rotation

    CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
    world = synth.make_world(n_points=3000, seed=4)
    R_gt, t_gt = synth.orbit_trajectory(n_frames=60, radius=3.0, arc=1.0)
    vocab = build_vocabulary(
        np.packbits(world.desc_bits, axis=1).view(np.uint32).reshape(-1, 8),
        k=6, depth=3, seed=0)
    cfg = SystemConfig(sensor=Sensor.MONOCULAR,
                       map=MapConfig(64, 8192, 600),
                       tracker=TrackerConfig(n_features=600))
    slam = Slam(CAM, cfg, vocab=vocab)
    tr = slam.get_tracker(0)
    assert tr.bow_fn is not None

    calls = {"bow": 0, "reloc": 0}
    orig_bow = tr._track_reference_keyframe_bow
    orig_reloc = tr._try_relocalize

    def counting_bow(*a, **k):
        calls["bow"] += 1
        return orig_bow(*a, **k)

    def counting_reloc(*a, **k):
        calls["reloc"] += 1
        return orig_reloc(*a, **k)

    tr._track_reference_keyframe_bow = counting_bow
    tr._try_relocalize = counting_reloc

    ts = np.arange(len(R_gt)) * 0.05
    recovered_at = None
    deltas = []          # per-frame translation steps in MAP units
    prev_t = None
    t39 = R39 = None
    for i in range(len(R_gt)):
        if i == 40:
            t39 = tr.t_cw.copy()
            R39 = tr.R_cw.copy()
            # poison the velocity model: a 25-degree/frame spin throws the
            # prediction ~200 px off — outside every projection window
            bad = Rotation.from_rotvec([0, 0.44, 0]).as_matrix()
            tr._vel_R = bad.astype(np.float32)
            tr._vel_t = np.array([0.5, 0.2, 0.1], np.float32)
        feats, _ = synth.render_features(world, R_gt[i], t_gt[i], CAM,
                                         capacity=600, seed=900 + i)
        slam.track_features(feats, float(ts[i]))
        if i == 40 and tr.state == TrackingState.OK:
            recovered_at = i
            t40 = tr.t_cw.copy()
            R40 = tr.R_cw.copy()
        if prev_t is not None and i < 40:
            deltas.append(np.linalg.norm(tr.t_cw - prev_t))
        prev_t = tr.t_cw.copy()
    assert calls["bow"] >= 1, "fallback rung never exercised"
    assert recovered_at == 40, "frame 40 did not recover in-place"
    assert calls["reloc"] == 0, "recovery must not need relocalization"
    # recovered pose is CONTINUOUS with frame 39 in the map's own gauge
    # (monocular scale is arbitrary, so compare against the sequence's own
    # per-frame motion, not metric GT)
    step = np.linalg.norm(t40 - t39)
    typical = float(np.median(deltas))
    assert step < 4.0 * typical, (
        f"recovered step {step:.3f} vs typical {typical:.3f}")
    rot_step = Rotation.from_matrix(R40 @ R39.T).magnitude()
    assert np.degrees(rot_step) < 8.0, f"rot jump {np.degrees(rot_step):.1f}"
