"""Capacity tiers: no silent degradation (VERDICT r3 weak #2 / next #3).

The reference's map grows unboundedly and is bounded only by culling
(/root/reference/src/LocalMapping.cc:906 KeyFrameCulling). Here the SoA
tensors start small, DOUBLE when full (a loud `grow_*` event + one
recompile tier for capacity-shaped consumers), and only the hard ceiling
drops data — also loudly. Covers: map growth under insert pressure,
slot-reuse interaction, database row growth, weld-driven growth with
preintegration carry-through, and checkpoint round-trip of a grown map.
"""

import numpy as np
import pytest

from orbslam3_tpu.slam_map.atlas import Atlas
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState

RNG = np.random.default_rng(5)


def _mk_kf_args(N=64):
    return dict(uv=RNG.uniform(0, 300, (N, 2)).astype(np.float32),
                octave=np.zeros(N, np.int32), angle=np.zeros(N, np.float32),
                desc=RNG.integers(0, 2**32, (N, 8), dtype=np.uint32),
                feat_valid=np.ones(N, bool), obs_mp=np.full(N, -1, np.int32))


def test_keyframe_growth_under_pressure():
    m = MapState(MapConfig(max_keyframes=4, max_points=64,
                           features_per_frame=64, keyframes_ceil=32))
    ids = []
    for i in range(20):
        k = m.add_keyframe(np.eye(3, dtype=np.float32),
                           np.zeros(3, np.float32), float(i), i,
                           **_mk_kf_args())
        assert k >= 0, f"KF {i} dropped below the ceiling"
        ids.append(k)
    assert m.cfg.max_keyframes >= 20
    grows = [e for e in m.events if e['kind'] == 'grow_keyframes']
    assert len(grows) >= 2  # 4 -> 8 -> 16 -> 32
    # grown arrays preserve earlier rows
    assert m.kf_ts[ids[3]] == 3.0
    assert m.kf_uid[ids[19]] == 19
    assert len(m.kf_R) == m.cfg.max_keyframes


def test_keyframe_ceiling_drops_loudly():
    m = MapState(MapConfig(max_keyframes=4, max_points=64,
                           features_per_frame=64, keyframes_ceil=8))
    got = [m.add_keyframe(np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), float(i), i,
                          **_mk_kf_args()) for i in range(10)]
    assert sum(1 for k in got if k >= 0) == 8
    drops = [e for e in m.events if e['kind'] == 'drop_keyframe']
    assert len(drops) == 2
    assert drops[0]['at_ceiling'] == 8


def test_point_growth_and_slot_reuse():
    m = MapState(MapConfig(max_keyframes=4, max_points=16,
                           features_per_frame=64, points_ceil=256))
    ids1 = m.add_points(RNG.normal(0, 1, (40, 3)).astype(np.float32),
                        RNG.integers(0, 2**32, (40, 8), dtype=np.uint32),
                        first_kf=0)
    assert (ids1 >= 0).all()
    assert m.cfg.max_points >= 40
    # tombstone half, re-add: reuses slots before growing again
    tier = m.cfg.max_points
    m.remove_points(ids1[:30])
    ids2 = m.add_points(RNG.normal(0, 1, (25, 3)).astype(np.float32),
                        RNG.integers(0, 2**32, (25, 8), dtype=np.uint32),
                        first_kf=0)
    assert (ids2 >= 0).all()
    assert m.cfg.max_points == tier, "should reuse tombstoned slots, not grow"


def test_database_grows_with_map(tmp_path):
    from orbslam3_tpu.place.database import KeyFrameDatabase
    from orbslam3_tpu.place.vocab import Vocabulary
    desc = RNG.integers(0, 2**32, (512, 8), dtype=np.uint32)
    from orbslam3_tpu.place.vocab import build_vocabulary
    vocab = build_vocabulary(desc, k=4, depth=3)
    db = KeyFrameDatabase(vocab, max_keyframes=4)
    for kf in range(40):
        _, bow = db.compute_bow(desc[kf * 8:(kf + 1) * 8],
                                np.ones(8, bool))
        db.add(kf, bow, map_id=0)
    assert len(db.active) >= 40
    assert db.active[:40].all()


def test_weld_grows_and_carries_preint():
    """Welding a src map bigger than the dst's free space grows dst (no
    silent drops) and moves the per-KF preintegration chain (VERDICT r3
    missing #6; reference keeps mpImuPreintegrated through merges)."""
    cfg = MapConfig(max_keyframes=8, max_points=128, features_per_frame=64)
    atlas = Atlas(cfg)
    dst = atlas.active
    prev = -1
    for i in range(6):
        prev = dst.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), float(i), i,
                                prev_kf=prev, **_mk_kf_args())
    src_id = atlas.create_new_map()
    src = atlas.maps[src_id]
    prev = -1
    for i in range(7):
        prev = src.add_keyframe(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), 10.0 + i, 100 + i,
                                prev_kf=prev,
                                preint=("PRE", i) if i > 0 else None,
                                **_mk_kf_args())
    kf_map = atlas.weld(dst.map_id, src_id, 1.0, np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32))
    merged = atlas.maps[dst.map_id]
    assert len(kf_map) == 7, "every src keyframe must survive the weld"
    assert merged.n_keyframes == 13
    # preintegration carried, re-keyed to the new slots
    carried = [merged.kf_pre.get(kf_map[s]) for s in kf_map
               if src.kf_frame_id[s] >= 101]
    assert all(p is not None and p[0] == "PRE" for p in carried)
    # temporal chain re-keyed
    for s, d in kf_map.items():
        ps = int(src.kf_prev[s])
        if ps in kf_map:
            assert int(merged.kf_prev[d]) == kf_map[ps]


def test_checkpoint_roundtrip_grown_map(tmp_path):
    from orbslam3_tpu.slam_map import serialize
    cfg = MapConfig(max_keyframes=4, max_points=32, features_per_frame=64)
    atlas = Atlas(cfg)
    m = atlas.active
    for i in range(10):   # forces growth past the atlas-level tier
        m.add_keyframe(np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32), float(i), i, **_mk_kf_args())
    path = str(tmp_path / "atlas.npz")
    serialize.save_atlas(atlas, path)
    out = serialize.load_atlas(path, check_vocab=False)
    restored = out.maps[m.map_id]
    assert restored.cfg.max_keyframes == m.cfg.max_keyframes
    assert restored.n_keyframes == 10
    np.testing.assert_allclose(restored.kf_ts[restored.kf_valid],
                               m.kf_ts[m.kf_valid])
