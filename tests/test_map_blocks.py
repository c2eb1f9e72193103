"""Multi-host map-block exchange tests (SURVEY §5.8): map -> blocks ->
bytes -> map round trip, and a cross-"host" Atlas merge through the wire
format."""

import numpy as np

from orbslam3_tpu.distributed.map_blocks import (blocks_to_map,
                                                 deserialize_block,
                                                 fetch_remote_map,
                                                 map_to_blocks,
                                                 serialize_block)
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState

RNG = np.random.default_rng(5)


def _make_map(n_kfs=10, n_pts=300, cfg=None, seed=0):
    rng = np.random.default_rng(seed)
    cfg = cfg or MapConfig(64, 4096, 128)
    m = MapState(cfg)
    pts = rng.uniform(-5, 5, (n_pts, 3)).astype(np.float32)
    ids = m.add_points(pos=pts,
                       desc=rng.integers(0, 2 ** 32, (n_pts, 8),
                                         dtype=np.uint64).astype(np.uint32),
                       first_kf=0)
    prev = -1
    for k in range(n_kfs):
        obs = np.full(cfg.features_per_frame, -1, np.int32)
        sel = rng.choice(n_pts, 60, replace=False)
        obs[:60] = ids[sel]
        kf = m.add_keyframe(
            np.eye(3, dtype=np.float32),
            rng.uniform(-1, 1, 3).astype(np.float32), 100.0 + k * 0.5, k,
            rng.uniform(0, 640, (cfg.features_per_frame, 2)).astype(
                np.float32),
            np.zeros(cfg.features_per_frame, np.int32),
            np.zeros(cfg.features_per_frame, np.float32),
            rng.integers(0, 2 ** 32, (cfg.features_per_frame, 8),
                         dtype=np.uint64).astype(np.uint32),
            np.ones(cfg.features_per_frame, bool), obs, prev_kf=prev)
        prev = kf
    return m


def test_block_roundtrip():
    m = _make_map(n_kfs=10)
    blocks = map_to_blocks(m, block_kfs=4)
    assert len(blocks) == 3  # 4+4+2 keyframes
    m2 = blocks_to_map(blocks, m.cfg)
    assert m2.n_keyframes == m.n_keyframes
    assert m2.n_points == m.n_points
    np.testing.assert_array_equal(m2.kf_valid, m.kf_valid)
    np.testing.assert_array_equal(m2.kf_uid, m.kf_uid)
    np.testing.assert_allclose(m2.kf_t, m.kf_t)
    np.testing.assert_allclose(m2.mp_pos, m.mp_pos)
    np.testing.assert_array_equal(m2.kf_obs_mp, m.kf_obs_mp)
    assert m2._next_uid == m._next_uid


def test_wire_roundtrip_and_size():
    m = _make_map(n_kfs=8)
    blocks = map_to_blocks(m, block_kfs=4)
    wires = [serialize_block(b) for b in blocks]
    # bounded block size (bounded transfers are the design point)
    assert all(len(w) < 2 * 2 ** 20 for w in wires)
    back = [deserialize_block(w) for w in wires]
    m2 = blocks_to_map(back, m.cfg)
    np.testing.assert_allclose(m2.mp_pos[m2.mp_valid], m.mp_pos[m.mp_valid])


def test_cross_host_merge_via_blocks():
    """Host B ships its map as wire blocks; host A reconstructs it and welds
    into its own atlas — the multi-host Atlas merge path."""
    from orbslam3_tpu.slam_map.atlas import Atlas
    cfg = MapConfig(64, 4096, 128)
    atlas = Atlas(cfg)
    m_a = atlas.active
    src = _make_map(n_kfs=6, cfg=cfg, seed=1)
    for k in src.keyframe_ids():
        pass
    # copy a's content from a fresh make (atlas.active starts empty)
    donor = _make_map(n_kfs=5, cfg=cfg, seed=2)
    for f in ("kf_R kf_t kf_ts kf_frame_id kf_uv kf_octave kf_angle kf_desc "
              "kf_feat_valid kf_obs_mp kf_valid kf_uid kf_prev").split():
        getattr(m_a, f)[:] = getattr(donor, f)
    for f in "mp_pos mp_desc mp_valid mp_first_kf mp_ref_kf".split():
        getattr(m_a, f)[:] = getattr(donor, f)
    m_a._next_uid = donor._next_uid
    n_a_kfs, n_a_pts = m_a.n_keyframes, m_a.n_points

    wires = [serialize_block(b) for b in map_to_blocks(src, block_kfs=3)]
    remote = fetch_remote_map(wires, cfg, map_id=7)
    atlas.maps[7] = remote
    kf_map = atlas.weld(m_a.map_id, 7, 1.0, np.eye(3, dtype=np.float32),
                        np.zeros(3, np.float32))
    merged = atlas.maps[m_a.map_id]
    assert merged.n_keyframes == n_a_kfs + src.n_keyframes
    assert merged.n_points == n_a_pts + src.n_points
    assert len(kf_map) == src.n_keyframes
