"""Multi-host Atlas map-block exchange.

SURVEY §5.8 / §7 stage 7: when tracking lanes run on different hosts, a
map merge (Atlas weld) needs the stored map's tensors shipped across the
DCN. The unit of exchange is a *keyframe block* — a fixed-schema dict of
contiguous array slices (keyframe rows + the map points they reference) —
so transfers are bounded, resumable, and independent of host-side Python
object graphs. The same block schema feeds `np.savez` (checkpointing) and
socket transport.

This is host-side data movement (DCN plane); the compute plane (sharded BA)
lives in `sharded_ba.py`. Reference analog: the whole-Atlas boost
serialization (`System.cc:1529-1673`) — redesigned as blocked tensor
exchange instead of one monolithic object graph.
"""

from __future__ import annotations

import io

import numpy as np

from orbslam3_tpu.slam_map.map_state import MapConfig, MapState

# keyframe-row arrays shipped per block (schema version 1)
_KF_FIELDS = ("kf_R", "kf_t", "kf_ts", "kf_frame_id", "kf_uv", "kf_octave",
              "kf_angle", "kf_desc", "kf_feat_valid", "kf_obs_mp",
              "kf_uright", "kf_vel", "kf_bias", "kf_prev", "kf_uid")
_MP_FIELDS = ("mp_pos", "mp_desc", "mp_normal", "mp_min_dist", "mp_max_dist",
              "mp_visible", "mp_found", "mp_first_kf", "mp_ref_kf")


def map_to_blocks(m: MapState, block_kfs: int = 64) -> list[dict]:
    """Split a map into transport blocks of <= block_kfs keyframes each.

    Every block carries its keyframe rows plus the map-point rows those
    keyframes observe (points shared between blocks are sent once, in the
    first block that references them). Valid points observed by NO keyframe
    (e.g. freshly triangulated, or whose observers were culled) are appended
    to the final block so the exchange ships the complete map — the contract
    is blocks_to_map(map_to_blocks(m)) == m for every valid row."""
    kfs = m.keyframe_ids()
    sent_mp = np.zeros(m.cfg.max_points, bool)
    blocks = []
    for start in range(0, len(kfs), block_kfs):
        rows = kfs[start:start + block_kfs]
        blk = {"schema": 1, "map_id": m.map_id, "kf_rows": np.asarray(rows)}
        for f in _KF_FIELDS:
            blk[f] = getattr(m, f)[rows].copy()
        obs = m.kf_obs_mp[rows]
        mp_ids = np.unique(obs[obs >= 0])
        mp_ids = mp_ids[m.mp_valid[mp_ids] & ~sent_mp[mp_ids]]
        sent_mp[mp_ids] = True
        blk["mp_rows"] = mp_ids
        for f in _MP_FIELDS:
            blk[f] = getattr(m, f)[mp_ids].copy()
        blocks.append(blk)
    # sweep: valid points not referenced by any keyframe still belong to the
    # map — append them to the last block (or a points-only block).
    leftover = np.flatnonzero(m.mp_valid & ~sent_mp)
    if len(leftover):
        if not blocks:
            blk = {"schema": 1, "map_id": m.map_id,
                   "kf_rows": np.zeros(0, np.int64)}
            for f in _KF_FIELDS:
                blk[f] = getattr(m, f)[:0].copy()
            blocks.append(blk)
        blk = blocks[-1]
        blk["mp_rows"] = np.concatenate([blk["mp_rows"], leftover])
        for f in _MP_FIELDS:
            blk[f] = np.concatenate(
                [blk[f], getattr(m, f)[leftover]], axis=0)
    return blocks


def blocks_to_map(blocks: list[dict], cfg: MapConfig,
                  map_id: int = 0) -> MapState:
    """Reassemble a MapState from received blocks (row ids preserved)."""
    m = MapState(cfg, map_id=map_id)
    max_uid = 0
    for blk in blocks:
        assert blk["schema"] == 1
        rows = blk["kf_rows"]
        for f in _KF_FIELDS:
            getattr(m, f)[rows] = blk[f]
        m.kf_valid[rows] = True
        mp_rows = blk["mp_rows"]
        for f in _MP_FIELDS:
            getattr(m, f)[mp_rows] = blk[f]
        m.mp_valid[mp_rows] = True
        if len(rows):
            max_uid = max(max_uid, int(blk["kf_uid"].max()))
    m._next_uid = max_uid + 1
    m.change_index += 1
    return m


def serialize_block(blk: dict) -> bytes:
    """One block -> bytes (npz container) for socket/file transport."""
    buf = io.BytesIO()
    np.savez_compressed(buf, **{k: np.asarray(v) for k, v in blk.items()})
    return buf.getvalue()


def deserialize_block(data: bytes) -> dict:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        blk = {k: z[k] for k in z.files}
    blk["schema"] = int(blk["schema"])
    blk["map_id"] = int(blk["map_id"])
    return blk


def fetch_remote_map(blocks_bytes: list[bytes], cfg: MapConfig,
                     map_id: int = 0) -> MapState:
    """Receiving side of a cross-host merge: wire blocks -> MapState, ready
    for `Atlas.weld`."""
    return blocks_to_map([deserialize_block(b) for b in blocks_bytes], cfg,
                         map_id=map_id)
