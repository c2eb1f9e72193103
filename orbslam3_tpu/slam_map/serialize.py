"""Atlas checkpoint / resume.

The reference serializes the whole Atlas object graph with
boost::serialization to `<name>.osa`, guarded by an MD5 checksum of the
vocabulary (`/root/reference/src/System.cc:1529-1673`, `include/Atlas.h:53-70`).
Here the map IS already flat SoA tensors, so a checkpoint is a single
compressed npz per atlas: every MapState array + the ID counters + a config
fingerprint + the vocabulary fingerprint. Loading restores stored maps and
spawns a fresh active map, matching the reference's warm-start-localization
semantics (`System.cc:172`).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

from .atlas import Atlas
from .map_state import MapConfig, MapState

FORMAT_VERSION = 1

_MAP_SCALARS = ('_next_uid', 'change_index', 'imu_initialized', 'iba_stage',
                'map_id')


def _map_arrays(m: MapState) -> dict[str, np.ndarray]:
    return {k: v for k, v in vars(m).items()
            if isinstance(v, np.ndarray)}


def config_fingerprint(cfg: MapConfig) -> str:
    return hashlib.md5(json.dumps(vars(cfg), sort_keys=True,
                                  default=str).encode()).hexdigest()


def vocab_fingerprint(vocab) -> str:
    """MD5 over the vocabulary's node tensors (the reference checksums the
    ORBvoc.txt file, `System.cc:1616-1623`)."""
    if vocab is None:
        return 'none'
    h = hashlib.md5()
    for lv, vv in zip(vocab.levels, vocab.valid):
        h.update(np.ascontiguousarray(lv).tobytes())
        h.update(np.ascontiguousarray(vv).tobytes())
    return h.hexdigest()


def save_atlas(atlas: Atlas, path: str, vocab=None, extra: dict = None):
    """Write the whole atlas (all maps incl. active) to one .npz."""
    blobs = {}
    meta = {
        'format': FORMAT_VERSION,
        'config': vars(atlas.cfg),
        'config_md5': config_fingerprint(atlas.cfg),
        'vocab_md5': vocab_fingerprint(vocab),
        'active_id': atlas.active_id,
        'next_map_id': atlas._next_map_id,
        'map_ids': sorted(atlas.maps),
        'map_scalars': {},
        # per-map capacity tier (maps grow independently; loading must
        # rebuild each at its own tier, not the atlas default)
        'map_config': {str(mid): vars(m.cfg) for mid, m in atlas.maps.items()},
        'extra': extra or {},
    }
    for mid, m in atlas.maps.items():
        for name, arr in _map_arrays(m).items():
            blobs[f'map{mid}/{name}'] = arr
        meta['map_scalars'][str(mid)] = {
            s: (int(getattr(m, s)) if not isinstance(getattr(m, s), bool)
                else bool(getattr(m, s)))
            for s in _MAP_SCALARS}
    blobs['__meta__'] = np.frombuffer(
        json.dumps(meta, default=str).encode(), np.uint8)
    np.savez_compressed(path, **blobs)


def load_atlas(path: str, vocab=None, check_vocab: bool = True) -> Atlas:
    """Restore an atlas; previously-stored maps become stored maps of a new
    Atlas whose active map is FRESH (reference `System.cc:172`)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z['__meta__']).decode())
        if meta['format'] != FORMAT_VERSION:
            raise ValueError(f"checkpoint format {meta['format']} != "
                             f"{FORMAT_VERSION}")
        if check_vocab and meta['vocab_md5'] != vocab_fingerprint(vocab):
            raise ValueError(
                'vocabulary fingerprint mismatch: checkpoint was built with '
                'a different vocabulary (reference System.cc:1634-1673 '
                'enforces the same invariant via MD5)')
        cfg = MapConfig(**{k: int(v) for k, v in meta['config'].items()})
        atlas = Atlas(cfg)
        atlas.maps.clear()  # drop the auto-created map; restore from blobs
        for mid in meta['map_ids']:
            mc = meta.get('map_config', {}).get(str(mid))
            mcfg = (MapConfig(**{k: int(v) for k, v in mc.items()})
                    if mc else cfg)
            m = MapState(mcfg, map_id=int(mid))
            for name in _map_arrays(m):
                key = f'map{mid}/{name}'
                if key in z:
                    arr = z[key]
                    getattr(m, name)[...] = arr
            for s, v in meta['map_scalars'][str(mid)].items():
                setattr(m, s, v)
            atlas.maps[int(mid)] = m
        atlas._next_map_id = int(meta['next_map_id'])
        # fresh active map on top of the restored ones
        atlas.create_new_map()
    return atlas
