"""Dissect why projection matching starves in the soak around frame ~310.

Reruns the soak prefix, then reimplements the search_by_projection gates in
numpy for the current frame and prints per-gate survivor counts.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.local_mapping import LocalMapper
from orbslam3_tpu.engine.tracking import Tracker, TrackerConfig, TrackingState
from orbslam3_tpu.slam_map.map_state import MapConfig, MapState
from orbslam3_tpu.utils import synth
from orbslam3_tpu.kernels import orb_descriptor as desc_k

CAM = Camera.pinhole(458.0, 458.0, 320.0, 240.0, width=640, height=480)
n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 315

world = synth.make_world(n_points=4000, seed=11, min_center_dist=5.5)
R_gt, t_gt = synth.orbit_trajectory(n_frames=3000, radius=3.0,
                                    arc=6.0 * np.pi)
ts = np.arange(3000) * 0.05
m = MapState(MapConfig(max_keyframes=16, max_points=2048,
                       features_per_frame=500))
mapper = LocalMapper(CAM, m)
tr = Tracker(CAM, m, TrackerConfig(n_features=500), local_mapper=mapper)
for i in range(n_probe):
    feats, gt_ids = synth.render_features(
        world, R_gt[i], t_gt[i], CAM, capacity=500, seed=10_000 + i)
    tr.process_features(feats, float(ts[i]))
    if i % 100 == 0:
        print(i, tr.state.name, "n_in", tr.n_inliers, "uid", m._next_uid)

i = n_probe
feats, gt_ids = synth.render_features(
    world, R_gt[i], t_gt[i], CAM, capacity=500, seed=10_000 + i)
print(f"\nprobe frame {i}: tracker {tr.state.name} n_in={tr.n_inliers}")

# candidate set exactly as the tracker builds it
ids_p = tr._local_map_points()
print("local candidate points:", len(ids_p))

R0 = tr._vel_R @ tr.R_cw
t0 = tr._vel_R @ tr.t_cw + tr._vel_t
pos = m.mp_pos[ids_p]
xc = pos @ R0.T + t0
uv = np.asarray(CAM.project(jnp.asarray(xc)))
z_ok = xc[:, 2] > 0
in_img = (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
print("project z>0:", z_ok.sum(), " in-image:", (z_ok & in_img).sum())

center = -R0.T @ t0
pw = pos - center
dist = np.linalg.norm(pw, axis=-1)
mind, maxd = m.mp_min_dist[ids_p], m.mp_max_dist[ids_p]
in_band = (dist >= 0.8 * mind) & (dist <= 1.2 * maxd) & (maxd > 0)
print("scale band ok:", (z_ok & in_img & in_band).sum(),
      " (maxd>0:", (maxd > 0).sum(), ")")

normal = m.mp_normal[ids_p]
has_n = np.linalg.norm(normal, axis=-1) > 1e-6
cosang = np.einsum("ki,ki->k", pw, normal) / np.maximum(dist, 1e-9)
ang_ok = ~has_n | (cosang > 0.5)
print("angle ok:", (z_ok & in_img & in_band & ang_ok).sum())
sel_dbg = z_ok & in_img
print("  cosang pct of in-image:",
      np.round(np.percentile(cosang[sel_dbg], [5, 25, 50, 75, 95]), 2))
print("  dist/maxd pct:", np.round(np.percentile(
    (dist / np.maximum(1.2 * maxd, 1e-9))[sel_dbg],
    [5, 25, 50, 75, 95]), 2))
print("  dist/(0.8*mind) pct:", np.round(np.percentile(
    (dist / np.maximum(0.8 * mind, 1e-9))[sel_dbg],
    [5, 25, 50, 75, 95]), 2))

lvl = np.ceil(np.log(np.maximum(maxd, 1e-9) / np.maximum(dist, 1e-9))
              / np.log(1.2))
lvl = np.clip(lvl, 0, 7).astype(int)
f_oct = np.asarray(feats.octave)
print("  predicted lvl histogram:",
      np.bincount(lvl[(z_ok & in_img)], minlength=8))
print("  feature octave histogram:",
      np.bincount(f_oct[np.asarray(feats.valid)], minlength=8))

# window + per-pair octave gate + descriptor
f_uv = np.asarray(feats.uv)
f_valid = np.asarray(feats.valid)
vis = z_ok & in_img & in_band & ang_ok
d2 = ((uv[:, None, :] - f_uv[None, :, :]) ** 2).sum(-1)
r_oct = 15.0 * (1.2 ** f_oct)
window = d2 <= (r_oct[None, :] ** 2)
oct_pair = np.abs(lvl[:, None] - f_oct[None, :]) <= 1
cands_with_feat = (window & oct_pair & f_valid[None, :]).any(1)
print("in window+octave of some feature:", (vis & cands_with_feat).sum())
window = window & oct_pair

# descriptor distances of candidate-feature pairs inside window
planes_mp = np.asarray(desc_k.descriptor_planes(jnp.asarray(m.mp_desc[ids_p])))
planes_f = np.asarray(desc_k.descriptor_planes(feats.desc))
ham = (256 - planes_mp @ planes_f.T) / 2
ok_pairs = (ham <= 100) & window & f_valid[None, :] & vis[:, None]
print("pairs passing TH (100):", ok_pairs.any(1).sum())
print("min hamming among visible cands:",
      np.percentile(ham[vis].min(1), [10, 50, 90]) if vis.any() else "n/a")

# -- dump 10 band-failing candidates' stats history ---------------------------
fail = np.nonzero(z_ok & in_img & ~in_band)[0][:10]
print("\nband-fail dump (mp, dist_now, maxd_stored, ref_kf, d_ref_now, "
      "oct_ref, maxd_recomputed):")
for j in fail:
    mp = int(ids_p[j])
    rk = int(m.mp_ref_kf[mp])
    if rk >= 0 and m.kf_valid[rk]:
        c_ref = -m.kf_R[rk].T @ m.kf_t[rk]
        d_ref = float(np.linalg.norm(m.mp_pos[mp] - c_ref))
        slot = np.nonzero(m.kf_obs_mp[rk] == mp)[0]
        o = int(m.kf_octave[rk, slot[0]]) if len(slot) else -1
        recompute = d_ref * 1.2 ** o if o >= 0 else -1
    else:
        d_ref, o, recompute = -1, -1, -1
    print(f"  mp{mp} d_now={dist[j]:.2f} maxd={maxd[j]:.2f} ref_kf={rk} "
          f"d_ref_now={d_ref:.2f} oct={o} maxd_recomp={recompute:.2f}")
