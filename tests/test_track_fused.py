"""Unit tests for the one-dispatch fused tracking program
(`engine/track_program.py`): retry-ladder semantics, pose recovery, and the
match bookkeeping the host tracker consumes. Mirrors what the reference's
host chain guarantees (TrackWithMotionModel -> TrackLocalMap,
/root/reference/src/Tracking.cc:2998/3093) without a host round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.track_program import fused_track_pose
from orbslam3_tpu.kernels import orb_descriptor as desc_k


K_CAP = 256     # candidate map-point capacity
F_CAP = 128     # frame feature capacity
N_PTS = 90


def _scene(seed=0, yaw=0.02, t_off=(0.03, -0.01, 0.02)):
    rng = np.random.default_rng(seed)
    cam = Camera.pinhole(458.0, 457.0, 367.0, 248.0)
    pts = np.stack([rng.uniform(-2, 2, N_PTS), rng.uniform(-1.5, 1.5, N_PTS),
                    rng.uniform(4.0, 8.0, N_PTS)], -1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    R_true = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t_true = np.asarray(t_off, np.float32)
    xc = pts @ R_true.T + t_true
    uv = np.asarray(cam.project(jnp.asarray(xc)))
    inside = ((uv[:, 0] > 10) & (uv[:, 0] < 742)
              & (uv[:, 1] > 10) & (uv[:, 1] < 470))

    desc = rng.integers(0, 2**32, size=(N_PTS, 8), dtype=np.uint32)

    mp_pos = np.zeros((K_CAP, 3), np.float32)
    mp_desc = np.zeros((K_CAP, 8), np.uint32)
    mp_valid = np.zeros(K_CAP, bool)
    mp_pos[:N_PTS] = pts
    mp_desc[:N_PTS] = desc
    mp_valid[:N_PTS] = inside
    # scale bands consistent with octave-0 observations at the true view
    # distance (PredictScale gates candidates to |level - octave| <= 1)
    mp_max_d = np.full(K_CAP, 1.0, np.float32)
    mp_max_d[:N_PTS] = np.linalg.norm(xc, axis=-1)
    mp_min_d = mp_max_d / (1.2 ** 8)

    f_uv = np.zeros((F_CAP, 2), np.float32)
    f_desc = rng.integers(0, 2**32, size=(F_CAP, 8), dtype=np.uint32)
    f_oct = np.zeros(F_CAP, np.int32)
    f_valid = np.zeros(F_CAP, bool)
    # map point i observed by feature (i+7)%N_PTS's slot — a nontrivial
    # permutation so index bookkeeping is actually exercised
    perm = (np.arange(N_PTS) + 7) % N_PTS
    f_uv[perm] = uv + rng.normal(0, 0.3, uv.shape)
    f_desc[perm] = desc
    f_valid[perm] = True
    return (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d,
            f_uv, f_desc, f_oct, f_valid, R_true, t_true, perm, inside)


def _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d,
         f_uv, f_desc, f_oct, f_valid,
         R0, t0, allow_last=False, R_last=None, t_last=None,
         radii=(15.0, 30.0, 60.0, 8.0), min_matches=20, min_inliers=15):
    mp_planes = desc_k.descriptor_planes(jnp.asarray(mp_desc))
    f_planes = desc_k.descriptor_planes(jnp.asarray(f_desc))
    zeros3 = np.zeros((K_CAP, 3), np.float32)   # zero normals: angle gate off
    if R_last is None:
        R_last, t_last = R0, t0
    ok, res = fused_track_pose(
        jnp.asarray(mp_pos), mp_planes, jnp.asarray(mp_valid),
        jnp.asarray(zeros3), jnp.asarray(mp_min_d), jnp.asarray(mp_max_d),
        cam, jnp.asarray(f_uv), f_planes, jnp.asarray(f_oct),
        jnp.asarray(f_valid),
        jnp.asarray(R0), jnp.asarray(t0),
        jnp.asarray(R_last), jnp.asarray(t_last),
        jnp.asarray(bool(allow_last)),
        jnp.asarray(radii, jnp.float32),
        jnp.asarray(min_matches, jnp.int32),
        jnp.asarray(min_inliers, jnp.int32))
    return bool(ok), jax.device_get(res)


def test_tracks_from_good_prediction():
    (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv, f_desc,
     f_oct, f_valid, R_true, t_true, perm, inside) = _scene()
    ok, res = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                   f_desc, f_oct, f_valid, R_true, t_true + 0.01)
    assert ok
    assert int(res["n_in"]) >= 40
    assert np.linalg.norm(res["t"] - t_true) < 5e-3
    assert np.linalg.norm(res["R"] - R_true) < 1e-3


def test_bookkeeping_maps_candidates_to_features():
    (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv, f_desc,
     f_oct, f_valid, R_true, t_true, perm, inside) = _scene()
    ok, res = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                   f_desc, f_oct, f_valid, R_true, t_true)
    assert ok
    mask = res["vsel"]
    sel = res["sel"][mask]          # candidate (map point) indices
    fsel = res["fidx"][mask]        # frame feature indices
    # every reported match must be the planted correspondence i -> perm[i]
    assert (perm[sel] == fsel).all()
    # uv/octave gathers line up with the matched features
    assert np.allclose(res["uv"][mask], f_uv[fsel])
    assert (res["oct"][mask] == f_oct[fsel]).all()


def test_ladder_widens_to_recover():
    (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv, f_desc,
     f_oct, f_valid, R_true, t_true, perm, inside) = _scene()
    # prediction off by ~25 px at the image center: narrow (15 px) fails,
    # wide (30 px) recovers
    t_bad = t_true + np.array([0.35, 0.0, 0.0], np.float32)
    ok, res = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                   f_desc, f_oct, f_valid, R_true, t_bad)
    assert ok
    assert np.linalg.norm(res["t"] - t_true) < 8e-3


def test_recently_lost_stage_gated_by_allow_last():
    (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv, f_desc,
     f_oct, f_valid, R_true, t_true, perm, inside) = _scene()
    # prediction hopeless; last known-good pose is right: only the
    # allow_last (RECENTLY_LOST) stage can recover
    t_bad = t_true + np.array([3.0, 0.0, 0.0], np.float32)
    ok, _ = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                 f_desc, f_oct, f_valid, R_true, t_bad, allow_last=False,
                 R_last=R_true, t_last=t_true)
    assert not ok
    ok2, res2 = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                     f_desc, f_oct, f_valid, R_true, t_bad, allow_last=True,
                     R_last=R_true, t_last=t_true)
    assert ok2
    assert np.linalg.norm(res2["t"] - t_true) < 8e-3


def test_no_map_overlap_fails():
    (cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv, f_desc,
     f_oct, f_valid, R_true, t_true, perm, inside) = _scene()
    # camera turned 180 degrees: nothing projects
    R_away = -np.eye(3, dtype=np.float32)
    R_away[1, 1] = 1.0
    ok, _ = _run(cam, mp_pos, mp_desc, mp_valid, mp_min_d, mp_max_d, f_uv,
                 f_desc, f_oct, f_valid, R_away, t_true, allow_last=True,
                 R_last=R_away, t_last=t_true)
    assert not ok
