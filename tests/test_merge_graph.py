"""Post-merge global consistency (VERDICT r4 missing #1).

After `MergeLocal` the reference optimizes the welding window, then runs the
merge-overload essential graph over the merged map so the window's BA
correction propagates to the far end of the welded-in map, and finally
spawns a global BA (`/root/reference/src/LoopClosing.cc:1719-1773`,
`src/Optimizer.cc:1785`). These tests pin both behaviors:

  * `_merge_essential_graph` rigidly transports a seam correction to the
    welded-in keyframes outside the window (unit);
  * a full `_merge_maps` with a deliberately imperfect seam Sim3 ends with
    the far end of the welded-in map MUCH closer to truth than the same
    merge with the essential-graph stage disabled, and a GBA has run.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from orbslam3_tpu.core import lie
from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.loop_closing import LoopCloser, LoopCloserConfig
from orbslam3_tpu.place.database import KeyFrameDatabase
from orbslam3_tpu.place.vocab import build_vocabulary
from orbslam3_tpu.slam_map.atlas import Atlas
from orbslam3_tpu.slam_map.map_state import MapConfig

RNG = np.random.default_rng(31)
CAM = Camera.pinhole(458.0, 457.0, 376.0, 240.0)


def circle_poses(n, radius=6.0, arc=2 * np.pi, a0=0.0):
    Rs, ts = [], []
    for i in range(n):
        a = a0 + arc * i / n
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).T.astype(np.float32)
        t = (-R @ c).astype(np.float32)
        Rs.append(R)
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


def add_kf(m, i, R, t, pts, ids, desc, prev, N=512, subset=None):
    xc = pts @ R.T + t
    uv = np.array(CAM.project(jnp.asarray(xc)))
    vis = (xc[:, 2] > 0.5) & (np.abs(uv[:, 0] - 376) < 370) \
        & (np.abs(uv[:, 1] - 240) < 235)
    if subset is not None:
        keep = np.zeros(len(pts), bool)
        keep[subset] = True
        vis &= keep
    sel = np.nonzero(vis)[0][:N]
    kf_uv = np.zeros((N, 2), np.float32)
    kf_desc = np.zeros((N, 8), np.uint32)
    obs = np.full(N, -1, np.int32)
    valid = np.zeros(N, bool)
    kf_uv[:len(sel)] = uv[sel]
    kf_desc[:len(sel)] = desc[sel]
    obs[:len(sel)] = ids[sel]
    valid[:len(sel)] = True
    return m.add_keyframe(R.astype(np.float32), t.astype(np.float32),
                          float(i), i, kf_uv, np.zeros(N, np.int32),
                          np.zeros(N, np.float32), kf_desc, valid, obs,
                          prev_kf=prev)


def centers_err(m, kfs, R_true, t_true, idx):
    errs = []
    for k, i in zip(kfs, idx):
        c = -m.kf_R[k].T @ m.kf_t[k]
        ct = -R_true[i].T @ t_true[i]
        errs.append(np.linalg.norm(c - ct))
    return np.asarray(errs)


def test_merge_essential_graph_transports_seam_correction():
    """Window KFs were moved by the welding BA; the graph must carry that
    correction to the non-window welded keyframes (and their landmarks)."""
    cfg = MapConfig(max_keyframes=32, max_points=4096,
                    features_per_frame=512)
    m = Atlas(cfg).active
    M = 12
    R_true, t_true = circle_poses(M)
    pts = np.stack([RNG.uniform(-1.5, 1.5, 500), RNG.uniform(-1.5, 1.5, 500),
                    RNG.uniform(-1.5, 1.5, 500)], -1).astype(np.float32)
    desc = RNG.integers(0, 2**32, (500, 8), dtype=np.uint32)
    # disjoint landmark halves — a real merge's two maps only share
    # covisibility through the welding window, so give the stored half set
    # A and the welded half a duplicated set B (as atlas.weld leaves them
    # before fusion); only the window observes both
    ids_a = m.add_points(pts, desc, first_kf=0)
    desc_b = RNG.integers(0, 2**32, (500, 8), dtype=np.uint32)

    # world-frame offset the "pre-BA" welded poses carry
    G = Rotation.from_rotvec([0, 0, 0.05]).as_matrix().astype(np.float32)
    g_t = np.array([0.25, -0.1, 0.0], np.float32)
    pts_b = (pts @ G.T + g_t).astype(np.float32)
    ids_b = m.add_points(pts_b, desc_b, first_kf=6)

    kfs = []
    prev = -1
    pre_R, pre_t = {}, {}
    for i in range(M):
        R, t = R_true[i], t_true[i]
        # offset pose: T_est = T_true o (G, g_t)^-1 in world
        R_off = (R @ G.T).astype(np.float32)
        t_off = (t - R_off @ g_t).astype(np.float32)
        if i < 6:
            k = add_kf(m, i, R, t, pts, ids_a, desc, prev)
            pre_R[k], pre_t[k] = R.copy(), t.copy()
        elif i < 8:
            # welding window: BA already moved these onto truth; the graph
            # only sees their PRE-BA pose through pre_R/pre_t. They observe
            # BOTH halves (seam covisibility after fusion): A points in the
            # first 256 feature slots, B points in the rest.
            k = add_kf(m, i, R, t, pts, ids_a, desc, prev)
            xc = pts_b @ R_off.T + t_off
            uv = np.array(CAM.project(jnp.asarray(xc)))
            vis = (xc[:, 2] > 0.5) & (np.abs(uv[:, 0] - 376) < 370) \
                & (np.abs(uv[:, 1] - 240) < 235)
            sel = np.nonzero(vis)[0][:256]
            sl = slice(256, 256 + len(sel))
            m.kf_uv[k][sl] = uv[sel]
            m.kf_desc[k][sl] = desc_b[sel]
            m.kf_obs_mp[k][sl] = ids_b[sel]
            m.kf_feat_valid[k][sl] = True
            pre_R[k], pre_t[k] = R_off.copy(), t_off.copy()
        else:
            k = add_kf(m, i, R_off, t_off, pts_b, ids_b, desc_b, prev)
            pre_R[k], pre_t[k] = R_off.copy(), t_off.copy()
        kfs.append(k)
        prev = k

    # a couple of landmarks referenced by a free welded keyframe must be
    # re-expressed along with it
    far_pts = (pts[:5] @ G.T + g_t).astype(np.float32)  # wrong-world coords
    far_ids = m.add_points(far_pts,
                           RNG.integers(0, 2**32, (5, 8), dtype=np.uint32),
                           first_kf=kfs[10])

    db = KeyFrameDatabase(
        build_vocabulary(RNG.integers(0, 2**32, (500, 8), dtype=np.uint32),
                         k=6, depth=3), max_keyframes=32)
    lc = LoopCloser(CAM, Atlas(cfg), db, LoopCloserConfig(fix_scale=True))

    welded = set(kfs[6:])
    window = kfs[6:8]
    before = centers_err(m, kfs[8:], R_true, t_true, range(8, M))
    assert before.min() > 0.2, "scenario must start with far-end drift"
    lc._merge_essential_graph(m, welded, window, pre_R, pre_t)
    after = centers_err(m, kfs[8:], R_true, t_true, range(8, M))
    assert after.max() < 0.05 * before.min(), (
        f"graph did not transport the correction: {after} vs {before}")
    # stored half untouched
    assert centers_err(m, kfs[:6], R_true, t_true, range(6)).max() < 1e-5
    # free-KF landmarks re-expressed into the corrected world
    assert np.abs(m.mp_pos[far_ids] - pts[:5]).max() < 0.05


def _two_map_merge(run_graph: bool, run_gba: bool = False):
    """Stored map A covers the first 2/3 of a circle at truth; active map B
    covers the last half with a uniform world offset. The seam Sim3 handed
    to _merge_maps is additionally perturbed, so only the welding-window BA
    (against fused true landmarks) can discover the residual correction —
    which reaches B's far end only through the essential graph."""
    cfg = MapConfig(max_keyframes=64, max_points=8192,
                    features_per_frame=512)
    atlas = Atlas(cfg)
    m_old = atlas.active
    M = 18
    R_true, t_true = circle_poses(M)
    pts = np.stack([RNG.uniform(-1.5, 1.5, 600), RNG.uniform(-1.5, 1.5, 600),
                    RNG.uniform(-1.5, 1.5, 600)], -1).astype(np.float32)
    desc = RNG.integers(0, 2**32, (600, 8), dtype=np.uint32)

    ids_a = m_old.add_points(pts, desc, first_kf=0)
    kfs_a = []
    prev = -1
    for i in range(12):
        k = add_kf(m_old, i, R_true[i], t_true[i], pts, ids_a, desc, prev)
        kfs_a.append(k)
        prev = k

    # active map B: frames 9..17, world offset by (G, g_t)
    mid_b = atlas.create_new_map()
    m_b = atlas.maps[mid_b]
    G = Rotation.from_rotvec([0, 0, 0.04]).as_matrix().astype(np.float32)
    g_t = np.array([0.2, -0.15, 0.1], np.float32)
    pts_b = (pts @ G.T + g_t).astype(np.float32)
    # duplicated landmarks keep the SAME descriptors (same physical points
    # re-triangulated in the new session) — the seam fuse matches on them
    ids_b = m_b.add_points(pts_b, desc, first_kf=0)
    kfs_b = []
    prev = -1
    for i in range(9, M):
        R_off = (R_true[i] @ G.T).astype(np.float32)
        t_off = (t_true[i] - R_off @ g_t).astype(np.float32)
        # LOCAL visibility: each B keyframe observes a sliding slice of the
        # cloud so covisibility falls off with temporal distance — a real
        # map's structure, and what makes a "far end" outside the welding
        # window's covisible border exist at all
        j = i - 9
        sub = np.arange(60 * j, min(60 * j + 180, 600))
        k = add_kf(m_b, i, R_off, t_off, pts_b, ids_b, desc, prev,
                   subset=sub)
        kfs_b.append(k)
        prev = k

    db = KeyFrameDatabase(
        build_vocabulary(RNG.integers(0, 2**32, (600, 8), dtype=np.uint32),
                         k=6, depth=3), max_keyframes=64)
    lc = LoopCloser(CAM, atlas, db,
                    LoopCloserConfig(fix_scale=True, gba_iters=5,
                                     run_global_ba=run_gba))
    lc.gba_background = False
    if not run_graph:
        lc._merge_essential_graph = lambda *a, **k: None

    # seam: B's first KF (frame 9) against A's KF 9 — but hand the merge a
    # PERTURBED Sim3 so the weld alone leaves a residual error everywhere
    cur, cand = kfs_b[0], kfs_a[9]
    # true S_cur<-cand maps a physical point's cand-camera coords into
    # cur-camera coords: x_cur = T_curB(D(T_cand^-1 x_cand)) where
    # D = (G, g_t) is the A-world -> B-world drift
    R_cur, t_cur = m_b.kf_R[cur], m_b.kf_t[cur]
    R_ca = R_cur @ G @ m_old.kf_R[cand].T
    t_ca = t_cur + R_cur @ g_t - R_ca @ m_old.kf_t[cand]
    # perturbation sized to stay inside the seam fuse's 4 px match radius
    # (0.004 rad * f458 ~ 1.8 px) so the welding BA can still lock on
    P = Rotation.from_rotvec([0, 0, 0.004]).as_matrix().astype(np.float32)
    R_pert = (P @ R_ca).astype(np.float32)
    t_pert = (t_ca + np.array([0.03, 0.02, 0.0], np.float32))

    atlas.change_map(mid_b)
    ev = lc._merge_maps(m_b, cur, m_old, cand, 1.0, R_pert, t_pert, 50)
    merged = atlas.maps[m_old.map_id]
    far = [ev.kf_map[k] for k in kfs_b[-4:]]
    err = centers_err(merged, far, R_true, t_true, range(M - 4, M))
    return float(err.mean()), lc, merged


def test_merge_far_end_corrected_and_gba_runs():
    # GBA disabled in the A/B pair so the essential graph's own
    # contribution is what's measured (this synthetic scenario is densely
    # covisible enough that a full GBA would fix it regardless)
    err_with, lc, merged = _two_map_merge(run_graph=True)
    err_without, _, _ = _two_map_merge(run_graph=False)
    # the essential graph must pull B's far end decisively closer to truth
    assert err_with < 0.5 * err_without, (
        f"far-end err with graph {err_with:.4f} vs without "
        f"{err_without:.4f}")
    assert err_with < 0.05, f"far-end err {err_with:.4f}"
    # and the merge path must spawn a global BA (LoopClosing.cc:1773);
    # inline mode finishes before _merge_maps returns
    _, lc_gba, _ = _two_map_merge(run_graph=True, run_gba=True)
    assert lc_gba.gba.n_finished >= 1
