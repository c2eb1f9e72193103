"""IMU initialization ladder: gravity/scale/bias MAP + map re-gauge + VI-BA.

TPU-native equivalent of `LocalMapping::InitializeIMU/ScaleRefinement`
(`/root/reference/src/LocalMapping.cc:1177-1500`) and the `FullInertialBA`
dispatch (`/root/reference/src/Optimizer.cc:392`): the staged ladder is host
logic; every solve is a jitted device program from `opt.inertial`.

Stages (driven by LocalMapper, reference LocalMapping.cc:185-244):
  0. first init  — inertial-only MAP with priors (1e2, 1e10), then the map is
     re-gauged in place (`MapState.apply_scaled_rotation`) so gravity is -z
     and the monocular scale is metric, then a short full VI-BA;
  1. VIBA1 (t > 5 s)  — re-solve with priors (1.0, 1e5), apply scale drift;
  2. VIBA2 (t > 15 s) — re-solve with priors (0, 0);
  +  scale refinement every ~10 s up to 75 s (mono only).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.imu.preintegration import ImuCalib
from orbslam3_tpu.opt import inertial as iopt
from orbslam3_tpu.slam_map.map_state import MapState


def temporal_chain(m: MapState) -> list[int]:
    """Valid keyframes in temporal order (the reference's mPrevKF chain,
    which for this engine is equivalent to timestamp order)."""
    ks = m.keyframe_ids()
    return [int(k) for k in ks[np.argsort(m.kf_ts[ks], kind="stable")]]


def chain_with_preint(m: MapState) -> tuple[list[int], list]:
    """Longest contiguous inertial chain. Returns (kfs, pres) with
    len(pres) == len(kfs) - 1.

    Walks the explicit `kf_prev` links (the reference's mPrevKF chain,
    KeyFrame.h temporal chain) rather than sorting all keyframes by
    timestamp: with multiple tracking lanes on a shared map, interleaved
    keyframes from different lanes are NOT spanned by each other's
    preintegration, so a global timestamp sort would pair preintegration
    edges with the wrong intervals. A chain link k is usable only when k
    carries a preintegration (kf_pre[k] spans kf_prev[k] -> k)."""
    ks = m.keyframe_ids()
    valid = set(int(k) for k in ks)
    # heads: keyframes whose predecessor is absent/culled/never set
    chains: list[list[int]] = []
    succ: dict[int, list[int]] = {}
    heads = []
    for k in valid:
        p = int(m.kf_prev[k])
        if p in valid:
            succ.setdefault(p, []).append(k)
        if p not in valid or m.kf_pre.get(k) is None:
            # chain start: no live predecessor, or the preintegration that
            # would span the incoming link is missing (chain break)
            heads.append(k)
    for h in heads:
        chain = [h]
        cur = h
        while True:
            nxts = sorted(succ.get(cur, []), key=lambda j: m.kf_ts[j])
            nxt = None
            for cand in nxts:
                if m.kf_pre.get(cand) is not None:
                    nxt = cand
                    break
            if nxt is None:
                break
            chain.append(nxt)
            cur = nxt
        chains.append(chain)
    if not chains:
        return [], []
    best = max(chains, key=len)
    pres = [m.kf_pre[k] for k in best[1:]]
    return best, pres


def cam_from_body(calib: ImuCalib):
    """ImuCalib stores Tbc (body<-camera); the solvers take Tcb (camera<-body)."""
    Rbc = np.asarray(calib.Rbc, np.float32)
    tbc = np.asarray(calib.tbc, np.float32)
    Rcb = Rbc.T
    tcb = -Rbc.T @ tbc
    return Rcb, tcb


def body_poses(m: MapState, ks: list[int], calib: ImuCalib):
    """Tcw keyframe poses -> body poses (Rwb, twb) via the camera-from-body
    extrinsics (reference ImuCamPose, G2oTypes.h:130)."""
    Rcb, tcb = cam_from_body(calib)
    Rcw = m.kf_R[ks]
    tcw = m.kf_t[ks]
    Rwb = np.einsum("kji,jl->kil", Rcw, Rcb)           # Rcw^T @ Rcb
    twb = np.einsum("kji,kj->ki", Rcw, tcb[None] - tcw)
    return jnp.asarray(Rwb), jnp.asarray(twb)


def initialize_imu(
    m: MapState,
    calib: ImuCalib,
    prior_gyro: float = 1e2,
    prior_acc: float = 1e10,
    fix_scale: bool = False,
    fix_vel: bool = False,
    regauge: bool = True,
    min_kfs: int = 6,
    n_iters: int = 20,
):
    """One rung of the init ladder. Returns the `InertialInit` (or None if
    the chain is too short / the solve is rejected).

    On success with `regauge`: the map is re-gauged to metric gravity-aligned
    coordinates, per-KF velocities/biases are written, and
    `m.imu_initialized` is set — the reference's
    InitializeIMU -> ApplyScaledRotation -> UpdateFrameIMU sequence
    (LocalMapping.cc:1271-1330).
    """
    kfs, pres = chain_with_preint(m)
    if len(kfs) < min_kfs:
        return None
    pairs = [(i, i + 1) for i in range(len(kfs) - 1)]
    edges = iopt.build_edges(pres, pairs)
    Rwb, twb = body_poses(m, kfs, calib)
    v0 = jnp.asarray(m.kf_vel[kfs]) if m.imu_initialized else None
    init = iopt.inertial_only_optimize(
        Rwb, twb, edges, prior_gyro=prior_gyro, prior_acc=prior_acc,
        v0=v0, n_iters=n_iters, fix_scale=fix_scale, fix_vel=fix_vel)
    s = float(init.scale)
    if not np.isfinite(s) or s < 1e-1:
        # reference aborts on degenerate scale (LocalMapping.cc:1275-1280)
        return None

    Rgw = np.asarray(init.Rwg).T  # new world: gravity along -z
    if regauge:
        # rotation angle of the residual gravity correction
        ang = float(np.arccos(np.clip((np.trace(Rgw) - 1.0) / 2.0, -1.0, 1.0)))
        if (not m.imu_initialized) or abs(s - 1.0) > 1e-5 or ang > 1e-3:
            # later rungs re-apply the FULL gravity-direction correction too
            # (reference ApplyScaledRotation(Twg, scale) whenever it corrects,
            # LocalMapping.cc:1285-1289) — not just the scale; otherwise
            # residual gravity misalignment after the first init is never
            # fixed and VI-BA's -z gravity assumption is silently violated.
            m.apply_scaled_rotation(Rgw, s)
        v_new = s * (np.asarray(init.v) @ Rgw.T)
        m.kf_vel[kfs] = v_new.astype(np.float32)
        m.kf_bias[kfs] = np.asarray(init.bias, np.float32)
        m.imu_initialized = True
    return init


def full_inertial_ba(m: MapState, calib: ImuCalib, camera,
                     n_iters: int = 8, points_cap: int = 4096,
                     obs_cap: int = 16384, fix_first: bool = True,
                     window: int | None = None,
                     prior_gyro: float = 0.0, prior_acc: float = 0.0):
    """Visual-inertial BA over the temporal chain (reference
    `FullInertialBA`, Optimizer.cc:392 — run once after IMU init; with
    `window=W` it becomes the sliding-window `LocalInertialBA`,
    Optimizer.cc:2383: the last W chain KFs optimize, the one before them is
    the fixed border). Writes optimized poses/velocities/biases/points back
    into the map."""
    kfs, pres = chain_with_preint(m)
    windowed = window is not None and len(kfs) > window + 1
    if windowed:
        cut = len(kfs) - (window + 1)  # keep one extra as the fixed border
        kfs, pres = kfs[cut:], pres[cut:]
        fix_first = True
    return _viba_over_chains(m, calib, camera, [(kfs, pres)],
                             n_iters=n_iters, points_cap=points_cap,
                             obs_cap=obs_cap, fix_first=fix_first,
                             windowed=windowed, prior_gyro=prior_gyro,
                             prior_acc=prior_acc)


def _window_back(m: MapState, k: int, window: int):
    """Temporal window ending at `k`: walk kf_prev while the link's
    preintegration exists, up to `window` optimizable KFs + 1 border."""
    kfs = [int(k)]
    pres = []
    while len(kfs) < window + 1:
        cur = kfs[0]
        p = int(m.kf_prev[cur])
        pre = m.kf_pre.get(cur)
        if p < 0 or not m.kf_valid[p] or pre is None:
            break
        kfs.insert(0, p)
        pres.insert(0, pre)
    return kfs, pres


def merge_inertial_ba(m: MapState, calib: ImuCalib, camera,
                      cur_kf: int, merge_kf: int, window: int = 10,
                      n_iters: int = 8, points_cap: int = 4096,
                      obs_cap: int = 16384):
    """Welding-window visual-inertial BA over the merge seam (reference
    `Optimizer::MergeInertialBA`, Optimizer.cc:3948, called from
    `LoopClosing::MergeLocal2`, LoopClosing.cc:1787+): TWO temporal
    windows — one ending at the current keyframe, one at the matched
    keyframe of the welded-in map — each with its own inertial chain,
    coupled VISUALLY through the fused seam landmarks. The back of each
    window is the fixed border."""
    chains = []
    for root in (cur_kf, merge_kf):
        kfs, pres = _window_back(m, root, window)
        if len(kfs) >= 2:
            chains.append((kfs, pres))
    if not chains:
        return None
    # de-dup: if the windows overlap (already same chain), fall back to one
    seen = set(chains[0][0])
    if len(chains) == 2 and any(k in seen for k in chains[1][0]):
        chains = chains[:1]
    return _viba_over_chains(m, calib, camera, chains, n_iters=n_iters,
                             points_cap=points_cap, obs_cap=obs_cap,
                             fix_first=True, windowed=True)


def _viba_over_chains(m: MapState, calib: ImuCalib, camera,
                      chains: list, n_iters: int = 8,
                      points_cap: int = 4096, obs_cap: int = 16384,
                      fix_first: bool = True, windowed: bool = False,
                      prior_gyro: float = 0.0, prior_acc: float = 0.0):
    """Core VI-BA over one or more temporal chains sharing a landmark set."""
    kfs = []
    pairs = []
    pres = []
    chain_starts = []
    for c_kfs, c_pres in chains:
        off = len(kfs)
        chain_starts.append(off)
        pairs += [(off + i, off + i + 1) for i in range(len(c_kfs) - 1)]
        kfs += list(c_kfs)
        pres += list(c_pres)
    if len(kfs) < 3:
        return None
    n_chain = len(kfs)

    obs = m.kf_obs_mp[kfs]
    mp_ids = np.unique(obs[obs >= 0])
    mp_ids = mp_ids[m.mp_valid[mp_ids]][:points_cap]
    P = len(mp_ids)
    if P == 0:
        return None

    fixed_obs: list[int] = []
    if windowed:
        # FIXED observer border (reference LocalInertialBA's
        # lFixedKeyFrames, Optimizer.cc:2440-2480): out-of-window keyframes
        # that observe the window's landmarks join as fixed visual anchors.
        # Without them every window solve moves the landmarks free of the
        # older map's observations and the gauge drifts cumulatively
        # (measured: ~3%/keyframe scale inflation on the VI golden run).
        in_chain = np.zeros(m.cfg.max_keyframes, bool)
        in_chain[kfs] = True
        mp_mask = np.zeros(m.cfg.max_points, bool)
        mp_mask[mp_ids] = True
        kk_all, ss_all = np.nonzero(m.kf_valid[:, None] & (m.kf_obs_mp >= 0))
        sees = mp_mask[m.kf_obs_mp[kk_all, ss_all]] & ~in_chain[kk_all]
        cand, counts = np.unique(kk_all[sees], return_counts=True)
        # strongest observers first, small cap to bound the problem
        fixed_obs = [int(x) for x in cand[np.argsort(-counts)][:12]]

    kfs = list(kfs) + fixed_obs
    edges = iopt.build_edges(pres, pairs)
    Rwb, twb = body_poses(m, kfs, calib)
    M = len(kfs)
    lm_lut = np.full(m.cfg.max_points, -1, np.int32)
    lm_lut[mp_ids] = np.arange(P)
    kf_lut = np.full(m.cfg.max_keyframes, -1, np.int32)
    kf_lut[kfs] = np.arange(M)

    kk, slots, mm = m.observations_of(mp_ids)
    sel = (kf_lut[kk] >= 0) & (lm_lut[mm] >= 0)
    kk, slots, mm = kk[sel], slots[sel], mm[sel]
    if len(kk) > obs_cap:
        keep = np.random.default_rng(0).permutation(len(kk))[:obs_cap]
        kk, slots, mm = kk[keep], slots[keep], mm[keep]
    O = len(kk)
    O_pad = obs_cap
    kf_idx = np.zeros(O_pad, np.int32)
    lm_idx = np.zeros(O_pad, np.int32)
    uv = np.zeros((O_pad, 2), np.float32)
    info = np.zeros(O_pad, np.float32)
    valid = np.zeros(O_pad, bool)
    kf_idx[:O] = kf_lut[kk]
    lm_idx[:O] = lm_lut[mm]
    uv[:O] = m.kf_uv[kk, slots]
    info[:O] = 1.0 / (1.2 ** (2 * m.kf_octave[kk, slots]))
    valid[:O] = True

    P_pad = points_cap
    pts = np.zeros((P_pad, 3), np.float32)
    pts[:P] = m.mp_pos[mp_ids]
    fixed_kf = np.zeros(M, bool)
    if fix_first:
        for off in chain_starts:   # each chain's oldest KF is its border
            fixed_kf[off] = True
    fixed_kf[n_chain:] = True  # observer border stays put

    prob = iopt.VIBAProblem(
        Rwb=Rwb, twb=twb,
        vel=jnp.asarray(m.kf_vel[kfs]),
        bias=jnp.asarray(m.kf_bias[kfs]),
        points=jnp.asarray(pts),
        kf_idx=jnp.asarray(kf_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv), info=jnp.asarray(info),
        valid=jnp.asarray(valid),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_lm=jnp.asarray(np.arange(P_pad) >= P),
    )
    Rcb_np, tcb_np = cam_from_body(calib)
    Rcb, tcb = jnp.asarray(Rcb_np), jnp.asarray(tcb_np)
    out, costs = iopt.visual_inertial_ba(prob, edges, camera, Rcb, tcb,
                                         n_iters=n_iters,
                                         prior_gyro=prior_gyro,
                                         prior_acc=prior_acc)

    # write back: body -> camera poses
    Rcw, tcw = iopt.body_to_cam(out.Rwb, out.twb, Rcb, tcb)
    m.kf_R[kfs] = np.asarray(Rcw, np.float32)
    m.kf_t[kfs] = np.asarray(tcw, np.float32)
    m.kf_vel[kfs] = np.asarray(out.vel, np.float32)
    m.kf_bias[kfs] = np.asarray(out.bias, np.float32)
    m.mp_pos[mp_ids] = np.asarray(out.points[:P], np.float32)
    m.change_index += 1
    # VI-BA can re-gauge geometry (nothing pins the similarity gauge except
    # the inertial terms when fix_first=False): the scale-band / normal
    # statistics must follow or the matcher's frustum gates reject the whole
    # map on the next frame (root cause of the post-init tracking loss on
    # the VI and fisheye goldens)
    m.update_point_stats(mp_ids)
    return costs
