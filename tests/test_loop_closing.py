"""Loop closing: pose-graph optimization, Atlas welding, and the full
detect -> Sim3 -> correct pipeline on a synthetic drifted revisit."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from orbslam3_tpu.core import lie
from orbslam3_tpu.core.camera import Camera
from orbslam3_tpu.engine.loop_closing import LoopCloser, LoopCloserConfig
from orbslam3_tpu.opt.pose_graph import (DOF_SIM3, PoseGraph,
                                         optimize_pose_graph)
from orbslam3_tpu.place.database import KeyFrameDatabase
from orbslam3_tpu.place.vocab import build_vocabulary
from orbslam3_tpu.slam_map.atlas import Atlas
from orbslam3_tpu.slam_map.map_state import MapConfig

RNG = np.random.default_rng(17)
CAM = Camera.pinhole(458.0, 457.0, 376.0, 240.0)


def circle_poses(n, radius=6.0, look_at=(0, 0, 0)):
    """n Tcw poses on a circle in the z=0 plane, cameras facing the center."""
    Rs, ts = [], []
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        # camera z axis points at the target
        z = np.asarray(look_at) - c
        z = z / np.linalg.norm(z)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], 1)
        R = Rwc.T.astype(np.float32)
        t = (-R @ c).astype(np.float32)
        Rs.append(R)
        ts.append(t)
    return np.stack(Rs), np.stack(ts)


class TestPoseGraph:
    def test_ring_drift_closed(self):
        """Odometry chain with per-edge drift; one exact loop edge fixes it."""
        M = 12
        R_true, t_true = circle_poses(M)
        # drifted estimates: accumulate a small error along the chain
        s_est = np.ones(M, np.float32)
        R_est = R_true.copy()
        t_est = t_true.copy()
        dR = Rotation.from_rotvec([0, 0, 0.03]).as_matrix().astype(np.float32)
        acc_R, acc_t, acc_s = np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0
        for i in range(1, M):
            acc_s *= 1.02
            acc_R = dR @ acc_R
            acc_t = acc_t + np.array([0.01, 0.0, 0.0], np.float32)
            # S_iw_est = T_iw_true o D_i (world-frame drift: moves centers)
            si, Ri, ti = lie.sim3_compose(
                jnp.asarray(1.0, jnp.float32), jnp.asarray(R_true[i]),
                jnp.asarray(t_true[i]), jnp.asarray(acc_s, jnp.float32),
                jnp.asarray(acc_R), jnp.asarray(acc_t))
            s_est[i], R_est[i], t_est[i] = float(si), np.asarray(Ri), np.asarray(ti)

        # edges: chain measurements from the DRIFTED poses (odometry is
        # consistent with the estimate), loop edge 0->last from TRUTH
        e_i, e_j, m_s, m_R, m_t = [], [], [], [], []
        for i in range(M - 1):
            # S_ji from drifted (estimate-consistent) relative poses
            sj, Rj, tj = lie.sim3_compose(
                jnp.asarray(s_est[i + 1], jnp.float32), jnp.asarray(R_est[i + 1]),
                jnp.asarray(t_est[i + 1]),
                *lie.sim3_inverse(jnp.asarray(s_est[i], jnp.float32),
                                  jnp.asarray(R_est[i]), jnp.asarray(t_est[i])))
            e_i.append(i); e_j.append(i + 1)
            m_s.append(float(sj)); m_R.append(np.asarray(Rj)); m_t.append(np.asarray(tj))
        # loop edge with the true relative transform (what Sim3 RANSAC finds)
        sj, Rj, tj = lie.sim3_compose(
            jnp.asarray(1.0, jnp.float32), jnp.asarray(R_true[M - 1]),
            jnp.asarray(t_true[M - 1]),
            *lie.sim3_inverse(jnp.asarray(1.0, jnp.float32),
                              jnp.asarray(R_true[0]), jnp.asarray(t_true[0])))
        e_i.append(0); e_j.append(M - 1)
        m_s.append(float(sj)); m_R.append(np.asarray(Rj)); m_t.append(np.asarray(tj))

        dof = np.tile(np.asarray(DOF_SIM3), (M, 1)).astype(np.float32)
        dof[0] = 0.0  # fix the first pose
        g = PoseGraph(
            s=jnp.asarray(s_est), R=jnp.asarray(R_est), t=jnp.asarray(t_est),
            e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
            m_s=jnp.asarray(m_s, jnp.float32), m_R=jnp.asarray(np.stack(m_R)),
            m_t=jnp.asarray(np.stack(m_t)), w=jnp.ones(len(e_i)),
            dof=jnp.asarray(dof))
        s, R, t = optimize_pose_graph(g, n_iters=30)
        s, R, t = np.asarray(s), np.asarray(R), np.asarray(t)

        # error of the last pose before vs after
        def pose_err(Ra, ta, sa):
            # camera center error vs truth
            ca = -(Ra.T @ (ta / sa))
            ct = -(R_true[M - 1].T @ t_true[M - 1])
            return np.linalg.norm(ca - ct)

        err_before = pose_err(R_est[M - 1], t_est[M - 1], s_est[M - 1])
        err_after = pose_err(R[M - 1], t[M - 1], s[M - 1])
        assert err_before > 0.3
        assert err_after < 0.15 * err_before
        # scales should have relaxed back toward 1
        assert abs(float(s[M - 1]) - 1.0) < 0.05


class TestAtlasWeld:
    def test_weld_preserves_projections(self):
        cfg = MapConfig(max_keyframes=16, max_points=256, features_per_frame=64)
        atlas = Atlas(cfg)
        m0 = atlas.active
        # map 1 = source to weld
        mid1 = atlas.create_new_map()
        m1 = atlas.maps[mid1]
        pts = np.stack([RNG.uniform(-2, 2, 50), RNG.uniform(-2, 2, 50),
                        RNG.uniform(4, 8, 50)], -1).astype(np.float32)
        desc = RNG.integers(0, 2**32, (50, 8), dtype=np.uint32)
        ids = m1.add_points(pts, desc, first_kf=0)
        R0 = Rotation.from_rotvec([0.05, 0.1, 0.0]).as_matrix().astype(np.float32)
        t0 = np.array([0.2, -0.1, 0.3], np.float32)
        obs = np.full(64, -1, np.int32)
        obs[:50] = ids
        uv = np.zeros((64, 2), np.float32)
        uv[:50] = np.asarray(CAM.project(jnp.asarray(pts @ R0.T + t0)))
        k = m1.add_keyframe(R0, t0, 0.0, 0, uv, np.zeros(64, np.int32),
                            np.zeros(64, np.float32), np.zeros((64, 8), np.uint32),
                            obs >= 0, obs)
        # weld with a known Sim3
        s = 1.5
        Rw = Rotation.from_rotvec([0, 0, 0.4]).as_matrix().astype(np.float32)
        tw = np.array([1.0, 2.0, -0.5], np.float32)
        kf_map = atlas.weld(m0.map_id, mid1, s, Rw, tw)
        assert atlas.active_id == m0.map_id
        nk = kf_map[k]
        # every welded landmark must reproject to the same pixel through the
        # welded pose
        mp = m0.kf_obs_mp[nk]
        sel = np.nonzero(mp >= 0)[0]
        P = m0.mp_pos[mp[sel]]
        pred = np.asarray(CAM.project(jnp.asarray(
            P @ m0.kf_R[nk].T + m0.kf_t[nk])))
        np.testing.assert_allclose(pred, m0.kf_uv[nk][sel], atol=0.1)


def build_revisit_scenario(drift_rotvec=(0, 0, 0.06), drift_t=(0.3, 0.0, 0.0),
                           drift_s=1.1, n_old=8, n_new=4, n_pts=300):
    """A 12-KF circle: KFs [0..n_old) observe landmark set A (true world);
    KFs [n_old..) observe a duplicated, drifted landmark set B with poses
    drifted consistently, ending where KF0 started (a revisit)."""
    cfg = MapConfig(max_keyframes=32, max_points=2048, features_per_frame=512)
    atlas = Atlas(cfg)
    m = atlas.active
    M = n_old + n_new
    R_true, t_true = circle_poses(M, radius=6.0)
    # world landmarks near the origin so every camera sees them
    pts = np.stack([RNG.uniform(-1.5, 1.5, n_pts), RNG.uniform(-1.5, 1.5, n_pts),
                    RNG.uniform(-1.5, 1.5, n_pts)], -1).astype(np.float32)
    desc = RNG.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)

    ids_A = m.add_points(pts, desc, first_kf=0)
    # drift Sim3 D: world -> drifted world
    Rd = Rotation.from_rotvec(drift_rotvec).as_matrix().astype(np.float32)
    td = np.asarray(drift_t, np.float32)
    pts_B = (drift_s * pts @ Rd.T + td).astype(np.float32)
    ids_B = m.add_points(pts_B, desc, first_kf=n_old)

    def add_kf(i, ids, positions, prev):
        R, t = R_true[i].copy(), t_true[i].copy()
        if ids is ids_B:
            # pose consistent with drifted landmarks: T' = T_true o D^-1
            si, Ri, ti = lie.sim3_compose(
                jnp.asarray(1.0, jnp.float32), jnp.asarray(R), jnp.asarray(t),
                *lie.sim3_inverse(jnp.asarray(drift_s, jnp.float32),
                                  jnp.asarray(Rd), jnp.asarray(td)))
            # store as SE3 with metric folded into translation (t/s)
            R = np.asarray(Ri, np.float32)
            t = (np.asarray(ti) / float(si)).astype(np.float32)
            positions = pts_B
        xc = positions @ R.T + t
        uv = np.array(CAM.project(jnp.asarray(xc)))
        vis = (xc[:, 2] > 0.5) & (np.abs(uv[:, 0] - 376) < 370) \
            & (np.abs(uv[:, 1] - 240) < 235)
        sel = np.nonzero(vis)[0][:512]
        N = 512
        kf_uv = np.zeros((N, 2), np.float32)
        kf_desc = np.zeros((N, 8), np.uint32)
        obs = np.full(N, -1, np.int32)
        valid = np.zeros(N, bool)
        n = len(sel)
        kf_uv[:n] = uv[sel]
        kf_desc[:n] = desc[sel]
        obs[:n] = ids[sel]
        valid[:n] = True
        return m.add_keyframe(R, t, float(i), i, kf_uv,
                              np.zeros(N, np.int32), np.zeros(N, np.float32),
                              kf_desc, valid, obs, prev_kf=prev)

    kfs = []
    for i in range(n_old):
        kfs.append(add_kf(i, ids_A, pts, kfs[-1] if kfs else -1))
    for i in range(n_old, M):
        kfs.append(add_kf(i, ids_B, pts_B, kfs[-1]))
    return atlas, m, kfs, R_true, t_true, desc


class TestLoopCloser:
    def test_detect_and_close(self):
        atlas, m, kfs, R_true, t_true, desc = build_revisit_scenario()
        voc = build_vocabulary(
            RNG.integers(0, 2**32, (1000, 8), dtype=np.uint32), k=6, depth=3)
        db = KeyFrameDatabase(voc, max_keyframes=32)
        cfg = LoopCloserConfig(consistency_threshold=1, min_kfs_in_map=6,
                               run_global_ba=True, gba_iters=6)
        lc = LoopCloser(CAM, atlas, db, cfg)
        event = None
        for k in kfs:
            ev = lc.process_keyframe(k)
            if ev is not None:
                event = ev
        lc.gba.join()  # background GBA must finish before map assertions
        assert event is not None, "loop not detected"
        assert event.kind == "loop"
        # drift scale was 1.1; the loop Sim3 (S_cur<-cand, the reference's
        # Scm) maps trusted-scale candidate coords into the drifted current
        # frame -> scale ~1.1
        assert abs(event.scale - 1.1) < 0.02
        # The invariant of a closed loop: the RELATIVE pose between the loop
        # keyframe and the matched keyframe matches truth (the step-drift
        # misfit is legitimately distributed over the rest of the graph —
        # absolute positions are not the pose graph's contract).
        cur, cand = event.kf, event.matched_kf
        R_rel = m.kf_R[cur] @ m.kf_R[cand].T
        t_rel = m.kf_t[cur] - R_rel @ m.kf_t[cand]
        R_rel_true = R_true[cur] @ R_true[cand].T
        t_rel_true = t_true[cur] - R_rel_true @ t_true[cand]
        rot_err = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(
            jnp.asarray(R_rel_true.T @ R_rel)))))
        assert rot_err < 2.0, f"loop relative rotation err {rot_err:.2f} deg"
        assert np.linalg.norm(t_rel - t_rel_true) < 0.3
        # map self-consistency after fuse + GBA: observations reproject well
        errs = []
        for k in kfs:
            obs = m.kf_obs_mp[k]
            sel = np.nonzero((obs >= 0) & m.mp_valid[np.maximum(obs, 0)])[0]
            xc = m.mp_pos[obs[sel]] @ m.kf_R[k].T + m.kf_t[k]
            pred = np.asarray(CAM.project(jnp.asarray(xc)))
            errs.append(np.linalg.norm(pred - m.kf_uv[k][sel], axis=-1))
        mean_reproj = float(np.concatenate(errs).mean())
        assert mean_reproj < 1.5, f"mean reprojection {mean_reproj:.2f} px"


class TestGlobalBA:
    """Interruptible global BA (RunGlobalBundleAdjustment,
    LoopClosing.cc:1210,2272-2515): abort on demand, and spanning-tree
    catch-up correction of keyframes/points created DURING the solve."""

    def _noisy_map(self, n_kfs=10, n_pts=400, sigma_pose=0.03):
        rng = np.random.default_rng(99)  # own stream: test-order independent
        cfg = MapConfig(max_keyframes=64, max_points=4096,
                        features_per_frame=512)
        m = Atlas(cfg).active
        R_true, t_true = circle_poses(n_kfs, radius=6.0)
        pts = np.stack([rng.uniform(-1.5, 1.5, n_pts),
                        rng.uniform(-1.5, 1.5, n_pts),
                        rng.uniform(-1.5, 1.5, n_pts)], -1).astype(np.float32)
        desc = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)
        ids = m.add_points(pts, desc, first_kf=0)
        prev = -1
        for i in range(n_kfs):
            R, t = R_true[i], t_true[i]
            if i > 0:  # perturb all but the gauge keyframe
                dR = Rotation.from_rotvec(
                    rng.normal(0, sigma_pose / 3, 3)).as_matrix()
                R = (dR @ R).astype(np.float32)
                t = (t + rng.normal(0, sigma_pose, 3)).astype(np.float32)
            xc = pts @ R_true[i].T + t_true[i]
            uv = np.array(CAM.project(jnp.asarray(xc)))
            vis = (xc[:, 2] > 0.5) & (np.abs(uv[:, 0] - 376) < 370) \
                & (np.abs(uv[:, 1] - 240) < 235)
            sel = np.nonzero(vis)[0][:512]
            N = 512
            kf_uv = np.zeros((N, 2), np.float32)
            kf_desc = np.zeros((N, 8), np.uint32)
            obs = np.full(N, -1, np.int32)
            valid = np.zeros(N, bool)
            kf_uv[:len(sel)] = uv[sel]
            kf_desc[:len(sel)] = desc[sel]
            obs[:len(sel)] = ids[sel]
            valid[:len(sel)] = True
            prev = m.add_keyframe(R, t, float(i), i, kf_uv,
                                  np.zeros(N, np.int32),
                                  np.zeros(N, np.float32),
                                  kf_desc, valid, obs, prev_kf=prev)
        return m, R_true, t_true, pts, desc, ids

    def test_background_gba_converges(self):
        from orbslam3_tpu.engine.global_ba import GlobalBA
        m, R_true, t_true, pts, desc, ids = self._noisy_map()
        kfs = m.keyframe_ids()

        def pose_rms():
            errs = [np.linalg.norm(-m.kf_R[k].T @ m.kf_t[k]
                                   - (-R_true[i].T @ t_true[i]))
                    for i, k in enumerate(kfs)]
            return float(np.sqrt(np.mean(np.square(errs))))

        before = pose_rms()
        gba = GlobalBA(CAM, iters_per_block=5, n_blocks=3)
        gba.request(m, fixed_kf=int(kfs[0]), background=True)
        gba.join()
        assert gba.n_finished == 1
        after = pose_rms()
        assert after < 0.35 * before, f"GBA {before:.4f} -> {after:.4f}"

    def test_abort_discards_solution(self):
        from orbslam3_tpu.engine.global_ba import GlobalBA
        m, *_ = self._noisy_map()
        kfs = m.keyframe_ids()
        R_before = m.kf_R.copy()
        gba = GlobalBA(CAM, iters_per_block=5, n_blocks=50)  # long solve
        gba.request(m, fixed_kf=int(kfs[0]), background=True)
        gba.abort_and_join()  # immediate abort (mbStopGBA)
        assert gba.n_finished == 0
        # an aborted GBA applies nothing
        np.testing.assert_array_equal(m.kf_R, R_before)

    def test_catchup_corrects_kfs_created_during_solve(self):
        """Keyframes + points inserted WHILE the solve runs get the
        spanning-tree catch-up correction (LoopClosing.cc:2400-2510)."""
        from orbslam3_tpu.engine.global_ba import GlobalBA
        m, R_true, t_true, pts, desc, ids = self._noisy_map()
        kfs = list(m.keyframe_ids())
        n0 = len(kfs)
        gba = GlobalBA(CAM, iters_per_block=5, n_blocks=3)
        gba.request(m, fixed_kf=int(kfs[0]), background=True)
        # while solving, insert a child keyframe hanging off the last KF,
        # with pose expressed in the OLD (uncorrected) gauge, plus a new
        # point referenced to it
        parent = kfs[-1]
        R_rel = Rotation.from_rotvec([0, 0.05, 0]).as_matrix().astype(
            np.float32)
        t_rel = np.array([0.1, 0.0, 0.02], np.float32)
        with m.lock:
            R_child = (R_rel @ m.kf_R[parent]).astype(np.float32)
            t_child = (R_rel @ m.kf_t[parent] + t_rel).astype(np.float32)
            parent_old_R = m.kf_R[parent].copy()
            parent_old_t = m.kf_t[parent].copy()
            N = 512
            child = m.add_keyframe(
                R_child, t_child, float(n0), n0, np.zeros((N, 2), np.float32),
                np.zeros(N, np.int32), np.zeros(N, np.float32),
                np.zeros((N, 8), np.uint32), np.zeros(N, bool),
                np.full(N, -1, np.int32), prev_kf=parent)
            # a fresh landmark referenced to the child
            p_new = m.add_points(np.array([[0.3, 0.2, 0.1]], np.float32),
                                 RNG.integers(0, 2**32, (1, 8),
                                              dtype=np.uint32),
                                 first_kf=child)
            cam_coords_old = m.kf_R[child] @ m.mp_pos[p_new[0]] \
                + m.kf_t[child]
        gba.join()
        assert gba.n_finished == 1
        # child must be re-expressed against the CORRECTED parent with the
        # same relative transform
        exp_R = R_rel @ m.kf_R[parent]
        exp_t = R_rel @ m.kf_t[parent] + t_rel
        assert np.linalg.norm(m.kf_R[child] - exp_R) < 1e-4
        assert np.linalg.norm(m.kf_t[child] - exp_t) < 1e-4
        # the fresh landmark keeps its camera-frame coords in the child view
        cam_coords_new = m.kf_R[child] @ m.mp_pos[p_new[0]] + m.kf_t[child]
        np.testing.assert_allclose(cam_coords_new, cam_coords_old, atol=1e-4)


class TestConsistencyChains:
    """Per-candidate temporal-consistency chains (LoopClosing.cc:380-401):
    interleaved candidates from different places must not share a counter."""

    def _closer(self):
        cfg = MapConfig(max_keyframes=64, max_points=2048,
                        features_per_frame=512)
        atlas = Atlas(cfg)
        voc = build_vocabulary(
            RNG.integers(0, 2**32, (500, 8), dtype=np.uint32), k=5, depth=3)
        db = KeyFrameDatabase(voc, max_keyframes=64)
        lc = LoopCloser(CAM, atlas, db,
                        LoopCloserConfig(consistency_threshold=3))
        return lc, atlas.active

    def test_interleaved_candidates_keep_separate_chains(self):
        lc, m = self._closer()
        uid = [100, 200, 300, 101, 201, 102]
        # simulate _detect_and_correct's chain bookkeeping directly:
        # candidates from place A (uids 10x) and place B (uids 20x, 30x)
        # interleave; neither reaches 3 because each chain only counts its
        # own covisible group hits
        def step(groups):
            prev = lc._chains.get(m.map_id, [])
            new = []
            for g in groups:
                count = 1 + max((c for gg, c in prev if gg & g), default=0)
                new.append((g, count))
            lc._chains[m.map_id] = new
            return max((c for _, c in new), default=0)

        assert step([{100, 101}]) == 1          # A
        assert step([{200, 201}]) == 1          # B (A's chain dies)
        assert step([{102, 100}]) == 1          # A again: chain restarted
        # consecutive hits on A now accumulate
        assert step([{101, 102}]) == 2
        assert step([{100, 102}]) == 3          # would fire at threshold 3

    def test_chains_are_per_map(self):
        lc, m = self._closer()
        lc._chains[0] = [({1, 2}, 2)]
        lc._chains[7] = [({1, 2}, 1)]
        # map 7's chain is independent of map 0's
        assert lc._chains[0][0][1] == 2
        assert lc._chains[7][0][1] == 1
