"""Interruptible global bundle adjustment with re-propagation.

TPU-native equivalent of the reference's `RunGlobalBundleAdjustment`
(`/root/reference/src/LoopClosing.cc:1210,2272-2515`): global BA runs on its
own thread over a SNAPSHOT of the map, abortable when a new loop/merge
arrives (`mbStopGBA`), and — because keyframes and landmarks keep being
created while it solves — finishes by correcting everything created during
the solve through the spanning tree (`LoopClosing.cc:2400-2510`) before
writing results back under the map lock.

Design:
  * snapshot (uids + poses + points + observation triplets) under the lock;
  * the solve runs in iteration blocks with an abort check between blocks
    (one jitted `bundle_adjust` program per block — the XLA program itself
    is uninterruptible, so block size bounds abort latency);
  * write-back matches rows by uid (slots can be reused while solving);
    keyframes whose uid is NOT in the snapshot are corrected via
    T_corrected = T_child_old o T_parent_old^-1 o T_parent_corrected walking
    `kf_prev`, and new landmarks via their reference keyframe's old/new
    transform pair — exactly the reference's catch-up pass.
"""

from __future__ import annotations

import threading

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.opt.ba import BAProblem, bundle_adjust
from orbslam3_tpu.slam_map.map_state import MapState


class GlobalBA:
    """One in-flight global BA at a time (reference spawns/aborts the same
    way: a new loop aborts the running GBA and starts a fresh one)."""

    def __init__(self, camera, iters_per_block: int = 5, n_blocks: int = 4):
        self.camera = camera
        self.iters_per_block = iters_per_block
        self.n_blocks = n_blocks
        self._thread: threading.Thread | None = None
        self._abort = threading.Event()
        self.running = False
        self.n_aborted = 0
        self.n_finished = 0

    # ------------------------------------------------------------------ api
    def request(self, m: MapState, fixed_kf: int, background: bool = True):
        """Start a GBA over map `m`. Aborts any in-flight solve first
        (LoopClosing.cc:1199-1210). With background=False the solve runs
        inline (tests / shutdown paths)."""
        self.abort_and_join()
        self._abort.clear()
        if background:
            self._thread = threading.Thread(
                target=self._run, args=(m, int(fixed_kf)), daemon=True)
            self.running = True
            self._thread.start()
        else:
            self.running = True
            self._run(m, int(fixed_kf))

    def abort_and_join(self):
        """Signal abort and wait for the worker (mbStopGBA + join)."""
        t = self._thread
        if t is not None and t.is_alive():
            self._abort.set()
            t.join()
        self._thread = None

    def join(self):
        t = self._thread
        if t is not None:
            t.join()
            self._thread = None

    # ------------------------------------------------------------ internals
    def _snapshot(self, m: MapState):
        with m.lock:
            kfs = m.keyframe_ids()
            mp_ids = np.nonzero(m.mp_valid)[0]
            if len(kfs) < 2 or len(mp_ids) == 0:
                return None
            snap = dict(
                kfs=kfs.copy(), kf_uid=m.kf_uid[kfs].copy(),
                R=m.kf_R[kfs].copy(), t=m.kf_t[kfs].copy(),
                mp_ids=mp_ids.copy(), mp_uid=m.mp_uid[mp_ids].copy(),
                pos=m.mp_pos[mp_ids].copy(),
            )
            kk, slots, mps = m.observations_of(mp_ids)
            snap["obs"] = (kk.copy(), slots.copy(), mps.copy())
            snap["uv"] = m.kf_uv[kk, slots].copy()
            snap["octv"] = m.kf_octave[kk, slots].copy()
            return snap

    def _run(self, m: MapState, fixed_kf: int):
        try:
            snap = self._snapshot(m)
            if snap is None:
                return
            kfs = snap["kfs"]
            slot = {int(k): i for i, k in enumerate(kfs)}
            pslot = np.full(m.cfg.max_points, -1, np.int64)
            pslot[snap["mp_ids"]] = np.arange(len(snap["mp_ids"]))
            kk, slots, mps = snap["obs"]
            kf_idx = np.asarray([slot[int(x)] for x in kk], np.int32)
            lm_idx = pslot[mps].astype(np.int32)
            info = (1.0 / 1.2 ** (2 * snap["octv"])).astype(np.float32)
            fixed = np.zeros(len(kfs), bool)
            fixed[slot.get(int(fixed_kf), 0)] = True

            R, t, pos = snap["R"], snap["t"], snap["pos"]
            for _ in range(self.n_blocks):
                if self._abort.is_set():
                    self.n_aborted += 1
                    return
                prob = BAProblem(
                    R=jnp.asarray(R), t=jnp.asarray(t),
                    points=jnp.asarray(pos),
                    kf_idx=jnp.asarray(kf_idx), lm_idx=jnp.asarray(lm_idx),
                    uv=jnp.asarray(snap["uv"], jnp.float32),
                    info=jnp.asarray(info),
                    valid=jnp.ones(len(kk), bool),
                    fixed_kf=jnp.asarray(fixed),
                    fixed_lm=jnp.zeros(len(snap["mp_ids"]), bool))
                out, _, _ = bundle_adjust(prob, self.camera,
                                          n_iters=self.iters_per_block)
                R = np.asarray(out.R, np.float32)
                t = np.asarray(out.t, np.float32)
                pos = np.asarray(out.points, np.float32)
            if self._abort.is_set():
                self.n_aborted += 1
                return
            self._write_back(m, snap, R, t, pos)
            self.n_finished += 1
        finally:
            self.running = False

    def _write_back(self, m: MapState, snap, R_new, t_new, pos_new):
        """Apply the solved state + catch-up correction under the map lock
        (LoopClosing.cc:2400-2510)."""
        with m.lock:
            # uid -> snapshot row (slots may have been reused mid-solve)
            uid_row = {int(u): i for i, u in enumerate(snap["kf_uid"])}
            old_R, old_t = {}, {}
            live = m.keyframe_ids()
            # 1. snapshot keyframes still alive: direct write
            for k in live:
                row = uid_row.get(int(m.kf_uid[k]), -1)
                if row >= 0:
                    old_R[int(k)] = m.kf_R[k].copy()
                    old_t[int(k)] = m.kf_t[k].copy()
                    m.kf_R[k] = R_new[row]
                    m.kf_t[k] = t_new[row]
            # 2. keyframes created during the solve: spanning-tree catch-up
            #    T_c_corr = (T_c_old o T_p_old^-1) o T_p_corr, walking prev
            #    until a corrected ancestor is found
            corrected = set(old_R.keys())
            # process in temporal order so parents correct before children
            fresh = [int(k) for k in live if int(k) not in corrected]
            fresh.sort(key=lambda k: float(m.kf_ts[k]))
            for k in fresh:
                p = int(m.kf_prev[k])
                if p < 0 or not m.kf_valid[p] or p not in corrected:
                    continue
                R_rel = m.kf_R[k] @ old_R[p].T
                t_rel = m.kf_t[k] - R_rel @ old_t[p]
                old_R[k] = m.kf_R[k].copy()
                old_t[k] = m.kf_t[k].copy()
                m.kf_R[k] = (R_rel @ m.kf_R[p]).astype(np.float32)
                m.kf_t[k] = (R_rel @ m.kf_t[p] + t_rel).astype(np.float32)
                corrected.add(k)
            # 3. snapshot landmarks still alive: direct write
            prow = {int(u): i for i, u in enumerate(snap["mp_uid"])}
            live_mp = np.nonzero(m.mp_valid)[0]
            fresh_mp = []
            for p in live_mp:
                row = prow.get(int(m.mp_uid[p]), -1)
                if row >= 0:
                    m.mp_pos[p] = pos_new[row]
                else:
                    fresh_mp.append(int(p))
            # 4. landmarks created during the solve: correct through their
            #    reference KF's old->corrected transform
            for p in fresh_mp:
                rk = int(m.mp_ref_kf[p])
                if rk < 0 or rk not in old_R:
                    continue
                xc = old_R[rk] @ m.mp_pos[p] + old_t[rk]
                m.mp_pos[p] = (m.kf_R[rk].T @ (xc - m.kf_t[rk])).astype(
                    np.float32)
            m.change_index += 1
            # geometry moved: refresh scale bands / normals so the
            # matcher's frustum gates stay consistent
            m.update_point_stats(live_mp)
