"""Keyframe database: place-recognition queries over BoW vectors.

TPU-native replacement for the reference's `KeyFrameDatabase`
(`/root/reference/src/KeyFrameDatabase.cc`, `include/KeyFrameDatabase.h:63-80`):
the DBoW2 inverted file (word -> keyframes) becomes a dense BoW matrix
(max_kf, n_words) resident on device; every query — word-sharing counts,
L1 scores, covisibility-group accumulation — is one batched matmul/reduction
instead of per-word list walks, which is the MXU-friendly formulation.

Queries mirrored:
  * `DetectRelocalizationCandidates` (KeyFrameDatabase.cc:578-719): shared-word
    count >= 0.8*max, score, accumulate over covisibility groups, keep
    candidates with accScore >= 0.75*best.
  * `DetectNBestCandidates` (loop/merge, KeyFrameDatabase.cc:440-576): same
    pipeline, excludes the query KF's covisible set, returns top-N group
    leaders.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.place.vocab import Vocabulary, bow_vector, descend


class KeyFrameDatabase:
    def __init__(self, vocab: Vocabulary, max_keyframes: int = 512):
        self.vocab = vocab
        self._levels, self._valids, self._idf = vocab.device_tensors()
        M, W = max_keyframes, vocab.n_words
        self.bow = np.zeros((M, W), np.float32)     # L1-normalized tf-idf rows
        self.present = np.zeros((M, W), bool)       # word-occurrence mask
        self.active = np.zeros(M, bool)
        self.map_of = np.full(M, -1, np.int64)      # owning map id (Atlas)

    # -- ingestion -------------------------------------------------------------
    def compute_bow(self, desc_packed: np.ndarray, valid: np.ndarray):
        """(N,8) uint32 + (N,) bool -> (words, bow vector) on device."""
        words = descend(jnp.asarray(desc_packed), self._levels, self._valids,
                        self.vocab.k)
        v = bow_vector(words, jnp.asarray(valid), self._idf)
        return np.asarray(words), np.asarray(v)

    def add(self, kf: int, bow_vec: np.ndarray, map_id: int = 0):
        self.bow[kf] = bow_vec
        self.present[kf] = bow_vec > 0
        self.active[kf] = True
        self.map_of[kf] = map_id

    def erase(self, kf: int):
        self.active[kf] = False
        self.bow[kf] = 0
        self.present[kf] = False

    def clear_map(self, map_id: int):
        m = self.map_of == map_id
        self.active[m] = False
        self.bow[m] = 0
        self.present[m] = False

    # -- queries ---------------------------------------------------------------
    def _scores(self, query_bow: np.ndarray, candidate_mask: np.ndarray):
        """Shared-word counts + L1 scores for all active KFs (one matmul)."""
        mask = self.active & candidate_mask
        qb = jnp.asarray(query_bow)
        shared = jnp.asarray(self.present, jnp.float32) @ (qb > 0).astype(
            jnp.float32)
        score = 1.0 - 0.5 * jnp.abs(jnp.asarray(self.bow) - qb[None]).sum(1)
        shared = np.array(shared)
        score = np.array(score)
        shared[~mask] = 0
        score[~mask] = -1.0
        return shared, score

    def _group_accumulate(self, scores: np.ndarray, cands: np.ndarray,
                          covis_fn, ratio: float):
        """Covisibility-group score accumulation (KeyFrameDatabase.cc:654-697):
        each candidate's score is summed with its covisible neighbours that are
        also candidates; group is represented by its best member."""
        cand_set = set(int(c) for c in cands)
        best_of_group, acc_of_group = {}, {}
        for c in cands:
            neigh = [n for n in covis_fn(int(c)) if n in cand_set]
            group = [int(c)] + neigh
            acc = float(sum(scores[g] for g in group))
            leader = max(group, key=lambda g: scores[g])
            key = int(c)
            best_of_group[key] = leader
            acc_of_group[key] = acc
        if not acc_of_group:
            return np.zeros(0, np.int64)
        best_acc = max(acc_of_group.values())
        out, seen = [], set()
        order = sorted(acc_of_group, key=lambda k: -acc_of_group[k])
        for key in order:
            if acc_of_group[key] < ratio * best_acc:
                break
            leader = best_of_group[key]
            if leader not in seen:
                seen.add(leader)
                out.append(leader)
        return np.asarray(out, np.int64)

    def detect_relocalization_candidates(
            self, query_bow: np.ndarray, covis_fn, map_id: int | None = None):
        """Candidates for relocalization (KeyFrameDatabase.cc:578-719)."""
        cmask = np.ones_like(self.active) if map_id is None else (
            self.map_of == map_id)
        shared, score = self._scores(query_bow, cmask)
        if shared.max() <= 0:
            return np.zeros(0, np.int64)
        min_common = 0.8 * shared.max()
        cands = np.nonzero((shared >= max(min_common, 1)) & (score > -1))[0]
        if cands.size == 0:
            return np.zeros(0, np.int64)
        return self._group_accumulate(score, cands, covis_fn, ratio=0.75)

    def detect_n_best_candidates(
            self, query_bow: np.ndarray, exclude: set[int], covis_fn,
            n_best: int = 3):
        """Top-N loop/merge candidates (KeyFrameDatabase.cc:440-576),
        excluding the query keyframe's own covisible set."""
        cmask = self.active.copy()
        for e in exclude:
            if 0 <= e < cmask.size:
                cmask[e] = False
        shared, score = self._scores(query_bow, cmask)
        if shared.max() <= 0:
            return np.zeros(0, np.int64)
        min_common = 0.8 * shared.max()
        cands = np.nonzero((shared >= max(min_common, 1)) & (score > -1))[0]
        if cands.size == 0:
            return np.zeros(0, np.int64)
        leaders = self._group_accumulate(score, cands, covis_fn, ratio=0.0)
        return leaders[:n_best]
