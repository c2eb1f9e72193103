"""Binary BoW vocabulary, tensorized for batched TPU descent.

TPU-native replacement for the reference's vendored DBoW2
(`/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h`, used via
`ORBVocabulary` loaded at `/root/reference/src/System.cc:118-126`): a k-ary
tree of binary (256-bit ORB) cluster centers; a descriptor descends the tree
by Hamming argmin at each level and lands on a leaf "word"; an image becomes
a tf-idf weighted sparse vector of words scored with the L1 metric.

Here the tree is flattened to one packed-descriptor tensor per level, stored
as a *complete* k-ary tree (missing children padded with an all-ones sentinel
at +inf distance), so the descent is L gather+XOR+popcount+argmin steps,
batched over all N descriptors of a frame in one jitted call — no pointer
chasing. Training (`build_vocabulary`) is host-side binary k-means with
bitwise-majority centroids, mirroring DBoW2's `HKmeansStep`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

DESC_WORDS = 8  # 256 bits / 32


def _popcount_np(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,8)x(M,8) packed uint32 -> (N,M) int32 Hamming distances (host)."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return _popcount_np(x).sum(-1).astype(np.int32)


def _majority_center(packed: np.ndarray) -> np.ndarray:
    """Bitwise-majority centroid of packed descriptors (DBoW2 meanValue)."""
    bits = np.unpackbits(packed.view(np.uint8), axis=1, bitorder="little")
    maj = (bits.sum(0) * 2 >= bits.shape[0]).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


def _kmeans_binary(packed: np.ndarray, k: int, rng: np.random.Generator,
                   iters: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Binary k-means; returns (centers (k,8), assignment (N,))."""
    n = packed.shape[0]
    k = min(k, n)
    sel = rng.choice(n, size=k, replace=False)
    centers = packed[sel].copy()
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        d = hamming_np(packed, centers)
        new_assign = d.argmin(1)
        if np.array_equal(new_assign, assign) and _ != 0:
            break
        assign = new_assign
        for c in range(k):
            m = assign == c
            if m.any():
                centers[c] = _majority_center(packed[m])
            else:  # re-seed empty cluster on the farthest point
                far = d.min(1).argmax()
                centers[c] = packed[far]
    return centers, assign


@dataclasses.dataclass
class Vocabulary:
    """Flattened complete k-ary binary vocabulary.

    levels[l]: (k**(l+1), 8) uint32 packed node descriptors for tree level
    l+1 (root excluded); node j's children at level l+1 occupy rows
    [j*k, (j+1)*k). Invalid (padded) nodes carry `valid=False` and are pushed
    to +inf distance during descent. Leaves = level `depth`; word id = leaf
    row index. idf: (n_words,) tf-idf weights (DBoW2 TF_IDF default).
    """

    k: int
    depth: int
    levels: list  # of (n_l, 8) uint32 arrays
    valid: list   # of (n_l,) bool arrays
    idf: np.ndarray

    @property
    def n_words(self) -> int:
        return self.levels[-1].shape[0]

    def device_tensors(self):
        return ([jnp.asarray(l) for l in self.levels],
                [jnp.asarray(v) for v in self.valid],
                jnp.asarray(self.idf, jnp.float32))

    # -- host-side convenience (tests / tools) --------------------------------
    def words_np(self, packed: np.ndarray) -> np.ndarray:
        node = np.zeros(packed.shape[0], np.int64)
        for l in range(self.depth):
            cand = node[:, None] * self.k + np.arange(self.k)
            d = _popcount_np(np.bitwise_xor(
                packed[:, None, :], self.levels[l][cand])).sum(-1)
            d = np.where(self.valid[l][cand], d, 1 << 20)
            node = cand[np.arange(packed.shape[0]), d.argmin(1)]
        return node

    def save(self, path: str):
        np.savez_compressed(
            path, k=self.k, depth=self.depth, idf=self.idf,
            **{f"level_{i}": l for i, l in enumerate(self.levels)},
            **{f"valid_{i}": v for i, v in enumerate(self.valid)})

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        depth = int(z["depth"])
        return Vocabulary(
            k=int(z["k"]), depth=depth,
            levels=[z[f"level_{i}"] for i in range(depth)],
            valid=[z[f"valid_{i}"] for i in range(depth)],
            idf=z["idf"])


def default_vocabulary_path() -> str:
    """Path of the shipped reference-scale vocabulary artifact (framework
    analog of `Vocabulary/ORBvoc.txt`, loaded by the reference at
    /root/reference/src/System.cc:118-126). Trained by
    `scripts/train_vocab_large.py` (10^5 words from rendered scenes)."""
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "assets", "vocab_100k.npz")


def load_default_vocabulary() -> "Vocabulary | None":
    """The shipped 10^5-word vocabulary, or None if the artifact is absent."""
    import os
    p = default_vocabulary_path()
    return Vocabulary.load(p) if os.path.exists(p) else None


def build_vocabulary(packed: np.ndarray, k: int = 8, depth: int = 3,
                     seed: int = 0) -> Vocabulary:
    """Train a k^depth-word binary vocabulary (DBoW2 `create`).

    packed: (N, 8) uint32 training descriptors. idf weights use the training
    set as the corpus (DBoW2 `setNodeWeights`).
    """
    rng = np.random.default_rng(seed)
    sentinel = np.full(DESC_WORDS, 0xFFFFFFFF, np.uint32)
    levels, valids = [], []
    # node -> indices of training descriptors in its subtree
    groups = {0: np.arange(packed.shape[0])}
    for l in range(depth):
        n_nodes = k ** (l + 1)
        lvl = np.tile(sentinel, (n_nodes, 1))
        vld = np.zeros(n_nodes, bool)
        nxt = {}
        for parent, idx in groups.items():
            if idx.size == 0:
                continue
            centers, assign = _kmeans_binary(packed[idx], k, rng)
            for c in range(centers.shape[0]):
                node = parent * k + c
                lvl[node] = centers[c]
                vld[node] = True
                nxt[node] = idx[assign == c]
        levels.append(lvl)
        valids.append(vld)
        groups = nxt
    # idf over leaves: weight = log(N_docs / n_docs_containing_word); with a
    # descriptor corpus we use log(N / n_i) per DBoW2's TF_IDF initialisation.
    n_words = k ** depth
    counts = np.zeros(n_words, np.float64)
    for leaf, idx in groups.items():
        counts[leaf] = idx.size
    n_total = max(packed.shape[0], 1)
    idf = np.where(counts > 0, np.log(n_total / np.maximum(counts, 1)), 0.0)
    return Vocabulary(k=k, depth=depth, levels=levels, valid=valids,
                      idf=idf.astype(np.float32))


# -- device path --------------------------------------------------------------

def _popcount_u32(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def descend(packed: jax.Array, levels, valids, k: int) -> jax.Array:
    """Batched tree descent: (N,8) uint32 -> (N,) int32 word ids.

    One gather + XOR/popcount + argmin per level; everything vectorized over
    descriptors (the reference walks each descriptor through the tree
    serially, `TemplatedVocabulary.h transform`).
    """
    n = packed.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for lvl, vld in zip(levels, valids):
        cand = node[:, None] * k + jnp.arange(k, dtype=jnp.int32)  # (N,k)
        child = lvl[cand]                                          # (N,k,8)
        d = _popcount_u32(jnp.bitwise_xor(packed[:, None, :], child)).sum(-1)
        d = jnp.where(vld[cand], d, 1 << 20)
        node = jnp.take_along_axis(cand, d.argmin(1)[:, None], 1)[:, 0]
    return node


@jax.jit
def bow_vector(words: jax.Array, valid: jax.Array, idf: jax.Array) -> jax.Array:
    """tf-idf L1-normalized dense BoW vector (n_words,).

    Matches DBoW2 `transform` with TF_IDF weighting + L1 normalisation
    (`TemplatedVocabulary.h`): v_w = tf(w) * idf(w), then v /= |v|_1.
    """
    n_words = idf.shape[0]
    tf = jnp.zeros(n_words, jnp.float32).at[words].add(
        jnp.where(valid, 1.0, 0.0))
    v = tf * idf
    s = v.sum()
    return jnp.where(s > 0, v / s, v)


@jax.jit
def l1_score(va: jax.Array, vb: jax.Array) -> jax.Array:
    """DBoW2 L1 scoring: 1 - 0.5*|va - vb|_1 in [0, 1] (L1Scoring::score)."""
    return 1.0 - 0.5 * jnp.abs(va - vb).sum(-1)


def node_at_level(words: jax.Array, depth: int, k: int, level: int) -> jax.Array:
    """Ancestor node id of each leaf word at `level` (DBoW2 FeatureVector
    grouping used by SearchByBoW, `ORBmatcher.cc SearchByBoW`)."""
    return words // (k ** (depth - level))
