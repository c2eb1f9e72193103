"""Fused Pallas matcher kernel vs. the unfused XLA reference path.

Equivalence contract: `hamming_pallas.masked_top2` (run in interpret mode on
the CPU test mesh) must reproduce the masked distance-matrix + top-2 semantics
of kernels/hamming.py exactly — same argmin ties (lowest column index), same
empty-row sentinel behavior.
"""

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.kernels import hamming as ham
from orbslam3_tpu.kernels import hamming_pallas


def _rand_planes(rng, n):
    return jnp.asarray(rng.integers(0, 2, (n, 256)) * 2 - 1, jnp.float32)


def _reference_top2(planes_a, planes_b, mask):
    dist = np.asarray(ham.distance_matrix(planes_a, planes_b))
    dist = np.where(np.asarray(mask), dist, 1 << 20).astype(np.int64)
    idx = dist.argmin(axis=1)
    best = dist[np.arange(dist.shape[0]), idx]
    d2 = dist.copy()
    d2[np.arange(dist.shape[0]), idx] = 1 << 20
    second = d2.min(axis=1)
    return idx, best, second


def test_masked_top2_matches_reference():
    rng = np.random.default_rng(0)
    n, m = 200, 310  # deliberately unaligned to tile sizes
    pa, pb = _rand_planes(rng, n), _rand_planes(rng, m)
    mask = jnp.asarray(rng.random((n, m)) < 0.3)

    idx, best, second = hamming_pallas.masked_top2(pa, pb, mask, interpret=True)
    ridx, rbest, rsecond = _reference_top2(pa, pb, mask)

    np.testing.assert_array_equal(np.asarray(best), np.minimum(rbest, 1 << 20))
    has = rbest < (1 << 20)
    np.testing.assert_array_equal(np.asarray(idx)[has], ridx[has])
    # second-best: only meaningful where >= 2 candidates
    has2 = rsecond < (1 << 20)
    np.testing.assert_array_equal(np.asarray(second)[has2], rsecond[has2])


def test_masked_top2_empty_rows_rejected():
    rng = np.random.default_rng(1)
    pa, pb = _rand_planes(rng, 16), _rand_planes(rng, 32)
    mask = jnp.zeros((16, 32), bool).at[3].set(True)
    idx, best, second = hamming_pallas.masked_top2(pa, pb, mask, interpret=True)
    assert np.asarray(best)[0] >= (1 << 20)      # empty row -> sentinel
    assert np.asarray(best)[3] <= 256            # populated row -> real dist
    ok = (np.asarray(best) <= ham.TH_HIGH)
    assert not ok[0]


def test_masked_match_ratio_dispatch_parity():
    """The dispatch wrapper agrees between its two code paths."""
    import os
    rng = np.random.default_rng(2)
    pa, pb = _rand_planes(rng, 64), _rand_planes(rng, 96)
    mask = jnp.asarray(rng.random((64, 96)) < 0.5)

    idx_x, best_x, ok_x = ham.masked_match_ratio(pa, pb, mask)
    os.environ["ORBSLAM3_TPU_PALLAS"] = "0"
    try:
        idx_ref, best_ref, ok_ref = ham.masked_match_ratio(pa, pb, mask)
    finally:
        os.environ.pop("ORBSLAM3_TPU_PALLAS")
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_ref))
    sel = np.asarray(ok_ref)
    np.testing.assert_array_equal(np.asarray(idx_x)[sel], np.asarray(idx_ref)[sel])
