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


def test_full_matcher_stack_through_pallas(monkeypatch):
    """The REAL matcher entry points (search_by_projection / search_by_bow)
    produce identical associations with the Pallas kernel forced on
    (interpret mode off-TPU) vs the unfused XLA path — covers the kernel
    inside the production call stack, not just in isolation (r3 weak #8)."""
    import numpy as np
    import jax.numpy as jnp

    from orbslam3_tpu.core.camera import Camera
    from orbslam3_tpu.kernels import orb_descriptor as desc_k
    from orbslam3_tpu.vision import matcher

    rng = np.random.default_rng(41)
    cam = Camera.pinhole(400.0, 400.0, 320.0, 240.0, width=640, height=480)
    K, N = 256, 128
    pts = np.stack([rng.uniform(-2, 2, K), rng.uniform(-1.5, 1.5, K),
                    rng.uniform(3, 9, K)], -1).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (K, 8), dtype=np.uint32)
    mp_planes = desc_k.descriptor_planes(jnp.asarray(desc))
    uv = np.asarray(cam.project(jnp.asarray(pts)))
    f_uv = jnp.asarray(uv[:N] + rng.normal(0, 1.0, (N, 2)), jnp.float32)
    f_planes = desc_k.descriptor_planes(jnp.asarray(desc[:N]))
    f_oct = jnp.zeros(N, jnp.int32)
    ones_k = jnp.ones(K, bool)
    ones_n = jnp.ones(N, bool)
    args = (jnp.asarray(pts), mp_planes, ones_k, jnp.eye(3), jnp.zeros(3),
            cam, f_uv, f_planes, f_oct, ones_n,
            jnp.asarray(10.0, jnp.float32))

    import jax
    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "0")
    jax.clear_caches()   # use_pallas() is read at TRACE time — force retrace
    idx0, d0, ok0, n0, _ = matcher.search_by_projection(*args)
    idx0, d0, ok0 = map(np.asarray, (idx0, d0, ok0)); n0 = int(n0)
    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "1")
    jax.clear_caches()
    idx1, d1, ok1, n1, _ = matcher.search_by_projection(*args)
    assert int(n1) == int(n0) > 0.7 * N
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_array_equal(np.asarray(idx0)[np.asarray(ok0)],
                                  np.asarray(idx1)[np.asarray(ok1)])

    words = rng.integers(0, 1000, K).astype(np.int64)
    ang = rng.uniform(0, 2 * np.pi, K).astype(np.float32)
    bow_args = (jnp.asarray(words[:N]), f_planes, ones_n,
                jnp.asarray(ang[:N]),
                jnp.asarray(words), mp_planes, ones_k, jnp.asarray(ang))
    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "0")
    jax.clear_caches()
    bi0, bd0, bok0, bn0 = matcher.search_by_bow(*bow_args, k=10)
    bok0 = np.asarray(bok0); bn0 = int(bn0)
    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "1")
    jax.clear_caches()
    bi1, bd1, bok1, bn1 = matcher.search_by_bow(*bow_args, k=10)
    assert int(bn0) == int(bn1) > 0
    np.testing.assert_array_equal(np.asarray(bok0), np.asarray(bok1))


def test_patch_gather_parity(monkeypatch):
    """The Pallas patch gather (interpret mode off-TPU) produces EXACTLY the
    descriptors of the XLA gather path for interior keypoints (the atlas
    margin guarantees interior support in production)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from orbslam3_tpu.kernels import orb_descriptor as desc_k

    rng = np.random.default_rng(6)
    H, W = 256, 384
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    N = 24
    ys = jnp.asarray(rng.integers(20, H - 20, N), jnp.int32)
    xs = jnp.asarray(rng.integers(20, W - 20, N), jnp.int32)
    ang = jnp.asarray(rng.uniform(0, 2 * np.pi, N), jnp.float32)
    wbin = desc_k.brief_weight_matrix()

    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "0")
    jax.clear_caches()
    d_xla = np.asarray(desc_k.brief_descriptors(img, ys, xs, ang, wbin))
    monkeypatch.setenv("ORBSLAM3_TPU_PALLAS", "1")
    jax.clear_caches()
    d_pl = np.asarray(desc_k.brief_descriptors(img, ys, xs, ang, wbin))
    np.testing.assert_array_equal(d_xla, d_pl)
