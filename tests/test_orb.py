"""Tests for the ORB extraction + Hamming matching kernels vs OpenCV."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from orbslam3_tpu.kernels import fast as fast_k
from orbslam3_tpu.kernels import hamming as ham_k
from orbslam3_tpu.kernels import image as image_k
from orbslam3_tpu.kernels import orb_descriptor as desc_k
from orbslam3_tpu.vision.frame import extract_features, level_quotas

RNG = np.random.default_rng(7)


def synthetic_image(h=240, w=320, n_blobs=120, seed=3):
    """Textured synthetic scene: random rectangles + noise => corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 100.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 30), rng.integers(10, w - 30)
        hh, ww = rng.integers(6, 25), rng.integers(6, 25)
        img[y : y + hh, x : x + ww] = rng.uniform(0, 255)
    img += rng.normal(scale=2.0, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


class TestFast:
    def test_matches_opencv_fast(self):
        img = synthetic_image()
        score = np.asarray(fast_k.fast_score_map(jnp.asarray(img), 20.0))
        ours = set(zip(*np.nonzero(score > 0)))

        det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
        kps = det.detect(img.astype(np.uint8))
        cv_pts = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}

        # Implementations differ in tie-handling at the threshold; require
        # high mutual agreement rather than exactness.
        inter = len(ours & cv_pts)
        assert inter / max(len(cv_pts), 1) > 0.9, (len(ours), len(cv_pts), inter)
        assert inter / max(len(ours), 1) > 0.9

    def test_nms_keeps_local_maxima(self):
        s = jnp.zeros((16, 16)).at[5, 5].set(10.0).at[5, 6].set(8.0).at[12, 3].set(4.0)
        out = np.asarray(fast_k.nms3(s))
        assert out[5, 5] == 10.0 and out[5, 6] == 0.0 and out[12, 3] == 4.0

    def test_select_uniform(self):
        img = synthetic_image()
        score = fast_k.detect(jnp.asarray(img))
        ys, xs, resp, valid = fast_k.select_uniform(score, 200, cell=32)
        ys, xs, valid = np.asarray(ys), np.asarray(xs), np.asarray(valid)
        n = valid.sum()
        assert n > 100
        pts = set(zip(ys[valid].tolist(), xs[valid].tolist()))
        assert len(pts) == n  # unique
        # spatial spread: keypoints should cover most occupied cells
        occupied = np.unique((ys[valid] // 64) * 100 + xs[valid] // 64)
        assert len(occupied) >= 12


class TestDescriptors:
    def test_rotation_invariance(self):
        img = synthetic_image(256, 256, seed=5)
        # rotate image by 30 deg around center
        M = cv2.getRotationMatrix2D((128, 128), 30, 1.0)
        rot = cv2.warpAffine(img, M, (256, 256), flags=cv2.INTER_LINEAR)

        score = fast_k.detect(jnp.asarray(img))
        ys, xs, _, valid = fast_k.select_uniform(score, 150, cell=32)
        ys, xs = np.asarray(ys), np.asarray(xs)
        keep = np.asarray(valid)
        # corresponding points in rotated image
        pts = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
        rpts = (M @ pts.T).T
        inb = (
            keep
            & (rpts[:, 0] > 25) & (rpts[:, 0] < 230)
            & (rpts[:, 1] > 25) & (rpts[:, 1] < 230)
            & (ys > 25) & (ys < 230) & (xs > 25) & (xs < 230)
        )

        blur_a = image_k.gaussian_blur(jnp.asarray(img))
        blur_b = image_k.gaussian_blur(jnp.asarray(rot))
        ang_a = desc_k.keypoint_angles(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs))
        ry = jnp.asarray(np.round(rpts[:, 1]).astype(np.int32))
        rx = jnp.asarray(np.round(rpts[:, 0]).astype(np.int32))
        ry = jnp.clip(ry, 0, 255); rx = jnp.clip(rx, 0, 255)
        ang_b = desc_k.keypoint_angles(jnp.asarray(rot), ry, rx)
        d_a = desc_k.brief_descriptors(blur_a, jnp.asarray(ys), jnp.asarray(xs), ang_a)
        d_b = desc_k.brief_descriptors(blur_b, ry, rx, ang_b)

        dist = np.asarray(ham_k.distance_vector(d_a, d_b))[inb]
        # true correspondences should be far below the random baseline (~128)
        assert np.median(dist) < 55, np.median(dist)

    def test_pack_unpack_roundtrip(self):
        bits = jnp.asarray(RNG.integers(0, 2, (32, 256)), jnp.uint32)
        packed = desc_k.pack_bits(bits)
        assert packed.shape == (32, 8) and packed.dtype == jnp.uint32
        back = desc_k.unpack_bits(packed)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


class TestHamming:
    def test_mxu_equals_popcount_equals_numpy(self):
        a_bits = RNG.integers(0, 2, (64, 256)).astype(np.uint32)
        b_bits = RNG.integers(0, 2, (48, 256)).astype(np.uint32)
        ref = (a_bits[:, None, :] != b_bits[None, :, :]).sum(-1)

        a_p = desc_k.pack_bits(jnp.asarray(a_bits))
        b_p = desc_k.pack_bits(jnp.asarray(b_bits))
        d_pop = np.asarray(ham_k.distance_matrix_popcount(a_p, b_p))
        np.testing.assert_array_equal(d_pop, ref)

        a_pl = desc_k.descriptor_planes(a_p)
        b_pl = desc_k.descriptor_planes(b_p)
        d_mxu = np.asarray(ham_k.distance_matrix(a_pl, b_pl))
        np.testing.assert_array_equal(d_mxu, ref)

    def test_match_ratio(self):
        # identical descriptors should match with distance 0
        bits = RNG.integers(0, 2, (32, 256)).astype(np.uint32)
        p = desc_k.pack_bits(jnp.asarray(bits))
        d = ham_k.distance_matrix_popcount(p, p)
        idx, dist, ok = ham_k.match_ratio(d, max_dist=50, ratio=0.9)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(32))
        assert np.asarray(dist).max() == 0
        assert np.asarray(ok).all()

    def test_mutual_filter(self):
        idx_ab = jnp.asarray([1, 0, 2])
        idx_ba = jnp.asarray([1, 0, 0])
        ok = jnp.asarray([True, True, True])
        out = np.asarray(ham_k.mutual_filter(idx_ab, ok, idx_ba))
        np.testing.assert_array_equal(out, [True, True, False])

    def test_rotation_consistency(self):
        n = 100
        ang_a = RNG.uniform(0, 2 * np.pi, n).astype(np.float32)
        # 90 inliers rotated by 0.5 rad, 10 outliers random
        ang_b = ang_a - 0.5
        ang_b[:10] = RNG.uniform(0, 2 * np.pi, 10)
        idx = jnp.arange(n)
        ok = jnp.ones(n, bool)
        out = np.asarray(
            ham_k.rotation_consistency(jnp.asarray(ang_a), jnp.asarray(ang_b), idx, ok)
        )
        assert out[10:].mean() > 0.95  # inliers kept
        assert out[:10].mean() < 0.5   # most outliers dropped


class TestPipeline:
    def test_extract_features(self):
        img = synthetic_image(480, 640, n_blobs=300)
        feats = extract_features(jnp.asarray(img), n_features=500)
        assert feats.capacity == 500
        v = np.asarray(feats.valid)
        assert v.sum() > 250
        uv = np.asarray(feats.uv)[v]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < 640).all()
        assert (uv[:, 1] >= 0).all() and (uv[:, 1] < 480).all()
        # multiple octaves populated
        assert len(np.unique(np.asarray(feats.octave)[v])) >= 3
        # descriptors not degenerate
        d = np.asarray(feats.desc)[v]
        assert np.unique(d, axis=0).shape[0] > 0.9 * d.shape[0]

    def test_level_quotas(self):
        q = level_quotas(1000, 8, 1.2)
        assert sum(q) == 1000 and q[0] > q[-1] > 0

    def test_jit_cache(self):
        img = jnp.asarray(synthetic_image(120, 160))
        f1 = extract_features(img, n_features=100)
        f2 = extract_features(img + 1.0, n_features=100)  # same shapes: cached
        assert f1.uv.shape == f2.uv.shape
