import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_map_tpu.config import ORBConfig
from orb_slam2_map_tpu.ops import fast, matching, orb, pyramid


@pytest.fixture(scope="module")
def test_image():
    """Synthetic textured image with known strong corners."""
    rng = np.random.default_rng(0)
    img = np.full((480, 640), 80.0, dtype=np.float32)
    # blocky random texture (sharp corners everywhere)
    blocks = rng.uniform(40, 200, (30, 40)).astype(np.float32)
    img = np.kron(blocks, np.ones((16, 16), dtype=np.float32))
    return jnp.asarray(img)


class TestFast:
    def test_detects_isolated_corner(self):
        img = np.full((64, 64), 50.0, dtype=np.float32)
        img[30:34, 30:34] = 200.0  # bright square: corners at its edges
        score = fast.fast_score(jnp.asarray(img), 20.0)
        assert float(score.max()) > 0
        ys, xs = np.nonzero(np.asarray(score) > 0)
        assert len(ys) > 0
        assert np.all((ys >= 27) & (ys <= 36) & (xs >= 27) & (xs <= 36))

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 99.0)
        score = fast.fast_score(img, 20.0)
        assert float(score.max()) == 0.0

    def test_no_corners_on_edge_only(self):
        """A long straight step edge is not a FAST-9 corner."""
        img = np.full((64, 64), 50.0, dtype=np.float32)
        img[:, 32:] = 200.0
        score = fast.fast_score(jnp.asarray(img), 20.0)
        # interior of the straight edge must not fire (line, not corner)
        assert float(np.asarray(score)[10:54, :].max()) == 0.0

    def test_score_is_max_threshold(self):
        img = np.full((64, 64), 50.0, dtype=np.float32)
        img[30:34, 30:34] = 120.0
        s = np.asarray(fast.fast_score(jnp.asarray(img), 20.0))
        peak = s.max()
        # still a corner at threshold just below the score, not above
        s_lo = np.asarray(fast.fast_score(jnp.asarray(img), peak - 0.5))
        s_hi = np.asarray(fast.fast_score(jnp.asarray(img), peak + 0.5))
        assert s_lo.max() > 0
        assert s_hi.max() == 0

    def test_nms_keeps_single_peak(self):
        score = np.zeros((32, 32), dtype=np.float32)
        score[10, 10] = 5.0
        score[10, 11] = 4.0
        out = np.asarray(fast.nms3(jnp.asarray(score)))
        assert out[10, 10] == 5.0
        assert out[10, 11] == 0.0


class TestPyramid:
    def test_level_sizes(self):
        sizes = pyramid.level_sizes(480, 640, 8, 1.2)
        assert sizes[0] == (480, 640)
        assert sizes[1] == (400, 533)
        assert len(sizes) == 8

    def test_resize_preserves_mean(self, test_image):
        out = pyramid.resize_bilinear(test_image, (400, 533))
        assert abs(float(out.mean()) - float(test_image.mean())) < 2.0

    def test_blur_preserves_mean(self, test_image):
        out = pyramid.gaussian_blur(test_image)
        assert abs(float(out.mean()) - float(test_image.mean())) < 0.5


class TestExtract:
    @pytest.fixture(scope="class")
    def kps(self, test_image):
        cfg = ORBConfig()
        return orb.extract(test_image, cfg), cfg

    def test_capacity_and_validity(self, kps):
        k, cfg = kps
        assert k.capacity == orb.total_capacity(cfg)
        assert int(k.valid.sum()) > 500  # textured image: plenty of corners

    def test_coords_in_bounds(self, kps):
        k, cfg = kps
        xy = np.asarray(k.xy)[np.asarray(k.valid)]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 640
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 480

    def test_levels_populated(self, kps):
        k, _ = kps
        lv = np.asarray(k.level)[np.asarray(k.valid)]
        assert lv.min() == 0
        assert lv.max() >= 4  # coarse levels find corners too

    def test_spatial_spread(self, kps):
        """Per-cell top-k should spread keypoints across the image
        (the quadtree property the reference enforces)."""
        k, _ = kps
        xy = np.asarray(k.xy)[np.asarray(k.valid)]
        # quadrant occupancy
        for qx in (0, 1):
            for qy in (0, 1):
                m = ((xy[:, 0] >= qx * 320) & (xy[:, 0] < (qx + 1) * 320)
                     & (xy[:, 1] >= qy * 240) & (xy[:, 1] < (qy + 1) * 240))
                assert m.sum() > 50

    def test_descriptors_deterministic(self, test_image):
        cfg = ORBConfig()
        k1 = orb.extract(test_image, cfg)
        k2 = orb.extract(test_image, cfg)
        np.testing.assert_array_equal(np.asarray(k1.desc), np.asarray(k2.desc))

    def test_rotation_invariance(self):
        """Descriptor of a 90-degree rotated patch should be close (steered
        BRIEF property) — check median distance is far below random (128)."""
        rng = np.random.default_rng(3)
        patch = rng.uniform(0, 255, (200, 200)).astype(np.float32)
        patch = np.kron(patch[:50, :50], np.ones((4, 4), dtype=np.float32))
        img1 = jnp.asarray(patch)
        img2 = jnp.asarray(np.rot90(patch).copy())
        cfg = ORBConfig(n_features=200, n_levels=1)
        k1 = orb.extract(img1, cfg)
        k2 = orb.extract(img2, cfg)
        d = np.asarray(matching.hamming_matrix(k1.desc, k2.desc))
        v1, v2 = np.asarray(k1.valid), np.asarray(k2.valid)
        d = d[v1][:, v2]
        # for each kp in img1 the rotated twin should be findable
        best = d.min(axis=1)
        assert np.median(best) < 60


class TestMatching:
    def test_hamming_matrix_matches_popcount(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (24, 8), dtype=np.uint32)
        d_mat = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        for i in range(16):
            for j in range(0, 24, 7):
                expected = bin(int.from_bytes(a[i].tobytes(), "little")
                               ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
                assert d_mat[i, j] == expected

    def test_popcount(self):
        x = jnp.asarray(np.array([[0, 1, 0xFFFFFFFF, 0x0F0F0F0F]], dtype=np.uint32))
        p = np.asarray(matching.popcount32(x))
        np.testing.assert_array_equal(p, [[0, 1, 32, 16]])

    def test_masked_nn_with_ratio(self):
        dist = jnp.asarray(np.array([[10.0, 50.0, 60.0], [30.0, 31.0, 90.0]]))
        r = matching.masked_nn(dist, max_dist=100.0, ratio=0.8)
        assert r.idx[0] == 0 and bool(r.ok[0])
        assert not bool(r.ok[1])  # 30 vs 31 fails ratio

    def test_masked_nn_gate(self):
        dist = jnp.asarray(np.array([[10.0, 20.0]]))
        gate = jnp.asarray(np.array([[False, True]]))
        r = matching.masked_nn(dist, gate=gate, max_dist=100.0)
        assert r.idx[0] == 1

    def test_resolve_duplicates(self):
        idx = jnp.asarray(np.array([0, 0, 1], dtype=np.int32))
        dist = jnp.asarray(np.array([5.0, 3.0, 7.0]))
        ok = jnp.asarray(np.array([True, True, True]))
        keep = np.asarray(matching.resolve_duplicates(idx, dist, ok, 4))
        np.testing.assert_array_equal(keep, [False, True, True])

    def test_rotation_consistency(self):
        n = 100
        rng = np.random.default_rng(2)
        angle_b = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        angle_a = angle_b + 0.3  # consistent rotation
        angle_a[:5] += np.pi     # 5 outliers
        idx = jnp.arange(n, dtype=jnp.int32)
        ok = jnp.ones(n, dtype=bool)
        keep = np.asarray(matching.rotation_consistency(
            jnp.asarray(angle_a), jnp.asarray(angle_b), idx, ok))
        assert keep[5:].mean() > 0.95
        assert keep[:5].sum() == 0

    def test_window_gate(self):
        q = jnp.asarray(np.array([[100.0, 100.0]]))
        kp = jnp.asarray(np.array([[103.0, 99.0], [120.0, 100.0]]))
        g = np.asarray(matching.window_gate(q, kp, jnp.asarray([5.0])))
        np.testing.assert_array_equal(g, [[True, False]])

    def test_epipolar_gate_geometry(self):
        """Points generated from a known F must pass their own gate."""
        # simple stereo F: x2 = x1 + disparity, y2 = y1 -> F = [e]_x for
        # pure horizontal translation: l2 = F @ x1 has form (0, -1, y1)
        F = jnp.asarray(np.array([[0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]))
        kp1 = jnp.asarray(np.array([[50.0, 60.0], [10.0, 20.0]]))
        kp2_good = jnp.asarray(np.array([[40.0, 60.0], [99.0, 20.0]]))
        sig = jnp.ones(2)
        g = np.asarray(matching.epipolar_gate(kp1, kp2_good, F.T, sig))
        # row i should accept kp2 with same y
        assert g[0, 0] and g[1, 1]
