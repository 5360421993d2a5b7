"""Native host runtime (native/orbslam_host.cpp via ctypes) vs the pure
Python/numpy fallbacks. The native library is required in this
environment (g++ is baked in; native/build.sh auto-runs on first use)."""

import numpy as np
import pytest

from orb_slam2_map_tpu import native
from orb_slam2_map_tpu.dense.grid2d import OccupancyGrid2D


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native runtime failed to build"


def _popcount_rows(a, b):
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


class TestBresenham:
    def test_matches_python_fallback(self):
        rng = np.random.default_rng(0)
        h, w = 40, 50
        vis_n = np.zeros((h, w), np.int32)
        occ_n = np.zeros((h, w), np.int32)
        px = rng.integers(-5, w + 5, 200)
        pz = rng.integers(-5, h + 5, 200)
        ok = native.bresenham_rays(vis_n, occ_n, 10, 12, px, pz)
        assert ok

        g = OccupancyGrid2D(0, w * 0.05, 0, h * 0.05, 0.05)
        for x1, z1 in zip(px, pz):
            g._bresenham(10, 12, int(x1), int(z1))
        np.testing.assert_array_equal(vis_n, g.visited)
        np.testing.assert_array_equal(occ_n, g.occupied)

    def test_grid2d_uses_native(self):
        # insert_rays (native path) must agree with pure-python _bresenham
        rng = np.random.default_rng(1)
        g1 = OccupancyGrid2D(-1, 1, -1, 1, 0.05)
        g2 = OccupancyGrid2D(-1, 1, -1, 1, 0.05)
        pts = rng.uniform(-0.9, 0.9, (100, 2))
        g1.insert_rays(np.zeros(2), pts)
        px, pz = g2._to_cell(pts[:, 0], pts[:, 1])
        ox, oz = g2._to_cell(np.zeros(1), np.zeros(1))
        for x1, z1 in zip(px, pz):
            g2._bresenham(int(ox[0]), int(oz[0]), int(x1), int(z1))
        np.testing.assert_array_equal(g1.visited, g2.visited)
        np.testing.assert_array_equal(g1.occupied, g2.occupied)


class TestMinMedianHamming:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        # 5 points with 1..9 observations each, CSR-packed
        counts = [1, 3, 9, 4, 2]
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        descs = rng.integers(0, 2 ** 32, (offsets[-1], 8),
                             dtype=np.uint32)
        out = native.min_median_hamming_batch(descs, offsets)
        assert out is not None
        for p in range(len(counts)):
            d = descs[offsets[p]:offsets[p + 1]]
            dist = _popcount_rows(d, d)
            # reference semantics: nth_element at n//2 (a median upper
            # half for even n), min over rows
            med = np.sort(dist, axis=1)[:, d.shape[0] // 2]
            best = int(np.argmin(med))
            np.testing.assert_array_equal(out[p], d[best])


class TestBuildObservers:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        K, N, M = 6, 32, 40
        kf_obs = rng.integers(-1, M, (K, N)).astype(np.int64)
        kf_exists = np.ones(K, np.uint8)
        kf_exists[2] = 0
        # map half the point ids into slots
        slot_of_mp = np.full(M, -1, np.int64)
        sel = rng.permutation(M)[: M // 2]
        slot_of_mp[sel] = np.arange(M // 2)
        res = native.build_observers(kf_obs, kf_exists, slot_of_mp,
                                     M // 2)
        assert res is not None
        counts, obs_kf, obs_kp = res
        # numpy reference
        exp = [[] for _ in range(M // 2)]
        for k in range(K):
            if not kf_exists[k]:
                continue
            for i in range(N):
                mp = kf_obs[k, i]
                if mp < 0 or slot_of_mp[mp] < 0:
                    continue
                exp[slot_of_mp[mp]].append((k, i))
        exp_counts = np.asarray([len(e) for e in exp], np.int32)
        np.testing.assert_array_equal(counts, exp_counts)
        off = np.concatenate([[0], np.cumsum(exp_counts)])
        for s in range(M // 2):
            got = sorted(zip(obs_kf[off[s]:off[s + 1]],
                             obs_kp[off[s]:off[s + 1]]))
            assert got == sorted(exp[s])
