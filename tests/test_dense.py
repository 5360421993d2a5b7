import numpy as np
import pytest

from orb_slam2_map_tpu.config import DenseMappingConfig, SystemConfig
from orb_slam2_map_tpu.dense import grid2d, occupancy, pointcloud
from orb_slam2_map_tpu.io.synthetic import SyntheticWorld, sweep_trajectory


class TestVoxelDownsample:
    def test_reduces_density(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 1, (10000, 3)).astype(np.float32)
        out, _ = pointcloud.voxel_downsample(xyz, None, 0.1)
        assert len(out) <= 11 ** 3
        assert len(out) > 500

    def test_centroid_property(self):
        xyz = np.asarray([[0.01, 0.01, 0.01], [0.03, 0.03, 0.03]],
                         dtype=np.float32)
        out, _ = pointcloud.voxel_downsample(xyz, None, 0.1)
        assert len(out) == 1
        np.testing.assert_allclose(out[0], [0.02, 0.02, 0.02], atol=1e-5)

    def test_colors_averaged(self):
        xyz = np.zeros((2, 3), dtype=np.float32)
        col = np.asarray([[0, 0, 0], [200, 100, 50]], dtype=np.uint8)
        out, oc = pointcloud.voxel_downsample(xyz, col, 0.1)
        assert oc[0, 0] == 100


class TestSOR:
    def test_removes_isolated_outlier(self):
        rng = np.random.default_rng(1)
        cloud = rng.normal(0, 0.1, (500, 3)).astype(np.float32)
        cloud = np.concatenate([cloud, [[5.0, 5.0, 5.0]]]).astype(np.float32)
        keep = pointcloud.statistical_outlier_removal(cloud, mean_k=20,
                                                      std_mul=1.0)
        assert not keep[-1]
        assert keep[:-1].mean() > 0.7


class TestPCD:
    def test_roundtrip(self, tmp_path):
        xyz = np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
        col = np.asarray([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
        p = str(tmp_path / "c.pcd")
        pointcloud.save_pcd(p, xyz, col)
        x2, c2 = pointcloud.load_pcd(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-3)
        np.testing.assert_array_equal(c2, col)


class TestOccupancy3D:
    def test_ray_insertion(self):
        cfg = DenseMappingConfig()
        g = occupancy.OccupancyGrid3D(cfg, origin=(0, 0, 0), size=(4, 2, 4))
        origin = np.asarray([2.0, 1.0, 0.5], dtype=np.float32)
        # wall of points at z = 3
        xs = np.linspace(0.5, 3.5, 40)
        ys = np.linspace(0.2, 1.8, 10)
        pts = np.stack(np.meshgrid(xs, ys, [3.0]), -1).reshape(-1, 3)
        g.insert_scan(origin, pts.astype(np.float32))
        centers, _ = g.occupied_cells(threshold=0.6)
        assert len(centers) > 50
        assert abs(np.median(centers[:, 2]) - 3.0) < 0.2
        # free space along the rays near origin
        prob = g.occupancy_prob()
        i, j, k = (int((2.0) / g.res), int(1.0 / g.res), int(1.5 / g.res))
        assert prob[i, j, k] < 0.45  # one miss update: sigmoid(-0.4)=0.401

    def test_ground_points_clear_only(self):
        cfg = DenseMappingConfig()
        g = occupancy.OccupancyGrid3D(cfg, origin=(0, 0, 0), size=(4, 2, 4))
        origin = np.asarray([2.0, 1.0, 0.5], dtype=np.float32)
        pts = np.asarray([[2.0, 0.1, 3.0]], dtype=np.float32)
        g.insert_scan(origin, pts, ground_mask=np.asarray([True]))
        centers, _ = g.occupied_cells(threshold=0.6)
        assert len(centers) == 0

    def test_save_load(self, tmp_path):
        cfg = DenseMappingConfig()
        g = occupancy.OccupancyGrid3D(cfg, origin=(0, 0, 0), size=(2, 2, 2))
        g.insert_scan(np.zeros(3, np.float32),
                      np.asarray([[1.0, 1.0, 1.0]], np.float32))
        p = str(tmp_path / "grid.npz")
        g.save(p)
        g2 = occupancy.OccupancyGrid3D.load(p, cfg)
        np.testing.assert_allclose(np.asarray(g.log_odds),
                                   np.asarray(g2.log_odds))

    def test_project_2d(self):
        cfg = DenseMappingConfig()
        g = occupancy.OccupancyGrid3D(cfg, origin=(0, 0, 0), size=(4, 2, 4))
        origin = np.asarray([2.0, 1.0, 0.5], dtype=np.float32)
        xs = np.linspace(0.5, 3.5, 60)
        pts = np.stack([xs, np.full(60, 1.0), np.full(60, 3.0)], -1)
        g.insert_scan(origin, pts.astype(np.float32))
        g.insert_scan(origin, pts.astype(np.float32))  # 2 hits > 0.8 thresh
        grid = g.project_2d(0.2, 1.8, threshold=0.6)
        assert (grid == 100).sum() > 10


class TestGroundPlane:
    def test_detects_horizontal_plane(self):
        rng = np.random.default_rng(2)
        ground = np.stack([rng.uniform(0, 5, 500),
                           np.full(500, 0.02) + rng.normal(0, 0.01, 500),
                           rng.uniform(0, 5, 500)], axis=1)
        wall = np.stack([rng.uniform(0, 5, 300),
                         rng.uniform(0, 2, 300),
                         np.full(300, 4.9)], axis=1)
        pts = np.concatenate([ground, wall]).astype(np.float32)
        cfg = DenseMappingConfig()
        mask, plane = occupancy.ransac_ground_plane(pts, cfg)
        assert mask[:500].mean() > 0.9
        assert mask[500:].mean() < 0.1


class TestGrid2D:
    def test_bresenham_marks_free_and_occupied(self):
        g = grid2d.OccupancyGrid2D(0, 10, 0, 10, 0.5)
        pts = np.asarray([[8.0, 8.0]] * 5)
        g.insert_rays(np.asarray([1.0, 1.0]), pts)
        out = g.grid()
        assert out[int(8 / 0.5), int(8 / 0.5)] == 100   # endpoint occupied
        assert out[int(4 / 0.5), int(4 / 0.5)] == 0     # along ray free
        assert out[0, -1] == -1                         # unseen

    def test_save_pgm(self, tmp_path):
        g = grid2d.OccupancyGrid2D(0, 2, 0, 2, 0.5)
        g.insert_rays(np.asarray([0.1, 0.1]), np.asarray([[1.5, 1.5]]))
        p = str(tmp_path / "map.pgm")
        g.save_pgm(p)
        data = open(p, "rb").read()
        assert data.startswith(b"P5")
        assert (tmp_path / "map.yaml").exists()


class TestDenseMapper:
    def test_end_to_end_geometry(self, tmp_path):
        """Fused cloud from two synthetic views must lie on the box walls."""
        world = SyntheticWorld()
        cfg = SystemConfig(camera=world.cam)
        from orb_slam2_map_tpu.slam.mapstore import MapStore

        m = MapStore(max_keyframes=8, max_points=128, kp_capacity=8)
        dm = pointcloud.DenseMapper(cfg, m)
        Twc, ts = sweep_trajectory(4)
        for i in (0, 2):
            _, gray, depth, rgb = (ts[i], *world.render(Twc[i]))
            kid = m.alloc_keyframe()
            m.kf_R[kid] = np.linalg.inv(Twc[i])[:3, :3]
            m.kf_t[kid] = np.linalg.inv(Twc[i])[:3, 3]
            dm.insert_keyframe(kid, rgb, depth)
        dm.finalize(str(tmp_path / "cloud.pcd"))
        xyz = dm.global_xyz
        assert len(xyz) > 5000
        L = np.asarray([6.0, 3.0, 6.0])
        d0 = np.abs(xyz).min(axis=1)
        d1 = np.abs(xyz - L).min(axis=1)
        wall_dist = np.minimum(d0, d1)
        assert np.percentile(wall_dist, 90) < 0.05
