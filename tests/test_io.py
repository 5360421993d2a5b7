import os

import numpy as np
import pytest

from orb_slam2_map_tpu.io import evaluate, synthetic, trajectory, tum
from orb_slam2_map_tpu import config


class TestTum:
    def test_association_parse(self, tmp_path):
        p = tmp_path / "assoc.txt"
        p.write_text(
            "# comment\n"
            "1.0 rgb/1.png 1.01 depth/1.png\n"
            "2.0 rgb/2.png 2.01 depth/2.png\n"
        )
        a = tum.load_associations(str(p))
        assert len(a.rgb_files) == 2
        assert a.rgb_files[1] == "rgb/2.png"
        assert a.depth_files[0] == "depth/1.png"
        np.testing.assert_allclose(a.timestamps, [1.0, 2.0])

    def test_reference_association_fixtures(self):
        ref = "/root/reference/Examples/RGB-D/associations/fr1_xyz.txt"
        if not os.path.exists(ref):
            pytest.skip("reference fixtures unavailable")
        a = tum.load_associations(ref)
        assert len(a.rgb_files) > 700

    def test_grayscale(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[..., 0] = 100
        g = tum.to_grayscale(img, rgb_order=1)
        np.testing.assert_allclose(g, 29.9, atol=0.01)


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 10
        mats = []
        for _ in range(n):
            w = rng.standard_normal(3) * 0.3
            th = np.linalg.norm(w)
            K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
            R = np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * K @ K
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = rng.standard_normal(3)
            mats.append(T)
        ts = np.arange(n, dtype=float)
        path = str(tmp_path / "traj.txt")
        trajectory.write_tum(path, ts, mats)
        ts2, mats2 = trajectory.read_tum(path)
        np.testing.assert_allclose(ts, ts2)
        np.testing.assert_allclose(np.asarray(mats), mats2, atol=1e-5)

    def test_kitti_write(self, tmp_path):
        path = str(tmp_path / "kitti.txt")
        trajectory.write_kitti(path, [np.eye(4)])
        vals = [float(x) for x in open(path).read().split()]
        assert len(vals) == 12
        assert vals[0] == 1.0


class TestEvaluate:
    def test_ate_zero_for_identical(self):
        rng = np.random.default_rng(1)
        pos = rng.standard_normal((50, 3))
        ts = np.arange(50, dtype=float)
        assert evaluate.ate_rmse(ts, pos, ts, pos) < 1e-9

    def test_ate_invariant_to_rigid_transform(self):
        rng = np.random.default_rng(2)
        pos = rng.standard_normal((50, 3))
        ts = np.arange(50, dtype=float)
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        moved = pos @ R.T + np.array([1.0, 2.0, 3.0])
        assert evaluate.ate_rmse(ts, moved, ts, pos) < 1e-6

    def test_ate_detects_error(self):
        rng = np.random.default_rng(3)
        pos = rng.standard_normal((50, 3))
        ts = np.arange(50, dtype=float)
        noisy = pos + 0.05 * rng.standard_normal((50, 3))
        e = evaluate.ate_rmse(ts, noisy, ts, pos)
        assert 0.02 < e < 0.12

    def test_umeyama_scale(self):
        rng = np.random.default_rng(4)
        src = rng.standard_normal((30, 3))
        dst = 2.5 * src + 1.0
        s, R, t = evaluate.umeyama_alignment(src, dst, with_scale=True)
        assert s == pytest.approx(2.5, rel=1e-6)


class TestSynthetic:
    def test_render_consistency(self):
        world = synthetic.SyntheticWorld()
        Twc, ts = synthetic.sweep_trajectory(2)
        t0, gray, depth, rgb = synthetic.SyntheticRGBDSequence(world, Twc, ts)[0]
        cam = world.cam
        assert gray.shape == (cam.height, cam.width)
        assert depth.shape == (cam.height, cam.width)
        assert rgb.shape == (cam.height, cam.width, 3)
        # most pixels should hit a wall with positive finite depth
        assert (depth > 0.05).mean() > 0.95
        assert depth.max() < 20.0
        # texture has contrast (needed for corners)
        assert gray.std() > 15.0

    def test_depth_geometry_exact(self):
        """Unprojecting rendered depth must land on the box walls."""
        world = synthetic.SyntheticWorld(size=(6.0, 3.0, 6.0))
        Twc, ts = synthetic.sweep_trajectory(3)
        _, _, depth, _ = synthetic.SyntheticRGBDSequence(world, Twc, ts)[1]
        cam = world.cam
        vs, us = np.mgrid[0:cam.height:40, 0:cam.width:40]
        z = depth[vs, us]
        x = (us - cam.cx) / cam.fx * z
        y = (vs - cam.cy) / cam.fy * z
        pc = np.stack([x, y, z], -1).reshape(-1, 3)
        Tw = Twc[1]
        pw = pc @ Tw[:3, :3].T + Tw[:3, 3]
        L = np.array([6.0, 3.0, 6.0])
        # each point lies on (at least) one wall plane
        d0 = np.abs(pw).min(axis=1)
        d1 = np.abs(pw - L).min(axis=1)
        wall_dist = np.minimum(d0, d1)
        valid = pc[:, 2] > 0.05
        assert np.percentile(wall_dist[valid], 95) < 0.01

    def test_rendering_deterministic(self):
        world = synthetic.SyntheticWorld(seed=5)
        Twc, _ = synthetic.orbit_trajectory(1)
        g1, d1, _ = world.render(Twc[0])
        g2, d2, _ = world.render(Twc[0])
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_array_equal(d1, d2)


class TestConfig:
    def test_defaults_match_reference_yaml(self):
        cfg = config.SystemConfig()
        assert cfg.orb.n_features == 1000
        assert cfg.orb.n_levels == 8
        assert cfg.matcher.th_low == 50
        assert cfg.tracking.max_local_keyframes == 80

    def test_load_reference_settings(self):
        path = "/root/reference/Examples/RGB-D/TUM1.yaml"
        if not os.path.exists(path):
            pytest.skip("reference settings unavailable")
        cfg = config.load_settings(path)
        assert cfg.camera.fx == pytest.approx(517.306408)
        assert cfg.camera.k1 == pytest.approx(0.262383)
        assert cfg.orb.ini_th_fast == 20
        assert cfg.depth_map_factor == 5000.0

    def test_features_per_level_sums(self):
        orb = config.ORBConfig()
        counts = orb.features_per_level()
        assert len(counts) == 8
        assert abs(sum(counts) - 1000) <= 10


class TestKitti:
    def _make_seq(self, tmp_path, n=3, stereo=True):
        from PIL import Image

        root = tmp_path / "00"
        (root / "image_0").mkdir(parents=True)
        if stereo:
            (root / "image_1").mkdir()
        rng = np.random.default_rng(0)
        for i in range(n):
            for sub in (["image_0", "image_1"] if stereo else ["image_0"]):
                img = rng.integers(0, 255, (37, 61), dtype=np.uint8)
                Image.fromarray(img).save(root / sub / f"{i:06d}.png")
        np.savetxt(root / "times.txt", np.arange(n) * 0.1)
        P0 = "P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0"
        P1 = ("P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 "
              "0 0 1 0")
        (root / "calib.txt").write_text(
            P0 + "\n" + P1 + "\n" + P0.replace("P0", "P2") + "\n"
            + P1.replace("P1", "P3") + "\n")
        return str(root)

    def test_sequence_load(self, tmp_path):
        from orb_slam2_map_tpu.io import kitti

        root = self._make_seq(tmp_path)
        seq = kitti.KittiSequence(root, stereo=True)
        assert len(seq) == 3
        t, gl, gr = seq[1]
        assert abs(t - 0.1) < 1e-9
        assert gl.shape == (37, 61) and gr.shape == (37, 61)
        # calib parsed: fx and bf from P0/P1
        assert abs(seq.camera.fx - 718.856) < 1e-3
        assert abs(seq.camera.bf - 386.1448) < 1e-3

    def test_camera_presets_match_reference_yamls(self):
        from orb_slam2_map_tpu.io import kitti

        c = kitti.kitti_camera(0)  # KITTI00-02.yaml
        assert abs(c.fx - 718.856) < 1e-3 and abs(c.bf - 386.1448) < 1e-3
        c3 = kitti.kitti_camera(3)  # KITTI03.yaml
        assert abs(c3.fx - 721.5377) < 1e-3
        c4 = kitti.kitti_camera(7)  # KITTI04-12.yaml
        assert abs(c4.fx - 707.0912) < 1e-3

    def test_poses_and_drift(self, tmp_path):
        from orb_slam2_map_tpu.io import kitti

        # straight-line gt, 1 m per frame, 150 frames
        n = 150
        Twc = np.tile(np.eye(4), (n, 1, 1))
        Twc[:, 2, 3] = np.arange(n, dtype=np.float64)
        flat = Twc[:, :3, :].reshape(n, 12)
        np.savetxt(tmp_path / "00.txt", flat)
        loaded = kitti.load_poses(str(tmp_path / "00.txt"))
        np.testing.assert_allclose(loaded, Twc)
        assert kitti.translational_drift(Twc, Twc, lengths=(100,)) == 0.0
        # 1% scale error -> ~1% drift
        est = Twc.copy()
        est[:, 2, 3] *= 1.01
        d = kitti.translational_drift(est, Twc, lengths=(100,))
        assert 0.5 < d < 1.5
