"""Tests: pub/sub map streaming, AR plane/cube, CLI tools.

Covers the reference-parity components added on top of the core SLAM
engine: the ROS-topic-equivalent bus + grid-builder node
(ros_mono_pub/sub), the ViewerAR plane detection + cube overlay, and the
offline converter tools (bin_vocabulary, pcd2octomap,
pointCloudToGridMap2D).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run_tool(name, argv):
    """Run a tools/ CLI in-process (same argv surface, none of the
    subprocess jax re-import / re-compile cost)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main([name] + list(argv))


# ---------------------------------------------------------------------------
# pub/sub bus + nodes
# ---------------------------------------------------------------------------

class TestMessageBus:
    def test_fanout_and_backpressure(self):
        from orb_slam2_map_tpu.io.stream import MessageBus

        bus = MessageBus()
        t = bus.topic("x", maxsize=2)
        q1, q2 = t.subscribe(), t.subscribe()
        for i in range(5):
            t.publish(i)
        # bounded queue dropped oldest, kept newest
        assert q1.qsize() == 2 and q2.qsize() == 2
        assert q1.get() == 3 and q1.get() == 4

    def test_same_topic_object(self):
        from orb_slam2_map_tpu.io.stream import MessageBus

        bus = MessageBus()
        assert bus.topic("a") is bus.topic("a")


class TestGridNode:
    def _mk(self):
        from orb_slam2_map_tpu.dense.grid2d import OccupancyGrid2D
        from orb_slam2_map_tpu.io.stream import (Grid2DBuilderNode,
                                                 MessageBus)

        bus = MessageBus()
        node = Grid2DBuilderNode(
            bus, lambda: OccupancyGrid2D(-2, 2, -2, 2, cell_size=0.1))
        return bus, node

    def test_integrates_pts_messages(self):
        from orb_slam2_map_tpu.io.stream import PtsAndPose

        bus, node = self._mk()
        Twc = np.eye(4, dtype=np.float32)
        pts = np.asarray([[1.0, 0.0, 1.0], [-1.0, 0.0, 1.5]],
                         dtype=np.float32)
        bus.topic("pts_and_pose").publish(
            PtsAndPose(frame_id=0, timestamp=0.0, Twc=Twc, points=pts))
        assert node.spin_once()
        g = node.grid.grid()
        assert (g == 100).sum() == 2          # two occupied endpoints
        assert (g == 0).sum() > 10            # free cells along the rays

    def test_loop_rebuild_replaces_grid(self):
        from orb_slam2_map_tpu.io.stream import AllKfAndPts, PtsAndPose

        bus, node = self._mk()
        Twc = np.eye(4, dtype=np.float32)
        bus.topic("pts_and_pose").publish(PtsAndPose(
            0, 0.0, Twc, np.asarray([[1.0, 0, 1.0]], dtype=np.float32)))
        node.drain()
        old = node.grid
        msg = AllKfAndPts(n_keyframes=1, Twc=[Twc],
                          points=[np.asarray([[0.5, 0, 0.5]],
                                             dtype=np.float32)])
        bus.topic("all_kf_and_pts", maxsize=4).publish(msg)
        node.drain()
        assert node.n_rebuilds == 1
        assert node.grid is not old
        assert (node.grid.grid() == 100).sum() == 1

    def test_publisher_with_live_system(self):
        from orb_slam2_map_tpu.config import SystemConfig
        from orb_slam2_map_tpu.io.stream import (MapPointPublisher,
                                                 MessageBus)
        from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                    SyntheticWorld,
                                                    sweep_trajectory)
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        world = SyntheticWorld()
        cfg = SystemConfig(camera=world.cam)
        Twc, ts = sweep_trajectory(6)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        bus = MessageBus()
        pub = MapPointPublisher(bus)
        bus_q = bus.topic("pts_and_pose").subscribe()
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
        for i in range(len(seq)):
            t, gray, depth, _ = seq[i]
            slam.track_rgbd(t, gray, depth)
            pub.update(slam)
        slam.shutdown()
        msgs = []
        while not bus_q.empty():
            msgs.append(bus_q.get())
        assert len(msgs) >= 4
        assert all(m.points.shape[1] == 3 for m in msgs)
        assert all(m.Twc.shape == (4, 4) for m in msgs)
        # tracked-point payloads are non-trivial once initialized
        assert max(len(m.points) for m in msgs) > 50


# ---------------------------------------------------------------------------
# AR
# ---------------------------------------------------------------------------

class TestAR:
    def test_detect_plane_recovers_ground(self):
        from orb_slam2_map_tpu.viz.ar import detect_plane

        rng = np.random.default_rng(0)
        pts = np.stack([rng.uniform(-1, 1, 200),
                        np.full(200, 0.5) + rng.normal(0, 1e-4, 200),
                        rng.uniform(1, 3, 200)], axis=1)
        plane = detect_plane(pts)
        assert plane is not None
        assert abs(abs(plane.normal[1]) - 1.0) < 1e-2
        assert abs(plane.origin[1] - 0.5) < 0.01

    def test_detect_plane_rejects_volume(self):
        from orb_slam2_map_tpu.viz.ar import detect_plane

        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, (100, 3))
        plane = detect_plane(pts)
        # full-volume scatter: an accidental plane may fit few points
        assert plane is None or plane.n_inliers < 60

    def test_cube_rests_on_plane(self):
        from orb_slam2_map_tpu.viz.ar import (cube_vertices_world,
                                              detect_plane)

        rng = np.random.default_rng(2)
        pts = np.stack([rng.uniform(-1, 1, 100),
                        np.zeros(100),
                        rng.uniform(1, 3, 100)], axis=1)
        plane = detect_plane(pts)
        v = cube_vertices_world(plane, size=0.2)
        # all vertices on the normal side, half at distance ~0, half ~0.2
        d = (v - plane.origin) @ plane.normal
        d = np.sort(np.abs(d))
        np.testing.assert_allclose(d[:4], 0.0, atol=1e-6)
        np.testing.assert_allclose(d[4:], 0.2, atol=1e-6)

    def test_ar_viewer_overlay_changes_pixels(self):
        from orb_slam2_map_tpu.geom.camera import PinholeCamera
        from orb_slam2_map_tpu.viz.ar import ARViewer

        cam = PinholeCamera(fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                            width=128, height=96, bf=8.0)
        rng = np.random.default_rng(3)
        # plane y=0.3 in front of an identity camera
        pts = np.stack([rng.uniform(-0.5, 0.5, 100),
                        np.full(100, 0.3),
                        rng.uniform(1.0, 2.0, 100)], axis=1)
        viewer = ARViewer(cam, cube_size=0.3)
        gray = np.full((96, 128), 120, dtype=np.uint8)
        out = viewer.update(gray, np.eye(4), pts)
        assert viewer.plane is not None
        assert (out != 120).any()


# ---------------------------------------------------------------------------
# tools
# ---------------------------------------------------------------------------

class TestTools:
    def test_bin_vocabulary_roundtrip(self, tmp_path):
        from orb_slam2_map_tpu.place.vocabulary import (Vocabulary,
                                                        train_vocabulary)

        rng = np.random.default_rng(0)
        descs = rng.integers(0, 2 ** 32, (400, 8), dtype=np.uint32)
        voc = train_vocabulary(descs, k=3, L=2)
        # write the DBoW2 text format the tool parses
        txt = tmp_path / "voc.txt"
        lines = [f"{voc.k} {voc.L} 0 0"]
        n_internal = voc.level_offset(voc.L)

        parent_of = {}
        # emit nodes in parent order (children of 0, then of 1, ...)
        nodes = []
        for lvl in range(1, voc.L + 1):
            off = voc.level_offset(lvl)
            poff = voc.level_offset(lvl - 1) if lvl > 1 else None
            for i in range(voc.k ** lvl):
                node_id = len(nodes) + 1
                parent = 0 if lvl == 1 else poff + i // voc.k + 1
                nodes.append((parent, off + i, lvl == voc.L))
        for parent, arr_idx, is_leaf in nodes:
            d = voc.centroids[arr_idx]
            byts = d.view(np.uint8)
            w = (voc.weights[arr_idx - voc.level_offset(voc.L)]
                 if is_leaf else 0.0)
            lines.append(f"{parent} {int(is_leaf)} "
                         + " ".join(str(int(b)) for b in byts)
                         + f" {w}")
        txt.write_text("\n".join(lines) + "\n")

        out = tmp_path / "voc.npz"
        rc = _run_tool("bin_vocabulary", [str(txt), str(out)])
        assert rc in (0, None)
        voc2 = Vocabulary.load(str(out))
        assert voc2.k == voc.k and voc2.L == voc.L
        np.testing.assert_array_equal(voc2.centroids, voc.centroids)

    def test_cloud_to_grid2d_cli(self, tmp_path):
        from orb_slam2_map_tpu.dense.pointcloud import save_pcd

        rng = np.random.default_rng(0)
        xyz = np.stack([rng.uniform(-1, 1, 500),
                        np.zeros(500),
                        rng.uniform(-1, 1, 500)], axis=1).astype(np.float32)
        pcd = tmp_path / "c.pcd"
        save_pcd(str(pcd), xyz)
        out = tmp_path / "g.pgm"
        rc = _run_tool("cloud_to_grid2d", [str(pcd), str(out), "0.1"])
        assert rc in (0, None)
        assert out.exists()
        head = out.read_bytes()[:2]
        assert head == b"P5"

    def test_pcd2octomap_cli(self, tmp_path):
        from orb_slam2_map_tpu.config import DenseMappingConfig
        from orb_slam2_map_tpu.dense.occupancy import OccupancyGrid3D
        from orb_slam2_map_tpu.dense.pointcloud import save_pcd

        rng = np.random.default_rng(0)
        xyz = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        pcd = tmp_path / "c.pcd"
        save_pcd(str(pcd), xyz)
        out = tmp_path / "o.npz"
        rc = _run_tool("pcd2octomap", [str(pcd), str(out), "0.1"])
        assert rc in (0, None)
        g = OccupancyGrid3D.load(str(out), DenseMappingConfig())
        occ, _ = g.occupied_cells(threshold=0.5)
        assert len(occ) > 0
