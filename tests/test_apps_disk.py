"""End-to-end dataset drivers from DISK: generate tiny TUM / KITTI
fixtures (tests/fixtures.py) and run the apps/ drivers on them in-process
— the full file-IO -> config -> SLAM -> trajectory-writer path the
reference exercises with its Examples binaries
(reference: Examples/RGB-D/rgbd_tum.cc:141-166, rgbd_cc.cc,
Examples/Stereo/stereo_kitti.cc)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixtures import make_kitti_fixture, make_tum_fixture  # noqa: E402

APPS = os.path.join(os.path.dirname(__file__), "..", "apps")


def _load_app(name):
    if APPS not in sys.path:
        sys.path.insert(0, APPS)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(APPS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tum_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_tiny"))
    return make_tum_fixture(root, n_frames=12)


class TestDiskDrivers:
    def test_rgbd_tum_from_disk(self, tum_fixture, tmp_path,
                                monkeypatch, capsys):
        root, assoc, gt, settings = tum_fixture
        out = str(tmp_path / "traj.txt")
        app = _load_app("rgbd_tum")
        monkeypatch.setattr(sys, "argv", [
            "rgbd_tum", root, assoc, "--settings", settings,
            "--gt", gt, "--out", out, "--no-loop"])
        assert app.main() == 0
        printed = capsys.readouterr().out
        assert "ATE RMSE" in printed
        ate_cm = float(printed.split("ATE RMSE:")[1].split("cm")[0])
        assert ate_cm < 2.0, f"disk TUM ATE {ate_cm}cm exceeds target"
        from orb_slam2_map_tpu.io import trajectory as tio

        ts2, mats = tio.read_tum(out)
        assert len(ts2) >= 10

    def test_rgbd_cc_from_disk(self, tum_fixture, tmp_path, monkeypatch):
        root, assoc, gt, settings = tum_fixture
        out = str(tmp_path / "traj_cc.txt")
        app = _load_app("rgbd_cc")
        monkeypatch.setattr(sys, "argv", [
            "rgbd_cc", root, "--settings", settings, "--out", out,
            "--no-loop"])
        assert app.main() == 0
        from orb_slam2_map_tpu.io import trajectory as tio

        ts2, mats = tio.read_tum(out)
        assert len(ts2) >= 10

    def test_stereo_kitti_from_disk(self, tmp_path_factory, tmp_path,
                                    monkeypatch):
        root = str(tmp_path_factory.mktemp("kitti_tiny"))
        root, Twc_gt = make_kitti_fixture(root, n_frames=6)
        out = str(tmp_path / "kitti.txt")
        app = _load_app("stereo_kitti")
        monkeypatch.setattr(sys, "argv", [
            "stereo_kitti", root, "--out", out, "--no-loop"])
        assert app.main() == 0
        assert os.path.exists(out)
        mats = np.loadtxt(out)
        assert mats.shape[1] == 12   # KITTI 3x4 rows

    def test_mono_tum_from_disk(self, tum_fixture, tmp_path, monkeypatch):
        """Monocular TUM driver end-to-end from files (reference:
        Examples/Monocular/mono_tum.cc): init from parallax, track, and
        write the keyframe trajectory."""
        root, assoc, gt, settings = tum_fixture
        out = str(tmp_path / "kf_traj.txt")
        app = _load_app("mono_tum")
        monkeypatch.setattr(sys, "argv", [
            "mono_tum", root, "--settings", settings, "--out", out,
            "--no-loop"])
        assert app.main() == 0
        from orb_slam2_map_tpu.io import trajectory as tio

        ts2, mats = tio.read_tum(out)
        assert len(ts2) >= 2, "mono init produced no keyframes"

    def test_mono_kitti_from_disk(self, tmp_path_factory, tmp_path,
                                  monkeypatch):
        root = str(tmp_path_factory.mktemp("kitti_mono"))
        root, Twc_gt = make_kitti_fixture(root, n_frames=10)
        out = str(tmp_path / "kf_traj.txt")
        app = _load_app("mono_kitti")
        monkeypatch.setattr(sys, "argv", [
            "mono_kitti", root, "--out", out, "--no-loop"])
        assert app.main() == 0
        import os as _os

        assert _os.path.exists(out)

    def test_rgbd_live_folder_source(self, tum_fixture, monkeypatch,
                                     capsys):
        root, assoc, gt, settings = tum_fixture
        app = _load_app("rgbd_live")
        monkeypatch.setattr(sys, "argv", [
            "rgbd_live", "--source", "folder", "--root", root,
            "--settings", settings, "--fps", "1000"])
        assert app.main() == 0
        assert "live run:" in capsys.readouterr().out

    def test_rgbd_live_network_source(self, monkeypatch, capsys):
        """Sensor-host → tracker TCP stream (the rgbd_xtion_cc live path
        with the capture on another machine): a server thread streams a
        synthetic sequence, the app tracks from `--source network`."""
        import socket
        import threading

        from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                    SyntheticWorld,
                                                    sweep_trajectory)

        app = _load_app("rgbd_live")
        world = SyntheticWorld()
        Twc, ts = sweep_trajectory(8)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        with socket.socket() as s:       # free port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        ready = threading.Event()
        th = threading.Thread(
            target=app.serve_frames, args=(port, iter(seq), world.cam),
            kwargs={"ready": ready}, daemon=True)
        th.start()
        assert ready.wait(5.0)
        monkeypatch.setattr(sys, "argv", [
            "rgbd_live", "--source", "network", "--port", str(port)])
        assert app.main() == 0
        th.join(timeout=10.0)
        assert not th.is_alive()
        out = capsys.readouterr().out
        assert "live run: 8 frames" in out

    def test_network_source_depth_roundtrip(self):
        """Depth must survive the wire bit-exactly (the encoder sends
        big-endian u16; a native-order decode byte-swaps every value:
        2.000 m would read back as 0.827 m)."""
        import socket
        import threading

        import numpy as np

        from orb_slam2_map_tpu.geom.camera import PinholeCamera

        app = _load_app("rgbd_live")
        h, w = 8, 12
        cam = PinholeCamera(fx=100.0, fy=100.0, cx=6.0, cy=4.0,
                            width=w, height=h)
        rng = np.random.default_rng(3)
        depth = rng.uniform(0.3, 9.0, (h, w)).astype(np.float32)
        depth[0, 0] = 2.0          # the advisor's probe value
        gray = rng.uniform(0, 255, (h, w)).astype(np.float32)
        frames = [(0.5, gray, depth, None)]
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        ready = threading.Event()
        th = threading.Thread(target=app.serve_frames,
                              args=(port, iter(frames), cam),
                              kwargs={"ready": ready}, daemon=True)
        th.start()
        assert ready.wait(5.0)
        src = app.NetworkSource(port=port)
        assert src.open()
        ts, g, d, rgb = src.grab()
        src.close()
        th.join(timeout=5.0)
        # quantization is 1/5000 m; byte-swap errors are ~1000x larger
        np.testing.assert_allclose(d, np.round(depth * 5000) / 5000,
                                   atol=1.01 / 5000)
        assert abs(float(d[0, 0]) - 2.0) < 1e-3
