"""Web viewer: the browser equivalent of the reference's Pangolin UI
(reference: src/Viewer.cc — camera-follow view, menu toggles, Save)."""

import json
import urllib.request

import numpy as np
import pytest

from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            sweep_trajectory)


@pytest.fixture(scope="module")
def served(small_world):
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
    from orb_slam2_map_tpu.viz.web_viewer import WebViewer

    world, cfg = small_world
    Twc, ts = sweep_trajectory(6)
    seq = SyntheticRGBDSequence(world, Twc, ts)
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      max_keyframes=64, max_points=1 << 14)
    viewer = WebViewer(slam, port=18765).start()
    for i in range(len(seq)):
        t, gray, depth, rgb = seq[i]
        Tcw = slam.track_rgbd(t, gray, depth)
        viewer.update(gray, Tcw)
    yield slam, viewer
    viewer.stop()


class TestWebViewer:
    def test_status(self, served):
        slam, viewer = served
        with urllib.request.urlopen(
                "http://127.0.0.1:18765/status", timeout=10) as r:
            s = json.loads(r.read())
        assert s["state"] == "OK"
        assert s["keyframes"] >= 1
        assert s["map_points"] > 100

    def test_index_page(self, served):
        with urllib.request.urlopen(
                "http://127.0.0.1:18765/", timeout=10) as r:
            body = r.read()
        assert b"live viewer" in body

    def test_frame_stream_delivers_png(self, served):
        req = urllib.request.urlopen(
            "http://127.0.0.1:18765/frame", timeout=10)
        data = req.read(40000)
        req.close()
        assert b"\x89PNG" in data

    def test_localization_toggle(self, served):
        slam, viewer = served
        req = urllib.request.Request(
            "http://127.0.0.1:18765/localization/on", method="POST")
        urllib.request.urlopen(req, timeout=10).read()
        assert slam.tracker.only_tracking
        req = urllib.request.Request(
            "http://127.0.0.1:18765/localization/off", method="POST")
        urllib.request.urlopen(req, timeout=10).read()
        assert not slam.tracker.only_tracking
