#!/usr/bin/env python
"""Live RGB-D sensor driver: the rgbd_xtion_cc-equivalent app.

Replaces the reference's OpenNI2 Xtion driver (reference:
Examples/RGB-D/rgbd_xtion_cc.cpp — device enumeration :37-57, depth+color
stream init, per-frame TrackRGBD loop). Hardware capture is abstracted
behind `FrameSource`; the OpenNI backend registers itself when the
`openni` package is present (not in this image — the source then reports
unavailable, exactly like the reference exits when no device enumerates),
and a `SyntheticSource` provides a real-time-paced stand-in so the live
loop (grab → track → viewer update → optional AR overlay) is exercisable
end-to-end without hardware.

Usage: python apps/rgbd_live.py [--source synthetic] [--frames 120]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class FrameSource:
    """Abstract live RGB-D source (the OpenNI2 VideoStream pair)."""

    def open(self) -> bool:
        raise NotImplementedError

    def grab(self):
        """-> (timestamp, gray float32 [H,W], depth float32 [H,W] m,
        rgb uint8 [H,W,3] or None), or None at end-of-stream."""
        raise NotImplementedError

    def close(self):
        pass

    @property
    def camera(self):
        raise NotImplementedError


class OpenNISource(FrameSource):
    """Xtion/Primesense via OpenNI2 — enumerates like
    rgbd_xtion_cc.cpp:37-57; unavailable in this image."""

    def open(self) -> bool:
        try:
            import openni  # noqa: F401 — not in the baked image
        except ImportError:
            print("OpenNI2 python bindings not available; "
                  "no device enumerated (cf. rgbd_xtion_cc exit path)")
            return False
        return False  # pragma: no cover — device bring-up not exercised here

    @property
    def camera(self):  # pragma: no cover
        raise RuntimeError("no device")


class SyntheticSource(FrameSource):
    """Real-time-paced synthetic sensor for hardware-free live runs."""

    def __init__(self, fps: float = 30.0, n_frames: int = 120):
        from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                    SyntheticWorld,
                                                    sweep_trajectory)

        self.world = SyntheticWorld()
        Twc, ts = sweep_trajectory(n_frames)
        self.seq = SyntheticRGBDSequence(self.world, Twc, ts)
        self.fps = fps
        self._i = 0
        self._t0 = None

    def open(self) -> bool:
        self._t0 = time.perf_counter()
        return True

    def grab(self):
        if self._i >= len(self.seq):
            return None
        # sensor pacing: block until this frame's capture time
        due = self._t0 + self._i / self.fps
        now = time.perf_counter()
        if now < due:
            time.sleep(due - now)
        t, gray, depth, rgb = self.seq[self._i]
        self._i += 1
        return time.perf_counter() - self._t0, gray, depth, rgb

    @property
    def camera(self):
        return self.world.cam


class FolderSource(FrameSource):
    """File-backed live source: streams paired PNGs from <root>/rgb and
    <root>/depth at sensor pace — a hardware-free stand-in with real
    disk IO (also covers FIFO-style feeds where another process drops
    frames into the folder)."""

    def __init__(self, root: str, fps: float = 30.0,
                 depth_factor: float = 5000.0, settings: str = None):
        self.root = root
        self.fps = fps
        self.depth_factor = depth_factor
        self.settings = settings
        self._cam = None
        self._files = []
        self._i = 0
        self._t0 = None

    def open(self) -> bool:
        rgb_dir = os.path.join(self.root, "rgb")
        depth_dir = os.path.join(self.root, "depth")
        if not (os.path.isdir(rgb_dir) and os.path.isdir(depth_dir)):
            print(f"no rgb/ + depth/ under {self.root}")
            return False
        rgbs = sorted(os.listdir(rgb_dir))
        depths = sorted(os.listdir(depth_dir))
        self._files = list(zip(rgbs, depths))
        if not self._files:
            return False
        if self.settings:
            from orb_slam2_map_tpu.config import load_settings

            cfg = load_settings(self.settings)
            self._cam = cfg.camera
            self.depth_factor = cfg.depth_map_factor
        else:
            from orb_slam2_map_tpu.config import SystemConfig

            self._cam = SystemConfig().camera
        self._t0 = time.perf_counter()
        return True

    def grab(self):
        if self._i >= len(self._files):
            return None
        due = self._t0 + self._i / self.fps
        now = time.perf_counter()
        if now < due:
            time.sleep(due - now)
        from orb_slam2_map_tpu.io.tum import _read_image, to_grayscale

        rname, dname = self._files[self._i]
        rgb = _read_image(os.path.join(self.root, "rgb", rname))
        depth = _read_image(os.path.join(self.root, "depth", dname))
        gray = to_grayscale(rgb)
        depth = depth.astype(np.float32) / self.depth_factor
        self._i += 1
        return time.perf_counter() - self._t0, gray, depth, rgb

    @property
    def camera(self):
        return self._cam


SOURCES = {"openni": OpenNISource, "synthetic": SyntheticSource,
           "folder": FolderSource}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source", choices=sorted(SOURCES), default="synthetic")
    p.add_argument("--root", default=None,
                   help="folder source: directory with rgb/ + depth/")
    p.add_argument("--settings", default=None)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--platform", default=None)
    p.add_argument("--ar", action="store_true",
                   help="AR cube overlay (ViewerAR equivalent)")
    p.add_argument("--out-dir", default=None,
                   help="viewer snapshot directory")
    p.add_argument("--web", type=int, default=None,
                   help="serve the live web viewer on this port")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import SystemConfig
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    if args.source == "synthetic":
        src = SyntheticSource(fps=args.fps, n_frames=args.frames)
    elif args.source == "folder":
        src = FolderSource(args.root or ".", fps=args.fps,
                           settings=args.settings)
    else:
        src = SOURCES[args.source]()
    if not src.open():
        return 1

    cfg = SystemConfig(camera=src.camera)
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      async_mapping=True)
    ar = None
    if args.ar:
        from orb_slam2_map_tpu.viz.ar import ARViewer

        ar = ARViewer(cfg.camera)

    viewer = None
    if args.out_dir:
        from orb_slam2_map_tpu.viz.viewer import Viewer

        viewer = Viewer(slam, args.out_dir)
    web = None
    if args.web:
        from orb_slam2_map_tpu.viz.web_viewer import WebViewer

        web = WebViewer(slam, port=args.web,
                        out_dir=args.out_dir or ".").start()
        print(f"web viewer at http://localhost:{args.web}/")

    n, dropped, t_wall = 0, 0, time.perf_counter()
    times = []
    while True:
        pkt = src.grab()
        if pkt is None:
            break
        ts, gray, depth, rgb = pkt
        t0 = time.perf_counter()
        Tcw = slam.track_rgbd(ts, gray, depth, rgb=rgb)
        dt = time.perf_counter() - t0
        if n > 0:
            times.append(dt)
        if Tcw is None and n > 0:
            dropped += 1
        if ar is not None and Tcw is not None:
            obs = slam.tracker.last_obs
            mp = obs[obs >= 0]
            mp = mp[slam.map.mp_exists[mp]]
            ar.update(gray, Tcw, slam.map.mp_pos[mp])
        if viewer is not None:
            viewer.update(gray, Tcw)
        if web is not None:
            web.update(gray, Tcw)
        n += 1
    wall = time.perf_counter() - t_wall
    src.close()
    if web is not None:
        web.stop()
    slam.shutdown()
    med = np.median(times) if times else 0.0
    print(f"live run: {n} frames in {wall:.1f}s "
          f"({n / wall:.1f} fps wall, median track {med*1e3:.1f} ms, "
          f"{dropped} lost)")
    print(slam.profile_report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
