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


class NetworkSource(FrameSource):
    """TCP network stream: the live-sensor path when the camera hangs off
    another machine (the common TPU deployment — the sensor host runs
    `python apps/rgbd_live.py --serve PORT` next to the camera and this
    process tracks). Replaces the reference's in-process OpenNI2 capture
    (reference: Examples/RGB-D/rgbd_xtion_cc.cpp:37-57) with a socket
    hop.

    Wire format: one JSON hello line
    `{"w","h","fx","fy","cx","cy","depth_factor"}\\n`, then per frame a
    big-endian u32 payload length + payload = f64 timestamp, u16[H,W]
    depth (depth_factor quantized), u8[H,W,3] rgb.
    """

    MAGIC = b"ORBD"

    def __init__(self, host: str = "127.0.0.1", port: int = 7075,
                 timeout: float = 10.0):
        self.host, self.port, self.timeout = host, port, timeout
        self._sock = None
        self._hdr = None

    def open(self) -> bool:
        import json
        import socket

        try:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout)
        except OSError as e:
            print(f"no stream at {self.host}:{self.port} ({e})")
            return False
        f = self._sock.makefile("rb")
        self._f = f
        magic = f.read(4)
        if magic != self.MAGIC:
            print("bad stream magic")
            return False
        self._hdr = json.loads(f.readline().decode())
        return True

    def _read_exact(self, n: int):
        buf = self._f.read(n)
        return buf if buf is not None and len(buf) == n else None

    def grab(self):
        import struct

        head = self._read_exact(4)
        if head is None:
            return None
        (length,) = struct.unpack("!I", head)
        if length == 0:       # clean end-of-stream marker
            return None
        payload = self._read_exact(length)
        if payload is None:
            return None
        h, w = self._hdr["h"], self._hdr["w"]
        (ts,) = struct.unpack_from("!d", payload, 0)
        off = 8
        # wire format is big-endian u16 (serve_frames encodes '>u2');
        # decoding with native order would byte-swap every depth value
        depth = np.frombuffer(payload, np.dtype(">u2"), h * w, off)
        depth = depth.reshape(h, w).astype(np.float32) \
            / self._hdr["depth_factor"]
        off += 2 * h * w
        rgb = np.frombuffer(payload, np.uint8, 3 * h * w, off)
        rgb = rgb.reshape(h, w, 3)
        gray = (rgb.astype(np.float32) @ np.array(
            [0.299, 0.587, 0.114], np.float32))
        return ts, gray, depth, rgb

    def close(self):
        if self._sock is not None:
            self._sock.close()

    @property
    def camera(self):
        from orb_slam2_map_tpu.geom.camera import PinholeCamera

        hd = self._hdr
        return PinholeCamera(fx=hd["fx"], fy=hd["fy"], cx=hd["cx"],
                             cy=hd["cy"], width=hd["w"], height=hd["h"])


def serve_frames(port: int, frames, cam, depth_factor: float = 5000.0,
                 fps: float = 0.0, host: str = "127.0.0.1",
                 ready=None) -> int:
    """Sensor-side streamer for NetworkSource: serves `frames` (an
    iterable of (ts, gray, depth_m, rgb)) to ONE client, paced at `fps`
    (0 = as fast as the socket drains). Returns frames sent."""
    import json
    import socket
    import struct

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    if ready is not None:
        ready.set()
    conn, _ = srv.accept()
    hello = {"w": cam.width, "h": cam.height, "fx": cam.fx, "fy": cam.fy,
             "cx": cam.cx, "cy": cam.cy, "depth_factor": depth_factor}
    out = conn.makefile("wb")
    out.write(NetworkSource.MAGIC)
    out.write((json.dumps(hello) + "\n").encode())
    sent, t0 = 0, time.perf_counter()
    for ts, gray, depth, rgb in frames:
        if fps > 0:
            due = t0 + sent / fps
            now = time.perf_counter()
            if now < due:
                time.sleep(due - now)
        d16 = np.clip(depth * depth_factor, 0, 65535)
        # clip-invalidate: out-of-range depth becomes 0 = no measurement
        d16 = np.where(depth * depth_factor > 65535, 0, d16)
        d16 = d16.astype(">u2")
        if rgb is None:
            g = np.clip(gray, 0, 255).astype(np.uint8)
            rgb = np.stack([g, g, g], axis=-1)
        payload = struct.pack("!d", float(ts)) + d16.tobytes() \
            + np.ascontiguousarray(rgb, np.uint8).tobytes()
        out.write(struct.pack("!I", len(payload)))
        out.write(payload)
        out.flush()
        sent += 1
    out.write(struct.pack("!I", 0))
    out.flush()
    out.close()
    conn.close()
    srv.close()
    return sent


SOURCES = {"openni": OpenNISource, "synthetic": SyntheticSource,
           "folder": FolderSource, "network": NetworkSource}


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
    p.add_argument("--serve", type=int, default=None,
                   help="sensor-side mode: stream the chosen source "
                        "over TCP on this port instead of tracking")
    p.add_argument("--host", default="127.0.0.1",
                   help="network source/serve host")
    p.add_argument("--port", type=int, default=7075,
                   help="network source port")
    args = p.parse_args()

    if args.serve:
        # sensor host: capture locally, stream to the tracking machine
        if args.source == "folder":
            src = FolderSource(args.root or ".", fps=args.fps,
                               settings=args.settings)
        else:
            src = SyntheticSource(fps=args.fps, n_frames=args.frames)
        if not src.open():
            return 1

        def _iter():
            while True:
                pkt = src.grab()
                if pkt is None:
                    return
                yield pkt

        n = serve_frames(args.serve, _iter(), src.camera,
                         host=args.host)
        print(f"streamed {n} frames")
        return 0

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
    elif args.source == "network":
        src = NetworkSource(host=args.host, port=args.port)
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
