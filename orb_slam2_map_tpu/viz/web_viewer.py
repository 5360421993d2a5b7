"""Live web viewer: browser-based equivalent of the Pangolin UI.

The reference's Viewer thread (reference: src/Viewer.cc:77-233) renders
an interactive camera-follow map view with menu toggles (points / KFs /
graph / localization mode / reset / Save). TPU hosts are headless, so
the interactive surface here is a zero-dependency HTTP server (stdlib
http.server on a daemon thread) streaming the live frame + map renders
as MJPEG-style multipart PNG, with the menu toggles exposed as HTTP
endpoints:

    GET /            single-page UI (frame + map streams + buttons)
    GET /frame       multipart PNG stream of the tracked frame overlay
    GET /map         multipart PNG stream of the map render
    GET /status      JSON tracking state (FrameDrawer's text overlay)
    POST /localization/{on,off}   ActivateLocalizationMode toggle
    POST /reset      System reset   (reference menu items :92-100)
    POST /save       Save button -> featurePointMap.npz (+octomap)

Start with `WebViewer(system, port=8765).start()` or pass `--web PORT`
to apps/rgbd_live.py / apps/rgbd_synthetic.py.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from . import frame_drawer, map_drawer

_PAGE = b"""<!doctype html>
<html><head><title>orb_slam2_map_tpu</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{border:1px solid #444;max-width:48%%}</style></head>
<body>
<h3>orb_slam2_map_tpu live viewer</h3>
<div id=status></div>
<button onclick="fetch('/localization/on',{method:'POST'})">Localization ON</button>
<button onclick="fetch('/localization/off',{method:'POST'})">Localization OFF</button>
<button onclick="fetch('/reset',{method:'POST'})">Reset</button>
<button onclick="fetch('/save',{method:'POST'})">Save map</button>
<br><img src="/frame"><img src="/map">
<script>setInterval(async()=>{const r=await fetch('/status');
document.getElementById('status').textContent=JSON.stringify(await r.json());},500)
</script></body></html>"""


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


class WebViewer:
    """Publish-subscribe: the SLAM loop calls update(); browser clients
    stream whatever is latest. All rendering happens lazily on demand so
    an unwatched viewer costs one array copy per update."""

    def __init__(self, system, port: int = 8765, out_dir: str = ".",
                 host: str = "127.0.0.1"):
        # localhost-only by default: the control surface exposes
        # unauthenticated POST /reset (wipes the map) and /save (writes
        # files) — the reference's Pangolin viewer is likewise local-only.
        # Pass host="0.0.0.0" explicitly to serve remote clients.
        self.system = system
        self.port = port
        self.host = host
        self.out_dir = out_dir
        self._lock = threading.Lock()
        self._gray: Optional[np.ndarray] = None
        self._Tcw: Optional[np.ndarray] = None
        self._seq = 0
        self._server: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------------

    def update(self, gray: np.ndarray, Tcw: Optional[np.ndarray]):
        with self._lock:
            self._gray = np.asarray(gray)
            self._Tcw = None if Tcw is None else np.asarray(Tcw)
            self._seq += 1

    def status(self) -> dict:
        m = self.system.map
        return {
            "state": self.system.tracking_state.name,
            "keyframes": int(m.n_keyframes()),
            "map_points": int(m.n_points()),
            "matches": int(getattr(self.system.tracker,
                                   "matches_inliers", 0)),
            "localization_mode": bool(self.system.tracker.only_tracking),
            "frame": self._seq,
        }

    def render_frame(self) -> Optional[np.ndarray]:
        with self._lock:
            gray = self._gray
        if gray is None:
            return None
        tr = self.system.tracker
        if tr.last_frame is None:
            return np.stack([gray.astype(np.uint8)] * 3, axis=-1)
        matched = tr.last_obs >= 0 if tr.last_obs is not None else None
        return frame_drawer.draw_frame(
            gray, np.asarray(tr.last_frame.xy),
            np.asarray(tr.last_frame.valid), matched,
            state=self.system.tracking_state.name,
            n_kfs=self.system.map.n_keyframes(),
            n_mps=self.system.map.n_points())

    def render_map(self) -> np.ndarray:
        with self._lock:
            Tcw = self._Tcw
        Twc = np.linalg.inv(Tcw) if Tcw is not None else None
        return map_drawer.draw_map(self.system.map, Twc, show_graph=True)

    # ------------------------------------------------------------------

    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # silence request logging
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/":
                    self._send(200, "text/html", _PAGE)
                elif self.path == "/status":
                    self._send(200, "application/json",
                               json.dumps(viewer.status()).encode())
                elif self.path in ("/frame", "/map"):
                    self._stream(self.path)
                else:
                    self._send(404, "text/plain", b"not found")

            def _stream(self, which):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                last = -1
                try:
                    while True:
                        if viewer._seq == last:
                            time.sleep(0.05)
                            continue
                        last = viewer._seq
                        img = (viewer.render_frame() if which == "/frame"
                               else viewer.render_map())
                        if img is None:
                            time.sleep(0.1)
                            continue
                        png = _png_bytes(img)
                        self.wfile.write(b"--frame\r\n"
                                         b"Content-Type: image/png\r\n\r\n")
                        self.wfile.write(png)
                        self.wfile.write(b"\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    return

            def do_POST(self):
                if self.path == "/localization/on":
                    viewer.system.activate_localization_mode()
                elif self.path == "/localization/off":
                    viewer.system.deactivate_localization_mode()
                elif self.path == "/reset":
                    viewer.system.reset()
                elif self.path == "/save":
                    import os

                    viewer.system.save_map(os.path.join(
                        viewer.out_dir, "featurePointMap.npz"))
                else:
                    self._send(404, "text/plain", b"not found")
                    return
                self._send(200, "application/json", b"{\"ok\": true}")

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None
