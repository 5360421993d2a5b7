"""Augmented-reality overlay: tracked-plane detection + virtual cube.

Replaces the reference's AR demo (reference:
Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc `DetectPlane` — RANSAC plane
fit over the map points the current frame tracks, 50 iterations,
inlier = point-plane distance < 3·median; and the GL cube drawn on the
plane, `ros_mono_ar.cc` wiring).

TPU-first redesign: all 50 RANSAC hypotheses are solved in one batched
closed-form (3-point plane) solve and scored against all points in a
single [hyp, point] broadcast — no per-iteration loop — then the winning
plane is refit by SVD on its inliers. Rendering is plain numpy line
rasterization into the RGB frame (no Pangolin/GL dependency).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..geom.camera import PinholeCamera


class Plane(NamedTuple):
    normal: np.ndarray    # [3] unit normal (world)
    origin: np.ndarray    # [3] a point on the plane (inlier centroid)
    Tpw: np.ndarray       # [4, 4] world->plane (z = plane normal)
    n_inliers: int


def detect_plane(points_w: np.ndarray, n_iters: int = 50,
                 min_points: int = 20, seed: int = 0) -> Optional[Plane]:
    """RANSAC plane over the tracked map points (ViewerAR::DetectPlane).

    Reference scores with distance < 0.2·median residual per hypothesis;
    here every hypothesis is scored in one vectorized pass and the best
    is refit with SVD over its inliers.
    """
    P = np.asarray(points_w, dtype=np.float64)
    if len(P) < min_points:
        return None
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(P), size=(n_iters, 3))
    a, b, c = P[idx[:, 0]], P[idx[:, 1]], P[idx[:, 2]]
    n = np.cross(b - a, c - a)                      # [I, 3]
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    ok = norm[:, 0] > 1e-9
    n = np.where(ok[:, None], n / np.maximum(norm, 1e-12), 0.0)
    d = -(n * a).sum(axis=1)                        # [I]
    # [I, P] point-plane distances
    dist = np.abs(P @ n.T + d[None, :]).T
    med = np.median(dist, axis=1, keepdims=True)    # per-hypothesis scale
    thresh = np.maximum(0.2 * med, 1e-4)
    inl = dist < thresh
    score = np.where(ok, inl.sum(axis=1), -1)
    best = int(np.argmax(score))
    if score[best] < min_points:
        return None
    sel = P[inl[best]]
    centroid = sel.mean(axis=0)
    _, _, vt = np.linalg.svd(sel - centroid, full_matrices=False)
    normal = vt[2]
    if normal[1] > 0:  # keep normal pointing "up" (-y is up in camera frames)
        normal = -normal
    # world->plane rotation: plane z-axis = normal
    z = normal
    x = np.cross([0.0, 1.0, 0.0], z)
    if np.linalg.norm(x) < 1e-6:
        x = np.cross([1.0, 0.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    Rwp = np.stack([x, y, z], axis=1)
    Tpw = np.eye(4)
    Tpw[:3, :3] = Rwp.T
    Tpw[:3, 3] = -Rwp.T @ centroid
    return Plane(normal=normal.astype(np.float64), origin=centroid,
                 Tpw=Tpw, n_inliers=int(score[best]))


_CUBE_VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64) - 0.5
_CUBE_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
               (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def cube_vertices_world(plane: Plane, size: float = 0.1) -> np.ndarray:
    """Cube of side `size` resting on the plane at the inlier centroid."""
    v = _CUBE_VERTS * size
    v[:, 2] += size / 2.0   # sit on the plane (plane-frame z = normal)
    Rpw = plane.Tpw[:3, :3]
    twp = -Rpw.T @ plane.Tpw[:3, 3]
    return v @ Rpw + twp[None, :]


def _draw_line(img: np.ndarray, p0, q0, color) -> None:
    x0, y0 = int(round(p0[0])), int(round(p0[1]))
    x1, y1 = int(round(q0[0])), int(round(q0[1]))
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.linspace(x0, x1, n + 1).round().astype(int)
    ys = np.linspace(y0, y1, n + 1).round().astype(int)
    h, w = img.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[m], xs[m]] = color


def draw_cube(img_rgb: np.ndarray, cam: PinholeCamera, Tcw: np.ndarray,
              plane: Plane, size: float = 0.1,
              color=(255, 60, 60)) -> np.ndarray:
    """Project the virtual cube into the frame and draw its edges."""
    V = cube_vertices_world(plane, size=size)
    Xc = V @ Tcw[:3, :3].T + Tcw[:3, 3][None, :]
    out = img_rgb.copy()
    if np.any(Xc[:, 2] <= 1e-6):
        return out
    u = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
    v = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
    uv = np.stack([u, v], axis=1)
    for i, j in _CUBE_EDGES:
        _draw_line(out, uv[i], uv[j], color)
    return out


class ARViewer:
    """Frame-by-frame AR session (ros_mono_ar.cc + ViewerAR loop):
    feed tracked frames; once enough points are tracked, a plane is
    detected and subsequent frames get a cube overlay."""

    def __init__(self, cam: PinholeCamera, cube_size: float = 0.1,
                 min_points: int = 20):
        self.cam = cam
        self.cube_size = cube_size
        self.min_points = min_points
        self.plane: Optional[Plane] = None

    def update(self, gray: np.ndarray, Tcw: Optional[np.ndarray],
               tracked_points_w: np.ndarray) -> np.ndarray:
        img = np.stack([np.asarray(gray, dtype=np.uint8)] * 3, axis=-1)
        if Tcw is None:
            return img
        if self.plane is None and len(tracked_points_w) >= self.min_points:
            self.plane = detect_plane(tracked_points_w,
                                      min_points=self.min_points)
        if self.plane is not None:
            img = draw_cube(img, self.cam, Tcw, self.plane,
                            size=self.cube_size)
        return img
