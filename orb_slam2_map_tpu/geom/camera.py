"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's scattered cv:: intrinsics handling
(reference: src/Frame.cc:404-434 undistortion, src/Tracking.cc:133-237
config parse, src/Frame.cc:269-325 frustum check). All ops are batched
jnp functions over point arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Static camera intrinsics. Fields mirror the reference YAML keys
    (Examples/RGB-D/TUM1.yaml:8-35)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    bf: float = 40.0        # stereo baseline * fx
    fps: float = 30.0
    th_depth: float = 50.0  # close/far point threshold, in baselines

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def baseline(self):
        return self.bf / self.fx

    @property
    def has_distortion(self):
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


def distort(cam: PinholeCamera, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2 * cam.p1 * x * y + cam.p2 * (r2 + 2 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2 * y * y) + 2 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: PinholeCamera, uv, iters: int = 8):
    """Iteratively invert distortion for pixel coords [..., 2].

    Matches cv::undistortPoints' fixed-point iteration used by the
    reference's Frame::UndistortKeyPoints (src/Frame.cc:404-434).
    """
    fxy = jnp.array([cam.fx, cam.fy], dtype=uv.dtype)
    cxy = jnp.array([cam.cx, cam.cy], dtype=uv.dtype)
    xd = (uv - cxy) / fxy
    x = xd
    for _ in range(iters):
        x_, y_ = x[..., 0], x[..., 1]
        r2 = x_ * x_ + y_ * y_
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = jnp.stack(
            [
                2 * cam.p1 * x_ * y_ + cam.p2 * (r2 + 2 * x_ * x_),
                cam.p1 * (r2 + 2 * y_ * y_) + 2 * cam.p2 * x_ * y_,
            ],
            axis=-1,
        )
        x = (xd - dx) / radial[..., None]
    return x * fxy + cxy


def project(cam: PinholeCamera, Xc):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion:
    the pipeline works on undistorted keypoints, as the reference does after
    Frame::UndistortKeyPoints)."""
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: PinholeCamera, Xc):
    """-> [..., 3] = (u, v, u_right) with u_right = u - bf/z
    (reference: src/Frame.cc:641-662 pseudo-stereo convention)."""
    uv = project(cam, Xc)
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def unproject(cam: PinholeCamera, uv, depth):
    """Pixel coords [..., 2] + depth [...] -> camera-frame points [..., 3]
    (reference: src/Frame.cc:664-678 UnprojectStereo)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def in_image(cam: PinholeCamera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


def undistorted_bounds(cam: PinholeCamera):
    """Undistorted image corner bounds (minx, maxx, miny, maxy), as the
    reference computes for its feature grid (src/Frame.cc:436-464)."""
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=jnp.float32,
    )
    und = undistort_points(cam, corners) if cam.has_distortion else corners
    minx = jnp.minimum(und[0, 0], und[2, 0])
    maxx = jnp.maximum(und[1, 0], und[3, 0])
    miny = jnp.minimum(und[0, 1], und[1, 1])
    maxy = jnp.maximum(und[2, 1], und[3, 1])
    return minx, maxx, miny, maxy
