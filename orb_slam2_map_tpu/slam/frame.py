"""Frame: per-image fixed-capacity feature container.

Replaces the reference's Frame class (reference: src/Frame.cc): ORB
extraction, keypoint undistortion (:404-434), RGB-D pseudo-stereo
mvuRight = u - bf/d (:641-662), and stereo-SAD right matching (:466-638,
see ops/stereo.py). The 64x48 feature grid (:230-245) is unnecessary on
TPU — candidate gating happens via dense masks in ops/matching.py.

A Frame is a NamedTuple of device arrays (capacity N keypoints, padded),
plus host-side scalars. Construction is one jitted program per sensor
type.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..geom import camera as cam_mod
from ..geom import se3
from ..ops import orb


class Frame(NamedTuple):
    xy: jnp.ndarray          # [N, 2] undistorted pixel coords
    response: jnp.ndarray    # [N]
    angle: jnp.ndarray       # [N]
    level: jnp.ndarray       # [N] int32
    desc: jnp.ndarray        # [N, 8] uint32
    valid: jnp.ndarray       # [N] bool
    ur: jnp.ndarray          # [N] right-image u; -1 if unavailable
    depth: jnp.ndarray       # [N] depth (m); -1 if unavailable
    inv_sigma2: jnp.ndarray  # [N] 1 / (scale_sigma2 at kp level)
    # pose Tcw (world -> camera); identity until tracked
    R: jnp.ndarray           # [3, 3]
    t: jnp.ndarray           # [3]

    @property
    def capacity(self):
        return self.xy.shape[0]


def _inv_sigma2_table(cfg: SystemConfig) -> np.ndarray:
    return np.asarray(
        [1.0 / s for s in cfg.orb.level_sigma2], dtype=np.float32
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _build_rgbd(cfg: SystemConfig, gray, depth_img):
    kp = orb.extract(gray, cfg.orb)
    cam = cfg.camera
    xy_und = (cam_mod.undistort_points(cam, kp.xy)
              if cam.has_distortion else kp.xy)

    # depth lookup at raw (distorted) keypoint coords, as the reference
    # samples mImDepth at the original keypoint (src/Frame.cc:649)
    xi = jnp.clip(kp.xy[:, 0].astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(kp.xy[:, 1].astype(jnp.int32), 0, cam.height - 1)
    d = depth_img[yi, xi]
    has_depth = (d > 0.0) & kp.valid
    ur = jnp.where(has_depth, xy_und[:, 0] - cam.bf / jnp.maximum(d, 1e-6), -1.0)
    depth = jnp.where(has_depth, d, -1.0)

    inv_s2 = jnp.asarray(_inv_sigma2_table(cfg))[kp.level]
    R, t = se3.identity()
    return Frame(xy=xy_und, response=kp.response, angle=kp.angle,
                 level=kp.level, desc=kp.desc, valid=kp.valid,
                 ur=ur, depth=depth, inv_sigma2=inv_s2, R=R, t=t)


def build_rgbd_frame(cfg: SystemConfig, gray: np.ndarray,
                     depth_img: np.ndarray) -> Frame:
    """RGB-D frame (reference: src/Frame.cc:119-170 ctor)."""
    return _build_rgbd(cfg, jnp.asarray(gray, dtype=jnp.float32),
                       jnp.asarray(depth_img, dtype=jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def _build_mono(cfg: SystemConfig, gray):
    kp = orb.extract(gray, cfg.orb)
    cam = cfg.camera
    xy_und = (cam_mod.undistort_points(cam, kp.xy)
              if cam.has_distortion else kp.xy)
    n = kp.xy.shape[0]
    inv_s2 = jnp.asarray(_inv_sigma2_table(cfg))[kp.level]
    R, t = se3.identity()
    return Frame(xy=xy_und, response=kp.response, angle=kp.angle,
                 level=kp.level, desc=kp.desc, valid=kp.valid,
                 ur=jnp.full(n, -1.0), depth=jnp.full(n, -1.0),
                 inv_sigma2=inv_s2, R=R, t=t)


def build_mono_frame(cfg: SystemConfig, gray: np.ndarray) -> Frame:
    """Monocular frame (reference: src/Frame.cc:172-227 ctor)."""
    return _build_mono(cfg, jnp.asarray(gray, dtype=jnp.float32))


def build_stereo_frame(cfg: SystemConfig, gray_left: np.ndarray,
                       gray_right: np.ndarray) -> Frame:
    """Stereo frame (reference: src/Frame.cc:61-117 ctor + :466-638
    ComputeStereoMatches). Extraction of both images is batched; the
    row-wise SAD disparity search lives in ops/stereo.py."""
    from ..ops import stereo as stereo_ops

    return stereo_ops.build_stereo_frame(cfg, gray_left, gray_right)


def set_pose(f: Frame, R, t) -> Frame:
    return f._replace(R=jnp.asarray(R), t=jnp.asarray(t))


def unproject_valid(cfg: SystemConfig, f: Frame):
    """World positions of keypoints with depth: [N, 3] + mask
    (reference: src/Frame.cc:664-678 UnprojectStereo)."""
    Xc = cam_mod.unproject(cfg.camera, f.xy, jnp.maximum(f.depth, 1e-6))
    Rwc, twc = se3.inverse(f.R, f.t)
    Xw = se3.act(Rwc, twc, Xc)
    return Xw, (f.depth > 0) & f.valid
