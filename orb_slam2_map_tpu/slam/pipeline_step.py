"""Fused per-frame tracking step: one jittable device program.

This is the "flagship forward step" of the engine: grayscale + depth in,
optimized camera pose out — ORB pyramid/FAST/descriptors, RGB-D
pseudo-stereo, projection-gated matching against the previous frame's
map points, and the 4x10 LM pose optimization, all fused under a single
jit so the per-frame hot path (SURVEY.md §3.2) never leaves the device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..optim import pose_opt
from . import frame as frame_mod
from . import search


class TrackStepResult(NamedTuple):
    R: jnp.ndarray           # [3,3] optimized Tcw
    t: jnp.ndarray           # [3]
    n_matches: jnp.ndarray   # int32
    n_inliers: jnp.ndarray   # int32
    kp_xy: jnp.ndarray       # [N,2] extracted keypoints (for downstream)
    kp_desc: jnp.ndarray     # [N,8]
    kp_valid: jnp.ndarray    # [N]


@functools.partial(jax.jit, static_argnums=(0,))
def tracking_step(cfg: SystemConfig, gray, depth,
                  last_xw, last_valid, last_level, last_ur, last_desc,
                  R_pred, t_pred) -> TrackStepResult:
    """Motion-model tracking step (extraction + match + pose opt)."""
    f = frame_mod._build_rgbd(cfg, gray, depth)
    m = search.search_by_projection_last_frame(
        cfg, R_pred, t_pred, last_xw, last_valid,
        float(cfg.tracking.search_window_mono),
        last_level, last_ur, last_desc, f)
    uv = f.xy[m.kp_idx]
    ur = f.ur[m.kp_idx]
    inv_s2 = f.inv_sigma2[m.kp_idx]
    res = pose_opt.pose_optimize(cfg.camera, R_pred, t_pred, last_xw,
                                 uv, ur, inv_s2, m.ok)
    return TrackStepResult(R=res.R, t=res.t,
                           n_matches=m.ok.sum().astype(jnp.int32),
                           n_inliers=res.n_inliers,
                           kp_xy=f.xy, kp_desc=f.desc, kp_valid=f.valid)
