"""Stereo keypoint matching: epipolar-row descriptor match + SAD refine.

Replaces Frame::ComputeStereoMatches (reference: src/Frame.cc:466-638):
for each left keypoint, search right keypoints on the same (scale-
tolerant) row within the disparity range, take the best Hamming match,
then refine disparity to sub-pixel with an 11x11 SAD window slid +-5 px
and a parabola fit, and finally reject matches whose SAD cost exceeds
1.5 * 1.4 * median (reference :604-637).

TPU shape: the candidate search is one gated [N, N] Hamming matmul; the
SAD refine gathers one 11x21 strip per matched keypoint (vmapped
dynamic-slice) and evaluates all 11 shifts as a dense tensor op.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..geom import camera as cam_mod
from ..geom import se3
from . import matching, orb, pyramid

SAD_W = 5          # half window (11x11), reference :547
SAD_SHIFT = 5      # +- disparity slide L, reference :549


@functools.partial(jax.jit, static_argnums=(0,))
def _stereo_match(cfg: SystemConfig, kp_l: orb.Keypoints,
                  kp_r: orb.Keypoints, img_l, img_r):
    """Returns (ur [N], depth [N]) for left keypoints; -1 where unmatched."""
    cam = cfg.camera
    sf = jnp.asarray(cfg.orb.scale_factors, dtype=jnp.float32)
    min_z = cam.baseline
    min_d = 0.0
    max_d = cam.bf / min_z

    # row band: |v_l - v_r| <= 2 * scale of left kp level (reference :489)
    row_tol = 2.0 * sf[kp_l.level]
    dv = jnp.abs(kp_l.xy[:, 1:2] - kp_r.xy[None, :, 1])
    disparity = kp_l.xy[:, 0:1] - kp_r.xy[None, :, 0]
    gate = (
        (dv <= row_tol[:, None])
        & (disparity >= min_d) & (disparity <= max_d)
        & matching.level_gate(kp_l.level, kp_r.level, -1, 1)
        & kp_l.valid[:, None] & kp_r.valid[None, :]
    )
    dmat = matching.hamming_matrix(kp_l.desc, kp_r.desc)
    res = matching.masked_nn(dmat, gate, max_dist=100.0)

    # --- SAD sub-pixel refinement on level-0 images (the reference works
    # per pyramid level; level-0 with scaled windows is equivalent at the
    # precision the parabola fit provides) ---
    uL = kp_l.xy[:, 0]
    vL = kp_l.xy[:, 1]
    uR0 = kp_r.xy[res.idx, 0]

    half = SAD_W
    width = 2 * half + 1
    strip_w = width + 2 * SAD_SHIFT

    pad = half + SAD_SHIFT + 1
    img_l_p = jnp.pad(img_l, pad, mode="edge")
    img_r_p = jnp.pad(img_r, pad, mode="edge")

    def gather(img_p, cx, cy, w):
        def one(x, y):
            return jax.lax.dynamic_slice(
                img_p, (y.astype(jnp.int32), x.astype(jnp.int32)),
                (width, w))
        return jax.vmap(one)(cx, cy)

    # left template: [N, 11, 11] centered at (uL, vL)
    tl = gather(img_l_p, uL - half + pad, vL - half + pad, width)
    # right strip: [N, 11, 21] centered at (uR0, vL)
    sr = gather(img_r_p, uR0 - half - SAD_SHIFT + pad, vL - half + pad,
                strip_w)
    # normalize by center pixel (reference divides by center intensity :551)
    cl = tl[:, half, half][:, None, None]
    tl_n = tl / jnp.maximum(cl, 1.0)
    cr = sr[:, half, SAD_SHIFT + half][:, None, None]
    sr_n = sr / jnp.maximum(cr, 1.0)

    # SAD over 11 shifts
    shifts = jnp.arange(2 * SAD_SHIFT + 1)
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(sr_n, s, width, axis=2),
        out_axes=1,
    )(shifts)                                        # [N, 11shifts, 11, 11]
    sad = jnp.sum(jnp.abs(windows - tl_n[:, None]), axis=(2, 3))  # [N, S]
    best_s = jnp.argmin(sad, axis=1)
    best_cost = jnp.take_along_axis(sad, best_s[:, None], 1)[:, 0]

    # parabola fit around the minimum (reference :583-594)
    sm1 = jnp.take_along_axis(sad, jnp.clip(best_s - 1, 0, 2 * SAD_SHIFT)[:, None], 1)[:, 0]
    sp1 = jnp.take_along_axis(sad, jnp.clip(best_s + 1, 0, 2 * SAD_SHIFT)[:, None], 1)[:, 0]
    denom = sm1 + sp1 - 2 * best_cost
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (sm1 - sp1) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    interior = (best_s > 0) & (best_s < 2 * SAD_SHIFT)
    delta = jnp.where(interior, delta, 0.0)

    u_r = uR0 + (best_s.astype(jnp.float32) - SAD_SHIFT) + delta
    disp = uL - u_r
    ok = res.ok & (disp > min_d) & (disp < max_d)

    # median-cost outlier rejection (reference :604-637)
    big = 1e9
    costs = jnp.where(ok, best_cost, big)
    med = jnp.median(jnp.where(ok, best_cost, jnp.nan))
    med = jnp.nan_to_num(med, nan=big)
    ok &= costs <= 1.5 * 1.4 * med

    depth = jnp.where(ok, cam.bf / jnp.maximum(disp, 1e-6), -1.0)
    ur = jnp.where(ok, u_r, -1.0)
    return ur, depth


def build_stereo_frame(cfg: SystemConfig, gray_left: np.ndarray,
                       gray_right: np.ndarray):
    """Stereo frame: dual extraction (the reference's two extraction
    threads, src/Frame.cc:78-81, become two device programs) + row SAD
    matching."""
    from ..slam.frame import Frame

    img_l = jnp.asarray(gray_left, dtype=jnp.float32)
    img_r = jnp.asarray(gray_right, dtype=jnp.float32)
    kp_l = orb.extract(img_l, cfg.orb)
    kp_r = orb.extract(img_r, cfg.orb)
    ur, depth = _stereo_match(cfg, kp_l, kp_r, img_l, img_r)

    cam = cfg.camera
    xy_und = (cam_mod.undistort_points(cam, kp_l.xy)
              if cam.has_distortion else kp_l.xy)
    inv_s2 = jnp.asarray(
        [1.0 / s for s in cfg.orb.level_sigma2], dtype=jnp.float32
    )[kp_l.level]
    R, t = se3.identity()
    return Frame(xy=xy_und, response=kp_l.response, angle=kp_l.angle,
                 level=kp_l.level, desc=kp_l.desc, valid=kp_l.valid,
                 ur=ur, depth=depth, inv_sigma2=inv_s2, R=R, t=t)
