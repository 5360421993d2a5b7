"""Fused per-frame tracking programs: the flagship device hot path.

The reference's per-frame hot path (SURVEY.md §3.2: ORB extraction →
projection matching → pose optimization → local-map matching → pose
optimization) runs here as a chain of jitted device programs with ONE
blocking host download per frame:

    _build_rgbd (frame.py)  →  motion_match_step  →  local_map_step
                                                   →  pack_frame_result
                                                   →  single np.asarray

Every stage is dispatched asynchronously; only the packed result is
fetched. This matters doubly on networked-TPU deployments where each
blocking transfer pays a proxy round trip (~tens of ms) — the classic
"minimise host-device sync points" rule, applied to SLAM.

Deliberately a chain of dispatches rather than one mega-jit: fusing the
image-plane extraction pipeline into the same XLA program as the [N,N]
matching matmuls makes the TPU scheduler serialize badly (measured 31 ms
fused vs 3 ms split); dispatch cost is negligible either way.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geom import se3
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


class MotionMatchResult(NamedTuple):
    n_matches: jnp.ndarray    # int32 (selected window)
    R: jnp.ndarray            # [3,3] optimized pose
    t: jnp.ndarray            # [3]
    n_inliers: jnp.ndarray    # int32
    cur_obs: jnp.ndarray      # [N] int32 map-point id per keypoint (-1)


@functools.partial(jax.jit, static_argnums=(0, 9))
def motion_match_step(cfg: SystemConfig, f: "frame_mod.Frame",
                      last_xw, last_valid, last_level, last_ur,
                      last_desc, last_angle, last_obs_ids,
                      min_matches: int,
                      R_t_inits=None) -> MotionMatchResult:
    """Motion-model phase on a pre-built frame: projection matching at
    the narrow window with an in-program 2x-window retry (reference:
    src/Tracking.cc:1151-1212 reruns a second CPU pass) + multi-start
    4x10 LM pose optimization. Emits per-keypoint map-point bindings
    directly (cur_obs), so downstream stages never need a host merge."""
    R0s, t0s = R_t_inits
    R_pred, t_pred = R0s[0], t0s[0]
    th = float(cfg.tracking.search_window_mono)

    m_narrow = search.search_by_projection_last_frame(
        cfg, R_pred, t_pred, last_xw, last_valid, th,
        last_level, last_ur, last_desc, f, last_angle)
    m_wide = search.search_by_projection_last_frame(
        cfg, R_pred, t_pred, last_xw, last_valid, 2.0 * th,
        last_level, last_ur, last_desc, f, last_angle)
    use_wide = m_narrow.ok.sum() < min_matches
    kp_idx = jnp.where(use_wide, m_wide.kp_idx, m_narrow.kp_idx)
    ok = jnp.where(use_wide, m_wide.ok, m_narrow.ok)

    uv = f.xy[kp_idx]
    ur = f.ur[kp_idx]
    inv_s2 = f.inv_sigma2[kp_idx]
    res = pose_opt.pose_optimize_multi(cfg.camera, R0s, t0s, last_xw,
                                       uv, ur, inv_s2, ok)
    inl = res.inliers & ok

    # per-keypoint binding: scatter surviving last-frame point ids onto
    # their matched keypoints (failed rows scatter out-of-range: dropped)
    N = f.capacity
    idx_safe = jnp.where(inl, kp_idx, N)
    cur_obs = jnp.full(N, -1, jnp.int32).at[idx_safe].set(
        last_obs_ids.astype(jnp.int32), mode="drop")
    return MotionMatchResult(n_matches=ok.sum().astype(jnp.int32),
                             R=res.R, t=res.t,
                             n_inliers=inl.sum().astype(jnp.int32),
                             cur_obs=cur_obs)


class LocalMapStepResult(NamedTuple):
    R: jnp.ndarray            # [3,3] final pose
    t: jnp.ndarray            # [3]
    cur_obs: jnp.ndarray      # [N] int32 merged + inlier-filtered bindings
    visible: jnp.ndarray      # [C] frustum-passing local points
    n_inliers: jnp.ndarray    # int32
    n_close_tracked: jnp.ndarray    # int32 (keyframe policy, c1c)
    n_close_untracked: jnp.ndarray  # int32


@functools.partial(jax.jit, static_argnums=(0,))
def local_map_step(cfg: SystemConfig, f: "frame_mod.Frame",
                   mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist,
                   mids, mp_valid, cur_obs_in, R_t_inits,
                   th) -> LocalMapStepResult:
    """Track-local-map phase (reference: src/Tracking.cc:1214-1258):
    gather the local points from the device-resident map columns,
    projection-match them into the frame's unbound keypoints, and run
    the final multi-start pose optimization over every binding.

    mids [C] indexes the full map columns; cur_obs_in [N] carries the
    motion-model bindings (map-point id per keypoint, -1 = free)."""
    kp_taken = cur_obs_in >= 0
    pos = mp_pos[mids]
    desc = mp_desc[mids]
    normal = mp_normal[mids]
    dmin = mp_min_dist[mids]
    dmax = mp_max_dist[mids]
    R0s, t0s = R_t_inits
    m = search.search_by_projection_local(
        cfg, R0s[0], t0s[0], pos, desc, normal, dmin, dmax, th,
        mp_valid, f, kp_taken)

    # merge: rows without a match scatter to index N (dropped) so they
    # can't race an accepted write at the same keypoint
    N = f.capacity
    idx_safe = jnp.where(m.ok, m.kp_idx, N)
    cur_obs = cur_obs_in.at[idx_safe].set(mids.astype(jnp.int32),
                                          mode="drop")
    X_kp = mp_pos[jnp.clip(cur_obs, 0, None)]
    valid_kp = cur_obs >= 0

    res = pose_opt.pose_optimize_multi(cfg.camera, R0s, t0s, X_kp,
                                       f.xy, f.ur, f.inv_sigma2, valid_kp)
    inl = res.inliers & valid_kp
    cur_out = jnp.where(inl, cur_obs, -1)

    # close-point counts for the keyframe policy (reference
    # bNeedToInsertClose, src/Tracking.cc:1296-1306) — computed here so
    # the host never downloads the depth map
    cam = cfg.camera
    th_depth_m = cam.bf / cam.fx * cam.th_depth
    close = (f.depth > 0) & (f.depth < th_depth_m) & f.valid
    tracked = cur_out >= 0
    return LocalMapStepResult(R=res.R, t=res.t, cur_obs=cur_out,
                              visible=m.visible,
                              n_inliers=inl.sum().astype(jnp.int32),
                              n_close_tracked=(close & tracked).sum()
                              .astype(jnp.int32),
                              n_close_untracked=(close & ~tracked).sum()
                              .astype(jnp.int32))


@jax.jit
def pack_frame_result(mm: MotionMatchResult, lm: LocalMapStepResult):
    """Pack everything the host needs from one tracked frame into a
    single f32 vector — ONE blocking download per frame.

    Layout: [n_matches_mm, n_inl_mm, n_inl_final, n_close_tracked,
             n_close_untracked, R(9 row-major), t(3), cur_obs(N),
             visible(C)]"""
    head = jnp.concatenate([
        jnp.stack([mm.n_matches.astype(jnp.float32),
                   mm.n_inliers.astype(jnp.float32),
                   lm.n_inliers.astype(jnp.float32),
                   lm.n_close_tracked.astype(jnp.float32),
                   lm.n_close_untracked.astype(jnp.float32)]),
        lm.R.reshape(-1), lm.t,
    ])
    return jnp.concatenate([head,
                            lm.cur_obs.astype(jnp.float32),
                            lm.visible.astype(jnp.float32)])


class TrackCarry(NamedTuple):
    """Device-resident tracking recurrence. Lives on the TPU across
    frames — in steady state nothing here is ever downloaded, which is
    what lets the pipeline run faster than the host<->device round-trip
    latency (the reference's per-frame mutex'd CPU state, re-imagined as
    a jit carry)."""

    R: jnp.ndarray           # [3,3] last frame's optimized Tcw
    t: jnp.ndarray           # [3]
    Rv: jnp.ndarray          # [3,3] velocity: Tcw_cur * Twc_last
    tv: jnp.ndarray          # [3]
    cur_obs: jnp.ndarray     # [N] int32 map-point id per last-frame kp
    last_xy: jnp.ndarray     # [N,2] last frame keypoints (undistorted)
    last_ur: jnp.ndarray     # [N]
    last_depth: jnp.ndarray  # [N]
    last_desc: jnp.ndarray   # [N,8] uint32
    last_level: jnp.ndarray  # [N] int32
    last_angle: jnp.ndarray  # [N]
    last_valid: jnp.ndarray  # [N] bool
    ok: jnp.ndarray          # [] bool — last frame tracked successfully


# packed layout offsets (host side unpacks with these)
PACK_SCALARS = 8  # [n_mm, n_inl_mm, n_inl_final, n_close_tr, n_close_untr,
                  #  ok, n_mm_map, n_vo]


@functools.partial(jax.jit, static_argnums=(0,))
def fused_frame_step(cfg: SystemConfig, carry: TrackCarry,
                     gray_u8, depth_f32, ctrl,
                     mp_pos, mp_desc, mp_normal, mp_min_dist, mp_max_dist,
                     mp_alive, mids, mp_valid, mp_redirect=None):
    """ONE device program per steady-state frame: build frame -> motion
    model (with temporal VO depth points, reference src/Tracking.cc:
    1085-1149 UpdateLastFrame) -> pose opt -> local-map match -> final
    pose opt -> velocity update. Consumes and produces the device carry;
    the only per-frame host traffic is the image upload and an
    asynchronous download of the packed result.

    ctrl: f32[4] = [th_local, min_inliers, use_motion(0/1), depth_scale].
    depth_f32 may be any dtype (u16 TUM-style uploads cost 40% of the
    f32 bytes over networked TPU); depth_m = depth * ctrl[3].
    mids [C] indexes the published map columns; mp_alive masks points
    culled since the column upload."""
    cam = cfg.camera
    tcfg = cfg.tracking
    f = frame_mod._build_rgbd(cfg, gray_u8.astype(jnp.float32),
                              depth_f32.astype(jnp.float32) * ctrl[3])
    N = f.capacity

    # ---- motion-model candidate set: bound map points + temporal VO ----
    # follow fuse merges first (the reference's CheckReplacedInLastFrame,
    # src/Tracking.cc:465 + MapPoint::GetReplaced): a binding whose point
    # merged into a survivor re-binds to the survivor instead of dying
    # with mp_alive — without this, every fuse round bled ~15 bindings
    # per frame out of the device carry until tracking starved
    mp_ids = jnp.clip(carry.cur_obs, 0, None)
    if mp_redirect is not None:
        mp_ids = mp_redirect[mp_ids].astype(jnp.int32)
    alive = (carry.cur_obs >= 0) & mp_alive[mp_ids]
    pos_bound = mp_pos[mp_ids]

    # temporal VO points from last frame's depth (the reference injects
    # the ~100 closest depth points into the last frame before motion
    # matching; they constrain the pose but carry no map binding)
    from ..geom import camera as cam_mod
    Rwc, twc = se3.inverse(carry.R, carry.t)
    Xc = cam_mod.unproject(cam, carry.last_xy,
                           jnp.maximum(carry.last_depth, 1e-6))
    Xw_vo = se3.act(Rwc, twc, Xc)
    has_d = (carry.last_depth > 0) & carry.last_valid & ~alive
    th_depth_m = cam.bf / cam.fx * cam.th_depth
    close = carry.last_depth < th_depth_m
    depth_key = jnp.where(has_d, carry.last_depth, jnp.inf)
    rank = jnp.argsort(jnp.argsort(depth_key))
    vo_valid = has_d & (close | (rank < tcfg.vo_depth_points))

    last_xw = jnp.where(alive[:, None], pos_bound, Xw_vo)
    last_src = alive | vo_valid

    R_pred = carry.Rv @ carry.R
    t_pred = carry.Rv @ carry.t + carry.tv
    use_motion = ctrl[2] > 0.5
    R_pred = jnp.where(use_motion, R_pred, carry.R)
    t_pred = jnp.where(use_motion, t_pred, carry.t)

    th = float(tcfg.search_window_mono)
    m_narrow = search.search_by_projection_last_frame(
        cfg, R_pred, t_pred, last_xw, last_src, th,
        carry.last_level, carry.last_ur, carry.last_desc, f,
        carry.last_angle)
    m_wide = search.search_by_projection_last_frame(
        cfg, R_pred, t_pred, last_xw, last_src, 2.0 * th,
        carry.last_level, carry.last_ur, carry.last_desc, f,
        carry.last_angle)
    use_wide = m_narrow.ok.sum() < tcfg.motion_model_min_matches
    kp_idx = jnp.where(use_wide, m_wide.kp_idx, m_narrow.kp_idx)
    mok = jnp.where(use_wide, m_wide.ok, m_narrow.ok)

    R0s = jnp.stack([R_pred, carry.R])
    t0s = jnp.stack([t_pred, carry.t])
    res_mm = pose_opt.pose_optimize_multi(
        cfg.camera, R0s, t0s, last_xw, f.xy[kp_idx], f.ur[kp_idx],
        f.inv_sigma2[kp_idx], mok)
    inl_mm = res_mm.inliers & mok
    # bindings for map-backed rows only (VO rows stay -1); propagate the
    # REDIRECTED ids so merges stick
    idx_safe = jnp.where(inl_mm & alive, kp_idx, N)
    bound_ids = jnp.where(carry.cur_obs >= 0, mp_ids,
                          jnp.int32(-1))
    cur_obs_mm = jnp.full(N, -1, jnp.int32).at[idx_safe].set(
        bound_ids.astype(jnp.int32), mode="drop")
    n_mm_map = (inl_mm & alive).sum()
    n_vo = (inl_mm & vo_valid).sum()

    # ---- local-map phase ----
    R0s2 = jnp.stack([res_mm.R, carry.R])
    t0s2 = jnp.stack([res_mm.t, carry.t])
    lm = local_map_step(cfg, f, mp_pos, mp_desc, mp_normal, mp_min_dist,
                        mp_max_dist, mids,
                        mp_valid & mp_alive[mids], cur_obs_mm,
                        (R0s2, t0s2), ctrl[0])

    ok = ((mok.sum() >= tcfg.motion_model_min_matches)
          & (inl_mm.sum() >= 10)
          & (lm.n_inliers >= ctrl[1].astype(jnp.int32)))

    # velocity update; freeze pose (zero velocity) on failure so the
    # supervisor can intervene from a sane state
    R_new = jnp.where(ok, lm.R, carry.R)
    t_new = jnp.where(ok, lm.t, carry.t)
    Rv = jnp.where(ok, R_new @ carry.R.T, jnp.eye(3, dtype=jnp.float32))
    tv = jnp.where(ok, t_new - (R_new @ carry.R.T) @ carry.t,
                   jnp.zeros(3, jnp.float32))

    new_carry = TrackCarry(
        R=R_new, t=t_new, Rv=Rv, tv=tv,
        cur_obs=jnp.where(ok, lm.cur_obs, -1),
        last_xy=f.xy, last_ur=f.ur, last_depth=f.depth, last_desc=f.desc,
        last_level=f.level, last_angle=f.angle, last_valid=f.valid,
        ok=ok)

    head = jnp.concatenate([
        jnp.stack([mok.sum().astype(jnp.float32),
                   inl_mm.sum().astype(jnp.float32),
                   lm.n_inliers.astype(jnp.float32),
                   lm.n_close_tracked.astype(jnp.float32),
                   lm.n_close_untracked.astype(jnp.float32),
                   ok.astype(jnp.float32),
                   n_mm_map.astype(jnp.float32),
                   n_vo.astype(jnp.float32)]),
        lm.R.reshape(-1), lm.t,
    ])
    # the per-frame refinement log (xy/ur/inv_sigma2 of every keypoint)
    # rides in the SAME packed array: the supervisor consumes it every
    # frame, and issuing separate copy_to_host_async calls per array
    # (r4/r5 behavior: 10 small async copies per frame) degrades the
    # networked-TPU tunnel into a sticky ~25 ms-RTT mode that capped the
    # whole pipeline at ~28 fps. One array, one copy, tunnel stays fast.
    packed = jnp.concatenate([head, lm.cur_obs.astype(jnp.float32),
                              lm.visible.astype(jnp.float32),
                              f.xy.reshape(-1), f.ur, f.inv_sigma2])
    return new_carry, packed, f


@functools.partial(jax.jit, static_argnums=(0,))
def tracking_step(cfg: SystemConfig, gray, depth,
                  last_xw, last_valid, last_level, last_ur, last_desc,
                  R_pred, t_pred) -> TrackStepResult:
    """Single-program motion-model tracking step (extraction + match +
    pose opt) — the driver-facing flagship forward step; the production
    path splits the same pipeline into the async chain above."""
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
