"""Monocular bootstrap + tracking entry.

Replaces Tracking::MonocularInitialization + CreateInitialMapMonocular
(reference: src/Tracking.cc:840-1014): windowed matching against a
reference frame (>= 100 keypoints, >= 100 matches), the H/F two-view
initializer, initial two-keyframe map with a 20-iteration global BA, and
median-depth = 1 scale normalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..optim import initializer
from ..optim.global_ba import run_global_ba
from . import frame as frame_mod
from . import search
from .tracking import TrackingState


class MonoInitializer:
    def __init__(self):
        self.ref_frame = None
        self.ref_ts = None


def track_monocular_frame(system, ts: float, gray: np.ndarray):
    """Entry point for System.track_monocular."""
    tracker = system.tracker
    if not hasattr(tracker, "_mono_init"):
        tracker._mono_init = MonoInitializer()
    tracker.frame_id += 1
    f = frame_mod.build_mono_frame(system.cfg, gray)

    if tracker.state in (TrackingState.NO_IMAGES_YET,
                         TrackingState.NOT_INITIALIZED):
        tracker.state = TrackingState.NOT_INITIALIZED
        ok = _monocular_initialization(system, ts, f)
        if ok:
            tracker.state = TrackingState.OK
            tracker._log_frame(ts, tracker.last_frame, lost=False)
            return tracker._pose_of(tracker.last_frame)
        return None
    return tracker._track(ts, f)


def _monocular_initialization(system, ts: float, f) -> bool:
    """(reference: src/Tracking.cc:840-912)."""
    tracker = system.tracker
    cfg = system.cfg
    mi = tracker._mono_init
    n_kp = int(np.asarray(f.valid).sum())

    if mi.ref_frame is None:
        if n_kp > cfg.tracking.min_init_mono_keypoints:
            mi.ref_frame = f
            mi.ref_ts = ts
        return False
    if n_kp <= cfg.tracking.min_init_mono_keypoints:
        mi.ref_frame = None  # weak frame: tear down (ref :866-885)
        return False

    ref = mi.ref_frame
    radius = jnp.full(ref.capacity, 100.0)
    idx, keep = search.match_descriptors_windowed(
        cfg, ref.desc, ref.xy, ref.valid, f.desc, f.xy, f.valid,
        radius, ref.angle, f.angle)
    keep_np = np.asarray(keep)
    n_matches = int(keep_np.sum())
    if n_matches < cfg.tracking.min_init_mono_matches:
        mi.ref_frame = None
        return False

    p1 = np.asarray(ref.xy)
    p2 = np.asarray(f.xy)[np.asarray(idx)]
    res = initializer.initialize_two_view_jit(
        cfg.camera, jnp.asarray(p1), jnp.asarray(p2), keep,
        jax.random.PRNGKey(0))
    if not bool(res.ok):
        return False

    good = np.asarray(res.good) & keep_np
    if good.sum() < 50:
        return False

    R21 = np.asarray(res.R21)
    t21 = np.asarray(res.t21)
    X = np.asarray(res.X)

    # --- create the initial two-KF map (ref :914-1014) ---
    m = system.map
    ref_posed = frame_mod.set_pose(ref, np.eye(3, dtype=np.float32),
                                   np.zeros(3, dtype=np.float32))
    cur_posed = frame_mod.set_pose(f, R21.astype(np.float32),
                                   t21.astype(np.float32))
    rows = np.nonzero(good)[0]
    cols = np.asarray(idx)[rows]

    mids = m.alloc_points(len(rows))
    m.mp_pos[mids] = X[rows]
    m.mp_desc[mids] = np.asarray(f.desc)[cols]
    m.mp_level[mids] = np.asarray(f.level)[cols]

    obs0 = np.full(ref.capacity, -1, dtype=np.int64)
    obs0[rows] = mids
    kid0 = m.add_keyframe(ref_posed, mi.ref_ts, tracker.frame_id - 1, obs0)
    obs1 = np.full(f.capacity, -1, dtype=np.int64)
    obs1[cols] = mids
    kid1 = m.add_keyframe(cur_posed, ts, tracker.frame_id, obs1)
    m.mp_first_kf[mids] = kid0
    m.update_point_stats(mids, np.asarray(cfg.orb.scale_factors, np.float32))

    # global BA, 20 iterations (ref :963)
    run_global_ba(cfg, m, fixed_kf=kid0, iters=20)

    # median-depth normalization (ref :966-990)
    R1, t1 = m.kf_R[kid1], m.kf_t[kid1]
    depths = (m.mp_pos[mids] @ m.kf_R[kid0].T + m.kf_t[kid0])[:, 2]
    med = float(np.median(depths))
    if med <= 0:
        # degenerate reconstruction: reset
        m.__init__(m.K, m.M, m.N)
        mi.ref_frame = None
        return False
    inv_med = 1.0 / med
    m.kf_t[kid1] *= inv_med
    m.mp_pos[mids] *= inv_med

    cur_final = frame_mod.set_pose(f, m.kf_R[kid1], m.kf_t[kid1])
    tracker.ref_kf = kid1
    tracker.last_kf_id = kid1
    tracker.last_frame_id_of_kf = tracker.frame_id
    tracker.last_frame = cur_final
    tracker.last_obs = obs1
    if system.local_mapper is not None:
        system.local_mapper.process_keyframe(kid0)
        system.local_mapper.process_keyframe(kid1)
    mi.ref_frame = None
    return True
