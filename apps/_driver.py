"""Shared dataset-driver scaffolding for the example apps.

Mirrors the structure every reference driver repeats (load → loop with
per-frame timing → timing stats → trajectory save; reference:
Examples/RGB-D/rgbd_tum.cc:77-136): one run loop with progress logging,
median/mean timing at exit, and trajectory/evaluation output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_sequence(slam, n_frames, step_fn, log_every: int = 50):
    """step_fn(i) must feed frame i to `slam` and return the pose (or
    None when lost). Returns (times list, n_lost)."""
    times = []
    n_lost = 0
    for i in range(n_frames):
        t0 = time.perf_counter()
        Tcw = step_fn(i)
        dt = time.perf_counter() - t0
        if i > 0:  # frame 0 pays the jit compile
            times.append(dt)
        if Tcw is None:
            n_lost += 1
        if i % log_every == 0:
            print(f"frame {i:5d}  state={slam.tracking_state.name:14s} "
                  f"kfs={slam.map.n_keyframes():4d} "
                  f"mps={slam.map.n_points():7d}  {dt*1e3:6.1f} ms",
                  flush=True)
    return times, n_lost


def report_timing(times, n_frames, n_lost):
    times = np.asarray(sorted(times))
    print("-" * 60)
    print(f"frames: {n_frames}  lost: {n_lost}")
    if len(times):
        # same stats the reference prints at exit (rgbd_tum.cc:124-133)
        print(f"median tracking time: {np.median(times)*1e3:.1f} ms")
        print(f"mean tracking time:   {times.mean()*1e3:.1f} ms  "
              f"({1.0/times.mean():.1f} fps)")


def finish(slam, args, ate_info=""):
    slam.shutdown()
    if getattr(args, "out", None):
        if getattr(args, "kitti_format", False):
            slam.save_trajectory_kitti(args.out)
        else:
            slam.save_trajectory_tum(args.out)
        print(f"trajectory written to {args.out}")
    if getattr(args, "save_map", None):
        slam.save_map(args.save_map)
        print(f"map written to {args.save_map}")
    if ate_info:
        print(ate_info)
