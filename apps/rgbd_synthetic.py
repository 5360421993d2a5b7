#!/usr/bin/env python
"""Synthetic RGB-D SLAM driver: the rgbd_tum-equivalent harness for the
synthetic world (reference driver: Examples/RGB-D/rgbd_tum.cc).

Runs the full pipeline on a generated sequence with ground truth, prints
per-frame timing stats (median/mean, as the reference does at exit,
rgbd_tum.cc:124-133) and the ATE RMSE versus ground truth.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--trajectory", choices=["sweep", "orbit"], default="sweep")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu for no-TPU runs)")
    p.add_argument("--out", default=None, help="TUM trajectory output path")
    p.add_argument("--dense", action="store_true", help="enable dense mapping")
    p.add_argument("--loop", action="store_true", default=None,
                   help="enable loop closing")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import SystemConfig
    from orb_slam2_map_tpu.io import evaluate
    from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                SyntheticWorld,
                                                orbit_trajectory,
                                                sweep_trajectory)
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    world = SyntheticWorld(seed=args.seed)
    cfg = SystemConfig(camera=world.cam)
    if args.trajectory == "sweep":
        Twc, ts = sweep_trajectory(args.frames)
    else:
        Twc, ts = orbit_trajectory(args.frames)
    seq = SyntheticRGBDSequence(world, Twc, ts)

    enable_loop = bool(args.loop) if args.loop is not None else False
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=enable_loop,
                      enable_dense_mapping=args.dense)

    times = []
    n_lost = 0
    for i in range(len(seq)):
        t, gray, depth, rgb = seq[i]
        t0 = time.perf_counter()
        Tcw = slam.track_rgbd(t, gray, depth, rgb=rgb)
        dt = time.perf_counter() - t0
        if i > 0:  # skip compile frame
            times.append(dt)
        if Tcw is None:
            n_lost += 1
        if i % 20 == 0:
            print(f"frame {i:4d}  state={slam.tracking_state.name:14s} "
                  f"kfs={slam.map.n_keyframes():3d} mps={slam.map.n_points():6d} "
                  f"inliers={slam.tracker.matches_inliers:4d}  {dt*1e3:6.1f} ms")

    slam.shutdown()
    ts_est, Twc_est = slam.trajectory()
    pos_est = np.asarray([T[:3, 3] for T in Twc_est])
    pos_gt = Twc[:, :3, 3]
    ate = evaluate.ate_rmse(ts_est, pos_est, ts, pos_gt)

    times = np.asarray(sorted(times))
    print("-" * 60)
    print(f"frames tracked: {len(ts_est)}/{len(seq)}  lost: {n_lost}")
    if len(times):
        print(f"median tracking time: {np.median(times)*1e3:.1f} ms  "
              f"mean: {times.mean()*1e3:.1f} ms  "
              f"fps: {1.0/times.mean():.1f}")
    print(f"ATE RMSE: {ate*100:.2f} cm")
    if args.out:
        slam.save_trajectory_tum(args.out)
        print(f"trajectory written to {args.out}")
    return 0 if ate < 0.05 and n_lost == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
