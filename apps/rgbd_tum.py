#!/usr/bin/env python
"""TUM RGB-D dataset driver — the primary benchmark harness
(reference: Examples/RGB-D/rgbd_tum.cc).

Usage:
    python apps/rgbd_tum.py <dataset_root> <association_file>
        [--settings TUM1.yaml] [--out traj.txt] [--gt groundtruth.txt]
"""

import argparse
import sys

import numpy as np

from _driver import finish, report_timing, run_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="TUM sequence directory")
    p.add_argument("association", help="association file path")
    p.add_argument("--settings", default=None,
                   help="reference-format YAML (default: TUM1 intrinsics)")
    p.add_argument("--out", default="CameraTrajectory.txt")
    p.add_argument("--gt", default=None, help="groundtruth.txt for ATE")
    p.add_argument("--dense", action="store_true")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--save-map", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import SystemConfig, load_settings
    from orb_slam2_map_tpu.io import evaluate
    from orb_slam2_map_tpu.io.tum import TumRGBDDataset, load_groundtruth
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    cfg = load_settings(args.settings) if args.settings else SystemConfig()
    seq = TumRGBDDataset(args.root, args.association,
                         depth_map_factor=cfg.depth_map_factor,
                         rgb_order=cfg.rgb_order)
    slam = SLAMSystem(cfg, Sensor.RGBD,
                      enable_loop_closing=not args.no_loop,
                      enable_dense_mapping=args.dense)

    def step(i):
        t, gray, depth, rgb = seq[i]
        return slam.track_rgbd(t, gray, depth, rgb=rgb)

    times, n_lost = run_sequence(slam, len(seq), step)
    report_timing(times, len(seq), n_lost)

    ate_info = ""
    if args.gt:
        ts_gt, poses_gt = load_groundtruth(args.gt)
        ts_est, Twc_est = slam.trajectory()
        pos_est = np.asarray([T[:3, 3] for T in Twc_est])
        ate = evaluate.ate_rmse(ts_est, pos_est, ts_gt, poses_gt[:, :3])
        ate_info = f"ATE RMSE: {ate*100:.2f} cm"
    finish(slam, args, ate_info)
    return 0


if __name__ == "__main__":
    sys.exit(main())
