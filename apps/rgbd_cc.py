#!/usr/bin/env python
"""Minimal folder-of-images RGB-D driver
(reference: Examples/RGB-D/rgbd_cc.cc, 69 LoC): read paired PNGs from
<root>/rgb and <root>/depth in sorted order, track, save the trajectory.

Usage: python apps/rgbd_cc.py <root> [--settings settings.yaml]
       [--out traj.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from _driver import report_timing, run_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="directory containing rgb/ and depth/")
    p.add_argument("--settings", default=None)
    p.add_argument("--out", default="CameraTrajectory.txt")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import SystemConfig, load_settings
    from orb_slam2_map_tpu.io.tum import _read_image, to_grayscale
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    cfg = load_settings(args.settings) if args.settings else SystemConfig()
    rgbs = sorted(os.listdir(os.path.join(args.root, "rgb")))
    depths = sorted(os.listdir(os.path.join(args.root, "depth")))
    if len(rgbs) != len(depths):
        print("rgb/ and depth/ must pair up by sorted order "
              "(reference rgbd_cc.cc pairing)")
        return 1

    slam = SLAMSystem(cfg, Sensor.RGBD,
                      enable_loop_closing=not args.no_loop)

    def step(i):
        rgb = _read_image(os.path.join(args.root, "rgb", rgbs[i]))
        depth = _read_image(os.path.join(args.root, "depth", depths[i]))
        gray = to_grayscale(rgb, cfg.rgb_order)
        d = depth.astype(np.float32) / cfg.depth_map_factor
        return slam.track_rgbd(i / cfg.camera.fps, gray, d, rgb=rgb)

    times, n_lost = run_sequence(slam, len(rgbs), step)
    report_timing(times, len(rgbs), n_lost)
    slam.save_trajectory_tum(args.out)
    print(f"trajectory saved to {args.out}")
    slam.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
