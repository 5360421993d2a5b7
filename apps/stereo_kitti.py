#!/usr/bin/env python
"""KITTI stereo odometry driver
(reference: Examples/Stereo/stereo_kitti.cc).

Usage:
    python apps/stereo_kitti.py <sequence_dir> [--out traj.txt]
        [--poses poses/00.txt]
"""

import argparse
import sys

import numpy as np

from _driver import finish, report_timing, run_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="KITTI sequences/NN directory")
    p.add_argument("--out", default="CameraTrajectory.txt")
    p.add_argument("--poses", default=None, help="ground-truth poses file")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--save-map", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    args.kitti_format = True

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import ORBConfig, SystemConfig
    from orb_slam2_map_tpu.io import kitti
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    seq = kitti.KittiSequence(args.root, stereo=True)
    # KITTI settings: 2000 features (Examples/Stereo/KITTI00-02.yaml)
    cfg = SystemConfig(camera=seq.camera,
                       orb=ORBConfig(n_features=2000, max_keypoints=2048))
    # size the map from the sequence: KITTI-00-class runs keep ~1 KF per
    # 3 frames after culling (reference keeps KITTI 00's 4541 frames in
    # ~1400 KFs) — cap at 2560 KFs / 2^18 points, bounded memory either way
    n_kf = int(np.clip(len(seq) // 2, 512, 2560))
    n_pt = (1 << 16) if n_kf <= 512 else (1 << 18)
    slam = SLAMSystem(cfg, Sensor.STEREO,
                      enable_loop_closing=not args.no_loop,
                      max_keyframes=n_kf, max_points=n_pt)

    def step(i):
        t, gl, gr = seq[i]
        return slam.track_stereo(t, gl, gr)

    times, n_lost = run_sequence(slam, len(seq), step)
    report_timing(times, len(seq), n_lost)

    info = ""
    if args.poses:
        Twc_gt = kitti.load_poses(args.poses)
        _, Twc_est = slam.trajectory()
        n = min(len(Twc_est), len(Twc_gt))
        drift = kitti.translational_drift(np.asarray(Twc_est)[:n],
                                          Twc_gt[:n])
        info = f"translational drift: {drift:.2f}%"
    finish(slam, args, info)
    return 0


if __name__ == "__main__":
    sys.exit(main())
