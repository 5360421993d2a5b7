#!/usr/bin/env python
"""KITTI monocular driver (reference: Examples/Monocular/mono_kitti.cc).

Usage: python apps/mono_kitti.py <sequence_dir> [--out traj.txt]
"""

import argparse
import sys

from _driver import finish, report_timing, run_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="KITTI sequences/NN directory")
    p.add_argument("--out", default="KeyFrameTrajectory.txt")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import ORBConfig, SystemConfig
    from orb_slam2_map_tpu.io import kitti
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    seq = kitti.KittiSequence(args.root, stereo=False)
    cfg = SystemConfig(camera=seq.camera,
                       orb=ORBConfig(n_features=2000, max_keypoints=2048))
    slam = SLAMSystem(cfg, Sensor.MONOCULAR,
                      enable_loop_closing=not args.no_loop)

    def step(i):
        t, gl = seq[i]
        return slam.track_monocular(t, gl)

    times, n_lost = run_sequence(slam, len(seq), step)
    report_timing(times, len(seq), n_lost)
    finish(slam, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
