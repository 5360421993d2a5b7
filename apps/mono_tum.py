#!/usr/bin/env python
"""TUM monocular driver (reference: Examples/Monocular/mono_tum.cc).

Usage: python apps/mono_tum.py <sequence_dir> [--settings TUM1.yaml]
"""

import argparse
import os
import sys

from _driver import finish, report_timing, run_sequence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="TUM sequence directory (with rgb.txt)")
    p.add_argument("--settings", default=None)
    p.add_argument("--out", default="KeyFrameTrajectory.txt")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from orb_slam2_map_tpu.config import SystemConfig, load_settings
    from orb_slam2_map_tpu.io.tum import _read_image, to_grayscale
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    cfg = load_settings(args.settings) if args.settings else SystemConfig()
    # rgb.txt: 'timestamp rgb/xxx.png' (mono_tum.cc LoadImages)
    ts, files = [], []
    with open(os.path.join(args.root, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, b = line.split()[:2]
            ts.append(float(a))
            files.append(os.path.join(args.root, b))

    slam = SLAMSystem(cfg, Sensor.MONOCULAR,
                      enable_loop_closing=not args.no_loop)

    def step(i):
        img = np.asarray(_read_image(files[i]))
        gray = to_grayscale(img, cfg.rgb_order)
        return slam.track_monocular(ts[i], gray)

    times, n_lost = run_sequence(slam, len(ts), step)
    report_timing(times, len(ts), n_lost)
    finish(slam, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
