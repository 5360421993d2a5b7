#!/usr/bin/env python
"""Streaming 2D occupancy-grid pipeline: SLAM → pub/sub → grid node.

The app-level equivalent of running the reference's two ROS nodes
(reference: Examples/ROS/ORB_SLAM2/src/ros_mono_pub.cc publishing
`pts_and_pose` / `all_kf_and_pts`, ros_mono_sub.cc building the
nav_msgs::OccupancyGrid): a SLAM system tracks a sequence, a publisher
node streams tracked points + poses over the in-process bus, and a grid
node integrates them (Bresenham ray counting, loop-closure rebuild) on
its own thread. Writes the final grid as PGM.

Usage: python apps/map2d_pipeline.py [--frames 60] [--out grid.pgm]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--out", default="map2d.pgm")
    p.add_argument("--cell", type=float, default=0.05)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from orb_slam2_map_tpu.config import SystemConfig
    from orb_slam2_map_tpu.dense.grid2d import OccupancyGrid2D
    from orb_slam2_map_tpu.io.stream import (Grid2DBuilderNode, MessageBus,
                                             MapPointPublisher, NodeRunner)
    from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                SyntheticWorld,
                                                sweep_trajectory)
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    world = SyntheticWorld()
    cfg = SystemConfig(camera=world.cam)
    Twc, ts = sweep_trajectory(args.frames)
    seq = SyntheticRGBDSequence(world, Twc, ts)

    bus = MessageBus()
    pub = MapPointPublisher(bus)
    node = Grid2DBuilderNode(
        bus, lambda: OccupancyGrid2D(-4.0, 4.0, -2.0, 8.0,
                                     cell_size=args.cell))
    runner = NodeRunner(node).start()

    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
    for i in range(len(seq)):
        t, gray, depth, _ = seq[i]
        slam.track_rgbd(t, gray, depth)
        pub.update(slam)
    slam.shutdown()
    runner.stop()

    node.grid.save_pgm(args.out)
    g = node.grid.grid()
    print(f"grid node: {node.n_msgs} messages, {node.n_rebuilds} rebuilds")
    print(f"wrote {args.out} ({node.grid.h}x{node.grid.w}, "
          f"{int((g == 100).sum())} occupied / {int((g == 0).sum())} free)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
