#!/usr/bin/env python
"""Project a dense point cloud (.pcd) to a 2D occupancy grid map (.pgm).

Replaces the reference's offline script (reference:
script/pointCloudToGridMap2D.py — height-band filter + per-point
Bresenham ray counting into a 2D grid, companion of 2d-grid-mapping.pdf).
Rays are rasterized by the batched native C++ Bresenham runtime (numpy
fallback).

Usage: python tools/cloud_to_grid2d.py input.pcd output.pgm \
           [cell_size] [y_min] [y_max]
"""

import sys


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import numpy as np

    from orb_slam2_map_tpu.dense.grid2d import grid_from_cloud
    from orb_slam2_map_tpu.dense.pointcloud import load_pcd

    cell = float(argv[3]) if len(argv) > 3 else 0.05
    y_band = None
    if len(argv) > 5:
        y_band = (float(argv[4]), float(argv[5]))
    xyz, _ = load_pcd(argv[1])
    print(f"read {len(xyz)} points")
    origin = np.asarray([xyz[:, 0].mean(), xyz[:, 2].mean()])
    grid = grid_from_cloud(xyz, origin, cell_size=cell, y_band=y_band)
    grid.save_pgm(argv[2])
    g = grid.grid()
    print(f"wrote {argv[2]} ({grid.h}x{grid.w}, "
          f"{int((g == 100).sum())} occupied cells)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
