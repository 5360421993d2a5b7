#!/usr/bin/env python
"""Convert a dense point cloud (.pcd) into a 3D occupancy map.

Replaces the reference's offline converter (reference:
tools/pcd2octomap.cc — reads a PCD, inserts every point into an
octomap::OcTree, writes .bt/.ot). Here the occupancy structure is the
framework's dense voxel log-odds grid (dense/occupancy.py) whose
ray-cast insertion runs as a batched JAX scatter.

Usage: python tools/pcd2octomap.py input.pcd output.npz [resolution]
"""

import sys

import numpy as np


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from orb_slam2_map_tpu.config import DenseMappingConfig
    from orb_slam2_map_tpu.dense.occupancy import OccupancyGrid3D
    from orb_slam2_map_tpu.dense.pointcloud import load_pcd

    res = float(argv[3]) if len(argv) > 3 else 0.05
    xyz, col = load_pcd(argv[1])
    print(f"read {len(xyz)} points from {argv[1]}")
    cfg = DenseMappingConfig(octo_resolution=res)
    lo = xyz.min(axis=0) - 2 * res
    hi = xyz.max(axis=0) + 2 * res
    grid = OccupancyGrid3D(cfg, origin=tuple(lo), size=tuple(hi - lo))
    origin = xyz.mean(axis=0)
    for s in range(0, len(xyz), 1 << 15):
        sl = slice(s, s + (1 << 15))
        grid.insert_scan(origin, xyz[sl],
                         colors=None if col is None else col[sl])
    # single-hit voxels sit at P=0.7 (one log-odds update); report at 0.5
    # like the reference tool's direct point insertion
    occ, _ = grid.occupied_cells(threshold=0.5)
    print(f"{len(occ)} occupied voxels at {res} m")
    grid.save(argv[2])
    print(f"wrote {argv[2]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
