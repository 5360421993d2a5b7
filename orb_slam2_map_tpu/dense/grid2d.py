"""2D occupancy-grid mapping from SLAM output.

Replaces the reference's ROS grid pipeline: ros_mono_pub.cc publishes
tracked map points + KF poses, ros_mono_sub.cc integrates them into a
nav_msgs::OccupancyGrid with per-point Bresenham ray visited/occupied
counting and full rebuild on loop closure (reference:
Examples/ROS/ORB_SLAM2/src/ros_mono_sub.cc:28-74, 58-74), plus the
offline script script/pointCloudToGridMap2D.py.

Here the grid is built directly from the map store (no IPC): batched
Bresenham traversal in numpy, visited/occupied counters, free threshold
semantics matching the ROS node's defaults.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..slam.mapstore import MapStore


class OccupancyGrid2D:
    """visited/occupied-count grid (ros_mono_sub semantics)."""

    def __init__(self, x_min: float, x_max: float, z_min: float,
                 z_max: float, cell_size: float = 0.05,
                 free_thresh: float = 0.55, occupied_thresh: float = 0.50,
                 visit_thresh: int = 0):
        self.x_min, self.x_max = x_min, x_max
        self.z_min, self.z_max = z_min, z_max
        self.cell = cell_size
        self.w = int(np.ceil((x_max - x_min) / cell_size))
        self.h = int(np.ceil((z_max - z_min) / cell_size))
        self.visited = np.zeros((self.h, self.w), dtype=np.int32)
        self.occupied = np.zeros((self.h, self.w), dtype=np.int32)
        self.free_thresh = free_thresh
        self.occupied_thresh = occupied_thresh
        self.visit_thresh = visit_thresh

    def _to_cell(self, x, z):
        cx = ((x - self.x_min) / self.cell).astype(np.int64)
        cz = ((z - self.z_min) / self.cell).astype(np.int64)
        return cx, cz

    def insert_rays(self, origin_xz: np.ndarray, points_xz: np.ndarray):
        """Count Bresenham-visited cells from origin to each point;
        endpoint cells count as occupied (reference:
        ros_mono_sub.cc processMapPt/processMapPts). Uses the native C++
        runtime when built (orb_slam2_map_tpu.native)."""
        from .. import native

        ox, oz = self._to_cell(np.asarray([origin_xz[0]]),
                               np.asarray([origin_xz[1]]))
        ox, oz = int(ox[0]), int(oz[0])
        px, pz = self._to_cell(points_xz[:, 0], points_xz[:, 1])
        if native.bresenham_rays(self.visited, self.occupied, ox, oz,
                                 px, pz):
            return
        for x1, z1 in zip(px, pz):
            self._bresenham(ox, oz, int(x1), int(z1))

    def _bresenham(self, x0, z0, x1, z1):
        dx = abs(x1 - x0)
        dz = abs(z1 - z0)
        sx = 1 if x0 < x1 else -1
        sz = 1 if z0 < z1 else -1
        err = dx - dz
        x, z = x0, z0
        while True:
            if 0 <= x < self.w and 0 <= z < self.h:
                self.visited[z, x] += 1
            if x == x1 and z == z1:
                break
            e2 = 2 * err
            if e2 > -dz:
                err -= dz
                x += sx
            if e2 < dx:
                err += dx
                z += sz
        if 0 <= x1 < self.w and 0 <= z1 < self.h:
            # endpoint already counted visited by the traversal loop
            self.occupied[z1, x1] += 1

    def grid(self) -> np.ndarray:
        """int8 occupancy: -1 unknown / 0 free / 100 occupied
        (nav_msgs::OccupancyGrid values, ros_mono_sub.cc getGridMap)."""
        out = np.full((self.h, self.w), -1, dtype=np.int8)
        seen = self.visited > self.visit_thresh
        ratio = np.zeros_like(self.visited, dtype=np.float64)
        ratio[seen] = 1.0 - self.occupied[seen] / self.visited[seen]
        out[seen & (ratio >= self.free_thresh)] = 0
        out[seen & (ratio < self.occupied_thresh)] = 100
        return out

    def save_pgm(self, path: str):
        """map_server-compatible PGM + YAML pair."""
        g = self.grid()
        img = np.full_like(g, 205, dtype=np.uint8)  # unknown = gray
        img[g == 0] = 254
        img[g == 100] = 0
        with open(path, "wb") as f:
            f.write(f"P5\n{self.w} {self.h}\n255\n".encode())
            f.write(img[::-1].tobytes())
        yaml_path = path.rsplit(".", 1)[0] + ".yaml"
        with open(yaml_path, "w") as f:
            f.write(f"image: {path}\nresolution: {self.cell}\n"
                    f"origin: [{self.x_min}, {self.z_min}, 0.0]\n"
                    f"negate: 0\noccupied_thresh: {self.occupied_thresh}\n"
                    f"free_thresh: {self.free_thresh}\n")


def grid_from_map(map_store: MapStore, cell_size: float = 0.05,
                  margin: float = 1.0) -> OccupancyGrid2D:
    """Build a 2D grid from sparse map points + keyframe poses (the
    ros_mono_pub -> ros_mono_sub pipeline without the topics)."""
    mids = map_store.point_ids()
    pts = map_store.mp_pos[mids]
    kfs = map_store.keyframe_ids()
    centers = np.stack([map_store.kf_Twc(int(k))[:3, 3] for k in kfs])
    all_x = np.concatenate([pts[:, 0], centers[:, 0]])
    all_z = np.concatenate([pts[:, 2], centers[:, 2]])
    grid = OccupancyGrid2D(all_x.min() - margin, all_x.max() + margin,
                           all_z.min() - margin, all_z.max() + margin,
                           cell_size)
    for k in kfs:
        k = int(k)
        obs = map_store.kf_obs[k]
        seen = np.unique(obs[obs >= 0])
        if len(seen) == 0:
            continue
        p = map_store.mp_pos[seen]
        c = map_store.kf_Twc(k)[:3, 3]
        grid.insert_rays(np.asarray([c[0], c[2]]), p[:, [0, 2]])
    return grid


def grid_from_cloud(xyz: np.ndarray, origin_xz: np.ndarray,
                    cell_size: float = 0.05,
                    y_band: Optional[Tuple[float, float]] = None,
                    margin: float = 0.5) -> OccupancyGrid2D:
    """Offline cloud -> 2D grid (script/pointCloudToGridMap2D.py
    equivalent): points inside the height band become obstacles."""
    sel = np.ones(len(xyz), dtype=bool)
    if y_band is not None:
        sel = (xyz[:, 1] >= y_band[0]) & (xyz[:, 1] <= y_band[1])
    p = xyz[sel]
    grid = OccupancyGrid2D(p[:, 0].min() - margin, p[:, 0].max() + margin,
                           p[:, 2].min() - margin, p[:, 2].max() + margin,
                           cell_size)
    grid.insert_rays(origin_xz, p[:, [0, 2]])
    return grid
