"""3D occupancy mapping: the octomap-equivalent subsystem.

Replaces the fork's octomap fusion inside MapDrawer (reference:
src/MapDrawer.cc:312-786): per-KF full-res clouds gated 0.5 m < d <
0.8*6 m + 1 cm voxel filter (:527-563), RANSAC ground-plane split
(perpendicular-to-Y model, 4 cm threshold, :566-663), ray-cast scan
insertion (ground rays clear free space, non-ground endpoints become
occupied, :691-769), occupancy threshold 0.8 for rendering/export
(:312+), and save/load (:772-786).

TPU-first: instead of an octree, a dense log-odds voxel grid with
fixed bounds — updates are one batched ray-march (positions [R, S, 3]
-> flat voxel indices -> scatter-add), which is how a TPU wants this
workload. Octree-style sparsity comes back at export time (only
occupied cells are serialized).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DenseMappingConfig

LOG_ODDS_MIN = -2.0
LOG_ODDS_MAX = 3.5


class OccupancyGrid3D:
    """Dense log-odds occupancy volume, world-aligned."""

    def __init__(self, cfg: DenseMappingConfig,
                 origin=(-1.0, -1.0, -1.0), size=(8.0, 4.0, 8.0)):
        self.cfg = cfg
        self.res = cfg.octo_resolution
        self.origin = np.asarray(origin, dtype=np.float32)
        self.dims = tuple(int(np.ceil(s / self.res)) for s in size)
        self.log_odds = jnp.zeros(self.dims, dtype=jnp.float32)
        # color accumulation (reference averages colors, :747-760)
        self.color_sum = np.zeros(self.dims + (3,), dtype=np.float32)
        self.color_n = np.zeros(self.dims, dtype=np.int32)

    # ------------------------------------------------------------------

    def insert_scan(self, sensor_origin: np.ndarray, points: np.ndarray,
                    colors: Optional[np.ndarray] = None,
                    ground_mask: Optional[np.ndarray] = None,
                    max_points: int = 1 << 15):
        """Ray-cast insertion (reference: src/MapDrawer.cc:691-769).

        ground_mask=True points update only free space along the ray (the
        reference inserts the ground cloud with endpoints free); others
        mark the endpoint occupied."""
        if len(points) == 0:
            return
        if len(points) > max_points:
            sel = np.random.default_rng(0).choice(len(points), max_points,
                                                  replace=False)
            points = points[sel]
            colors = colors[sel] if colors is not None else None
            ground_mask = (ground_mask[sel] if ground_mask is not None
                           else None)
        n = len(points)
        pad = max_points - n
        pts = np.concatenate([points, np.zeros((pad, 3), np.float32)])
        gm = np.zeros(max_points, dtype=bool)
        if ground_mask is not None:
            gm[:n] = ground_mask
        valid = np.zeros(max_points, dtype=bool)
        valid[:n] = True

        self.log_odds = _raycast_update(
            self.log_odds, jnp.asarray(sensor_origin, jnp.float32),
            jnp.asarray(pts), jnp.asarray(gm), jnp.asarray(valid),
            jnp.asarray(self.origin), self.res,
            self.cfg.occ_log_odds_hit, self.cfg.occ_log_odds_miss)

        if colors is not None:
            idx = np.floor((points - self.origin) / self.res).astype(np.int64)
            ok = np.all((idx >= 0) & (idx < np.asarray(self.dims)), axis=1)
            idx = idx[ok]
            np.add.at(self.color_sum, (idx[:, 0], idx[:, 1], idx[:, 2]),
                      colors[ok].astype(np.float32))
            np.add.at(self.color_n, (idx[:, 0], idx[:, 1], idx[:, 2]), 1)

    # ------------------------------------------------------------------

    def occupied_cells(self, threshold: Optional[float] = None):
        """(centers [N, 3], colors [N, 3]) of occupied voxels
        (occ prob > threshold, reference occ_thresh 0.8)."""
        th = threshold if threshold is not None else self.cfg.occ_threshold
        log_th = np.log(th / (1 - th))
        lo = np.asarray(self.log_odds)
        idx = np.argwhere(lo > log_th)
        centers = self.origin + (idx + 0.5) * self.res
        n = np.maximum(self.color_n[idx[:, 0], idx[:, 1], idx[:, 2]], 1)
        cols = (self.color_sum[idx[:, 0], idx[:, 1], idx[:, 2]]
                / n[:, None]).astype(np.uint8)
        return centers.astype(np.float32), cols

    def occupancy_prob(self) -> np.ndarray:
        lo = np.asarray(self.log_odds)
        return 1.0 / (1.0 + np.exp(-lo))

    def project_2d(self, y_min: float, y_max: float,
                   threshold: Optional[float] = None) -> np.ndarray:
        """2D occupancy map: max occupancy over a height band
        (the script/pointCloudToGridMap2D.py capability). Returns
        int8 grid: -1 unknown, 0 free, 100 occupied (ROS convention)."""
        th = threshold if threshold is not None else self.cfg.occ_threshold
        prob = self.occupancy_prob()
        j0 = max(int((y_min - self.origin[1]) / self.res), 0)
        j1 = min(int(np.ceil((y_max - self.origin[1]) / self.res)),
                 self.dims[1])
        band = prob[:, j0:j1, :]
        lo = np.asarray(self.log_odds)[:, j0:j1, :]
        known = np.abs(lo).max(axis=1) > 1e-6
        occ = band.max(axis=1) > th
        grid = np.full((self.dims[0], self.dims[2]), -1, dtype=np.int8)
        grid[known & ~occ] = 0
        grid[occ] = 100
        return grid

    # ------------------------------------------------------------------

    def save(self, path: str):
        """(reference SaveOctoMap, src/MapDrawer.cc:772-779)."""
        np.savez_compressed(
            path, log_odds=np.asarray(self.log_odds), origin=self.origin,
            res=self.res, color_sum=self.color_sum, color_n=self.color_n)

    @staticmethod
    def load(path: str, cfg: DenseMappingConfig) -> "OccupancyGrid3D":
        z = np.load(path)
        res = float(z["res"])
        lo = z["log_odds"]
        g = OccupancyGrid3D(cfg, origin=tuple(z["origin"]),
                            size=tuple(d * res for d in lo.shape))
        g.res = res
        g.log_odds = jnp.asarray(lo)
        g.color_sum = z["color_sum"]
        g.color_n = z["color_n"]
        return g


@functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(0,))
def _raycast_update(log_odds, origin_w, points, ground_mask, valid,
                    grid_origin, res: float, hit, miss):
    """Batched ray march: S samples along each origin->point ray mark free
    space; endpoints of non-ground rays mark occupied."""
    dims = log_odds.shape
    rays = points - origin_w[None, :]
    lengths = jnp.linalg.norm(rays, axis=1)
    S = 192
    # sample fractions excluding the endpoint voxel
    fr = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    pos = origin_w[None, None, :] + rays[:, None, :] * fr[None, :, None]
    step_len = lengths / S
    # subsample at ~res spacing: weight 0 for samples closer than res apart
    keep = (fr[None, :] * lengths[:, None]) <= (lengths[:, None] - res)

    n_cells = dims[0] * dims[1] * dims[2]
    idx = jnp.floor((pos - grid_origin[None, None, :]) / res).astype(jnp.int32)
    in_bounds = jnp.all(
        (idx >= 0) & (idx < jnp.asarray(dims)[None, None, :]), axis=-1)
    flat = (idx[..., 0] * dims[1] + idx[..., 1]) * dims[2] + idx[..., 2]
    # OOB sentinel must be POSITIVE: jax wraps negative scatter indices
    flat = jnp.where(in_bounds & keep & valid[:, None], flat, n_cells)

    lo_flat = log_odds.reshape(-1)
    # free-space updates: use scatter-max of a "visited" mask to apply miss
    # once per voxel per scan (octomap marks each traversed cell once)
    visited = jnp.zeros_like(lo_flat, dtype=jnp.bool_)
    visited = visited.at[flat.reshape(-1)].set(True, mode="drop")
    lo_flat = lo_flat + jnp.where(visited, miss, 0.0)

    # endpoint occupied updates (non-ground)
    eidx = jnp.floor((points - grid_origin[None, :]) / res).astype(jnp.int32)
    e_in = jnp.all((eidx >= 0) & (eidx < jnp.asarray(dims)[None, :]), axis=-1)
    eflat = (eidx[..., 0] * dims[1] + eidx[..., 1]) * dims[2] + eidx[..., 2]
    occ_sel = e_in & valid & ~ground_mask
    eflat = jnp.where(occ_sel, eflat, n_cells)
    hit_mask = jnp.zeros_like(lo_flat, dtype=jnp.bool_)
    hit_mask = hit_mask.at[eflat].set(True, mode="drop")
    # hit overrides the miss applied above for the endpoint cell
    lo_flat = lo_flat + jnp.where(hit_mask, hit - 0.0, 0.0)

    return jnp.clip(lo_flat, LOG_ODDS_MIN, LOG_ODDS_MAX).reshape(dims)


def ransac_ground_plane(points: np.ndarray, cfg: DenseMappingConfig,
                        n_iters: int = 200, seed: int = 0
                        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Split a cloud into (ground_mask, plane) with a RANSAC plane
    constrained near-perpendicular to the Y axis (reference:
    src/MapDrawer.cc:566-663: SACMODEL_PERPENDICULAR_PLANE, axis Y,
    eps 10 deg, dist 0.04, 200 iters)."""
    if len(points) < 50:
        return np.zeros(len(points), dtype=bool), None
    rng = np.random.default_rng(seed)
    axis = np.zeros(3)
    axis[cfg.ground_axis] = 1.0
    best_inl = None
    best_count = -1
    best_plane = None
    idx = rng.integers(0, len(points), (n_iters, 3))
    p0, p1, p2 = points[idx[:, 0]], points[idx[:, 1]], points[idx[:, 2]]
    normals = np.cross(p1 - p0, p2 - p0)
    norms = np.linalg.norm(normals, axis=1) + 1e-12
    normals = normals / norms[:, None]
    cosang = np.abs(normals @ axis)
    valid = cosang > np.cos(np.deg2rad(10.0))
    for i in np.nonzero(valid)[0]:
        d = -normals[i] @ p0[i]
        dist = np.abs(points @ normals[i] + d)
        inl = dist < cfg.ground_dist_th
        c = int(inl.sum())
        if c > best_count:
            best_count = c
            best_inl = inl
            best_plane = np.concatenate([normals[i], [d]])
    if best_inl is None:
        return np.zeros(len(points), dtype=bool), None
    return best_inl, best_plane
