"""Map visualization: points, keyframe frusta, covisibility graph,
occupancy voxels.

Replaces MapDrawer's GL rendering (reference: src/MapDrawer.cc:56-290
points/frusta/graph + :312-475 DrawOctoMap colored boxes / height
colormap). Headless matplotlib (Agg) renders to PNG/arrays — the
Pangolin window becomes `viewer.Viewer`, which saves/streams these
renders.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _require_mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def draw_map(map_store, current_Twc: Optional[np.ndarray] = None,
             show_graph: bool = True, figsize=(10, 8)):
    """3D scatter of map points + KF frusta + covisibility edges.
    Returns an RGB uint8 image."""
    plt = _require_mpl()
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")

    mids = map_store.point_ids()
    if len(mids):
        pts = map_store.mp_pos[mids]
        ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.5, c="k",
                   alpha=0.5)

    kfs = map_store.keyframe_ids()
    centers = {}
    for k in kfs:
        Twc = map_store.kf_Twc(int(k))
        centers[int(k)] = Twc[:3, 3]
        _draw_frustum(ax, Twc, scale=0.05, color="b")
    if show_graph:
        for k in kfs:
            w = map_store.covis[k]
            for j in np.nonzero(w >= 100)[0]:
                if j > k and map_store.kf_exists[j]:
                    a, b = centers[int(k)], centers[int(j)]
                    ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                            "g-", lw=0.5, alpha=0.6)
        for (a_id, b_id) in map_store.loop_edges:
            if map_store.kf_exists[a_id] and map_store.kf_exists[b_id]:
                a, b = centers.get(a_id), centers.get(b_id)
                if a is not None and b is not None:
                    ax.plot([a[0], b[0]], [a[2], b[2]], [-a[1], -b[1]],
                            "r-", lw=1.5)
    if current_Twc is not None:
        _draw_frustum(ax, current_Twc, scale=0.1, color="r")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_zlabel("-y")
    return _fig_to_array(fig)


def _draw_frustum(ax, Twc, scale=0.05, color="b"):
    w, h, z = scale, scale * 0.75, scale * 0.6
    pts_c = np.asarray([
        [0, 0, 0], [w, h, z], [w, -h, z], [-w, -h, z], [-w, h, z]])
    pts_w = pts_c @ Twc[:3, :3].T + Twc[:3, 3]
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    for a, b in edges:
        ax.plot([pts_w[a, 0], pts_w[b, 0]], [pts_w[a, 2], pts_w[b, 2]],
                [-pts_w[a, 1], -pts_w[b, 1]], color=color, lw=0.7)


def draw_occupancy(grid3d, figsize=(10, 8), max_voxels: int = 20000):
    """Occupied voxels colored by height (reference DrawOctoMap height
    colormap, src/MapDrawer.cc:476-525)."""
    plt = _require_mpl()
    centers, cols = grid3d.occupied_cells()
    if len(centers) > max_voxels:
        sel = np.random.default_rng(0).choice(len(centers), max_voxels,
                                              replace=False)
        centers = centers[sel]
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")
    if len(centers):
        h = centers[:, 1]
        ax.scatter(centers[:, 0], centers[:, 2], -h, c=-h, s=2.0,
                   cmap="viridis")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    return _fig_to_array(fig)


def draw_grid2d(grid, figsize=(8, 8)):
    """2D occupancy grid render (free=white, occupied=black, unknown=gray)."""
    plt = _require_mpl()
    g = grid.grid()
    img = np.full(g.shape, 0.8)
    img[g == 0] = 1.0
    img[g == 100] = 0.0
    fig, ax = plt.subplots(figsize=figsize)
    ax.imshow(img, cmap="gray", origin="lower", vmin=0, vmax=1)
    ax.set_title("occupancy grid")
    return _fig_to_array(fig)


def _fig_to_array(fig) -> np.ndarray:
    import matplotlib.pyplot as plt

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return buf
