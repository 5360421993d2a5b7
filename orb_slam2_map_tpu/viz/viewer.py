"""Viewer: periodic map/frame rendering + save hooks.

Replaces the reference's Pangolin UI thread (reference: src/Viewer.cc,
296 LoC: camera-follow render loop, menu toggles, the Save button that
writes featurePointMap.bin + octoMap.ot, :212-218). Headless environments
get the same capability as an orchestrated stage: render every N frames
to an output directory, and `save()` mirrors the Save button.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import frame_drawer, map_drawer


class Viewer:
    def __init__(self, system, out_dir: str, every_n: int = 30,
                 draw_map_points: bool = True, draw_keyframes: bool = True,
                 draw_graph: bool = True):
        self.system = system
        self.out_dir = out_dir
        self.every_n = every_n
        self.draw_graph = draw_graph
        self.counter = 0
        os.makedirs(out_dir, exist_ok=True)

    def update(self, gray: np.ndarray, Tcw: Optional[np.ndarray]):
        """Call once per tracked frame (the render loop tick)."""
        self.counter += 1
        if self.counter % self.every_n:
            return
        tr = self.system.tracker
        if tr.last_frame is not None:
            matched = tr.last_obs >= 0 if tr.last_obs is not None else None
            img = frame_drawer.draw_frame(
                gray, np.asarray(tr.last_frame.xy),
                np.asarray(tr.last_frame.valid), matched,
                state=self.system.tracking_state.name,
                n_kfs=self.system.map.n_keyframes(),
                n_mps=self.system.map.n_points())
            frame_drawer.save_png(
                os.path.join(self.out_dir, f"frame_{self.counter:06d}.png"),
                img)
        Twc = np.linalg.inv(Tcw) if Tcw is not None else None
        map_img = map_drawer.draw_map(self.system.map, Twc,
                                      show_graph=self.draw_graph)
        frame_drawer.save_png(
            os.path.join(self.out_dir, f"map_{self.counter:06d}.png"),
            map_img)

    def save(self, occupancy_grid=None):
        """The Save button (reference: src/Viewer.cc:212-218): sparse map
        checkpoint + occupancy map."""
        self.system.save_map(os.path.join(self.out_dir,
                                          "featurePointMap.npz"))
        if occupancy_grid is not None:
            occupancy_grid.save(os.path.join(self.out_dir, "octoMap.npz"))
