"""TUM RGB-D dataset loading.

Replaces the reference's association-file loader
(reference: Examples/RGB-D/rgbd_tum.cc:141-166) and the per-frame image
read + DepthMapFactor rescale (reference: src/Tracking.cc:300-338).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class TumAssociation:
    timestamps: np.ndarray          # [N] float64
    rgb_files: List[str]
    depth_files: List[str]


def load_associations(path: str) -> TumAssociation:
    """Parse a TUM association file: 't_rgb rgb/x.png t_depth depth/y.png'
    per line (reference: Examples/RGB-D/rgbd_tum.cc:141-166)."""
    ts, rgbs, depths = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            ts.append(float(parts[0]))
            rgbs.append(parts[1])
            depths.append(parts[3])
    return TumAssociation(np.asarray(ts, dtype=np.float64), rgbs, depths)


def _read_image(path: str) -> np.ndarray:
    """Read a PNG/PGM image to a numpy array without OpenCV."""
    try:
        from PIL import Image  # pillow is in the base image

        return np.asarray(Image.open(path))
    except ImportError:  # pragma: no cover - fallback
        import imageio.v2 as imageio

        return imageio.imread(path)


def to_grayscale(img: np.ndarray, rgb_order: int = 1) -> np.ndarray:
    """Color -> float32 grayscale in [0, 255] (reference:
    src/Tracking.cc:308-321 cvtColor; BGR handled via rgb_order=0)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    img = img.astype(np.float32)
    if img.shape[-1] >= 3:
        w = (0.299, 0.587, 0.114) if rgb_order else (0.114, 0.587, 0.299)
        return img[..., 0] * w[0] + img[..., 1] * w[1] + img[..., 2] * w[2]
    return img[..., 0]


class TumRGBDDataset:
    """Iterates (timestamp, gray f32 [H,W], depth_m f32 [H,W], rgb u8 [H,W,3]).

    Depth PNGs are uint16 scaled by DepthMapFactor (reference:
    src/Tracking.cc:324-327 convertTo 1/5000).
    """

    def __init__(self, root: str, association_file: str,
                 depth_map_factor: float = 5000.0, rgb_order: int = 1):
        self.root = root
        self.assoc = load_associations(association_file)
        self.depth_map_factor = depth_map_factor
        self.rgb_order = rgb_order

    def __len__(self):
        return len(self.assoc.rgb_files)

    def __getitem__(self, i: int):
        rgb = _read_image(os.path.join(self.root, self.assoc.rgb_files[i]))
        depth = _read_image(os.path.join(self.root, self.assoc.depth_files[i]))
        gray = to_grayscale(rgb, self.rgb_order)
        depth_m = depth.astype(np.float32) / self.depth_map_factor
        if rgb.ndim == 2:
            rgb = np.stack([rgb] * 3, axis=-1)
        return self.assoc.timestamps[i], gray, depth_m, rgb


def load_groundtruth(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a TUM groundtruth.txt: 't tx ty tz qx qy qz qw' lines.
    Returns (timestamps [N], poses [N, 7])."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 8:
                continue
            ts.append(float(parts[0]))
            poses.append([float(x) for x in parts[1:8]])
    return np.asarray(ts), np.asarray(poses, dtype=np.float64)
