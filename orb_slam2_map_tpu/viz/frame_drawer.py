"""Frame visualization: keypoints/matches/state overlay.

Replaces FrameDrawer (reference: src/FrameDrawer.cc, 202 LoC): renders
the current frame with tracked keypoints and a status line (state, #KFs,
#MPs, #matches, src/FrameDrawer.cc:128-164). Headless: returns an RGB
numpy image (and can save PNGs); no GUI dependency.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _draw_square(img, x, y, half, color):
    h, w = img.shape[:2]
    x0, x1 = max(x - half, 0), min(x + half, w - 1)
    y0, y1 = max(y - half, 0), min(y + half, h - 1)
    img[y0, x0:x1 + 1] = color
    img[y1, x0:x1 + 1] = color
    img[y0:y1 + 1, x0] = color
    img[y0:y1 + 1, x1] = color


def draw_frame(gray: np.ndarray, kp_xy: np.ndarray, kp_valid: np.ndarray,
               matched_mask: Optional[np.ndarray] = None,
               state: str = "", n_kfs: int = 0, n_mps: int = 0) -> np.ndarray:
    """RGB image with green squares on matched keypoints, blue on
    unmatched (reference draws 5px squares + points,
    src/FrameDrawer.cc:83-112)."""
    img = np.stack([gray.astype(np.uint8)] * 3, axis=-1)
    kp = kp_xy.astype(np.int32)
    matched = (matched_mask if matched_mask is not None
               else np.zeros(len(kp), dtype=bool))
    for i in np.nonzero(kp_valid)[0]:
        color = (0, 255, 0) if matched[i] else (80, 80, 255)
        _draw_square(img, int(kp[i, 0]), int(kp[i, 1]), 3, color)
    return img


def save_png(path: str, img: np.ndarray):
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:  # pragma: no cover
        import imageio.v2 as imageio

        imageio.imwrite(path, img)


def status_text(state: str, n_kfs: int, n_mps: int, n_matches: int) -> str:
    """The reference's status line content (src/FrameDrawer.cc:128-164)."""
    return (f"SLAM MODE | {state} | KFs: {n_kfs}, MPs: {n_mps}, "
            f"Matches: {n_matches}")
