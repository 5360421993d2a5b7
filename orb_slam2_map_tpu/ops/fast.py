"""Vectorized FAST-9-16 corner detection.

Replaces the reference's per-cell cv::FAST calls
(reference: src/ORBextractor.cc:769-829). Instead of looping over 30x30
cells on the CPU, the whole image is processed as one fused elementwise
program: the 16-pixel Bresenham ring is materialized as 16 shifted views,
the contiguous-arc-of-9 test is a log-depth AND-reduction, and the corner
score is the exact OpenCV cornerScore (max over arcs of the min ring
difference = the largest threshold at which the pixel stays a corner).
This is VPU-shaped work: ~300 elementwise ops/pixel, no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# FAST-16 Bresenham circle offsets (dr, dc), circularly ordered.
RING_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LENGTH = 9  # FAST-9: contiguous arc of >= 9 ring pixels


def ring_stack(img: jnp.ndarray) -> jnp.ndarray:
    """[16, H, W] ring pixel values via shifted slices of a padded image."""
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    views = []
    for dr, dc in RING_OFFSETS:
        views.append(p[3 + dr:3 + dr + H, 3 + dc:3 + dc + W])
    return jnp.stack(views, axis=0)


def _windowed_reduce(x: jnp.ndarray, op, length: int) -> jnp.ndarray:
    """Reduce op over all circular windows of `length` along axis 0 (len 16).
    Returns [16, H, W]: entry s = op over x[s:s+length] (circular)."""
    ext = jnp.concatenate([x, x[: length - 1]], axis=0)  # [16+len-1, H, W]
    # runs of 3, then runs of 9 = three runs of 3 stepped by 3
    r3 = op(op(ext[:-2], ext[1:-1]), ext[2:])            # [22, H, W] for len 9
    if length == 9:
        return op(op(r3[:16], r3[3:19]), r3[6:22])
    raise ValueError("only arc length 9 supported")


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Threshold-independent FAST-9-16 corner score map [H, W].

    score(p) = the largest threshold t at which p is still a corner
    (OpenCV cornerScore in closed form: best over the 16 circular arcs of
    the min ring-difference within the arc). A pixel is a FAST corner at
    threshold t iff score(p) > t, so a single pass serves every threshold
    — the reference's two-threshold fallback (iniThFAST=20, minThFAST=7,
    src/ORBextractor.cc:791-801) reads this one map twice.
    """
    ring = ring_stack(img)                              # [16, H, W]
    center = img[None]
    min_b = _windowed_reduce(ring - center, jnp.minimum, ARC_LENGTH).max(axis=0)
    min_d = _windowed_reduce(center - ring, jnp.minimum, ARC_LENGTH).max(axis=0)
    return jnp.maximum(min_b, min_d)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9-16 corner response map [H, W]: zero where not a corner at
    `threshold`, else the cornerScore (see fast_score_map)."""
    score = fast_score_map(img)
    return jnp.where(score > threshold, score, 0.0)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep pixels equal to the local max.
    Ties broken toward the top-left pixel (strictly greater than later
    neighbors in raster order) so plateaus yield a single keypoint."""
    H, W = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-1.0)
    keep = jnp.ones_like(score, dtype=bool)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            nb = p[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            if (dr < 0) or (dr == 0 and dc < 0):
                keep &= score > nb       # earlier neighbor: must beat it
            else:
                keep &= score >= nb      # later neighbor: ties OK
    return jnp.where(keep, score, 0.0)
