"""Batched ORB feature extraction: keypoints + oriented BRIEF descriptors.

Replaces ORBextractor (reference: src/ORBextractor.cc:1043-1105 operator(),
:765-853 ComputeKeyPointsOctTree, :77-147 IC_Angle + rBRIEF). TPU-first
redesign:

  * FAST + score + NMS: one fused elementwise pass per level (ops/fast.py).
  * Spatial balancing: the reference's CPU quadtree (DistributeOctTree,
    src/ORBextractor.cc:539-763) becomes a static-shape per-cell top-k with
    rank-major priority, which reproduces its "best response per region,
    spread first" behavior without data-dependent recursion.
  * Orientation + descriptors: per-keypoint patch gathers (one
    dynamic-slice per keypoint, vmapped) followed by dense moment /
    bit-test arithmetic — everything padded to a fixed per-level capacity.
  * The rBRIEF sampling pattern is generated (seeded Gaussian pairs, the
    original BRIEF recipe) rather than copied from OpenCV's learned table;
    the whole stack (matching, vocabulary) is trained on these
    descriptors, so only internal consistency matters.

The extractor is a single jittable function image -> fixed-capacity
keypoint set; all hot loops run on device.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ORBConfig
from . import fast, pyramid

HALF_PATCH = 15           # IC-angle circular patch radius (ref: :73)
BRIEF_N_TESTS = 256
BRIEF_PATCH = 48          # gather patch side for descriptor sampling
BRIEF_HALF = BRIEF_PATCH // 2


class Keypoints(NamedTuple):
    """Fixed-capacity SoA keypoint set for one image (device arrays)."""

    xy: jnp.ndarray        # [N, 2] float32, level-0 (full-res) pixel coords
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray     # [N] float32 radians
    level: jnp.ndarray     # [N] int32 pyramid level
    desc: jnp.ndarray      # [N, 8] uint32 packed rBRIEF
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self):
        return self.xy.shape[0]


# ---------------------------------------------------------------------------
# rBRIEF pattern (generated, deterministic)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) test-pair offsets.

    Gaussian BRIEF pairs (Calonder et al. recipe: p, q ~ N(0, (S/5)^2)),
    seeded for determinism, deduplicated, clipped to +-13 so rotated
    samples stay within the gather patch.
    """
    rng = np.random.default_rng(20240917)
    sigma = 31 / 5.0
    pts = []
    seen = set()
    while len(pts) < BRIEF_N_TESTS:
        p = np.clip(np.round(rng.normal(0, sigma, 4)), -13, 13).astype(np.int32)
        key = tuple(p)
        if key in seen or (p[0] == p[2] and p[1] == p[3]):
            continue
        seen.add(key)
        pts.append(p)
    return np.asarray(pts, dtype=np.int32)


@functools.lru_cache(maxsize=1)
def _ic_angle_masks() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Circular-patch mask and x/y coordinate grids for IC-angle moments
    (reference: src/ORBextractor.cc:77-104 uses per-row u_max bounds; the
    dense mask form is identical)."""
    r = HALF_PATCH
    ys, xs = np.mgrid[-r:r + 1, -r:r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    return (mask.astype(np.float32), xs.astype(np.float32) * mask,
            ys.astype(np.float32) * mask)


# ---------------------------------------------------------------------------
# Per-level keypoint detection with spatial balancing
# ---------------------------------------------------------------------------

def detect_level(img: jnp.ndarray, n_keep: int, cfg: ORBConfig):
    """Detect up to n_keep FAST keypoints on one pyramid level.

    Returns (xy [n_keep, 2] float32 level coords, response [n_keep],
    valid [n_keep] bool). Two-threshold fallback per cell mirrors the
    reference (src/ORBextractor.cc:791-801): cells that found nothing at
    iniThFAST retry at minThFAST.
    """
    H, W = img.shape
    border = cfg.edge_threshold - 3  # FAST evaluated inside this margin (:770)
    cs = cfg.cell_size

    # one threshold-independent score pass serves both FAST thresholds
    # (reference: src/ORBextractor.cc:791-801 runs cv::FAST twice); the
    # shared NMS is exact because any suppressing neighbor has a larger
    # score and therefore passes every threshold the suppressed pixel does
    smap = fast.fast_score_map(img)
    nms = fast.nms3(smap)
    score_hi = jnp.where(nms > float(cfg.ini_th_fast), nms, 0.0)
    score_lo = jnp.where(nms > float(cfg.min_th_fast), nms, 0.0)

    # mask the border
    rr = jnp.arange(H)[:, None]
    cc = jnp.arange(W)[None, :]
    inb = (rr >= border) & (rr < H - border) & (cc >= border) & (cc < W - border)
    score_hi = jnp.where(inb, score_hi, 0.0)
    score_lo = jnp.where(inb, score_lo, 0.0)

    # pad to cell multiples, reshape into cells
    Hp = (H + cs - 1) // cs * cs
    Wp = (W + cs - 1) // cs * cs
    pad_h, pad_w = Hp - H, Wp - W
    sh = jnp.pad(score_hi, ((0, pad_h), (0, pad_w)))
    sl = jnp.pad(score_lo, ((0, pad_h), (0, pad_w)))
    ncy, ncx = Hp // cs, Wp // cs
    sh_c = sh.reshape(ncy, cs, ncx, cs).transpose(0, 2, 1, 3).reshape(ncy * ncx, cs * cs)
    sl_c = sl.reshape(ncy, cs, ncx, cs).transpose(0, 2, 1, 3).reshape(ncy * ncx, cs * cs)

    has_hi = sh_c.max(axis=1) > 0.0
    cell_scores = jnp.where(has_hi[:, None], sh_c, sl_c)    # [C, cs*cs]

    # per-cell top-R candidates (quadtree stand-in)
    R = 4
    top_vals, top_idx = jax.lax.top_k(cell_scores, R)       # [C, R]
    cell_ids = jnp.arange(ncy * ncx)[:, None]
    cy = cell_ids // ncx
    cx = cell_ids % ncx
    py = cy * cs + top_idx // cs                            # [C, R] pixel rows
    px = cx * cs + top_idx % cs

    vals = top_vals.reshape(-1)
    pys_i = py.reshape(-1)
    pxs_i = px.reshape(-1)
    ranks = jnp.broadcast_to(jnp.arange(R)[None, :], top_vals.shape).reshape(-1)

    # sub-pixel refinement: 1D quadratic fits on the pre-NMS score map
    # around each peak. Integer FAST corners carry a coherent quantization
    # bias under viewpoint change (the whole lattice snaps together),
    # which biases pose estimates at far range; the parabola fit removes
    # most of it. (An improvement over the reference, which keeps integer
    # FAST positions, src/ORBextractor.cc:819-827.)
    # pre-NMS score (raw_hi>0 implies raw_lo==raw_hi, so the low-threshold
    # mask reproduces the old where(raw_hi>0, raw_hi, raw_lo) exactly)
    score_full = jnp.pad(jnp.where(smap > float(cfg.min_th_fast), smap, 0.0),
                         ((1, 1 + pad_h), (1, 1 + pad_w)))
    yc = pys_i + 1
    xc = pxs_i + 1
    s_c = score_full[yc, xc]
    s_l = score_full[yc, xc - 1]
    s_r = score_full[yc, xc + 1]
    s_u = score_full[yc - 1, xc]
    s_d = score_full[yc + 1, xc]
    denx = 2.0 * s_c - s_l - s_r
    deny = 2.0 * s_c - s_u - s_d
    dx = jnp.where(jnp.abs(denx) > 1e-6,
                   0.5 * (s_r - s_l) / jnp.where(jnp.abs(denx) > 1e-6,
                                                 denx, 1.0), 0.0)
    dy = jnp.where(jnp.abs(deny) > 1e-6,
                   0.5 * (s_d - s_u) / jnp.where(jnp.abs(deny) > 1e-6,
                                                 deny, 1.0), 0.0)
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)
    pxs = pxs_i.astype(jnp.float32) + dx
    pys = pys_i.astype(jnp.float32) + dy

    valid = vals > 0.0
    # rank-major priority: all best-in-cell first, then second-best, ...
    priority = jnp.where(valid, -ranks.astype(jnp.float32) * 1e6 + vals, -jnp.inf)
    k = min(n_keep, vals.shape[0])
    sel_p, sel_i = jax.lax.top_k(priority, k)
    xy = jnp.stack([pxs[sel_i], pys[sel_i]], axis=-1)
    resp = vals[sel_i]
    ok = jnp.isfinite(sel_p)
    if k < n_keep:  # capacity exceeds candidates; pad
        pad = n_keep - k
        xy = jnp.concatenate([xy, jnp.full((pad, 2), float(border))])
        resp = jnp.concatenate([resp, jnp.zeros(pad)])
        ok = jnp.concatenate([ok, jnp.zeros(pad, dtype=bool)])
    xy = jnp.where(ok[:, None], xy, float(border + 1))
    return xy, resp, ok


# ---------------------------------------------------------------------------
# Orientation + descriptors (per level, fixed capacity)
# ---------------------------------------------------------------------------

def _gather_at_offsets(img: jnp.ndarray, xy: jnp.ndarray,
                       dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Sample img at (trunc(xy) + (dy, dx)) with edge clamping.

    xy [N, 2] float level coords; dx/dy [N, K] or [K] integer offsets.
    Returns [N, K] float32. One flat XLA gather — the TPU-friendly form
    of a per-keypoint patch read (a vmapped dynamic_slice was measured to
    re-read the whole padded image per keypoint, ~550 MB/level)."""
    H, W = img.shape
    cx = xy[:, 0].astype(jnp.int32)[:, None]                # trunc, as before
    cy = xy[:, 1].astype(jnp.int32)[:, None]
    ax = jnp.clip(cx + dx, 0, W - 1)
    ay = jnp.clip(cy + dy, 0, H - 1)
    flat_idx = (ay * W + ax).reshape(-1)
    return img.reshape(-1)[flat_idx].reshape(ax.shape)


def _gather_patches(img: jnp.ndarray, xy: jnp.ndarray, half: int):
    """[N, 2*half+1, 2*half+1] patches centered at trunc(xy) (level
    coords); `img` is pre-padded by `half` so slices never go OOB.

    A vmapped dynamic_slice immediately consumed by a static-weight
    contraction (einsum) is the FAST patch form on TPU — XLA fuses the
    weighting into the slice loop (measured 0.04 ms for 1032 keypoints).
    Only use this when the consumer is a static contraction; dynamic
    in-patch indexing (take_along_axis) costs ~7 ms at the same size."""
    size = 2 * half + 1
    padded = jnp.pad(img, half, mode="edge")

    def one(p):
        c = p.astype(jnp.int32)  # (x, y)
        return jax.lax.dynamic_slice(padded, (c[1], c[0]), (size, size))

    return jax.vmap(one)(xy)


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint [N] (radians)."""
    mask, mx, my = _ic_angle_masks()
    patches = _gather_patches(img, xy, HALF_PATCH)          # [N, 31, 31]
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(mx))
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(my))
    return jnp.arctan2(m01, m10)


def brief_descriptors(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF-256 -> [N, 8] uint32 packed descriptors.

    Per keypoint: rotate the 512 pattern points by the keypoint angle
    (steered BRIEF, as the reference's computeOrbDescriptor
    src/ORBextractor.cc:108-147), sample nearest-neighbor with one flat
    gather, compare, pack bits.
    """
    pat = jnp.asarray(brief_pattern())                      # [256, 4]
    pts = jnp.concatenate([pat[:, :2], pat[:, 2:]], axis=0).astype(jnp.float32)
    # [512, 2] (x, y)

    ca, sa = jnp.cos(angle), jnp.sin(angle)                 # [N]
    rx = pts[None, :, 0] * ca[:, None] - pts[None, :, 1] * sa[:, None]
    ry = pts[None, :, 0] * sa[:, None] + pts[None, :, 1] * ca[:, None]
    dx = jnp.round(rx).astype(jnp.int32)                    # [N, 512]
    dy = jnp.round(ry).astype(jnp.int32)

    samples = _gather_at_offsets(img_blurred, xy, dx, dy)   # [N, 512]

    a = samples[:, :BRIEF_N_TESTS]
    b = samples[:, BRIEF_N_TESTS:]
    bits = (a < b).astype(jnp.uint32)                       # [N, 256]
    shifts = jnp.asarray(np.arange(32, dtype=np.uint32))
    words = (bits.reshape(-1, 8, 32) << shifts[None, None, :]).sum(
        axis=-1, dtype=jnp.uint32
    )
    return words                                            # [N, 8]


# ---------------------------------------------------------------------------
# Full extractor
# ---------------------------------------------------------------------------

def _level_capacities(cfg: ORBConfig) -> List[int]:
    caps = cfg.features_per_level()
    # round up each level to a multiple of 8 (sublane alignment), keep total
    return [max(8, (c + 7) // 8 * 8) for c in caps]


def extract(img: jnp.ndarray, cfg: ORBConfig) -> Keypoints:
    """Full ORB extraction for one grayscale image [H, W] float32.

    Mirrors ORBextractor::operator() (reference: src/ORBextractor.cc:
    1043-1105): pyramid -> per-level FAST+balance -> IC angle on raw level
    -> Gaussian blur -> rBRIEF; keypoint coords scaled back to level 0.
    Output capacity = sum of per-level capacities (~cfg.n_features padded).
    """
    levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    caps = _level_capacities(cfg)
    scale = cfg.scale_factor

    xs, rs, angs, lvls, descs, oks = [], [], [], [], [], []
    for lvl, (im, cap) in enumerate(zip(levels, caps)):
        xy, resp, ok = detect_level(im, cap, cfg)
        ang = ic_angles(im, xy)
        blurred = pyramid.gaussian_blur(im)
        desc = brief_descriptors(blurred, xy, ang)
        s = scale ** lvl
        xs.append(xy * s)
        rs.append(resp)
        angs.append(ang)
        lvls.append(jnp.full(cap, lvl, dtype=jnp.int32))
        descs.append(desc)
        oks.append(ok)

    return Keypoints(
        xy=jnp.concatenate(xs, axis=0),
        response=jnp.concatenate(rs, axis=0),
        angle=jnp.concatenate(angs, axis=0),
        level=jnp.concatenate(lvls, axis=0),
        desc=jnp.concatenate(descs, axis=0),
        valid=jnp.concatenate(oks, axis=0),
    )


def total_capacity(cfg: ORBConfig) -> int:
    return sum(_level_capacities(cfg))


def unpack_descriptors(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] float32 in {-1, +1} ("matmul form" for
    MXU Hamming distance; see ops/matching.py)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.float32)
    return bits * 2.0 - 1.0
