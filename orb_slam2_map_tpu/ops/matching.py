"""Descriptor matching kernels: Hamming distance on the MXU + gated NN.

Replaces ORBmatcher (reference: src/ORBmatcher.cc, 1665 LoC of eight
Search* variants and two Fuse variants). TPU-first redesign: every variant
decomposes into the same three batched primitives —

  1. all-pairs Hamming distance. Descriptors are unpacked to {-1,+1}
     vectors so distance = (256 - A @ B^T) / 2 rides the MXU as a single
     [N,256]x[256,M] matmul (vs the reference's per-pair popcount loop,
     src/ORBmatcher.cc:1647-1663);
  2. a candidate gate expressed as an additive mask (search-window radius,
     scale-level band, stereo right-coord check, epipolar distance, BoW
     node equality — whatever the variant needs);
  3. masked nearest-neighbor selection with optional Lowe ratio test,
     mutual cross-check, and the rotation-histogram consistency filter
     (reference: src/ORBmatcher.cc:1601-1642 keeps the top-3 bins).

The reference prunes candidates with per-cell grids and BoW buckets to
save CPU; on TPU the dense 1024x1024 distance matrix costs ~0.5 GFLOP =
microseconds, so gates are applied after the fact as masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)
HISTO_LENGTH = 30  # rotation histogram bins (reference: src/ORBmatcher.cc:39)


def unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 packed -> [N, 256] float {-1, +1} (bf16-able)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32) * 2.0 - 1.0


_USE_PALLAS = None


def _use_pallas(standalone: bool = False) -> bool:
    """Pallas XOR+popcount kernel routing policy (measured on v5e):

    * INSIDE fused tracking programs the MXU unpack-matmul wins because
      XLA fuses the gate production and NN selection around the matmul
      (motion step 4.1 ms XLA vs 4.4 ms Pallas) — the Pallas call
      boundary forces the [N, M] gate through HBM. Off by default;
      ORB_TPU_PALLAS=1 forces it for A/B measurement.
    * STANDALONE dispatches whose gate is a host-built array (loop
      closing's BoW match, offline batch matching) have no fusion to
      lose: the Pallas kernel wins outright (1.0 vs 1.5 ms at 1221^2,
      and the f32 distance matrix never materializes in HBM). On by
      default on TPU via standalone=True; ORB_TPU_PALLAS=0 disables."""
    import os

    global _USE_PALLAS
    if _USE_PALLAS is None:
        try:
            plat = jax.devices()[0].platform
        except Exception:
            plat = "cpu"
        _USE_PALLAS = {"tpu": plat == "tpu"}
    if not _USE_PALLAS["tpu"]:
        return False
    # the env var is re-read per call (cheap) so in-process toggling —
    # the A/B measurement use case — takes effect immediately
    env = os.environ.get("ORB_TPU_PALLAS")
    if env is not None:
        return env == "1"
    return standalone


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance [N, M] float32 from packed uint32[*, 8].

    dist = (256 - a.b) / 2 with a, b in {-1,+1}^256 — one MXU matmul.
    (The standalone Pallas variant, ops/pallas_kernels.hamming_matrix_
    pallas, measures faster in isolation but breaks XLA's fusion with
    the surrounding gate/NN ops; the fully-fused matcher `gated_nn` is
    the Pallas entry point instead.)
    """
    a = unpack_pm1(desc_a).astype(jnp.bfloat16)
    b = unpack_pm1(desc_b).astype(jnp.bfloat16)
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return (256.0 - dot) * 0.5


def hamming_distance(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Rowwise Hamming distance [N] between paired packed descriptors."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    return popcount32(x).sum(axis=-1)


def popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Vectorized popcount for uint32 (SWAR bit tricks)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [N] int32 best column per row (-1 semantics via ok)
    dist: jnp.ndarray   # [N] float32 best distance
    ok: jnp.ndarray     # [N] bool


def gated_nn(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
             gate: jnp.ndarray, max_dist: float = 256.0,
             ratio: Optional[float] = None,
             standalone: bool = False) -> MatchResult:
    """Fused distance + gated nearest neighbor: the common core of every
    Search* variant. Pass standalone=True when this is its own dispatch
    with a host-built gate (loop closing, offline matching) — that
    routes to the Pallas XOR+popcount kernel on TPU, which wins exactly
    when there is no surrounding XLA program to fuse with (see
    _use_pallas)."""
    if _use_pallas(standalone):
        from . import pallas_kernels

        idx, best, second = pallas_kernels.gated_nn_pallas(desc_a, desc_b,
                                                           gate)
        ok = best <= max_dist
        if ratio is not None:
            ok &= best < ratio * second
        return MatchResult(idx=idx, dist=best, ok=ok)
    dmat = hamming_matrix(desc_a, desc_b)
    return masked_nn(dmat, gate, max_dist=max_dist, ratio=ratio)


def masked_nn(dist: jnp.ndarray, gate: Optional[jnp.ndarray] = None,
              max_dist: float = 256.0, ratio: Optional[float] = None,
              cross_check: bool = False) -> MatchResult:
    """Nearest neighbor per row of a gated distance matrix.

    gate: bool [N, M], True = candidate allowed. ratio: Lowe's test
    best < ratio * second_best (reference NN-ratio). cross_check: also
    require the row to be its column's best (used by Fuse-style dedup).
    """
    d = dist if gate is None else jnp.where(gate, dist, INF)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
    ok = best <= max_dist
    if ratio is not None:
        d2 = jnp.where(
            jax.nn.one_hot(idx, d.shape[1], dtype=bool), INF, d
        )
        second = d2.min(axis=1)
        ok &= best < ratio * second
    if cross_check:
        col_best = jnp.argmin(d, axis=0).astype(jnp.int32)  # [M]
        ok &= col_best[idx] == jnp.arange(d.shape[0], dtype=jnp.int32)
    return MatchResult(idx=idx, dist=best, ok=ok)


def resolve_duplicates(idx: jnp.ndarray, dist: jnp.ndarray,
                       ok: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Keep only the lowest-distance row per matched column (the reference
    repeatedly evicts worse duplicate matches, e.g. src/ORBmatcher.cc:
    110-121). Returns updated ok mask."""
    n = idx.shape[0]
    col = jnp.where(ok, idx, n_cols)
    d = jnp.where(ok, dist, INF)
    best_dist = jnp.full((n_cols + 1,), INF).at[col].min(d)
    cand = ok & (d == best_dist[col])
    rowid = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2**30)
    best_row = jnp.full((n_cols + 1,), big).at[col].min(
        jnp.where(cand, rowid, big)
    )
    return cand & (best_row[col] == rowid)


def rotation_consistency(angle_a: jnp.ndarray, angle_b: jnp.ndarray,
                         idx: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """Rotation-histogram filter: keep matches whose angle difference falls
    in one of the 3 most populated of 30 bins
    (reference: src/ORBmatcher.cc:1601-1642 ComputeThreeMaxima)."""
    diff = angle_a - angle_b[idx]
    # wrap to [0, 2pi)
    two_pi = 2.0 * jnp.pi
    diff = jnp.mod(diff, two_pi)
    bins = jnp.clip((diff * HISTO_LENGTH / two_pi).astype(jnp.int32),
                    0, HISTO_LENGTH - 1)
    hist = jnp.zeros(HISTO_LENGTH, dtype=jnp.int32).at[bins].add(
        ok.astype(jnp.int32)
    )
    top3_vals, top3_idx = jax.lax.top_k(hist, 3)
    # reference keeps bin2/bin3 only if >= 0.1 * max count
    keep2 = top3_vals[1] >= 0.1 * top3_vals[0]
    keep3 = top3_vals[2] >= 0.1 * top3_vals[0]
    in1 = bins == top3_idx[0]
    in2 = (bins == top3_idx[1]) & keep2
    in3 = (bins == top3_idx[2]) & keep3
    return ok & (in1 | in2 | in3)


# ---------------------------------------------------------------------------
# Candidate gates
# ---------------------------------------------------------------------------

def window_gate(query_uv: jnp.ndarray, kp_xy: jnp.ndarray,
                radius: jnp.ndarray) -> jnp.ndarray:
    """[N_query, N_kp] True where kp within +-radius box of query point
    (the reference's GetFeaturesInArea grid query, src/Frame.cc:327-393)."""
    dx = jnp.abs(query_uv[:, None, 0] - kp_xy[None, :, 0])
    dy = jnp.abs(query_uv[:, None, 1] - kp_xy[None, :, 1])
    r = radius if radius.ndim == 1 else radius
    return (dx <= r[:, None]) & (dy <= r[:, None])


def level_gate(query_level: jnp.ndarray, kp_level: jnp.ndarray,
               min_delta: int = 0, max_delta: int = 1) -> jnp.ndarray:
    """[N_query, N_kp] scale-band gate: kp_level in
    [query_level + min_delta, query_level + max_delta]."""
    d = kp_level[None, :] - query_level[:, None]
    return (d >= min_delta) & (d <= max_delta)


def stereo_gate(query_ur: jnp.ndarray, kp_ur: jnp.ndarray,
                radius: jnp.ndarray) -> jnp.ndarray:
    """Right-image column agreement for stereo/RGB-D points
    (reference: src/ORBmatcher.cc:1413-1417). kp_ur < 0 = monocular kp
    (always passes)."""
    d = jnp.abs(query_ur[:, None] - kp_ur[None, :])
    return (kp_ur[None, :] < 0) | (d <= radius[:, None])


def epipolar_gate(kp1_xy: jnp.ndarray, kp2_xy: jnp.ndarray,
                  F12: jnp.ndarray, sigma2_level2: jnp.ndarray) -> jnp.ndarray:
    """[N1, N2] Sampson-style epipolar distance gate for triangulation
    matching (reference: src/ORBmatcher.cc:140-157 CheckDistEpipolarLine,
    gate dsqr < 3.84 * sigma2 of kp2's level)."""
    ones1 = jnp.ones((kp1_xy.shape[0], 1), dtype=kp1_xy.dtype)
    x1 = jnp.concatenate([kp1_xy, ones1], axis=1)          # [N1, 3]
    lines = x1 @ F12.T                                      # epilines in img2
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]   # [N1, 1] each
    den = a * a + b * b
    dist_num = a * kp2_xy[None, :, 0] + b * kp2_xy[None, :, 1] + c
    dsqr = dist_num * dist_num / jnp.where(den < 1e-12, 1e-12, den)
    return dsqr < 3.84 * sigma2_level2[None, :]
