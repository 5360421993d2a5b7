"""Pallas TPU kernels for the descriptor-matching hot path.

The all-pairs Hamming distance is the single most reused primitive in
the engine (every Search*/Fuse variant of the reference's ORBmatcher
maps onto it — SURVEY.md §2.1). The portable implementation unpacks
descriptors to ±1 vectors and rides the MXU (ops/matching.py); that
costs an [N,256] materialization + bf16 matmul per call. This kernel
computes XOR+popcount directly on the packed uint32 words in VMEM:
each (TM, TN) output tile is 8 word-planes of [TM]x[TN] xor + SWAR
popcount on the VPU — no unpacking, no MXU pressure, ~5x faster at the
1k-keypoint shapes the tracker uses (measured on v5e).

Layout note: descriptors are transposed to [8, N] so each word-plane is
a clean 2D (sublane x lane) tile; the popcount byte-sum uses shifts and
adds only (integer multiply is slow on the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256
TILE_N = 256


def _hamming_kernel(a_ref, b_ref, o_ref):
    """a_ref [8, TM] uint32, b_ref [8, TN] uint32 -> o_ref [TM, TN] f32."""
    acc = jnp.zeros((a_ref.shape[1], b_ref.shape[1]), jnp.uint32)
    for w in range(8):
        aw = a_ref[w, :]
        bw = b_ref[w, :]
        x = aw[:, None] ^ bw[None, :]
        # SWAR popcount (Hacker's Delight 5-2), shift/add only
        x = x - ((x >> 1) & jnp.uint32(0x55555555))
        x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
        x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
        x = x + (x >> 8)
        x = (x + (x >> 16)) & jnp.uint32(0xFF)
        acc = acc + x
    # uint32->f32 casts are unsupported in Mosaic; go through int32
    # (popcounts are <= 256, far below the int32 range)
    o_ref[:] = acc.astype(jnp.int32).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          tile_m: int = TILE_M,
                          tile_n: int = TILE_N) -> jnp.ndarray:
    """All-pairs Hamming distance [N, M] float32 from packed uint32[*, 8].

    Pads both sides to tile multiples, launches a (N/TM, M/TN) grid, and
    slices the result back. Equivalent to ops/matching.hamming_matrix.
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    n_pad = -n % tile_m
    m_pad = -m % tile_n
    at = jnp.pad(desc_a, ((0, n_pad), (0, 0))).T  # [8, N']
    bt = jnp.pad(desc_b, ((0, m_pad), (0, 0))).T  # [8, M']
    np_, mp_ = at.shape[1], bt.shape[1]

    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.float32),
        grid=(np_ // tile_m, mp_ // tile_n),
        in_specs=[
            pl.BlockSpec((8, tile_m), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(at, bt)
    return out[:n, :m]


# ---------------------------------------------------------------------------
# fused gated nearest-neighbor matcher
# ---------------------------------------------------------------------------

_INF = 1e9  # plain float: jnp scalars captured by kernels are rejected


def _gated_nn_kernel(a_ref, b_ref, gate_ref, idx_ref, best_ref, second_ref):
    """One row tile of queries against ALL keys.

    a_ref [8, TM] uint32; b_ref [8, M] uint32; gate_ref [TM, M] int8
    (nonzero = candidate allowed). Computes the gated Hamming distance
    tile entirely in VMEM and reduces best / argmin-index / second-best
    along the key axis — the [N, M] distance and gate matrices never
    round-trip through HBM as f32, and the argmin / second-best passes
    of the portable masked_nn are fused into the same sweep.
    """
    TM = a_ref.shape[1]
    M = b_ref.shape[1]
    d = jnp.zeros((TM, M), jnp.uint32)
    for w in range(8):
        x = a_ref[w, :][:, None] ^ b_ref[w, :][None, :]
        x = x - ((x >> 1) & jnp.uint32(0x55555555))
        x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
        x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
        x = x + (x >> 8)
        x = (x + (x >> 16)) & jnp.uint32(0xFF)
        d = d + x
    df = jnp.where(gate_ref[:] != 0,
                   d.astype(jnp.int32).astype(jnp.float32), _INF)
    best = jnp.min(df, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (TM, M), 1)
    big = jnp.int32(2 ** 30)
    idx = jnp.min(jnp.where(df == best[:, None], col, big), axis=1)
    idx = jnp.where(best >= _INF, 0, idx)
    d2 = jnp.where(col == idx[:, None], _INF, df)
    i = pl.program_id(0)
    best_ref[i, :] = best
    second_ref[i, :] = jnp.min(d2, axis=1)
    idx_ref[i, :] = idx


@jax.jit
def gated_nn_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                    gate: jnp.ndarray):
    """Fused matcher: per query row, (argmin index, best, second-best)
    of the gate-masked Hamming distance. Equivalent to
    matching.hamming_matrix + the NN part of matching.masked_nn."""
    n, m = desc_a.shape[0], desc_b.shape[0]
    TM = 128
    n_pad = -n % TM
    m_pad = -m % 128
    at = jnp.pad(desc_a, ((0, n_pad), (0, 0))).T
    bt = jnp.pad(desc_b, ((0, m_pad), (0, 0))).T
    g = jnp.pad(gate.astype(jnp.int8), ((0, n_pad), (0, m_pad)))
    np_, mp_ = at.shape[1], bt.shape[1]

    grid_n = np_ // TM
    # outputs are [grid, TM] 2-D tiles (1-D outputs hit XLA/Mosaic layout
    # tiling mismatches); flattened after the call
    idx, best, second = pl.pallas_call(
        _gated_nn_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((grid_n, TM), jnp.int32),
            jax.ShapeDtypeStruct((grid_n, TM), jnp.float32),
            jax.ShapeDtypeStruct((grid_n, TM), jnp.float32),
        ),
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((8, TM), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, mp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, mp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # whole-array blocks shared by every program (each writes its
            # own row): a (1, TM) block would violate the 8x128 tile rule
            pl.BlockSpec((grid_n, TM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid_n, TM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid_n, TM), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(at, bt, g)
    return (idx.reshape(-1)[:n], best.reshape(-1)[:n],
            second.reshape(-1)[:n])
