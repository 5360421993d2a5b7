"""Trajectory-axis sharded pose-graph (essential-graph) optimization.

The SLAM analogue of sequence parallelism (SURVEY.md §5.7): the
"sequence" is the keyframe trajectory, and the essential graph's edges
(spanning tree + strong covisibility + loop edges; reference:
src/Optimizer.cc:781-1044) partition naturally into trajectory segments.
Each device owns an edge segment, evaluates its residuals/Jacobians, and
the per-iteration reduced system H [V,7,V,7] / g [V,7] is psummed over
ICI; every device then performs the identical replicated dense solve.
Vertices (keyframe Sim3 poses) are replicated — only edge work shards.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..optim import pose_graph as pg


def shard_edges(edges_ij: np.ndarray, edges_meas, edge_valid: np.ndarray,
                n_shards: int):
    """Pad edge arrays so the leading (edge) dim divides n_shards.
    Contiguous blocks = trajectory segments when edges are in
    trajectory order (the assembly order of loop_closing)."""
    E = edges_ij.shape[0]
    E_pad = (E + n_shards - 1) // n_shards * n_shards
    Rm, tm, sm = edges_meas

    def pad(a, fill=0):
        out = np.full((E_pad,) + a.shape[1:], fill, dtype=a.dtype)
        out[:E] = a
        return out

    eye = np.zeros((E_pad, 3, 3), Rm.dtype)
    eye[:] = np.eye(3)
    eye[:E] = Rm
    return (pad(np.asarray(edges_ij)), (eye, pad(np.asarray(tm)),
                                        pad(np.asarray(sm), fill=1)),
            pad(np.asarray(edge_valid)))


@functools.lru_cache(maxsize=16)
def _dist_pg_fn(mesh: Mesh, axis: str, fix_scale: bool, iters: int):
    """Build + jit the sharded pose-graph program ONCE per (mesh,
    config): a fresh shard_map closure per call has an empty jit cache
    and re-traces/compiles the whole LM loop on every loop closure."""
    in_specs = ((P(), P(), P()),                 # poses (replicated)
                P(axis),                          # edges_ij
                (P(axis), P(axis), P(axis)),      # measurements
                P(axis), P(), P())                # valid, vv, fixed
    out_specs = (P(), P(), P())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    def run(poses, eij, meas, ev, vv, fx):
        res = pg.pose_graph_inner(poses, eij, meas, ev, vv, fx,
                                  fix_scale, iters, axis)
        return tuple(res)

    return jax.jit(run)


def distributed_pose_graph(poses, edges_ij, edges_meas, edge_valid,
                           vertex_valid, fixed, mesh: Mesh,
                           axis: str = "data", fix_scale: bool = True,
                           iters: int = 20) -> pg.PoseGraphResult:
    """Edge arrays must be pre-padded by shard_edges for
    mesh.shape[axis]. Vertices are replicated."""
    run = _dist_pg_fn(mesh, axis, fix_scale, iters)
    out = run(tuple(poses), edges_ij, tuple(edges_meas), edge_valid,
              vertex_valid, fixed)
    return pg.PoseGraphResult(*out)
