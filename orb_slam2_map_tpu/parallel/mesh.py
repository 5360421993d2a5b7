"""Device-mesh helpers for multi-chip / multi-host scaling.

The reference has no distributed backend — its parallelism is one
process's thread graph (SURVEY.md §2.4). The TPU-native scale-out story
is jax.sharding: a named Mesh over the slice, pjit/shard_map programs
with explicit collective reductions over ICI. These helpers centralize
mesh construction so apps/tests/benchmarks agree on axis names:

  * "data":  frame-level / observation-level sharding (DP analogue)
  * "map":   map-block (point) sharding for distributed BA
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",)) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), axis_names)


def make_2d_mesh(data: int, map_axis: int) -> Mesh:
    devs = np.asarray(jax.devices()[: data * map_axis])
    return Mesh(devs.reshape(data, map_axis), ("data", "map"))


def shard_leading(mesh: Mesh, axis: str, x):
    """Put an array with its leading dim sharded over `axis`."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    n = x.shape[axis]
    target = (n + multiple - 1) // multiple * multiple
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return np.pad(x, pad, constant_values=fill)
