"""Data-parallel frontend: batched ORB extraction over a device mesh.

The reference's only data parallelism is the 2-way stereo extraction
thread pair (reference: src/Frame.cc:78-81). On TPU the natural form is
frame-level batching — vmapped extraction sharded over the mesh "data"
axis, used by offline mapping / multi-session ingestion, and by the
scaling-efficiency benchmark (frames/s at N devices vs 1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ORBConfig
from ..ops import orb


@functools.partial(jax.jit, static_argnums=(1,))
def extract_batch(images: jnp.ndarray, cfg: ORBConfig) -> orb.Keypoints:
    """[B, H, W] -> batched Keypoints (leading dim B). Pure vmap — under
    jit with sharded inputs XLA partitions it over the batch."""
    return jax.vmap(lambda im: orb.extract(im, cfg))(images)


@functools.lru_cache(maxsize=16)
def _sharded_extract_fn(cfg: ORBConfig, mesh: Mesh, axis: str):
    """jit-compiled shard_map extractor, cached per (cfg, mesh) — an
    unjitted shard_map re-traces eagerly on every call."""

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=P(axis),
                       out_specs=(P(axis),) * 6,
                       check_vma=False)
    def run(imgs):
        return tuple(jax.vmap(lambda im: orb.extract(im, cfg))(imgs))

    return run


def extract_batch_sharded(images, cfg: ORBConfig, mesh: Mesh,
                          axis: str = "data") -> orb.Keypoints:
    """Explicitly shard the batch over `axis` and extract per-device."""
    images = jax.device_put(images, NamedSharding(mesh, P(axis)))
    run = _sharded_extract_fn(cfg, mesh, axis)
    return orb.Keypoints(*run(images))
