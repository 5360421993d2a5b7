"""Distributed bundle adjustment over a device mesh.

The SLAM-native model parallelism (SURVEY.md §2.4 / BASELINE.json north
star): partition map points (and their observations) across devices —
landmark marginalization (Hpp^-1) is embarrassingly parallel per owner
shard, while the reduced camera system is psum-reduced over the mesh so
every device sees identical camera updates. The CG matvec's only
communication is the [K, 6] camera-vector all-reduce per iteration,
riding ICI.

Observation-to-shard assignment keeps every observation of a point on
the point's owner device, so Hpp never crosses the interconnect.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geom.camera import PinholeCamera
from ..optim import global_ba as gba


def shard_problem(prob: gba.GBAProblem, n_shards: int
                  ) -> Tuple[gba.GBAProblem, np.ndarray]:
    """Re-layout a GBAProblem so points and their observations are
    contiguous per shard. Returns (sharded problem with leading dims
    divisible by n_shards, point permutation used)."""
    P_total = prob.X.shape[0]
    O_total = prob.cam_idx.shape[0]
    pnt = np.asarray(prob.pnt_idx)
    valid = np.asarray(prob.obs_valid)

    # owner of point p = p mod n_shards -> permute points so each shard's
    # points are contiguous
    P_pad = (P_total + n_shards - 1) // n_shards * n_shards
    owner = np.arange(P_pad) % n_shards
    perm = np.argsort(owner, kind="stable")         # points ordered by shard
    inv_perm = np.argsort(perm)

    X = np.zeros((P_pad, 3), np.float32)
    X[:P_total] = np.asarray(prob.X)
    X = X[perm]
    new_pnt = inv_perm[pnt]

    # order observations by owner shard
    obs_owner = owner[pnt]
    obs_order = np.argsort(np.where(valid, obs_owner, n_shards),
                           kind="stable")
    per_shard = [np.nonzero(valid & (obs_owner == s))[0]
                 for s in range(n_shards)]
    max_per = max(max(len(s) for s in per_shard), 1)
    O_shard = ((max_per + 7) // 8) * 8
    cam_i = np.zeros((n_shards, O_shard), np.int32)
    pnt_i = np.zeros((n_shards, O_shard), np.int32)
    uv = np.zeros((n_shards, O_shard, 2), np.float32)
    ur = np.full((n_shards, O_shard), -1.0, np.float32)
    iv = np.ones((n_shards, O_shard), np.float32)
    ov = np.zeros((n_shards, O_shard), bool)
    for s, idx in enumerate(per_shard):
        n = len(idx)
        cam_i[s, :n] = np.asarray(prob.cam_idx)[idx]
        pnt_i[s, :n] = new_pnt[idx]
        uv[s, :n] = np.asarray(prob.uv)[idx]
        ur[s, :n] = np.asarray(prob.ur)[idx]
        iv[s, :n] = np.asarray(prob.inv_sigma2)[idx]
        ov[s, :n] = True
    # local point indices within the shard
    pts_per = P_pad // n_shards
    pnt_local = pnt_i - (np.arange(n_shards, dtype=np.int32)[:, None]
                         * pts_per)

    sharded = gba.GBAProblem(
        R=prob.R, t=prob.t,
        X=jnp.asarray(X),
        cam_free=prob.cam_free,
        cam_idx=jnp.asarray(cam_i.reshape(-1)),
        pnt_idx=jnp.asarray(pnt_local.reshape(-1)),
        uv=jnp.asarray(uv.reshape(-1, 2)),
        ur=jnp.asarray(ur.reshape(-1)),
        inv_sigma2=jnp.asarray(iv.reshape(-1)),
        obs_valid=jnp.asarray(ov.reshape(-1)),
    )
    return sharded, perm


@functools.lru_cache(maxsize=16)
def _dist_gba_fn(cam: PinholeCamera, mesh: Mesh, axis: str,
                 iters: int, cg_iters: int):
    """Build + jit the sharded GBA program ONCE per (cam, mesh, config).

    The shard_map closure must be cached at module level: a fresh
    closure per call has an empty jit cache, so every loop-closure GBA
    chunk would re-trace and re-compile the whole LM loop (measured:
    ~10 s per call on a virtual mesh vs sub-ms steady state)."""
    # fields passed positionally: flat specs sidestep NamedTuple-vs-tuple
    # pytree-structure mismatches in shard_map spec matching
    in_specs = (P(), P(), P(axis), P(),
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis))
    out_specs = (P(), P(), P(axis), P(axis), P())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    def run(*fields):
        p = gba.GBAProblem(*fields)
        res = gba.global_ba_inner(cam, p, iters, cg_iters, True, axis)
        return tuple(res)

    return jax.jit(run)


def distributed_global_ba(cam: PinholeCamera, prob: gba.GBAProblem,
                          mesh: Mesh, axis: str = "data",
                          iters: int = 10, cg_iters: int = 16
                          ) -> gba.GBAResult:
    """Run global BA with points + observations sharded over `axis`.

    `prob` must already be laid out by shard_problem for
    mesh.shape[axis] shards. Cameras are replicated; the per-CG-iteration
    collective is one [K, 6] psum.
    """
    run = _dist_gba_fn(cam, mesh, axis, iters, cg_iters)
    return gba.GBAResult(*run(*prob))


@functools.lru_cache(maxsize=16)
def _dist_gba_chunk_fn(cam: PinholeCamera, mesh: Mesh, axis: str,
                       iters: int, cg_iters: int):
    """Jitted sharded LM chunk, cached per (cam, mesh, config) — see
    _dist_gba_fn for why module-level caching is load-bearing."""
    in_specs = (P(), P(), P(axis), P(),
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P())
    out_specs = ((P(), P(), P(axis), P(),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
                 P(), P())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    def run(*fields):
        p = gba.GBAProblem(*fields[:-1])
        p_out, lam, n_done = gba._lm_loop(cam, p, iters, cg_iters, True,
                                          axis, fields[-1])
        return tuple(p_out), lam, n_done

    return jax.jit(run)


def distributed_global_ba_chunk(cam: PinholeCamera, prob: gba.GBAProblem,
                                mesh: Mesh, axis: str = "data",
                                iters: int = 5, cg_iters: int = 16,
                                lam0=1e-5):
    """Chunked distributed GBA for the background worker: same semantics
    as gba.global_ba_chunk (damping carried across chunks, chi2-plateau
    early exit) but with points/observations sharded over the mesh and
    camera reductions psummed over ICI. Returns
    (sharded problem with updated R/t/X, lam_out, n_iters_done)."""
    run = _dist_gba_chunk_fn(cam, mesh, axis, iters, cg_iters)
    out, lam, n_done = run(*prob, jnp.asarray(lam0, jnp.float32))
    return gba.GBAProblem(*out), lam, n_done


def run_distributed_global_ba(cfg, map_store, mesh: Mesh,
                              axis: str = "data", fixed_kf: int = 0,
                              iters: int = 10):
    """Host-side: assemble from the map store, shard, run, write back."""
    from ..optim.global_ba import GBAProblem

    m = map_store
    kfs = m.keyframe_ids()
    mids = m.point_ids()
    if len(kfs) < 2 or len(mids) < 10:
        return
    # reuse the single-chip assembly then re-layout
    import io as _io
    from ..optim import global_ba as g

    # build flat problem (duplicated logic kept in g.run_global_ba; here we
    # assemble directly to avoid running the single-chip solve)
    K = len(kfs)
    kf_slot = np.full(m.K, -1, np.int64)
    kf_slot[kfs] = np.arange(K)
    Pn = len(mids)
    mp_slot = np.full(m.M, -1, np.int64)
    mp_slot[mids] = np.arange(Pn)
    inv_sigma2_tab = 1.0 / np.asarray(cfg.orb.level_sigma2, np.float32)
    cam_i, pnt_i, uvs, urs, ivs = [], [], [], [], []
    for k in kfs:
        obs = m.kf_obs[k]
        kp = np.nonzero((obs >= 0) & (mp_slot[np.clip(obs, 0, None)] >= 0))[0]
        if len(kp) == 0:
            continue
        cam_i.append(np.full(len(kp), kf_slot[k]))
        pnt_i.append(mp_slot[obs[kp]])
        uvs.append(m.kf_xy[k][kp])
        urs.append(m.kf_ur[k][kp])
        ivs.append(inv_sigma2_tab[m.kf_level[k][kp]])
    cam_i = np.concatenate(cam_i).astype(np.int32)
    pnt_i = np.concatenate(pnt_i).astype(np.int32)
    cam_free = np.ones(K, bool)
    if fixed_kf >= 0 and kf_slot[fixed_kf] >= 0:
        cam_free[kf_slot[fixed_kf]] = False
    prob = GBAProblem(
        R=jnp.asarray(m.kf_R[kfs]), t=jnp.asarray(m.kf_t[kfs]),
        X=jnp.asarray(m.mp_pos[mids]), cam_free=jnp.asarray(cam_free),
        cam_idx=jnp.asarray(cam_i), pnt_idx=jnp.asarray(pnt_i),
        uv=jnp.asarray(np.concatenate(uvs, dtype=np.float32)),
        ur=jnp.asarray(np.concatenate(urs, dtype=np.float32)),
        inv_sigma2=jnp.asarray(np.concatenate(ivs, dtype=np.float32)),
        obs_valid=jnp.ones(len(cam_i), dtype=bool),
    )
    n = mesh.shape[axis]
    sharded, perm = shard_problem(prob, n)
    res = distributed_global_ba(cfg.camera, sharded, mesh, axis, iters)
    m.kf_R[kfs] = np.asarray(res.R)
    m.kf_t[kfs] = np.asarray(res.t)
    X_out = np.asarray(res.X)
    inv_perm = np.argsort(perm)
    m.mp_pos[mids] = X_out[inv_perm][:Pn]
    m.mark_all_points_dirty()
    m.version += 1
