"""Fused fixed-shape device programs for the local-mapping stage.

The reference's CreateNewMapPoints / SearchInNeighbors inner loops
(reference: src/LocalMapping.cc:207-452, :454-534 + the epipolar and Fuse
matchers in src/ORBmatcher.cc) are per-point CPU loops; here each
neighbor interaction is ONE jitted program over the full keypoint
capacity with masks — static shapes, so XLA compiles each program once
for the whole run (data-dependent gathers would recompile per call and
stall the pipeline for tens of seconds per keyframe on a real chip).

Host code slices the per-call results with numpy masks afterwards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..geom import se3
from ..ops import matching
from ..optim import triangulate


class TriangulatePairResult(NamedTuple):
    kp2_idx: jnp.ndarray   # [N] matched keypoint in KF2 per KF1 keypoint
    ok: jnp.ndarray        # [N] match accepted + all gates passed
    X: jnp.ndarray         # [N, 3] triangulated world points


@functools.partial(jax.jit, static_argnums=(0,))
def triangulate_pair(cfg: SystemConfig, R1, t1, R2, t2,
                     xy1, level1, desc1, free1, ur1,
                     xy2, level2, desc2, free2, ur2
                     ) -> TriangulatePairResult:
    """Epipolar-gated matching + DLT triangulation + acceptance gates for
    one keyframe/neighbor pair, all shapes fixed at keypoint capacity
    (reference: src/LocalMapping.cc:207-452 with SearchForTriangulation,
    src/ORBmatcher.cc:657-823)."""
    cam = cfg.camera
    lcfg = cfg.local_mapping
    sigma2 = jnp.asarray(cfg.orb.level_sigma2, jnp.float32)

    # fundamental matrix F12 (reference: src/LocalMapping.cc:536-553)
    R12 = R1 @ R2.T
    t12 = -R12 @ t2 + t1
    t12x = jnp.stack([
        jnp.stack([jnp.float32(0), -t12[2], t12[1]]),
        jnp.stack([t12[2], jnp.float32(0), -t12[0]]),
        jnp.stack([-t12[1], t12[0], jnp.float32(0)]),
    ])
    Kinv = jnp.linalg.inv(cam.K)
    F12 = Kinv.T @ t12x @ R12 @ Kinv

    gate = (matching.epipolar_gate(xy1, xy2, F12.T, sigma2[level2])
            & free1[:, None] & free2[None, :])
    res = matching.gated_nn(desc1, desc2, gate, max_dist=50.0)
    ok = matching.resolve_duplicates(res.idx, res.dist, res.ok,
                                     xy2.shape[0])

    P1 = triangulate.projection_matrix(cam, R1, t1)
    P2 = triangulate.projection_matrix(cam, R2, t2)
    xy2_m = xy2[res.idx]
    X = triangulate.triangulate_dlt(P1, P2, xy1, xy2_m)
    good = triangulate.acceptance_gates(
        cam, R1, t1, R2, t2, X, xy1, xy2_m, ur1, ur2[res.idx],
        sigma2[level1], sigma2[level2[res.idx]],
        chi2_mono=lcfg.chi2_mono, chi2_stereo=lcfg.chi2_stereo)
    return TriangulatePairResult(kp2_idx=res.idx, ok=ok & good, X=X)


class FuseMatchResult(NamedTuple):
    kp_idx: jnp.ndarray    # [C] matched keypoint per candidate point
    ok: jnp.ndarray        # [C]


@functools.partial(jax.jit, static_argnums=(0, 12))
def fuse_match(cfg: SystemConfig, R, t, mp_pos, mp_desc,
               mp_min_dist, mp_max_dist, mp_valid,
               kf_xy, kf_level, kf_valid, kf_desc,
               th: float = 3.0) -> FuseMatchResult:
    """Project candidate map points into a keyframe and match against its
    keypoints (reference Fuse, src/ORBmatcher.cc:825-975): frustum +
    distance band + predicted-scale window + level band + Hamming NN.
    Candidate arrays are padded to a bucket size so jit caches per
    bucket, not per call.

    With th=10 and an Scw normalized to SE3 (R, t/s) this is also the
    loop-closing SearchByProjection (reference: src/ORBmatcher.cc:290-403
    + src/LoopClosing.cc:376-386), which decomposes Scw the same way."""
    cam = cfg.camera
    n_levels = cfg.orb.n_levels
    sf = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    log_sf = jnp.log(jnp.float32(cfg.orb.scale_factor))

    Xc = se3.act(R, t, mp_pos)
    z = Xc[..., 2]
    zs = jnp.maximum(z, 1e-9)
    u = cam.fx * Xc[..., 0] / zs + cam.cx
    v = cam.fy * Xc[..., 1] / zs + cam.cy
    Rwc, twc = se3.inverse(R, t)
    dist = jnp.linalg.norm(mp_pos - twc[None, :], axis=-1)
    visible = (mp_valid & (z > 0.05)
               & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
               & (dist >= 0.8 * mp_min_dist) & (dist <= 1.2 * mp_max_dist))

    ratio = jnp.maximum(mp_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    pred = jnp.clip(jnp.ceil(jnp.log(ratio) / log_sf).astype(jnp.int32),
                    0, n_levels - 1)
    radius = th * sf[pred]

    uvq = jnp.stack([u, v], axis=1)
    gate = (matching.window_gate(uvq, kf_xy, radius)
            & matching.level_gate(pred, kf_level, min_delta=-1, max_delta=0)
            & visible[:, None] & kf_valid[None, :])
    res = matching.gated_nn(mp_desc, kf_desc, gate, max_dist=50.0)
    keep = matching.resolve_duplicates(res.idx, res.dist, res.ok,
                                       kf_xy.shape[0])
    return FuseMatchResult(kp_idx=res.idx, ok=keep)


@functools.partial(jax.jit, static_argnums=(0,))
def triangulate_pairs_batch(cfg: SystemConfig, R1, t1,
                            xy1, level1, desc1, free1, ur1,
                            R2s, t2s, xy2s, level2s, desc2s, free2s,
                            ur2s) -> TriangulatePairResult:
    """All neighbor pairs in ONE dispatch (vmap over the neighbor axis).
    On networked TPU deployments each blocking download costs a proxy
    round trip, so the per-neighbor loop synchronizes once for the whole
    batch instead of once per neighbor. Results carry a [B] leading axis;
    the host consumes them in neighbor order and drops keypoints already
    consumed by an earlier pair (the sequential free1 update of
    reference src/LocalMapping.cc:207-452, applied post hoc)."""
    return jax.vmap(
        lambda R2, t2, xy2, level2, desc2, free2, ur2:
        triangulate_pair(cfg, R1, t1, R2, t2, xy1, level1, desc1, free1,
                         ur1, xy2, level2, desc2, free2, ur2)
    )(R2s, t2s, xy2s, level2s, desc2s, free2s, ur2s)


@functools.partial(jax.jit, static_argnums=(0,))
def fuse_match_batch(cfg: SystemConfig, Rs, ts, mp_pos, mp_desc,
                     mp_min_dist, mp_max_dist, mp_valid,
                     kf_xys, kf_levels, kf_valids, kf_descs
                     ) -> FuseMatchResult:
    """Fuse the same candidate point set into MANY keyframes in ONE
    dispatch (vmap over the keyframe axis) — the forward direction of
    SearchInNeighbors (reference: src/LocalMapping.cc:454-534) without a
    per-target host sync."""
    return jax.vmap(
        lambda R, t, kf_xy, kf_level, kf_valid, kf_desc:
        fuse_match(cfg, R, t, mp_pos, mp_desc, mp_min_dist, mp_max_dist,
                   mp_valid, kf_xy, kf_level, kf_valid, kf_desc)
    )(Rs, ts, kf_xys, kf_levels, kf_valids, kf_descs)


class Sim3SearchResult(NamedTuple):
    match12: jnp.ndarray   # [N1] int32: agreed keypoint in KF2 (-1 = none)
    ok: jnp.ndarray        # [N1] bool


@functools.partial(jax.jit, static_argnums=(0,))
def search_by_sim3(cfg: SystemConfig, R12, t12, s12,
                   Xc1, has1, desc1, level1, mind1, maxd1, xy1, already1,
                   Xc2, has2, desc2, level2, mind2, maxd2, xy2, already2,
                   ) -> Sim3SearchResult:
    """Sim3-guided match widening between two keyframes (reference:
    src/ORBmatcher.cc:1102-1326 SearchBySim3, th=7.5): transform each
    KF's bound map points into the other camera with the estimated S12
    (and S21 = S12^-1), project, gate by scale band / predicted level /
    radius, Hamming-NN both directions, and keep mutual agreements.

    Inputs are per-keypoint arrays at full capacity: XcK = camera-K-frame
    position of the map point bound to each keypoint, hasK = bound & alive,
    alreadyK = keypoint participates in an existing match (kept as-is)."""
    cam = cfg.camera
    n_levels = cfg.orb.n_levels
    sf = jnp.asarray(cfg.orb.scale_factors, jnp.float32)
    log_sf = jnp.log(jnp.float32(cfg.orb.scale_factor))
    th = 7.5

    sR12 = s12 * R12
    sR21 = (1.0 / s12) * R12.T
    t21 = -sR21 @ t12

    def one_direction(Xc_src, src_ok, desc_src, mind, maxd,
                      sR, tt, xy_dst, level_dst, dst_ok, desc_dst):
        Xc = Xc_src @ sR.T + tt
        z = Xc[..., 2]
        zs = jnp.maximum(z, 1e-9)
        u = cam.fx * Xc[..., 0] / zs + cam.cx
        v = cam.fy * Xc[..., 1] / zs + cam.cy
        dist = jnp.linalg.norm(Xc, axis=-1)   # ref: dist3D = |p3Dc|
        visible = (src_ok & (z > 0.0)
                   & (u >= 0) & (u < cam.width)
                   & (v >= 0) & (v < cam.height)
                   & (dist >= 0.8 * mind) & (dist <= 1.2 * maxd))
        ratio = jnp.maximum(maxd, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.clip(jnp.ceil(jnp.log(ratio) / log_sf)
                        .astype(jnp.int32), 0, n_levels - 1)
        radius = th * sf[pred]
        gate = (matching.window_gate(jnp.stack([u, v], 1), xy_dst, radius)
                & matching.level_gate(pred, level_dst,
                                      min_delta=-1, max_delta=0)
                & visible[:, None] & dst_ok[None, :])
        res = matching.gated_nn(desc_src, desc_dst, gate, max_dist=100.0)
        return jnp.where(res.ok & visible, res.idx, -1)

    m12 = one_direction(Xc1, has1 & ~already1, desc1, mind1, maxd1,
                        sR21, t21, xy2, level2, has2 & ~already2, desc2)
    m21 = one_direction(Xc2, has2 & ~already2, desc2, mind2, maxd2,
                        sR12, t12, xy1, level1, has1 & ~already1, desc1)

    # mutual agreement (reference :1300-1320)
    n1 = Xc1.shape[0]
    back = m21[jnp.clip(m12, 0, None)]
    agree = (m12 >= 0) & (back == jnp.arange(n1, dtype=m21.dtype))
    return Sim3SearchResult(match12=jnp.where(agree, m12, -1), ok=agree)


def bucket_size(n: int, minimum: int = 1024) -> int:
    """Next power-of-two bucket >= n (bounds the number of distinct
    compiled shapes for variable-length candidate sets)."""
    b = minimum
    while b < n:
        b *= 2
    return b
