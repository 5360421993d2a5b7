"""Sim3 RANSAC solver + Sim3 optimization for loop closing.

Replaces Sim3Solver (reference: src/Sim3Solver.cc, 425 LoC — Horn
closed-form over 3-point RANSAC samples with both-direction reprojection
checks) and Optimizer::OptimizeSim3 (reference: src/Optimizer.cc:
1046-1241 — one Sim3 vertex, forward/backward projection edges, inlier
pruning).

TPU shape: all RANSAC hypotheses solved at once (vmapped Horn), scored
jointly; the Sim3 refinement is a small LM on the 7-dim tangent using
jax.jacfwd for exact Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sim3
from ..geom.camera import PinholeCamera
from . import horn


class Sim3RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def sim3_ransac(cam: PinholeCamera, X1, X2, level_sigma2_1, level_sigma2_2,
                valid, key, n_hypotheses: int = 256, fix_scale: bool = False,
                min_inliers: int = 20) -> Sim3RansacResult:
    """Estimate S12 (maps camera-2-frame points into camera 1) from paired
    camera-frame points X1, X2 [N, 3].

    The inlier check is the reference's two-direction reprojection error
    gate: project S12*X2 into image 1 and S21*X1 into image 2, threshold
    9.21 * sigma2 each (reference: src/Sim3Solver.cc:340-365 CheckInliers,
    th2 = 9.210)."""
    N = X1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(3,))
    )(jax.random.split(key, n_hypotheses))

    def solve_one(ids):
        R, t, s = horn.absolute_orientation(X2[ids], X1[ids],
                                            with_scale=not fix_scale)
        return R, t, s

    Rs, ts, ss = jax.vmap(solve_one)(idx)           # S12 hypotheses

    def proj(X):
        z = jnp.where(jnp.abs(X[..., 2]) < 1e-9, 1e-9, X[..., 2])
        return jnp.stack([cam.fx * X[..., 0] / z + cam.cx,
                          cam.fy * X[..., 1] / z + cam.cy], axis=-1)

    # forward: S12 X2 vs proj of X1
    X2in1 = (ss[:, None, None] * jnp.einsum("hij,nj->hni", Rs, X2)
             + ts[:, None, :])
    e1 = proj(X2in1) - proj(X1)[None]
    # backward: S21 X1 vs proj of X2
    Rt = jnp.swapaxes(Rs, -1, -2)
    s_inv = 1.0 / ss
    t_inv = -s_inv[:, None] * jnp.einsum("hij,hj->hi", Rt, ts)
    X1in2 = (s_inv[:, None, None] * jnp.einsum("hij,nj->hni", Rt, X1)
             + t_inv[:, None, :])
    e2 = proj(X1in2) - proj(X2)[None]

    th = 9.210
    inl = (
        (jnp.sum(e1 * e1, axis=-1) < th * level_sigma2_1[None, :])
        & (jnp.sum(e2 * e2, axis=-1) < th * level_sigma2_2[None, :])
        & (X2in1[..., 2] > 0) & (X1in2[..., 2] > 0)
        & valid[None, :]
    )
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    n = counts[best]
    return Sim3RansacResult(R=Rs[best], t=ts[best], s=ss[best],
                            inliers=inl[best],
                            n_inliers=n.astype(jnp.int32),
                            ok=n >= min_inliers)


sim3_ransac_jit = jax.jit(sim3_ransac, static_argnums=(0, 7, 8, 9))


class Sim3OptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def optimize_sim3(cam: PinholeCamera, R0, t0, s0, X1, X2, uv1, uv2,
                  inv_sigma2_1, inv_sigma2_2, valid,
                  fix_scale: bool = False, iters: int = 20,
                  chi2_th: float = 9.999) -> Sim3OptResult:
    """LM refinement of S12 with forward/backward projection residuals
    (reference: src/Optimizer.cc:1046-1241; huber delta sqrt(10),
    two-round inlier pruning)."""

    # left-multiplicative update: S = exp(xi) * S0
    def apply(xi, R, t, s):
        dR, dt, ds = sim3.exp(xi)
        return sim3.compose(dR, dt, ds, R, t, s)

    def proj(X):
        z = jnp.where(jnp.abs(X[..., 2]) < 1e-9, 1e-9, X[..., 2])
        return jnp.stack([cam.fx * X[..., 0] / z + cam.cx,
                          cam.fy * X[..., 1] / z + cam.cy], axis=-1)

    def residuals(params, active):
        R, t, s = params
        X2in1 = sim3.act(R, t, s, X2)
        Ri, ti, si = sim3.inverse(R, t, s)
        X1in2 = sim3.act(Ri, ti, si, X1)
        e1 = (proj(X2in1) - uv1) * jnp.sqrt(inv_sigma2_1)[:, None]
        e2 = (proj(X1in2) - uv2) * jnp.sqrt(inv_sigma2_2)[:, None]
        w = active.astype(jnp.float32)
        return e1 * w[:, None], e2 * w[:, None]

    def chi2(params):
        R, t, s = params
        X2in1 = sim3.act(R, t, s, X2)
        Ri, ti, si = sim3.inverse(R, t, s)
        X1in2 = sim3.act(Ri, ti, si, X1)
        c1 = jnp.sum((proj(X2in1) - uv1) ** 2, -1) * inv_sigma2_1
        c2 = jnp.sum((proj(X1in2) - uv2) ** 2, -1) * inv_sigma2_2
        return c1, c2

    def total(params, active):
        e1, e2 = residuals(params, active)
        return jnp.sum(e1 * e1) + jnp.sum(e2 * e2)

    def lm(params, active, n_iters):
        def body(_, carry):
            (R, t, s), lam = carry

            def f(xi):
                Rn, tn, sn = apply(xi[None], R[None], t[None], s[None])
                e1, e2 = residuals((Rn[0], tn[0], sn[0]), active)
                return jnp.concatenate([e1.reshape(-1), e2.reshape(-1)])

            xi0 = jnp.zeros(7)
            J = jax.jacfwd(f)(xi0)                  # [2N*2, 7]
            r = f(xi0)
            if fix_scale:
                J = J.at[:, 6].set(0.0)
            H = J.T @ J + lam * jnp.eye(7)
            g = -J.T @ r
            dx = jnp.linalg.solve(H, g)
            if fix_scale:
                dx = dx.at[6].set(0.0)
            Rn, tn, sn = apply(dx[None], R[None], t[None], s[None])
            new = (Rn[0], tn[0], sn[0])
            better = total(new, active) < total((R, t, s), active)
            out = tuple(jnp.where(better, a, b) for a, b in zip(new, (R, t, s)))
            lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return out, lam

        (R, t, s), _ = jax.lax.fori_loop(0, n_iters, body,
                                         (params, jnp.float32(1e-4)))
        return R, t, s

    params = (R0, t0, s0)
    active = valid
    params = lm(params, active, iters // 2)
    c1, c2 = chi2(params)
    active = valid & (c1 < chi2_th) & (c2 < chi2_th)
    params = lm(params, active, iters)
    c1, c2 = chi2(params)
    inl = valid & (c1 < chi2_th) & (c2 < chi2_th)
    R, t, s = params
    return Sim3OptResult(R=R, t=t, s=s, inliers=inl,
                         n_inliers=inl.sum().astype(jnp.int32))


optimize_sim3_jit = jax.jit(optimize_sim3, static_argnums=(0, 11, 12, 13))
