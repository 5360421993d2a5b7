"""Essential-graph / pose-graph optimization over Sim3.

Replaces Optimizer::OptimizeEssentialGraph (reference: src/Optimizer.cc:
781-1044): Sim3 vertices (7-DoF, scale frozen for stereo/RGB-D via
`_fix_scale`), loop + spanning-tree + strong-covisibility (weight >= 100)
+ past-loop edges with identity information, ~20 iterations, then SE3
recovery t/s and landmark re-mapping through each point's reference KF.

TPU shape: residuals r_e = log_sim3(S_meas_ji * S_i * S_j^-1) for all
edges at once; per-edge 14-dim Jacobians via vmapped jacfwd (exact,
autodiff); normal equations assembled as dense [7V, 7V] scatter-adds and
solved with one Cholesky — a 512-KF graph is a 3584-dim solve, trivial
for the MXU. (Block-sparse CG is the planned scale-out path; see
parallel/dist_ba.py.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sim3


class PoseGraphResult(NamedTuple):
    R: jnp.ndarray   # [V, 3, 3] optimized S_iw rotations
    t: jnp.ndarray   # [V, 3]
    s: jnp.ndarray   # [V]


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """r = log(S_meas_ji * S_i * S_j^{-1}), [7]."""
    Rij, tij, sij = sim3.compose(Ri, ti, si, *sim3.inverse(Rj, tj, sj))
    Re, te, se = sim3.compose(Rm, tm, sm, Rij, tij, sij)
    return sim3.log(Re[None], te[None], se[None])[0]


def _edge_residual_tangent(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """Residual after left-perturbing both endpoints (for jacfwd)."""
    dRi, dti, dsi = sim3.exp(xi_i[None])
    Rii, tii, sii = sim3.compose(dRi[0], dti[0], dsi[0], Ri, ti, si)
    dRj, dtj, dsj = sim3.exp(xi_j[None])
    Rjj, tjj, sjj = sim3.compose(dRj[0], dtj[0], dsj[0], Rj, tj, sj)
    return _edge_residual(Rii, tii, sii, Rjj, tjj, sjj, Rm, tm, sm)


@functools.partial(jax.jit, static_argnums=(7, 8))
def optimize_pose_graph(poses, edges_ij, edges_meas, edge_valid,
                        vertex_valid, fixed, init_correction,
                        fix_scale: bool = True, iters: int = 20
                        ) -> PoseGraphResult:
    """Args:
      poses: (R [V,3,3], t [V,3], s [V]) current S_iw estimates
        (s=1 unless a loop correction seeded scale drift).
      edges_ij: [E, 2] int32 (i, j) vertex indices.
      edges_meas: (Rm [E,3,3], tm [E,3], sm [E]) measurements S_ji.
      edge_valid: [E] bool. vertex_valid: [V] bool. fixed: [V] bool
        (the loop keyframe, reference :820).
      init_correction: unused placeholder for corrected-pose seeding
        (pass poses already seeded, as the reference does via
        CorrectedSim3, :838-852).
    """
    return pose_graph_inner(poses, edges_ij, edges_meas, edge_valid,
                            vertex_valid, fixed, fix_scale, iters, None)


def pose_graph_inner(poses, edges_ij, edges_meas, edge_valid,
                     vertex_valid, fixed, fix_scale: bool, iters: int,
                     psum_axis) -> PoseGraphResult:
    """Traceable body shared by the single-chip jit and the shard_map
    trajectory-sharded path (parallel/dist_pose_graph.py): with
    psum_axis set, edge arrays are per-device shards (trajectory
    segments) and the assembled H/g — plus the acceptance objective —
    are all-reduced over the mesh, so every device solves the identical
    replicated system."""
    R, t, s = poses
    Rm, tm, sm = edges_meas
    V = R.shape[0]
    E = edges_ij.shape[0]

    def residual_and_jac(R, t, s):
        i = edges_ij[:, 0]
        j = edges_ij[:, 1]

        def per_edge(Ri, ti, si, Rj, tj, sj, Rme, tme, sme):
            f = lambda xi_i, xi_j: _edge_residual_tangent(
                xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rme, tme, sme)
            zero = jnp.zeros(7)
            r = f(zero, zero)
            Ji = jax.jacfwd(f, argnums=0)(zero, zero)
            Jj = jax.jacfwd(f, argnums=1)(zero, zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(
            R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm)
        return r, Ji, Jj

    def step(carry, _):
        R, t, s, lam = carry
        r, Ji, Jj = residual_and_jac(R, t, s)
        w = edge_valid.astype(jnp.float32)
        if fix_scale:
            Ji = Ji.at[:, 6, :].set(0.0).at[:, :, 6].set(0.0)
            Jj = Jj.at[:, 6, :].set(0.0).at[:, :, 6].set(0.0)
            r = r.at[:, 6].set(0.0)
        i = edges_ij[:, 0]
        j = edges_ij[:, 1]

        # assemble dense H [V,7,V,7] and g [V,7] with scatter-adds
        Hii = jnp.einsum("eai,e,eaj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eai,e,eaj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eai,e,eaj->eij", Ji, w, Jj)
        gi = -jnp.einsum("eai,e,ea->ei", Ji, w, r)
        gj = -jnp.einsum("eai,e,ea->ei", Jj, w, r)

        H = jnp.zeros((V, V, 7, 7))
        H = H.at[i, i].add(Hii)
        H = H.at[j, j].add(Hjj)
        H = H.at[i, j].add(Hij)
        H = H.at[j, i].add(jnp.swapaxes(Hij, -1, -2))
        g = jnp.zeros((V, 7)).at[i].add(gi).at[j].add(gj)
        if psum_axis is not None:
            H = jax.lax.psum(H, psum_axis)
            g = jax.lax.psum(g, psum_axis)

        free = vertex_valid & ~fixed
        diag_scale = 1.0 + lam
        H = H.at[jnp.arange(V), jnp.arange(V)].multiply(
            jnp.where(free, 1.0, 1.0)[:, None, None])
        # fix rows/cols of non-free vertices
        fmask = free.astype(H.dtype)
        H = H * fmask[:, None, None, None] * fmask[None, :, None, None]
        Hf = H.transpose(0, 2, 1, 3).reshape(V * 7, V * 7)
        # damping + identity for pinned coords
        pin = jnp.repeat(~free, 7).astype(Hf.dtype)
        if fix_scale:
            scale_coord = jnp.tile(
                jnp.arange(7) == 6, (V,)).astype(Hf.dtype)
            pin = jnp.clip(pin + scale_coord, 0.0, 1.0)
        diag = jnp.diagonal(Hf)
        Hf = Hf + jnp.diag(lam * (jnp.abs(diag) + 1e-6) + pin)
        gf = (g * fmask[:, None]).reshape(V * 7)
        if fix_scale:
            gf = gf * (1.0 - scale_coord)

        dx = jnp.linalg.solve(Hf, gf).reshape(V, 7)
        dR, dt, ds = sim3.exp(dx)
        Rn, tn, sn = sim3.compose(dR, dt, ds, R, t, s)
        Rn = jnp.where(free[:, None, None], Rn, R)
        tn = jnp.where(free[:, None], tn, t)
        sn = jnp.where(free, sn, s)

        # accept if total error decreased
        def total(R_, t_, s_):
            r_, _, _ = residual_and_jac(R_, t_, s_)
            out = jnp.sum(jnp.sum(r_ * r_, -1) * w)
            if psum_axis is not None:
                out = jax.lax.psum(out, psum_axis)
            return out

        better = total(Rn, tn, sn) < total(R, t, s)
        R = jnp.where(better, Rn, R)
        t = jnp.where(better, tn, t)
        s = jnp.where(better, sn, s)
        lam = jnp.clip(jnp.where(better, lam * 0.3, lam * 5.0), 1e-12, 1e4)
        return (R, t, s, lam), None

    (R, t, s, _), _ = jax.lax.scan(step, (R, t, s, jnp.float32(1e-8)),
                                   None, length=iters)
    return PoseGraphResult(R=R, t=t, s=s)
