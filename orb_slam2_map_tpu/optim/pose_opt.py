"""Pose-only optimization (motion-only BA) — the per-frame hot path.

Replaces Optimizer::PoseOptimization (reference: src/Optimizer.cc:239-451):
a single SE3 vertex, mono/stereo reprojection edges, 4 rounds x 10 LM
iterations with chi-squared inlier reclassification between rounds and the
Huber kernel dropped for the final rounds.

TPU design: the whole schedule is ONE jitted program. Each iteration is a
batched residual/Jacobian evaluation over the fixed-capacity observation
set ([N,3] einsums), a 6x6 normal-equation reduction on the MXU, and a
closed-form 6x6 solve — no host round-trips inside the 40 iterations.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.camera import PinholeCamera
from . import residuals as res


class PoseOptResult(NamedTuple):
    R: jnp.ndarray          # [3, 3] optimized Tcw rotation
    t: jnp.ndarray          # [3]
    inliers: jnp.ndarray    # [N] bool
    n_inliers: jnp.ndarray  # int32
    chi2: jnp.ndarray       # [N] final per-obs chi2


def _chi2(cam, R, t, X, uv, ur, inv_sigma2):
    e, Xc = res.project_residual(cam, R, t, X, uv, ur)
    is_stereo = ur >= 0
    c = (e[..., 0] ** 2 + e[..., 1] ** 2
         + jnp.where(is_stereo, e[..., 2] ** 2, 0.0)) * inv_sigma2
    return c, Xc[..., 2] > 0.0


def _lm_rounds(cam, R0, t0, X, uv, ur, inv_sigma2, active0,
               rounds, iters_per_round, use_huber_rounds):
    """Runs the reference's round schedule; returns final pose + inliers."""
    is_stereo = ur >= 0
    delta2 = jnp.where(is_stereo, res.CHI2_STEREO, res.CHI2_MONO)

    def normal_eq(R, t):
        """One projection + weighted normal equations at (R, t)."""
        e, Xc = res.project_residual(cam, R, t, X, uv, ur)
        chi2 = jnp.einsum("ni,ni->n", e, e) * inv_sigma2
        w = jnp.where(active_ref[0], inv_sigma2, 0.0)
        if use_huber_ref[0]:
            w = w * res.huber_weight(chi2, delta2)
        w = jnp.where(Xc[..., 2] > 1e-6, w, 0.0)
        Jpt = res.proj_jacobian_point(cam, Xc, is_stereo)
        J = res.pose_jacobian_from_point_jac(Jpt, Xc)       # [N, 3, 6]
        H = jnp.einsum("nri,n,nrj->ij", J, w, J)
        b = -jnp.einsum("nri,n,nr->i", J, w, e)
        chi_tot = jnp.sum(jnp.einsum("ni,ni->n", e, e) * w)
        return H, b, chi_tot

    active_ref = [None]
    use_huber_ref = [None]

    def lm_iterations(R, t, active, use_huber, n_iters):
        """Classic LM with carried normal equations: ONE projection /
        Jacobian evaluation per iteration (the textbook restructuring of
        the evaluate-step-then-re-evaluate loop; halves the per-iteration
        device work vs the naive form while accepting/rejecting steps on
        exactly the same decrease test)."""
        active_ref[0] = active
        use_huber_ref[0] = use_huber
        H0, b0, chi0 = normal_eq(R, t)

        def body(_, carry):
            R, t, chi_best, H, b, lam = carry
            Haug = H + lam * jnp.diag(jnp.diagonal(H) + 1e-9)
            dx = jnp.linalg.solve(Haug, b)
            dR, dt = se3.se3_exp(dx)
            R_try, t_try = se3.compose(dR, dt, R, t)
            H_try, b_try, chi_try = normal_eq(R_try, t_try)
            ok = (chi_try < chi_best) & jnp.all(jnp.isfinite(dx))
            R = jnp.where(ok, R_try, R)
            t = jnp.where(ok, t_try, t)
            chi_best = jnp.where(ok, chi_try, chi_best)
            H = jnp.where(ok, H_try, H)
            b = jnp.where(ok, b_try, b)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            return R, t, chi_best, H, b, lam

        R, t, _, _, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (R, t, chi0, H0, b0, jnp.float32(1e-3)))
        return R, t

    R, t, active = R0, t0, active0
    for rnd in range(rounds):
        use_huber = rnd in use_huber_rounds
        R, t = lm_iterations(R, t, active, use_huber, iters_per_round)
        chi2, pos_depth = _chi2(cam, R, t, X, uv, ur, inv_sigma2)
        active = active0 & (chi2 <= delta2) & pos_depth
    chi2, pos_depth = _chi2(cam, R, t, X, uv, ur, inv_sigma2)
    inliers = active0 & (chi2 <= delta2) & pos_depth
    return R, t, inliers, chi2


def pose_optimize(cam: PinholeCamera, R0, t0, X, uv, ur, inv_sigma2,
                  valid) -> PoseOptResult:
    """Optimize Tcw given 3D-2D correspondences.

    Args (all fixed capacity N, masked by `valid`):
      X [N,3] world points; uv [N,2] observed (undistorted) pixels;
      ur [N] right-image u (or -1 for mono); inv_sigma2 [N] per-level
      information; valid [N] bool.
    Schedule: 4 rounds x 10 iters, Huber on rounds 0-1, off 2-3
    (reference: src/Optimizer.cc:369-442, its={10,10,10,10},
    kernel dropped at it==2).
    """
    R, t, inliers, chi2 = _lm_rounds(
        cam, R0, t0, X, uv, ur, inv_sigma2, valid,
        rounds=4, iters_per_round=10, use_huber_rounds=(0, 1),
    )
    return PoseOptResult(R=R, t=t, inliers=inliers,
                         n_inliers=inliers.sum().astype(jnp.int32),
                         chi2=chi2)


pose_optimize_jit = jax.jit(pose_optimize, static_argnums=(0,))


def pose_optimize_multi(cam: PinholeCamera, R0s, t0s, X, uv, ur,
                        inv_sigma2, valid) -> PoseOptResult:
    """Multi-start pose optimization: run the full LM schedule from a
    batch of initializations [S, 3, 3] / [S, 3] (vmapped — near-free on
    TPU) and keep the basin with the most inliers (ties: lowest inlier
    chi2).

    Robust reweighting makes the cost surface init-dependent (IRLS can
    have spurious stationary points under weakly-observable geometry —
    e.g. all-far-points views where translation-along-axis is barely
    constrained); the reference's g2o runs a single init from the motion
    model and silently accepts whichever basin that lands in. Multi-start
    is the batched-hardware answer.
    """
    results = jax.vmap(
        lambda R0, t0: pose_optimize(cam, R0, t0, X, uv, ur, inv_sigma2,
                                     valid)
    )(R0s, t0s)
    chi_inl = jnp.where(results.inliers, results.chi2, 0.0).sum(axis=1)
    score = results.n_inliers.astype(jnp.float32) - 1e-4 * chi_inl
    best = jnp.argmax(score)
    return PoseOptResult(R=results.R[best], t=results.t[best],
                         inliers=results.inliers[best],
                         n_inliers=results.n_inliers[best],
                         chi2=results.chi2[best])


pose_optimize_multi_jit = jax.jit(pose_optimize_multi, static_argnums=(0,))
