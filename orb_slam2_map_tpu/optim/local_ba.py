"""Local bundle adjustment with explicit Schur complement — MXU-shaped.

Replaces Optimizer::LocalBundleAdjustment (reference: src/Optimizer.cc:
453-778): covisibility-1-ring keyframes free, boundary observers fixed,
landmarks marginalized (g2o setMarginalized(true) Schur trick), Huber
kernels sqrt(5.991)/sqrt(7.815), 5-then-10-iteration schedule with outlier
pruning in between.

TPU-first structure: the local problem is small and dense-friendly —
<= K free cameras x P points. Observations live in a dense [P, K] masked
grid (and [P, F] for fixed cameras), so every Jacobian product, the
per-point 3x3 Hessians, the 6x6 camera blocks, and the Schur reduction
S = Hcc - W Hll^-1 W^T are plain einsums that XLA maps onto the MXU. The
reduced [6K, 6K] system is solved with one dense Cholesky. No sparse
bookkeeping, no scatter — the masks do the sparsity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.camera import PinholeCamera
from . import residuals as res


class BAProblem(NamedTuple):
    """Dense padded local-BA problem. P points, K free cams, F fixed cams."""

    R_free: jnp.ndarray     # [K, 3, 3] Tcw rotations
    t_free: jnp.ndarray     # [K, 3]
    R_fix: jnp.ndarray      # [F, 3, 3]
    t_fix: jnp.ndarray      # [F, 3]
    X: jnp.ndarray          # [P, 3] world points
    cam_valid: jnp.ndarray  # [K] bool
    point_valid: jnp.ndarray  # [P] bool
    # dense observation grids; mask False where no observation
    uv_free: jnp.ndarray    # [P, K, 2]
    ur_free: jnp.ndarray    # [P, K] (-1 mono)
    inv_sigma2_free: jnp.ndarray  # [P, K]
    mask_free: jnp.ndarray  # [P, K] bool
    uv_fix: jnp.ndarray     # [P, F, 2]
    ur_fix: jnp.ndarray     # [P, F]
    inv_sigma2_fix: jnp.ndarray   # [P, F]
    mask_fix: jnp.ndarray   # [P, F] bool


class BAResult(NamedTuple):
    R_free: jnp.ndarray
    t_free: jnp.ndarray
    X: jnp.ndarray
    inlier_free: jnp.ndarray  # [P, K] bool (post-opt chi2 gate)
    inlier_fix: jnp.ndarray   # [P, F] bool
    chi2_total: jnp.ndarray   # scalar


def _residuals_grid(cam, R, t, X, uv, ur, mask):
    """Batched residuals over a dense [P, C] obs grid.
    Returns e [P,C,3], Xc [P,C,3]."""
    Xc = jnp.einsum("cij,pj->pci", R, X) + t[None, :, :]
    z = Xc[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * iz + cam.cx
    v = cam.fy * Xc[..., 1] * iz + cam.cy
    u_r = u - cam.bf * iz
    is_stereo = ur >= 0
    e = jnp.stack(
        [uv[..., 0] - u, uv[..., 1] - v,
         jnp.where(is_stereo, ur - u_r, 0.0)],
        axis=-1,
    )
    return e, Xc


def _jacobians_grid(cam, Xc, ur, R):
    """J_pt (d e / d Xc) [P,C,3,3]; J_cam [P,C,3,6]; J_X [P,C,3,3]."""
    is_stereo = ur >= 0
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_r = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2 + cam.bf * iz2], axis=-1)
    row_r = jnp.where(is_stereo[..., None], row_r, 0.0)
    Jpt = -jnp.stack([row_u, row_v, row_r], axis=-2)        # [P,C,3,3]
    # camera (left-perturbation): dXc/dxi = [I | -hat(Xc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    dXdxi = jnp.concatenate([eye, -se3.hat(Xc)], axis=-1)   # [P,C,3,6]
    Jc = Jpt @ dXdxi
    JX = jnp.einsum("pcab,cbj->pcaj", Jpt, R)               # dXc/dX = R
    return Jpt, Jc, JX


def _chi2_grid(e, ur, inv_sigma2, mask):
    is_stereo = ur >= 0
    c = (e[..., 0] ** 2 + e[..., 1] ** 2
         + jnp.where(is_stereo, e[..., 2] ** 2, 0.0)) * inv_sigma2
    return jnp.where(mask, c, 0.0)


def _inv3(M):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _lm_step(cam, prob: BAProblem, use_huber: bool, lam,
             huber2_mono=res.CHI2_MONO, huber2_stereo=res.CHI2_STEREO):
    """One damped Schur-complement Gauss-Newton step. Returns proposal."""
    P, K = prob.mask_free.shape
    F = prob.mask_fix.shape[1]

    e_f, Xc_f = _residuals_grid(cam, prob.R_free, prob.t_free, prob.X,
                                prob.uv_free, prob.ur_free, prob.mask_free)
    e_x, Xc_x = _residuals_grid(cam, prob.R_fix, prob.t_fix, prob.X,
                                prob.uv_fix, prob.ur_fix, prob.mask_fix)

    base_mask_f = (prob.mask_free & prob.point_valid[:, None]
                   & prob.cam_valid[None, :] & (Xc_f[..., 2] > 1e-6))
    base_mask_x = (prob.mask_fix & prob.point_valid[:, None]
                   & (Xc_x[..., 2] > 1e-6))

    chi_f = _chi2_grid(e_f, prob.ur_free, prob.inv_sigma2_free, base_mask_f)
    chi_x = _chi2_grid(e_x, prob.ur_fix, prob.inv_sigma2_fix, base_mask_x)

    w_f = jnp.where(base_mask_f, prob.inv_sigma2_free, 0.0)
    w_x = jnp.where(base_mask_x, prob.inv_sigma2_fix, 0.0)
    if use_huber:
        d2_f = jnp.where(prob.ur_free >= 0, huber2_stereo, huber2_mono)
        d2_x = jnp.where(prob.ur_fix >= 0, huber2_stereo, huber2_mono)
        w_f = w_f * res.huber_weight(chi_f, d2_f)
        w_x = w_x * res.huber_weight(chi_x, d2_x)

    _, Jc, JXf = _jacobians_grid(cam, Xc_f, prob.ur_free, prob.R_free)
    _, _, JXx = _jacobians_grid(cam, Xc_x, prob.ur_fix, prob.R_fix)

    # --- normal-equation blocks (all einsum/MXU) ---
    # camera blocks [K, 6, 6]
    Hcc = jnp.einsum("pkai,pk,pkaj->kij", Jc, w_f, Jc)
    g_c = -jnp.einsum("pkai,pk,pka->ki", Jc, w_f, e_f)
    # landmark blocks [P, 3, 3] from free + fixed observations
    Hll = (jnp.einsum("pkai,pk,pkaj->pij", JXf, w_f, JXf)
           + jnp.einsum("pfai,pf,pfaj->pij", JXx, w_x, JXx))
    g_l = (-jnp.einsum("pkai,pk,pka->pi", JXf, w_f, e_f)
           - jnp.einsum("pfai,pf,pfa->pi", JXx, w_x, e_x))
    # coupling W[p,k] = Jc^T w JX : [P, K, 6, 3]
    Wc = jnp.einsum("pkai,pk,pkaj->pkij", Jc, w_f, JXf)

    # --- damping ---
    eyeK = jnp.eye(6, dtype=Hcc.dtype)
    eyeP = jnp.eye(3, dtype=Hll.dtype)
    Hcc_d = Hcc + lam * (jnp.abs(Hcc) * eyeK + 1e-8 * eyeK)
    Hll_d = Hll + lam * (jnp.abs(Hll) * eyeP + 1e-8 * eyeP)

    # guard: points with no observations get identity (zero update)
    has_obs = (w_f.sum(axis=1) + w_x.sum(axis=1)) > 0
    Hll_d = jnp.where(has_obs[:, None, None], Hll_d,
                      jnp.broadcast_to(eyeP, Hll_d.shape))
    Hll_inv = _inv3(Hll_d)

    # --- Schur reduction onto cameras ---
    T = jnp.einsum("pkab,pbc->pkac", Wc, Hll_inv)           # [P,K,6,3]
    S_red = jnp.einsum("pkac,plbc->klab", T, Wc)            # [K,K,6,6]
    S = jnp.zeros_like(S_red).at[
        jnp.arange(K), jnp.arange(K)].add(Hcc_d) - S_red
    rhs = g_c - jnp.einsum("pkac,pc->ka", T, g_l)           # [K,6]

    # mask invalid cameras to identity rows/cols
    cm = prob.cam_valid
    pair = cm[:, None] & cm[None, :]
    S = jnp.where(pair[:, :, None, None], S, 0.0)
    S_flat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    diag_fix = jnp.repeat(~cm, 6)
    S_flat = S_flat + jnp.diag(diag_fix.astype(S_flat.dtype))
    rhs_flat = jnp.where(cm[:, None], rhs, 0.0).reshape(K * 6)

    dc = jnp.linalg.solve(S_flat, rhs_flat).reshape(K, 6)
    # back-substitute landmarks: dl = Hll^-1 (g_l - W^T dc)
    WTdc = jnp.einsum("pkij,ki->pj", Wc, dc)
    dl = jnp.einsum("pij,pj->pi", Hll_inv, g_l - WTdc)
    dl = jnp.where(has_obs[:, None] & prob.point_valid[:, None], dl, 0.0)

    # --- apply ---
    dR, dt = se3.se3_exp(dc)
    R_new, t_new = se3.compose(dR, dt, prob.R_free, prob.t_free)
    R_new = jnp.where(cm[:, None, None], R_new, prob.R_free)
    t_new = jnp.where(cm[:, None], t_new, prob.t_free)
    X_new = prob.X + dl

    chi2_old = chi_f.sum() + chi_x.sum()
    return R_new, t_new, X_new, chi2_old


def _total_chi2(cam, prob, R, t, X):
    e_f, Xc_f = _residuals_grid(cam, R, t, X, prob.uv_free, prob.ur_free,
                                prob.mask_free)
    e_x, Xc_x = _residuals_grid(cam, prob.R_fix, prob.t_fix, X,
                                prob.uv_fix, prob.ur_fix, prob.mask_fix)
    m_f = (prob.mask_free & prob.point_valid[:, None] & prob.cam_valid[None, :])
    m_x = prob.mask_fix & prob.point_valid[:, None]
    chi_f = _chi2_grid(e_f, prob.ur_free, prob.inv_sigma2_free, m_f)
    chi_x = _chi2_grid(e_x, prob.ur_fix, prob.inv_sigma2_fix, m_x)
    # behind-camera observations are heavily penalized, not counted
    chi_f = jnp.where(Xc_f[..., 2] > 1e-6, chi_f, jnp.where(m_f, 1e4, 0.0))
    chi_x = jnp.where(Xc_x[..., 2] > 1e-6, chi_x, jnp.where(m_x, 1e4, 0.0))
    return chi_f, chi_x


def _lm_loop(cam, prob: BAProblem, n_iters: int, use_huber: bool):
    def body(_, carry):
        prob, lam = carry
        R_new, t_new, X_new, _ = _lm_step(cam, prob, use_huber, lam)
        chi_f_old, chi_x_old = _total_chi2(cam, prob, prob.R_free,
                                           prob.t_free, prob.X)
        chi_f_new, chi_x_new = _total_chi2(cam, prob, R_new, t_new, X_new)
        old = chi_f_old.sum() + chi_x_old.sum()
        new = chi_f_new.sum() + chi_x_new.sum()
        ok = (new < old) & jnp.isfinite(new)
        prob = prob._replace(
            R_free=jnp.where(ok, R_new, prob.R_free),
            t_free=jnp.where(ok, t_new, prob.t_free),
            X=jnp.where(ok, X_new, prob.X),
        )
        lam = jnp.clip(jnp.where(ok, lam * 0.4, lam * 5.0), 1e-8, 1e5)
        return prob, lam

    prob, _ = jax.lax.fori_loop(0, n_iters, body, (prob, jnp.float32(1e-4)))
    return prob


def local_ba(cam: PinholeCamera, prob: BAProblem,
             iters_first: int = 5, iters_second: int = 10) -> BAResult:
    """Full local-BA schedule (reference: src/Optimizer.cc:610-650):
    5 Huber iters -> drop outlier observations -> 10 more iters ->
    final outlier classification for map cleanup."""
    prob = _lm_loop(cam, prob, iters_first, use_huber=True)

    # mid-schedule outlier pruning
    chi_f, chi_x = _total_chi2(cam, prob, prob.R_free, prob.t_free, prob.X)
    th_f = jnp.where(prob.ur_free >= 0, res.CHI2_STEREO, res.CHI2_MONO)
    th_x = jnp.where(prob.ur_fix >= 0, res.CHI2_STEREO, res.CHI2_MONO)
    prob = prob._replace(
        mask_free=prob.mask_free & (chi_f <= th_f),
        mask_fix=prob.mask_fix & (chi_x <= th_x),
    )

    prob = _lm_loop(cam, prob, iters_second, use_huber=False)

    chi_f, chi_x = _total_chi2(cam, prob, prob.R_free, prob.t_free, prob.X)
    inlier_free = prob.mask_free & (chi_f <= th_f)
    inlier_fix = prob.mask_fix & (chi_x <= th_x)
    return BAResult(R_free=prob.R_free, t_free=prob.t_free, X=prob.X,
                    inlier_free=inlier_free, inlier_fix=inlier_fix,
                    chi2_total=chi_f.sum() + chi_x.sum())


local_ba_jit = jax.jit(local_ba, static_argnums=(0, 2, 3))
