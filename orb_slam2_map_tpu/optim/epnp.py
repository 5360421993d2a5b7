"""EPnP (Lepetit et al.) + massively-parallel RANSAC.

Replaces PnPsolver (reference: src/PnPsolver.cc, 1022 LoC): EPnP control
points via PCA (:375-409), barycentric coordinates (:411-434), the 12x12
M^T M eigen-system (:436-451), beta cases N=1,2,3 with Gauss-Newton
refinement (:667-858), and the ICP-style pose recovery (:569-627).

TPU-first redesign of the RANSAC: instead of the reference's sequential
`iterate(5)` partial runs, ALL hypotheses are solved at once — sample
[H, 4] minimal sets, vmap the closed-form EPnP over the hypothesis axis,
score every hypothesis against every correspondence as one [H, N]
reprojection-error matrix, and pick the argmax-inlier hypothesis. A
final EPnP on the inlier set refines (the reference's `Refine`, :260-306).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geom.camera import PinholeCamera
from . import horn


def _control_points(Xw):
    """[N, 3] world points -> [4, 3] control points (centroid + PCA axes)
    (reference: src/PnPsolver.cc:375-409)."""
    c0 = Xw.mean(axis=0)
    Xc = Xw - c0
    n = Xw.shape[0]
    cov = Xc.T @ Xc / n
    eigval, eigvec = jnp.linalg.eigh(cov)          # ascending
    # scale axes by sqrt of eigenvalue (reference uses sqrt(lambda/n) with
    # unnormalized cov; equivalent up to the same factor used consistently)
    axes = eigvec.T * jnp.sqrt(jnp.maximum(eigval, 1e-10))[:, None]
    return jnp.concatenate([c0[None], c0[None] + axes], axis=0)


def _barycentric(Xw, C):
    """alphas [N, 4] with X = sum_j alpha_j C_j, sum alpha = 1
    (reference: src/PnPsolver.cc:411-434)."""
    # Solve via the 3x3 basis formed by C[1:] - C[0]
    B = (C[1:] - C[0]).T                            # [3, 3]
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    a123 = (Xw - C[0]) @ Binv.T                     # [N, 3]
    a0 = 1.0 - a123.sum(axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_MtM(cam: PinholeCamera, alphas, uv):
    """Accumulate M^T M [12, 12] directly (never materialize M [2N, 12])."""
    n = alphas.shape[0]
    u = uv[:, 0]
    v = uv[:, 1]
    # row_u[i, 3j + k]: alpha_ij * (fx, 0, cx - u_i)[k]
    zeros = jnp.zeros(n)
    ru = jnp.stack([jnp.full(n, cam.fx), zeros, cam.cx - u], axis=1)  # [N,3]
    rv = jnp.stack([zeros, jnp.full(n, cam.fy), cam.cy - v], axis=1)
    Mu = (alphas[:, :, None] * ru[:, None, :]).reshape(n, 12)
    Mv = (alphas[:, :, None] * rv[:, None, :]).reshape(n, 12)
    return Mu.T @ Mu + Mv.T @ Mv


_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _rho(C):
    """[6] squared distances between control points."""
    return jnp.stack([jnp.sum((C[a] - C[b]) ** 2) for a, b in _PAIRS])


def _vdiffs(V):
    """V: [4, 3] (one null vector reshaped). -> [6, 3] pairwise diffs."""
    return jnp.stack([V[a] - V[b] for a, b in _PAIRS])


def _solve_pose_from_betas(cam, alphas, Xw, uv, Vs, betas):
    """Camera-frame control points = sum_k beta_k * V_k; recover pose via
    absolute orientation world->camera; return (R, t, err)."""
    Cc = jnp.einsum("k,kij->ij", betas, Vs)          # [4, 3]
    Xc = alphas @ Cc                                  # [N, 3]
    # enforce positive depth (sign ambiguity of eigenvectors)
    sign = jnp.sign(Xc[:, 2].sum())
    sign = jnp.where(sign == 0, 1.0, sign)
    Xc = Xc * sign
    R, t, _ = horn.absolute_orientation(Xw, Xc, with_scale=False)
    proj = (Xw @ R.T + t)
    z = jnp.where(jnp.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    pu = cam.fx * proj[:, 0] / z + cam.cx
    pv = cam.fy * proj[:, 1] / z + cam.cy
    err = jnp.mean((pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2)
    return R, t, err


def _gauss_newton_betas(Vs, rho, betas0, iters: int = 5):
    """Refine betas so control-point distances match rho
    (reference: src/PnPsolver.cc:741-806 gauss_newton)."""
    dv = jnp.stack([_vdiffs(V) for V in Vs], axis=0)  # [4, 6, 3]

    def body(_, betas):
        # current camera control diffs: sum_k beta_k dv[k]  -> [6, 3]
        cur = jnp.einsum("k,kij->ij", betas, dv)
        f = jnp.sum(cur * cur, axis=1) - rho          # [6]
        J = 2.0 * jnp.einsum("ij,kij->ik", cur, dv)   # [6, 4]
        JtJ = J.T @ J + 1e-9 * jnp.eye(4)
        delta = jnp.linalg.solve(JtJ, -J.T @ f)
        return betas + delta

    return jax.lax.fori_loop(0, iters, body, betas0)


def epnp_solve(cam: PinholeCamera, Xw, uv, weights=None):
    """Closed-form EPnP for one correspondence set [N>=4].

    Returns (R, t, reproj_mse). Tries the N=1 and N=2 beta
    initializations plus Gauss-Newton refinement and keeps the best
    (reference runs cases 1,2,3; case 3 rarely wins and the GN refine
    from case 1/2 reaches the same basin).
    """
    C = _control_points(Xw)
    alphas = _barycentric(Xw, C)
    MtM = _build_MtM(cam, alphas, uv)
    _, eigvec = jnp.linalg.eigh(MtM)                  # ascending eigenvalues
    Vs = [eigvec[:, i].reshape(4, 3) for i in range(4)]
    Vs = jnp.stack(Vs, axis=0)                        # [4, 4, 3] kernel vecs
    rho = _rho(C)

    # case N=1: scale of v0
    dv0 = _vdiffs(Vs[0])
    num = jnp.sum(jnp.sqrt(jnp.sum(dv0 * dv0, axis=1)) * jnp.sqrt(rho))
    den = jnp.sum(jnp.sum(dv0 * dv0, axis=1))
    b1 = jnp.stack([num / jnp.maximum(den, 1e-12), 0.0, 0.0, 0.0])

    # case N=2: solve for [b00, b01, b11] via 6x3 LS
    dv1 = _vdiffs(Vs[1])
    L = jnp.stack(
        [jnp.sum(dv0 * dv0, axis=1),
         2.0 * jnp.sum(dv0 * dv1, axis=1),
         jnp.sum(dv1 * dv1, axis=1)], axis=1)         # [6, 3]
    sol = jnp.linalg.lstsq(L, rho)[0]
    b00, b01, b11 = sol[0], sol[1], sol[2]
    beta0 = jnp.sqrt(jnp.maximum(b00, 1e-12))
    beta1 = jnp.sqrt(jnp.maximum(b11, 1e-12)) * jnp.sign(b01) * jnp.sign(b00 + 1e-30)
    b2 = jnp.stack([beta0, beta1, 0.0, 0.0])

    best = None
    for b_init in (b1, b2):
        betas = _gauss_newton_betas(Vs, rho, b_init)
        R, t, err = _solve_pose_from_betas(cam, alphas, Xw, uv, Vs, betas)
        if best is None:
            best = (R, t, err)
        else:
            use = err < best[2]
            best = (jnp.where(use, R, best[0]), jnp.where(use, t, best[1]),
                    jnp.minimum(err, best[2]))
    return best


class PnPRansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray     # [N] bool
    n_inliers: jnp.ndarray   # int32
    ok: jnp.ndarray          # bool — enough inliers found


def pnp_ransac(cam: PinholeCamera, Xw, uv, inv_sigma2, valid, key,
               n_hypotheses: int = 256, max_err2: float = 5.991,
               min_inliers: int = 10) -> PnPRansacResult:
    """Batched-RANSAC EPnP.

    Replaces PnPsolver's sequential RANSAC loop (reference:
    src/PnPsolver.cc:165-258) with one vmapped solve of `n_hypotheses`
    4-point minimal sets scored jointly. Per-point inlier gate is
    max_err2 * sigma2(level) as the reference's mvMaxError (:154-156).
    """
    N = Xw.shape[0]
    # sample valid indices with replacement-free-ish trick: random keys,
    # invalid entries get probability ~0
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(4,))
    )(jax.random.split(key, n_hypotheses))            # [H, 4]

    def solve_one(ids):
        R, t, _ = epnp_solve(cam, Xw[ids], uv[ids])
        return R, t

    Rs, ts = jax.vmap(solve_one)(idx)                 # [H,3,3],[H,3]

    # score all hypotheses on all points
    Xc = jnp.einsum("hij,nj->hni", Rs, Xw) + ts[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    pu = cam.fx * Xc[..., 0] / z + cam.cx
    pv = cam.fy * Xc[..., 1] / z + cam.cy
    err2 = (pu - uv[None, :, 0]) ** 2 + (pv - uv[None, :, 1]) ** 2
    gate = max_err2 / jnp.maximum(inv_sigma2, 1e-9)   # sigma2 * th
    inl = (err2 <= gate[None, :]) & (Xc[..., 2] > 0) & valid[None, :]
    counts = inl.sum(axis=1)
    best_h = jnp.argmax(counts)
    inliers = inl[best_h]
    n_inl = counts[best_h]

    # refine on inliers (weighted EPnP over full set, weights = inliers)
    w = inliers.astype(jnp.float32)

    def refine():
        # weighted control points: reuse epnp on the full set but weight the
        # LS by zeroing rows of non-inliers via duplicating uv at inliers.
        # Simplest robust approach: masked version — replace outlier rows
        # with an inlier row (index of first inlier) so they don't perturb.
        first = jnp.argmax(inliers)
        sel = jnp.where(inliers, jnp.arange(N), first)
        R, t, _ = epnp_solve(cam, Xw[sel], uv[sel])
        return R, t

    R_ref, t_ref = refine()
    # recount inliers after refine
    Xc2 = Xw @ R_ref.T + t_ref
    z2 = jnp.where(jnp.abs(Xc2[:, 2]) < 1e-9, 1e-9, Xc2[:, 2])
    pu2 = cam.fx * Xc2[:, 0] / z2 + cam.cx
    pv2 = cam.fy * Xc2[:, 1] / z2 + cam.cy
    err2b = (pu2 - uv[:, 0]) ** 2 + (pv2 - uv[:, 1]) ** 2
    inliers2 = (err2b <= gate) & (Xc2[:, 2] > 0) & valid
    better = inliers2.sum() >= n_inl
    R_out = jnp.where(better, R_ref, Rs[best_h])
    t_out = jnp.where(better, t_ref, ts[best_h])
    inl_out = jnp.where(better, inliers2, inliers)
    n_out = inl_out.sum().astype(jnp.int32)
    return PnPRansacResult(R=R_out, t=t_out, inliers=inl_out,
                           n_inliers=n_out, ok=n_out >= min_inliers)


pnp_ransac_jit = jax.jit(pnp_ransac, static_argnums=(0, 6, 7, 8))
