"""Monocular map initialization: parallel H/F RANSAC + reconstruction.

Replaces Initializer (reference: src/Initializer.cc, 931 LoC): seeded
8-point RANSAC for a homography H (DLT, :226-266) and fundamental F
(8-point, :268-303) with symmetric-transfer scoring (:305-468), the
RH = SH/(SH+SF) > 0.40 model choice (:112-118), 4-way R,t disambiguation
for F (:470-570), Faugeras 8-motion decomposition for H (:572-732), and
parallax/depth/reprojection-gated triangulation checks (:798-907).

The reference runs H and F estimation in two threads with a sequential
200-iteration RANSAC each; here BOTH models and ALL samples are one
batched solve (vmapped DLT/8-point over [S, 8] sample sets) followed by a
joint [S, N] scoring pass — the survey's "model-hypothesis parallelism
as a batch dimension" (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geom.camera import PinholeCamera
from . import triangulate as tri

SIGMA = 1.0
TH_H = 5.991
TH_F = 3.84
SCORE_TH = 5.991  # both scores accumulate against this roof (ref :352,:442)


def _normalize(pts):
    """Hartley normalization (reference: src/Initializer.cc:749-796)."""
    mean = pts.mean(axis=0)
    d = jnp.abs(pts - mean).mean(axis=0)
    s = 1.0 / jnp.maximum(d, 1e-9)
    T = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return (pts - mean) * s, T


def _compute_h(x1, x2):
    """DLT homography from 8 correspondences [8, 2] each (ref :226-266)."""
    n = x1.shape[0]
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _compute_f(x1, x2):
    """8-point fundamental matrix (ref :268-303)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o],
                  axis=1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    U, D, Vt = jnp.linalg.svd(F)
    D = D.at[2].set(0.0)
    return U @ jnp.diag(D) @ Vt


def _score_h(H, H_inv, p1, p2, valid):
    """Symmetric transfer score for H (ref :305-392)."""
    def transfer(M, a):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], axis=1)
        b = ah @ M.T
        w = jnp.where(jnp.abs(b[:, 2]) < 1e-9, 1e-9, b[:, 2])
        return b[:, :2] / w[:, None]

    e12 = jnp.sum((transfer(H_inv, p2) - p1) ** 2, axis=1) / (SIGMA ** 2)
    e21 = jnp.sum((transfer(H, p1) - p2) ** 2, axis=1) / (SIGMA ** 2)
    inl = (e12 < TH_H) & (e21 < TH_H) & valid
    score = jnp.where(e12 < TH_H, SCORE_TH - e12, 0.0) + \
        jnp.where(e21 < TH_H, SCORE_TH - e21, 0.0)
    return jnp.where(valid, score, 0.0).sum(), inl


def _score_f(F, p1, p2, valid):
    """Symmetric epipolar-distance score for F (ref :394-468)."""
    o = jnp.ones((p1.shape[0], 1))
    x1 = jnp.concatenate([p1, o], axis=1)
    x2 = jnp.concatenate([p2, o], axis=1)
    l2 = x1 @ F.T
    l1 = x2 @ F
    d2 = (jnp.sum(x2 * l2, axis=1) ** 2 /
          jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)) / SIGMA ** 2
    d1 = (jnp.sum(x1 * l1, axis=1) ** 2 /
          jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)) / SIGMA ** 2
    inl = (d1 < TH_F) & (d2 < TH_F) & valid
    score = jnp.where(d2 < TH_F, SCORE_TH - d2, 0.0) + \
        jnp.where(d1 < TH_F, SCORE_TH - d1, 0.0)
    return jnp.where(valid, score, 0.0).sum(), inl


def _check_rt(cam: PinholeCamera, R, t, p1, p2, valid,
              th2: float = 4.0 * SIGMA * SIGMA):
    """Triangulate + count good points (ref :798-907 CheckRT). Returns
    (n_good, parallax_deg, X [N, 3], good mask)."""
    P1 = cam.K @ jnp.concatenate(
        [jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = cam.K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = tri.triangulate_dlt(P1, P2, p1, p2)
    finite = jnp.all(jnp.isfinite(X), axis=1)

    c1 = jnp.zeros(3)
    c2 = -R.T @ t
    n1 = X - c1
    n2 = X - c2
    d1 = jnp.linalg.norm(n1, axis=1)
    d2 = jnp.linalg.norm(n2, axis=1)
    cos_par = jnp.sum(n1 * n2, axis=1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]
    ok_depth = ((z1 > 0) & (z2 > 0)) | (cos_par >= 0.99998)
    ok_depth &= (z1 > 0) & (z2 > 0)

    def reproj(P, X):
        o = jnp.ones((X.shape[0], 1))
        xh = jnp.concatenate([X, o], axis=1) @ P.T
        w = jnp.where(jnp.abs(xh[:, 2]) < 1e-9, 1e-9, xh[:, 2])
        return xh[:, :2] / w[:, None]

    e1 = jnp.sum((reproj(P1, X) - p1) ** 2, axis=1)
    e2 = jnp.sum((reproj(P2, X) - p2) ** 2, axis=1)
    good = valid & finite & ok_depth & (e1 < th2) & (e2 < th2) & \
        (cos_par < 0.99998)
    n_good = good.sum()
    # parallax of the 50th-best point (ref takes min(50, n)-th)
    par = jnp.where(good, cos_par, 1.0)
    par_sorted = jnp.sort(par)
    k = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = jnp.degrees(jnp.arccos(jnp.clip(par_sorted[k], -1.0, 1.0)))
    return n_good, parallax, X, good


class InitResult(NamedTuple):
    ok: jnp.ndarray          # bool
    R21: jnp.ndarray         # [3,3] pose of frame 2 w.r.t. frame 1
    t21: jnp.ndarray         # [3] (unit scale)
    X: jnp.ndarray           # [N, 3] triangulated points (frame-1 coords)
    good: jnp.ndarray        # [N] bool triangulated mask
    used_h: jnp.ndarray      # bool — which model was chosen


def initialize_two_view(cam: PinholeCamera, p1, p2, valid, key,
                        n_ransac: int = 200,
                        min_triangulated: int = 50) -> InitResult:
    """Full two-view bootstrap. p1, p2: [N, 2] matched undistorted pixel
    coords, `valid` mask. Seeded sampling (the reference seeds its RANSAC,
    src/Initializer.cc:80) keeps runs reproducible."""
    N = p1.shape[0]
    p1n, T1 = _normalize(p1)
    p2n, T2 = _normalize(p2)
    T2inv = jnp.linalg.inv(T2)

    logits = jnp.where(valid, 0.0, -1e9)
    samples = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(8,))
    )(jax.random.split(key, n_ransac))                # [S, 8]

    def solve_sample(ids):
        H = T2inv @ _compute_h(p1n[ids], p2n[ids]) @ T1
        Fm = T2.T @ _compute_f(p1n[ids], p2n[ids]) @ T1
        return H, Fm

    Hs, Fs = jax.vmap(solve_sample)(samples)

    def score_pair(H, F):
        sh, _ = _score_h(H, jnp.linalg.inv(H + 1e-12 * jnp.eye(3)), p1, p2, valid)
        sf, _ = _score_f(F, p1, p2, valid)
        return sh, sf

    sh, sf = jax.vmap(score_pair)(Hs, Fs)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)
    H_best = Hs[bh]
    F_best = Fs[bf]
    SH = sh[bh]
    SF = sf[bf]
    _, inl_h = _score_h(H_best, jnp.linalg.inv(H_best + 1e-12 * jnp.eye(3)),
                        p1, p2, valid)
    _, inl_f = _score_f(F_best, p1, p2, valid)
    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40    # (ref :112-118)

    # --- reconstruct from F: E -> 4 motions (ref :470-570) ---
    K = cam.K
    E = K.T @ F_best @ K
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    f_motions = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]

    # --- reconstruct from H: Faugeras (ref :572-732); the 8 solutions ---
    A = jnp.linalg.inv(K) @ H_best @ K
    Ua, Da, Vta = jnp.linalg.svd(A)
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    d1, d2, d3 = Da[0], Da[1], Da[2]
    h_motions = []
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + 1e-12),
                             0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + 1e-12),
                             0.0, None))
    for eps1 in (1.0, -1.0):
        for eps3 in (1.0, -1.0):
            x1_, x3_ = eps1 * aux1, eps3 * aux3
            # d' = d2 case
            st = jnp.sqrt(jnp.clip(
                (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) \
                / jnp.maximum((d1 + d3) * d2, 1e-12)
            ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
            st = eps1 * eps3 * st
            Rp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                              [0.0, 0.0, 1.0]])
            Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
            R = s_det * Ua @ Rp @ Vta
            tp = jnp.stack([x1_, 0.0, -x3_]) * (d1 - d3)
            t = Ua @ tp
            h_motions.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    for eps1 in (1.0, -1.0):
        for eps3 in (1.0, -1.0):
            x1_, x3_ = eps1 * aux1, eps3 * aux3
            # d' = -d2 case
            sphi = jnp.sqrt(jnp.clip(
                (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) \
                / jnp.maximum((d1 - d3) * d2, 1e-12)
            cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
            sphi = eps1 * eps3 * sphi
            Rp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0],
                              [0.0, 0.0, -1.0]])
            Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sphi)
            Rp = Rp.at[2, 0].set(sphi).at[2, 2].set(-cphi)
            R = s_det * Ua @ Rp @ Vta
            tp = jnp.stack([x1_, 0.0, x3_]) * (d1 + d3)
            t = Ua @ tp
            h_motions.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))

    # --- evaluate all motions of the chosen model ---
    def eval_motions(motions, inl):
        Rs = jnp.stack([m[0] for m in motions])
        ts = jnp.stack([m[1] for m in motions])
        n_good, par, X, good = jax.vmap(
            lambda R, t: _check_rt(cam, R, t, p1, p2, inl))(Rs, ts)
        return Rs, ts, n_good, par, X, good

    Rf, tf, ngf, parf, Xf, goodf = eval_motions(f_motions, inl_f)
    Rh, th_, ngh, parh, Xh, goodh = eval_motions(h_motions, inl_h)

    def select(Rs, ts, ng, par, X, good, n_inl, similar_ratio):
        best = jnp.argmax(ng)
        n_best = ng[best]
        n_similar = (ng > similar_ratio * n_best).sum()
        ok = ((n_best >= jnp.maximum(
            0.9 * n_inl, min_triangulated)) & (n_similar == 1)
            & (par[best] > 1.0))
        return ok, Rs[best], ts[best], X[best], good[best]

    okf, Rf_b, tf_b, Xf_b, goodf_b = select(
        Rf, tf, ngf, parf, Xf, goodf, inl_f.sum(), 0.7)
    okh, Rh_b, th_b, Xh_b, goodh_b = select(
        Rh, th_, ngh, parh, Xh, goodh, inl_h.sum(), 0.75)

    ok = jnp.where(use_h, okh, okf)
    R_out = jnp.where(use_h, Rh_b, Rf_b)
    t_out = jnp.where(use_h, th_b, tf_b)
    X_out = jnp.where(use_h, Xh_b, Xf_b)
    good_out = jnp.where(use_h, goodh_b, goodf_b)
    return InitResult(ok=ok, R21=R_out, t21=t_out, X=X_out, good=good_out,
                      used_h=use_h)


initialize_two_view_jit = jax.jit(initialize_two_view,
                                  static_argnums=(0, 5, 6))
