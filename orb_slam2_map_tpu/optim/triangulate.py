"""Batched two-view triangulation + acceptance gating.

Replaces the DLT-SVD triangulation inside LocalMapping::CreateNewMapPoints
(reference: src/LocalMapping.cc:322-331) and Initializer::Triangulate
(reference: src/Initializer.cc:734-747), vmapped over all candidate
matches at once instead of a per-match loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..geom import se3
from ..geom.camera import PinholeCamera


def triangulate_dlt(P1, P2, x1, x2):
    """Linear DLT triangulation, batched.

    P1, P2: [3, 4] projection matrices; x1, x2: [N, 2] (undistorted pixel
    or normalized) coords consistent with P's. Returns [N, 3] points.
    """
    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        # Inhomogeneous solve: A[:, :3] X = -A[:, 3] via 3x3 normal
        # equations. The reference uses a homogeneous 4x4 SVD
        # (src/LocalMapping.cc:322-331); for finite points the two agree
        # to first order, and batched small SVD is pathologically slow on
        # TPU (QR-iteration loops) while a 3x3 solve is pure VPU math.
        M = A[:, :3]
        b = -A[:, 3]
        AtA = M.T @ M + 1e-9 * jnp.eye(3, dtype=M.dtype)
        Atb = M.T @ b
        return _solve3x3(AtA, Atb)

    return jax.vmap(one)(x1, x2)


def _solve3x3(S, b):
    """Closed-form symmetric 3x3 solve via the adjugate (pure VPU math —
    no LU/SVD loops, so the batched vmap stays elementwise on TPU)."""
    c00 = S[1, 1] * S[2, 2] - S[1, 2] * S[2, 1]
    c01 = S[0, 2] * S[2, 1] - S[0, 1] * S[2, 2]
    c02 = S[0, 1] * S[1, 2] - S[0, 2] * S[1, 1]
    c10 = S[1, 2] * S[2, 0] - S[1, 0] * S[2, 2]
    c11 = S[0, 0] * S[2, 2] - S[0, 2] * S[2, 0]
    c12 = S[0, 2] * S[1, 0] - S[0, 0] * S[1, 2]
    c20 = S[1, 0] * S[2, 1] - S[1, 1] * S[2, 0]
    c21 = S[0, 1] * S[2, 0] - S[0, 0] * S[2, 1]
    c22 = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
    det = S[0, 0] * c00 + S[0, 1] * c10 + S[0, 2] * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([jnp.stack([c00, c01, c02]),
                     jnp.stack([c10, c11, c12]),
                     jnp.stack([c20, c21, c22])])
    return (adj @ b) * inv_det


def projection_matrix(cam: PinholeCamera, R, t):
    """K [R | t] as a [3, 4] matrix."""
    Rt = jnp.concatenate([R, t[:, None]], axis=1)
    return cam.K @ Rt


def parallax_cos(R1, t1, R2, t2, X):
    """cos of the ray parallax angle at X between camera centers 1, 2
    (reference: src/LocalMapping.cc:288-318 parallax decision)."""
    c1 = se3.inverse(R1, t1)[1]
    c2 = se3.inverse(R2, t2)[1]
    r1 = X - c1
    r2 = X - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def acceptance_gates(cam: PinholeCamera, R1, t1, R2, t2, X, uv1, uv2,
                     ur1, ur2, sigma2_1, sigma2_2,
                     chi2_mono: float = 5.991, chi2_stereo: float = 7.8):
    """Depth/reprojection/scale gates for new map points
    (reference: src/LocalMapping.cc:349-431). Returns bool [N]."""
    Xc1 = se3.act(R1, t1, X)
    Xc2 = se3.act(R2, t2, X)
    ok = (Xc1[..., 2] > 0) & (Xc2[..., 2] > 0)

    def reproj_ok(Xc, uv, ur, sigma2):
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
        u = cam.fx * Xc[..., 0] / z + cam.cx
        v = cam.fy * Xc[..., 1] / z + cam.cy
        e2 = (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2
        is_stereo = ur >= 0
        u_r = u - cam.bf / z
        e2s = e2 + jnp.where(is_stereo, (u_r - ur) ** 2, 0.0)
        th = jnp.where(is_stereo, chi2_stereo, chi2_mono)
        return jnp.where(is_stereo, e2s, e2) <= th * sigma2

    ok &= reproj_ok(Xc1, uv1, ur1, sigma2_1)
    ok &= reproj_ok(Xc2, uv2, ur2, sigma2_2)

    # scale-consistency: distance ratio vs level-sigma ratio
    c1 = se3.inverse(R1, t1)[1]
    c2 = se3.inverse(R2, t2)[1]
    d1 = jnp.linalg.norm(X - c1, axis=-1)
    d2 = jnp.linalg.norm(X - c2, axis=-1)
    ok &= (d1 > 1e-6) & (d2 > 1e-6)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_octave = jnp.sqrt(sigma2_1 / jnp.maximum(sigma2_2, 1e-12))
    ratio_factor = 1.5 * 1.2  # 1.5 * scaleFactor (reference: :242)
    ok &= (ratio_dist * ratio_factor > ratio_octave) & (
        ratio_dist < ratio_octave * ratio_factor
    )
    return ok
