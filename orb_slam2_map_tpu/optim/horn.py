"""Closed-form absolute orientation (Horn) with optional scale — batched.

Replaces Sim3Solver::ComputeSim3's Horn-1987 quaternion method
(reference: src/Sim3Solver.cc:226-337) and the ICP pose step inside EPnP
(reference: src/PnPsolver.cc:569-627). Implemented via the Umeyama SVD
form (mathematically identical optimum) because jnp.linalg.svd batches
cleanly on device.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def absolute_orientation(A, B, weights=None, with_scale: bool = False):
    """Find (R, t, s) minimizing sum w_i || B_i - (s R A_i + t) ||^2.

    A, B: [..., N, 3] paired point sets (batched over leading dims).
    Returns R [..., 3, 3], t [..., 3], s [...].
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    wsum = weights.sum(axis=-1, keepdims=True)
    w = weights / jnp.maximum(wsum, 1e-12)
    mu_a = jnp.einsum("...n,...ni->...i", w, A)
    mu_b = jnp.einsum("...n,...ni->...i", w, B)
    Ac = A - mu_a[..., None, :]
    Bc = B - mu_b[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", w, Bc, Ac)  # B A^T
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(cov.shape[:-2] + (3,), dtype=A.dtype)
    S = S.at[..., 2].set(jnp.sign(det) + (det == 0))
    R = jnp.einsum("...ik,...k,...kj->...ij", U, S, Vt)
    if with_scale:
        var_a = jnp.einsum("...n,...ni,...ni->...", w, Ac, Ac)
        s = jnp.einsum("...k,...k->...", D, S) / jnp.maximum(var_a, 1e-12)
    else:
        s = jnp.ones(cov.shape[:-2], dtype=A.dtype)
    t = mu_b - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_a)
    return R, t, s
