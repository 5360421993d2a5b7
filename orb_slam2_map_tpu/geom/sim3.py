"""Sim(3) operations for loop closing and essential-graph optimization.

Replaces g2o::Sim3 / VertexSim3Expmap (+ the `_fix_scale` stereo/RGB-D mode)
used by the reference's loop closer (reference: src/Optimizer.cc:781-1241,
src/Sim3Solver.cc). A Sim3 element is carried as (R [...,3,3], t [...,3],
s [...]) acting as X -> s * R @ X + t. Tangent is [..., 7] = (rho, phi,
sigma) with sigma = log s.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def identity(batch=(), dtype=jnp.float32):
    R, t = se3.identity(batch, dtype)
    return R, t, jnp.ones(batch, dtype=dtype)


def act(R, t, s, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


def compose(Ra, ta, sa, Rb, tb, sb):
    """(a) * (b): X -> sa Ra (sb Rb X + tb) + ta."""
    R = Ra @ Rb
    s = sa * sb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t, s


def inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return Rt, t_inv, s_inv


def exp(xi):
    """sim(3) exp: [..., 7] (rho, phi, sigma) -> (R, t, s).

    Uses the closed-form W matrix (Strasdat's thesis) with small-angle /
    small-scale guards so jacobians stay finite under jax.grad.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = se3.hat(phi)
    K2 = K @ K

    sig = sigma
    es = s
    # Coefficients A, B, C of W = C I + A K + B K^2 (Strasdat, Appendix).
    small_sig = jnp.abs(sig) < 1e-5
    small_theta = theta < 1e-5
    C = jnp.where(small_sig, 1.0 + sig / 2.0, (es - 1.0) / jnp.where(small_sig, 1.0, sig))

    # generic denominators
    sig2 = sig * sig
    t2s2 = theta2 + sig2

    def _safe(x, d):
        return x / jnp.where(jnp.abs(d) < _EPS, 1.0, d)

    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)

    a_gen = _safe(es * sin_t * sig + (1.0 - es * cos_t) * theta, theta * t2s2)
    b_gen = _safe(
        (C - _safe((es * cos_t - 1.0) * sig + es * sin_t * theta, t2s2)), theta2
    )
    # sigma ~ 0 limits
    a_sig0 = _safe(1.0 - cos_t, theta2)
    b_sig0 = _safe(theta - sin_t, theta2 * theta)
    # theta ~ 0 limits
    a_th0 = jnp.where(
        small_sig, 0.5 + sig / 6.0, _safe(es * (sig - 1.0) + 1.0, sig2)
    )
    b_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sig / 24.0,
        _safe(es * (0.5 * sig2 - sig + 1.0) - 1.0, sig2 * sig),
    )

    A = jnp.where(small_theta, a_th0, jnp.where(small_sig, a_sig0, a_gen))
    B = jnp.where(small_theta, b_th0, jnp.where(small_sig, b_sig0, b_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, s


def log(R, t, s):
    """sim(3) log: -> [..., 7]. Inverse of exp (solves W rho = t)."""
    phi = se3.so3_log(R)
    sigma = jnp.log(s)
    xi_probe = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # Recompute W by re-running exp's coefficient math on (phi, sigma):
    # exp() builds t = W rho, so W = d t / d rho; probe with basis vectors.
    eye = jnp.eye(3, dtype=R.dtype)
    cols = []
    for i in range(3):
        rho_i = jnp.broadcast_to(eye[i], phi.shape)
        xi_i = jnp.concatenate([rho_i, phi, sigma[..., None]], axis=-1)
        _, t_i, _ = exp(xi_i)
        cols.append(t_i)
    W = jnp.stack(cols, axis=-1)
    del xi_probe
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def from_se3(R, t):
    return R, t, jnp.ones(R.shape[:-2], dtype=R.dtype)


def to_se3(R, t, s):
    """Project Sim3 to SE3 the way the reference recovers poses after
    essential-graph optimization: R unchanged, t /= s
    (reference: src/Optimizer.cc:1017-1021)."""
    return R, t / s[..., None]
