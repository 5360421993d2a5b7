"""SE(3) / SO(3) Lie-group operations, batched and jit-friendly.

Replaces the reference's g2o::SE3Quat + Converter (reference:
src/Converter.cc:27-160) with pure-functional JAX ops. Poses are carried as
(R, t) pairs — R: [..., 3, 3], t: [..., 3] — so that every op vmaps/jits
cleanly and stays in registers on the VPU. Tangent vectors are
[..., 6] = (rho, phi) with translation first, matching g2o's se3quat
ordering used throughout the reference optimizer (src/Optimizer.cc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(phi):
    """Rodrigues formula, safe at phi ~ 0. [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    K2 = K @ K
    # sin(t)/t and (1-cos(t))/t^2 with stable small-angle forms.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """SO(3) log map: [..., 3, 3] -> [..., 3]. Safe near identity and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    # Generic: theta / sin(theta) * w ; near 0: w * (1 + theta^2/6).
    # The small branch must NOT touch `theta`: d(arccos)/dx -> -inf at
    # x=1, so any use of theta at R=I poisons autodiff jacobians (this
    # made every exactly-consistent pose-graph edge produce NaN J and
    # silently froze the essential-graph optimizer). 2(1-cos) ~ theta^2
    # is a smooth proxy with the right value AND derivative at I.
    theta2_smooth = 2.0 * (1.0 - cos_theta)
    scale = jnp.where(
        small,
        1.0 + theta2_smooth / 6.0,
        theta / jnp.where(small, 1.0, sin_theta + _EPS),
    )
    w_generic = w * scale[..., None]
    # Near pi the vee form degenerates; recover axis from diagonal.
    near_pi = theta > 3.0
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis2)
    # fix signs using the skew part (w) where nonzero, else off-diagonals
    sign = jnp.where(w >= 0, 1.0, -1.0)
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(phi):
    """Left Jacobian of SO(3): J = I + b K + c K^2 (used by se3 exp V)."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    K2 = K @ K
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def se3_exp(xi):
    """se(3) exp: [..., 6] (rho, phi) -> (R [..., 3, 3], t [..., 3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """SE(3) log: -> [..., 6] (rho, phi)."""
    phi = so3_log(R)
    V = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb): first apply b, then a."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def act(R, t, X):
    """Apply pose to points X [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, X) + t


def relative(Ra, ta, Rb, tb):
    """T_ab = T_a * T_b^{-1}."""
    Rbi, tbi = inverse(Rb, tb)
    return compose(Ra, ta, Rbi, tbi)


def to_matrix(R, t):
    """(R, t) -> [..., 4, 4] homogeneous matrix."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def from_matrix(T):
    return T[..., :3, :3], T[..., :3, 3]


def to_quaternion(R):
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order.

    Branch-free Shepperd's method (selects the numerically largest pivot).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate formulations; pick per-element the best-conditioned.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    q0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )
    choice = jnp.argmax(
        jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1),
        axis=-1,
    )
    q = jnp.take_along_axis(
        jnp.stack([q0, q1, q2, q3], axis=-2), choice[..., None, None], axis=-2
    )[..., 0, :]
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def from_quaternion(q):
    """Quaternion (x, y, z, w) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def identity(batch=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    t = jnp.zeros(batch + (3,), dtype=dtype)
    return R, t
