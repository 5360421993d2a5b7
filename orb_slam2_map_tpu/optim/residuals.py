"""Reprojection residuals + analytic Jacobians shared by all optimizers.

Replaces the g2o edge types the reference links against
(EdgeSE3ProjectXYZ, EdgeStereoSE3ProjectXYZ, *OnlyPose variants; SURVEY.md
§2.3). Everything is batched: one call evaluates residuals/Jacobians for
all observations as dense arrays, shaped for einsum-reduction into normal
equations on the MXU.

Conventions: pose is Tcw = (R, t) (world->camera); points X are world
coords; left-multiplicative update exp(xi) * Tcw with xi = (rho, phi),
matching g2o SE3Quat::oplus so the LM trajectories are comparable.
Residual e = observation - projection (g2o sign convention).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..geom import se3
from ..geom.camera import PinholeCamera

CHI2_MONO = 5.991    # 2-DoF 95% gate (reference: src/Optimizer.cc:145)
CHI2_STEREO = 7.815  # 3-DoF 95% gate (reference: src/Optimizer.cc:183)


def project_residual(cam: PinholeCamera, R, t, X, uv, ur):
    """Residual [N, 3] = (du, dv, dur) and camera-frame z.

    Monocular observations (ur < 0) produce a zero third component, so
    one fused kernel serves both edge types; weighting masks it anyway.
    """
    Xc = se3.act(R, t, X)                                   # [N, 3]
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    u_r = u - cam.bf * inv_z
    is_stereo = ur >= 0
    e = jnp.stack(
        [uv[..., 0] - u, uv[..., 1] - v,
         jnp.where(is_stereo, ur - u_r, 0.0)],
        axis=-1,
    )
    return e, Xc


def proj_jacobian_point(cam: PinholeCamera, Xc, is_stereo):
    """d(residual)/d(Xc): [N, 3, 3]. Includes the g2o minus sign
    (residual = obs - proj => J = -dproj/dXc)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_r = jnp.stack(
        [cam.fx * iz, zero, -cam.fx * x * iz2 + cam.bf * iz2], axis=-1
    )
    row_r = jnp.where(is_stereo[..., None], row_r, 0.0)
    return -jnp.stack([row_u, row_v, row_r], axis=-2)       # [N, 3, 3]


def pose_jacobian_from_point_jac(Jpt, Xc):
    """Chain rule to the left-perturbation pose tangent:
    dXc/dxi = [I | -hat(Xc)] -> J_pose [N, 3, 6] = Jpt @ [I | -hat(Xc)]."""
    N = Xc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), (N, 3, 3))
    dX = jnp.concatenate([eye, -se3.hat(Xc)], axis=-1)      # [N, 3, 6]
    return Jpt @ dX


def point_jacobian_world(Jpt, R):
    """dXc/dX = R -> J_point [N, 3, 3] (world-point Jacobian for BA)."""
    return Jpt @ R


def huber_weight(chi2, delta2):
    """Robust reweighting for the Huber kernel at squared threshold
    delta2: w = 1 inside, delta/r outside (iteratively reweighted LS
    equivalent of g2o's RobustKernelHuber)."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    delta = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, 1.0, delta / r)
