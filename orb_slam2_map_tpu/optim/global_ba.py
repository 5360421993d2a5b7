"""Global bundle adjustment: implicit-Schur conjugate gradient.

Replaces Optimizer::GlobalBundleAdjustemnt (reference: src/Optimizer.cc:
41-237 — g2o LM over all keyframes + landmarks with Schur
marginalization). A dense Schur complement is O(K^2) memory and fine for
the local window (optim/local_ba.py) but not for whole-map BA; here the
reduced camera system S = Hcc - W Hpp^-1 W^T is never materialized:

  * observations live in flat [O] arrays (cam_idx, pnt_idx, uv, ...);
  * residuals/Jacobians are one batched evaluation over O;
  * Hpp (3x3 blocks) is a segment-sum + closed-form inverse;
  * S @ x inside CG is four segment-sum/gather passes — pure
    gather/scatter + small einsums, which XLA fuses well on TPU;
  * block-Jacobi (6x6 camera blocks) preconditioning.

This structure is exactly what shards across devices: each device owns an
observation (and point) shard and the CG reductions become psums
(parallel/dist_ba.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import se3
from ..geom.camera import PinholeCamera
from . import residuals as res_mod


class GBAProblem(NamedTuple):
    R: jnp.ndarray          # [K, 3, 3]
    t: jnp.ndarray          # [K, 3]
    X: jnp.ndarray          # [P, 3]
    cam_free: jnp.ndarray   # [K] bool (False = held fixed)
    cam_idx: jnp.ndarray    # [O] int32
    pnt_idx: jnp.ndarray    # [O] int32
    uv: jnp.ndarray         # [O, 2]
    ur: jnp.ndarray         # [O]
    inv_sigma2: jnp.ndarray # [O]
    obs_valid: jnp.ndarray  # [O] bool


class GBAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    inliers: jnp.ndarray    # [O] bool
    chi2: jnp.ndarray


def _obs_terms(cam: PinholeCamera, p: GBAProblem, use_huber: bool):
    Rg = p.R[p.cam_idx]
    tg = p.t[p.cam_idx]
    Xg = p.X[p.pnt_idx]
    e, Xc = res_mod.project_residual(cam, Rg, tg, Xg, p.uv, p.ur)
    is_stereo = p.ur >= 0
    w = jnp.where(p.obs_valid & (Xc[..., 2] > 1e-6), p.inv_sigma2, 0.0)
    chi2 = jnp.einsum("oi,oi->o", e, e) * p.inv_sigma2
    if use_huber:
        d2 = jnp.where(is_stereo, res_mod.CHI2_STEREO, res_mod.CHI2_MONO)
        w = w * res_mod.huber_weight(chi2, d2)
    Jpt = res_mod.proj_jacobian_point(cam, Xc, is_stereo)    # [O,3,3]
    Jc = res_mod.pose_jacobian_from_point_jac(Jpt, Xc)       # [O,3,6]
    Jp = Jpt @ Rg                                             # [O,3,3]
    # zero camera Jacobian for fixed cameras
    free = p.cam_free[p.cam_idx]
    Jc = jnp.where(free[:, None, None], Jc, 0.0)
    return e, Jc, Jp, w, chi2


def _inv3(M):
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)], -2)
    return adj / det[..., None, None]


def _inv6(M):
    return jnp.linalg.inv(M + 1e-9 * jnp.eye(6, dtype=M.dtype))


def _gn_step(cam, p: GBAProblem, lam, use_huber: bool, cg_iters: int,
             psum_axis=None):
    """One damped implicit-Schur GN step. psum_axis: if set, observation
    arrays are sharded over that mesh axis and reductions are psummed
    (the distributed-BA path)."""
    K = p.R.shape[0]
    P = p.X.shape[0]
    e, Jc, Jp, w, _ = _obs_terms(cam, p, use_huber)

    def seg_cam(vals):  # [O, ...] -> [K, ...]
        out = jax.ops.segment_sum(vals, p.cam_idx, num_segments=K)
        if psum_axis is not None:
            out = jax.lax.psum(out, psum_axis)
        return out

    def seg_pnt(vals):  # [O, ...] -> [P, ...]
        out = jax.ops.segment_sum(vals, p.pnt_idx, num_segments=P)
        # points are owner-sharded in the distributed path: no psum
        return out

    # fixed blocks
    Hcc = seg_cam(jnp.einsum("oai,o,oaj->oij", Jc, w, Jc))   # [K,6,6]
    gc = seg_cam(-jnp.einsum("oai,o,oa->oi", Jc, w, e))      # [K,6]
    Hpp = seg_pnt(jnp.einsum("oai,o,oaj->oij", Jp, w, Jp))   # [P,3,3]
    gp = seg_pnt(-jnp.einsum("oai,o,oa->oi", Jp, w, e))      # [P,3]

    eye3 = jnp.eye(3, dtype=Hpp.dtype)
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    Hpp_d = Hpp + lam * (jnp.abs(Hpp) * eye3 + 1e-8 * eye3)
    has_obs = Hpp[..., 0, 0] + Hpp[..., 1, 1] + Hpp[..., 2, 2] > 0
    Hpp_d = jnp.where(has_obs[:, None, None], Hpp_d,
                      jnp.broadcast_to(eye3, Hpp_d.shape))
    Hpp_inv = _inv3(Hpp_d)
    Hcc_d = Hcc + lam * (jnp.abs(Hcc) * eye6 + 1e-8 * eye6)

    # careful index bookkeeping for the coupling terms:
    #   W[c,p] = sum_{o in (c,p)} Jc_o^T w Jp_o  (6x3)
    #   (W^T x)_p = sum_o Jp_o^T w (Jc_o x_c)
    def matvec(x):
        jc_x = jnp.einsum("oai,oi->oa", Jc, x[p.cam_idx])     # [O,3]
        v = seg_pnt(jnp.einsum("oab,o,oa->ob", Jp, w, jc_x))  # [P,3]
        c = jnp.einsum("pij,pj->pi", Hpp_inv, v)              # [P,3]
        jp_c = jnp.einsum("oab,ob->oa", Jp, c[p.pnt_idx])     # [O,3]
        back = seg_cam(jnp.einsum("oai,o,oa->oi", Jc, w, jp_c))
        hx = jnp.einsum("kij,kj->ki", Hcc_d, x)
        return hx - back

    # rhs = gc - W Hpp^-1 gp
    cpre = jnp.einsum("pij,pj->pi", Hpp_inv, gp)
    jp_c = jnp.einsum("oab,ob->oa", Jp, cpre[p.pnt_idx])
    rhs = gc - seg_cam(jnp.einsum("oai,o,oa->oi", Jc, w, jp_c))

    # block-Jacobi preconditioner
    Minv = _inv6(Hcc_d)
    pinned = ~p.cam_free

    def precond(r):
        out = jnp.einsum("kij,kj->ki", Minv, r)
        return jnp.where(pinned[:, None], 0.0, out)

    def dot(a, b):
        return jnp.sum(a * b)

    x0 = jnp.zeros_like(rhs)
    r0 = jnp.where(pinned[:, None], 0.0, rhs)
    z0 = precond(r0)

    def cg_body(_, carry):
        x, r, z, pdir, rz = carry
        Ap = matvec(pdir)
        Ap = jnp.where(pinned[:, None], 0.0, Ap)
        alpha = rz / jnp.maximum(dot(pdir, Ap), 1e-20)
        x = x + alpha * pdir
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        pdir = z + beta * pdir
        return x, r, z, pdir, rz_new

    rz0 = dot(r0, z0)

    def cg_body_w(carry):
        x, r, z, pdir, rz, it = carry
        x, r, z, pdir, rz = cg_body(it, (x, r, z, pdir, rz))
        return x, r, z, pdir, rz, it + 1

    def cg_cond(carry):
        _, _, _, _, rz, it = carry
        # early exit on a converged (e.g. warm-started) system: the
        # preconditioned residual is replicated across shards (camera
        # vectors are psummed), so all devices agree on the trip count
        return (it < cg_iters) & (rz > 1e-6 * rz0) & (rz > 1e-30)

    dc = jax.lax.while_loop(
        cg_cond, cg_body_w, (x0, r0, z0, z0, rz0, jnp.int32(0)))[0]
    dc = jnp.where(pinned[:, None], 0.0, dc)

    # back-substitute landmarks: dp = Hpp^-1 (gp - W^T dc)
    jc_dc = jnp.einsum("oai,oi->oa", Jc, dc[p.cam_idx])
    wtd = seg_pnt(jnp.einsum("oab,o,oa->ob", Jp, w, jc_dc))
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, gp - wtd)
    dp = jnp.where(has_obs[:, None], dp, 0.0)

    dR, dt = se3.se3_exp(dc)
    R_new, t_new = se3.compose(dR, dt, p.R, p.t)
    R_new = jnp.where(p.cam_free[:, None, None], R_new, p.R)
    t_new = jnp.where(p.cam_free[:, None], t_new, p.t)
    X_new = p.X + dp
    return R_new, t_new, X_new


def _total_chi2(cam, p: GBAProblem, psum_axis=None, robust=False):
    """Acceptance objective for LM. Every valid observation contributes —
    masking by camera-frame depth here would let a divergent step hide
    its own residuals (NaN/behind-camera -> w=0 -> chi2 "improves"), so
    non-finite terms are replaced by a large finite penalty instead.
    With robust=True the Huber rho is summed (what _gn_step minimizes)."""
    e, _, _, w, chi2 = _obs_terms(cam, p, use_huber=False)
    if robust:
        is_stereo = p.ur >= 0
        d2 = jnp.where(is_stereo, res_mod.CHI2_STEREO, res_mod.CHI2_MONO)
        delta = jnp.sqrt(d2)
        r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        chi2 = jnp.where(chi2 <= d2, chi2, 2.0 * delta * r - d2)
    chi2_safe = jnp.where(jnp.isfinite(chi2), chi2, 1e12)
    total = jnp.sum(jnp.where(p.obs_valid, chi2_safe, 0.0))
    if psum_axis is not None:
        total = jax.lax.psum(total, psum_axis)
    return total, chi2


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def global_ba(cam: PinholeCamera, prob: GBAProblem, iters: int = 20,
              cg_iters: int = 24, use_huber: bool = True) -> GBAResult:
    return global_ba_inner(cam, prob, iters, cg_iters, use_huber, None)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def global_ba_chunk(cam: PinholeCamera, prob: GBAProblem, iters: int,
                    cg_iters: int, use_huber: bool, lam0):
    """Chunked entry for background GBA: carries the LM damping across
    chunks (restarting the damping schedule between small chunks hurts
    convergence) and reports how many iterations actually ran so the
    caller can stop early once the chi2 plateaus.
    Returns (GBAResult, lam_out, n_iters_done)."""
    prob, lam, n_done = _lm_loop(cam, prob, iters, cg_iters, use_huber,
                                 None, lam0)
    return _finish(cam, prob, None), lam, n_done


def _lm_loop(cam, prob, iters, cg_iters, use_huber, psum_axis, lam0):
    """LM with chi2-plateau early exit (the reference's g2o terminates
    on vanishing gain too; running all 20 iterations on a warm-started
    problem is pure waste — VERDICT r2 item 2)."""
    cur0, _ = _total_chi2(cam, prob, psum_axis, robust=use_huber)

    def cond(carry):
        _, _, _, i, done = carry
        return (i < iters) & ~done

    def body(carry):
        p, lam, cur, i, _ = carry
        R_new, t_new, X_new = _gn_step(cam, p, lam, use_huber, cg_iters,
                                       psum_axis)
        cand = p._replace(R=R_new, t=t_new, X=X_new)
        new, _ = _total_chi2(cam, cand, psum_axis, robust=use_huber)
        # finiteness must be agreed across shards: X is owner-sharded, so
        # a NaN on one device must reject the (replicated) camera update
        # everywhere or replicas diverge
        nbad = (jnp.sum(~jnp.isfinite(X_new)) +
                jnp.sum(~jnp.isfinite(t_new)) +
                jnp.sum(~jnp.isfinite(R_new)))
        if psum_axis is not None:
            nbad = jax.lax.psum(nbad, psum_axis)
        ok = (new < cur) & jnp.isfinite(new) & (nbad == 0)
        p = p._replace(
            R=jnp.where(ok, R_new, p.R),
            t=jnp.where(ok, t_new, p.t),
            X=jnp.where(ok, X_new, p.X),
        )
        # stop when an accepted step no longer buys relative improvement,
        # or damping has blown past any useful range (all chi2/lam values
        # are shard-replicated, so the trip count agrees across devices).
        # 1e-6: the former 1e-4 threshold quit while pose error was still
        # halving every few iterations — the live merge landed at 3.1 cm
        # KF-ATE on a map whose optimum is 1.5 cm (r5 diagnostics)
        plateau = ok & (cur - new <= 1e-6 * jnp.maximum(cur, 1e-12))
        cur = jnp.where(ok, new, cur)
        stuck = ~ok & (lam >= 1e5)
        lam = jnp.clip(jnp.where(ok, lam * 0.4, lam * 5.0), 1e-9, 1e5)
        return p, lam, cur, i + 1, plateau | stuck

    prob, lam, _, n_done, _ = jax.lax.while_loop(
        cond, body,
        (prob, jnp.asarray(lam0, jnp.float32), cur0, jnp.int32(0),
         jnp.asarray(False)))
    return prob, lam, n_done


def _finish(cam, prob, psum_axis) -> GBAResult:
    total, chi2 = _total_chi2(cam, prob, psum_axis)
    is_stereo = prob.ur >= 0
    th = jnp.where(is_stereo, res_mod.CHI2_STEREO, res_mod.CHI2_MONO)
    inl = prob.obs_valid & (chi2 <= th)
    return GBAResult(R=prob.R, t=prob.t, X=prob.X, inliers=inl, chi2=total)


def global_ba_inner(cam, prob, iters, cg_iters, use_huber,
                    psum_axis) -> GBAResult:
    """Traceable body shared by the single-chip jit and the shard_map
    distributed path (parallel/dist_ba.py): with psum_axis set, the
    observation/point arrays are per-device shards and all camera-side
    reductions ride the mesh collective."""
    prob, _, _ = _lm_loop(cam, prob, iters, cg_iters, use_huber,
                          psum_axis, 1e-5)
    return _finish(cam, prob, psum_axis)


# ---------------------------------------------------------------------------
# host-side assembly from the map store
# ---------------------------------------------------------------------------

def build_gba_problem(cfg, map_store, fixed_kf: int):
    """Assemble a GBAProblem snapshot from the map. Returns
    (problem, kfs, mids) or None if the map is too small — the snapshot
    is what lets global BA run on a background thread while the map
    keeps evolving (reference mTcwGBA staging,
    src/Optimizer.cc:121-135, 207-235)."""
    m = map_store
    kfs = m.keyframe_ids()
    mids = m.point_ids()
    if len(kfs) < 2 or len(mids) < 10:
        return None
    K = len(kfs)
    kf_slot = np.full(m.K, -1, np.int64)
    kf_slot[kfs] = np.arange(K)
    P = len(mids)
    mp_slot = np.full(m.M, -1, np.int64)
    mp_slot[mids] = np.arange(P)
    # pow2-pad cameras and points (not only observations): exact K/P
    # shapes compiled a fresh XLA program for every map size — each
    # background-GBA launch on a grown map paid a full compile on the
    # worker (11 distinct global_ba_chunk cache entries after one bench
    # run). Padded cameras are pinned (cam_free=False) and padded points
    # have no observations (has_obs=False -> dp=0), so the solve is
    # unchanged; consumers slice results by len(kfs)/len(mids).
    K_pad = 1 << (K - 1).bit_length()
    P_pad = 1 << (P - 1).bit_length()

    inv_sigma2_tab = 1.0 / np.asarray(cfg.orb.level_sigma2, np.float32)
    cam_i, pnt_i, uvs, urs, ivs = [], [], [], [], []
    for k in kfs:
        obs = m.kf_obs[k]
        kp = np.nonzero((obs >= 0) & (mp_slot[np.clip(obs, 0, None)] >= 0))[0]
        if len(kp) == 0:
            continue
        cam_i.append(np.full(len(kp), kf_slot[k]))
        pnt_i.append(mp_slot[obs[kp]])
        uvs.append(m.kf_xy[k][kp])
        urs.append(m.kf_ur[k][kp])
        ivs.append(inv_sigma2_tab[m.kf_level[k][kp]])
    if not cam_i:
        return None
    cam_i = np.concatenate(cam_i)
    pnt_i = np.concatenate(pnt_i)
    uvs = np.concatenate(uvs)
    urs = np.concatenate(urs)
    ivs = np.concatenate(ivs)
    O = len(cam_i)
    O_pad = 1 << (O - 1).bit_length()

    def pad(a, shape, fill=0):
        out = np.full((O_pad,) + shape, fill, dtype=a.dtype)
        out[:O] = a
        return out

    cam_free = np.zeros(K_pad, bool)
    cam_free[:K] = True
    if fixed_kf >= 0 and kf_slot[fixed_kf] >= 0:
        cam_free[kf_slot[fixed_kf]] = False

    Rp = np.tile(np.eye(3, dtype=np.float32), (K_pad, 1, 1))
    tp = np.zeros((K_pad, 3), np.float32)
    Rp[:K] = m.kf_R[kfs]
    tp[:K] = m.kf_t[kfs]
    Xp = np.zeros((P_pad, 3), np.float32)
    Xp[:P] = m.mp_pos[mids]
    prob = GBAProblem(
        R=jnp.asarray(Rp), t=jnp.asarray(tp),
        X=jnp.asarray(Xp),
        cam_free=jnp.asarray(cam_free),
        cam_idx=jnp.asarray(pad(cam_i.astype(np.int32), ())),
        pnt_idx=jnp.asarray(pad(pnt_i.astype(np.int32), ())),
        uv=jnp.asarray(pad(uvs.astype(np.float32), (2,))),
        ur=jnp.asarray(pad(urs.astype(np.float32), (), fill=-1.0)),
        inv_sigma2=jnp.asarray(pad(ivs.astype(np.float32), (), fill=1.0)),
        obs_valid=jnp.asarray(
            np.arange(O_pad) < O),
    )
    return prob, kfs, mids


def run_global_ba(cfg, map_store, fixed_kf: int, iters: int = 20):
    """Synchronous GBA: assemble, run, write back."""
    built = build_gba_problem(cfg, map_store, fixed_kf)
    if built is None:
        return
    prob, kfs, mids = built
    res = global_ba(cfg.camera, prob, iters)
    m = map_store
    Rn = np.asarray(res.R)[:len(kfs)]
    tn = np.asarray(res.t)[:len(kfs)]
    Xn = np.asarray(res.X)[:len(mids)]
    # write-back guard: a degenerate solve must never teleport the map
    pose_ok = np.isfinite(tn).all(axis=1) \
        & (np.linalg.norm(tn - m.kf_t[kfs], axis=1) < 3.0)
    pt_ok = np.isfinite(Xn).all(axis=1) \
        & (np.linalg.norm(Xn - m.mp_pos[mids], axis=1) < 10.0)
    # project back to SO(3): f32 LM retractions drift R R^T off
    # identity, which SE3 composes downstream assume exact
    U, _, Vt = np.linalg.svd(Rn[pose_ok])
    m.kf_R[kfs[pose_ok]] = (U @ Vt).astype(np.float32)
    m.kf_t[kfs[pose_ok]] = tn[pose_ok]
    m.mp_pos[mids[pt_ok]] = Xn[pt_ok]
    m.mark_all_points_dirty()
    m.version += 1
