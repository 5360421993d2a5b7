"""Multi-chip paths (parallel/) on the virtual 8-device CPU mesh set up
by conftest.py — the sharding programs the driver dry-runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_map_tpu.config import ORBConfig
from orb_slam2_map_tpu.geom.camera import PinholeCamera
from orb_slam2_map_tpu.ops import orb
from orb_slam2_map_tpu.optim import global_ba as gba
from orb_slam2_map_tpu.parallel import dist_ba, dist_frontend, mesh as meshmod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multi-device CPU mesh")


TINY_CAM = PinholeCamera(fx=60.0, fy=60.0, cx=39.5, cy=31.5,
                         width=80, height=64, bf=6.0)


def tiny_ba_problem(K=4, Pn=24, noise=0.02, seed=0):
    cam = TINY_CAM
    rng = np.random.default_rng(seed)
    z = rng.uniform(1.0, 3.0, Pn)
    u = rng.uniform(5, 75, Pn)
    v = rng.uniform(5, 59, Pn)
    X = np.stack([(u - cam.cx) / cam.fx * z, (v - cam.cy) / cam.fy * z, z],
                 axis=1).astype(np.float32)
    cam_idx = np.tile(np.arange(K, dtype=np.int32), Pn)
    pnt_idx = np.repeat(np.arange(Pn, dtype=np.int32), K)
    O = len(cam_idx)
    Xc = X[pnt_idx]
    uv = np.stack([cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx,
                   cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy],
                  1).astype(np.float32)
    X_noisy = X + rng.normal(0, noise, X.shape).astype(np.float32)
    prob = gba.GBAProblem(
        R=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))),
        t=jnp.asarray(rng.normal(0, 0.01, (K, 3)).astype(np.float32)),
        X=jnp.asarray(X_noisy),
        cam_free=jnp.asarray(np.asarray([False] + [True] * (K - 1))),
        cam_idx=jnp.asarray(cam_idx), pnt_idx=jnp.asarray(pnt_idx),
        uv=jnp.asarray(uv), ur=jnp.full(O, -1.0, dtype=jnp.float32),
        inv_sigma2=jnp.ones(O, dtype=jnp.float32),
        obs_valid=jnp.ones(O, dtype=bool),
    )
    return cam, prob, X


class TestDistFrontend:
    def test_sharded_extract_matches_single_device(self):
        n = min(len(jax.devices()), 8)
        m = meshmod.make_mesh(n)
        cfg = ORBConfig(n_features=64, n_levels=2, max_keypoints=64)
        rng = np.random.default_rng(0)
        images = rng.uniform(0, 255, (n, 64, 80)).astype(np.float32)
        kps = dist_frontend.extract_batch_sharded(jnp.asarray(images),
                                                  cfg, m)
        ref = jax.vmap(lambda im: orb.extract(im, cfg))(
            jnp.asarray(images))
        np.testing.assert_array_equal(np.asarray(kps.valid),
                                      np.asarray(ref.valid))
        np.testing.assert_allclose(np.asarray(kps.xy),
                                   np.asarray(ref.xy), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(kps.desc),
                                      np.asarray(ref.desc))


class TestDistBA:
    def test_shard_problem_roundtrip(self):
        cam, prob, X_true = tiny_ba_problem()
        sharded, perm = dist_ba.shard_problem(prob, 4)
        assert sharded.X.shape[0] % 4 == 0
        inv_perm = np.argsort(perm)
        np.testing.assert_allclose(
            np.asarray(sharded.X)[inv_perm][: prob.X.shape[0]],
            np.asarray(prob.X))
        # every observation must reference the point it did before
        Xs = np.asarray(sharded.X)
        n_shard = Xs.shape[0] // 4
        pts_of_obs = np.asarray(sharded.pnt_idx)
        owners = np.repeat(np.arange(4), len(pts_of_obs) // 4)
        glob = pts_of_obs + owners * n_shard
        ov = np.asarray(sharded.obs_valid)
        uv_exp = np.asarray(prob.uv)
        assert ov.sum() == int(np.asarray(prob.obs_valid).sum())

    def test_distributed_matches_single_chip(self):
        cam, prob, X_true = tiny_ba_problem()
        n = 4
        m = meshmod.make_mesh(n)
        single = gba.global_ba(cam, prob, iters=5, cg_iters=8)
        sharded, perm = dist_ba.shard_problem(prob, n)
        dist = dist_ba.distributed_global_ba(cam, sharded, m, "data",
                                             iters=5, cg_iters=8)
        inv_perm = np.argsort(perm)
        Pn = prob.X.shape[0]
        # psum reduction order != single-device order, so CG trajectories
        # differ in the last few bits; compare loosely
        np.testing.assert_allclose(np.asarray(dist.t),
                                   np.asarray(single.t), atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(dist.X)[inv_perm][:Pn],
            np.asarray(single.X), atol=5e-3)

    def test_distributed_reduces_error(self):
        cam, prob, X_true = tiny_ba_problem(noise=0.05, seed=1)
        n = 4
        m = meshmod.make_mesh(n)
        sharded, perm = dist_ba.shard_problem(prob, n)
        res = dist_ba.distributed_global_ba(cam, sharded, m, "data",
                                            iters=8, cg_iters=12)
        inv_perm = np.argsort(perm)
        Pn = prob.X.shape[0]
        X_out = np.asarray(res.X)[inv_perm][:Pn]
        err_before = np.linalg.norm(np.asarray(prob.X) - X_true, axis=1)
        err_after = np.linalg.norm(X_out - X_true, axis=1)
        assert err_after.mean() < 0.5 * err_before.mean()


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def circle_pose_graph(V=12, drift=0.03, seed=0):
    """Ground-truth poses on a circle + exact odometry/loop measurements
    + drifted initial estimates (vertex 0 fixed at gt)."""
    from orb_slam2_map_tpu.geom import sim3 as s3
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    R_gt = np.stack([_rot_y(2 * np.pi * i / V) for i in range(V)])
    t_gt = np.stack([[np.cos(2 * np.pi * i / V) * 3.0, 0.0,
                      np.sin(2 * np.pi * i / V) * 3.0]
                     for i in range(V)]).astype(np.float32)
    s_gt = np.ones(V, np.float32)

    def compose_np(Ra, ta, sa, Rb, tb, sb):
        return (np.asarray(Ra @ Rb),
                np.asarray(sa * (Ra @ tb) + ta), sa * sb)

    def inv_np(R, t, s):
        Rt = R.T
        return Rt, -(Rt @ t) / s, 1.0 / s

    edges, meas = [], []
    for i in range(V):
        j = (i + 1) % V     # odometry ring; last edge is the loop edge
        # measurement S_ji = S_j * S_i^-1 (loop_closing rel_se3
        # convention): log(S_ji * S_i * S_j^-1) = 0 at gt
        Si_inv = inv_np(R_gt[i], t_gt[i], s_gt[i])
        Rm, tm, sm = compose_np(R_gt[j], t_gt[j], s_gt[j], *Si_inv)
        edges.append((i, j))
        meas.append((Rm, tm, sm))

    # drifted initial guess: accumulate noise along the chain
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for i in range(1, V):
        dR = _rot_y(rng.normal(0, drift))
        R0.append(dR @ R_gt[i])
        t0.append(t_gt[i] + rng.normal(0, drift * 5, 3).astype(np.float32))
    R0 = np.stack(R0).astype(np.float32)
    t0 = np.stack(t0).astype(np.float32)

    ij = np.asarray(edges, np.int32)
    Rm = np.stack([m[0] for m in meas]).astype(np.float32)
    tm = np.stack([m[1] for m in meas]).astype(np.float32)
    sm = np.asarray([m[2] for m in meas], np.float32)
    ev = np.ones(len(edges), bool)
    vv = np.ones(V, bool)
    fx = np.zeros(V, bool)
    fx[0] = True
    return ((R0, t0, np.ones(V, np.float32)), ij, (Rm, tm, sm), ev, vv,
            fx, R_gt, t_gt)


class TestPoseGraph:
    def test_single_chip_recovers_circle(self):
        import jax.numpy as jnp

        from orb_slam2_map_tpu.optim import pose_graph as pg

        poses, ij, meas, ev, vv, fx, R_gt, t_gt = circle_pose_graph()
        res = pg.optimize_pose_graph(
            tuple(jnp.asarray(x) for x in poses), jnp.asarray(ij),
            tuple(jnp.asarray(x) for x in meas), jnp.asarray(ev),
            jnp.asarray(vv), jnp.asarray(fx), None, True, 15)
        err0 = np.linalg.norm(poses[1] - t_gt, axis=1).mean()
        err1 = np.linalg.norm(np.asarray(res.t) - t_gt, axis=1).mean()
        assert err1 < 0.05 * err0 + 1e-4

    def test_distributed_matches_single_chip(self):
        import jax.numpy as jnp

        from orb_slam2_map_tpu.optim import pose_graph as pg
        from orb_slam2_map_tpu.parallel import (dist_pose_graph as dpg,
                                                mesh as meshmod)

        poses, ij, meas, ev, vv, fx, R_gt, t_gt = circle_pose_graph()
        single = pg.optimize_pose_graph(
            tuple(jnp.asarray(x) for x in poses), jnp.asarray(ij),
            tuple(jnp.asarray(x) for x in meas), jnp.asarray(ev),
            jnp.asarray(vv), jnp.asarray(fx), None, True, 10)
        n = 4
        m = meshmod.make_mesh(n)
        ij_p, meas_p, ev_p = dpg.shard_edges(ij, meas, ev, n)
        dist = dpg.distributed_pose_graph(
            tuple(jnp.asarray(x) for x in poses), jnp.asarray(ij_p),
            tuple(jnp.asarray(x) for x in meas_p), jnp.asarray(ev_p),
            jnp.asarray(vv), jnp.asarray(fx), m, "data", True, 10)
        np.testing.assert_allclose(np.asarray(dist.t),
                                   np.asarray(single.t), atol=5e-3)
        err = np.linalg.norm(np.asarray(dist.t) - t_gt, axis=1).mean()
        assert err < 0.02
