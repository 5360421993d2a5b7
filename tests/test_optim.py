import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_map_tpu.geom import se3
from orb_slam2_map_tpu.io.synthetic import synthetic_camera
from orb_slam2_map_tpu.optim import epnp, horn, local_ba, pose_opt, triangulate


CAM = synthetic_camera()


def make_scene(key, n_points=200, depth_range=(1.0, 6.0)):
    """Random world points in front of an identity camera + a GT pose."""
    k1, k2, k3 = jax.random.split(key, 3)
    z = jax.random.uniform(k1, (n_points,), minval=depth_range[0],
                           maxval=depth_range[1])
    u = jax.random.uniform(k2, (n_points,), minval=40.0, maxval=600.0)
    v = jax.random.uniform(k3, (n_points,), minval=40.0, maxval=440.0)
    x = (u - CAM.cx) / CAM.fx * z
    y = (v - CAM.cy) / CAM.fy * z
    X = jnp.stack([x, y, z], axis=-1)
    return X


def project_points(R, t, X, stereo=True):
    Xc = X @ R.T + t
    z = Xc[:, 2]
    u = CAM.fx * Xc[:, 0] / z + CAM.cx
    v = CAM.fy * Xc[:, 1] / z + CAM.cy
    uv = jnp.stack([u, v], axis=-1)
    ur = u - CAM.bf / z if stereo else jnp.full_like(u, -1.0)
    return uv, ur


class TestPoseOpt:
    def test_converges_from_perturbed_pose(self):
        key = jax.random.PRNGKey(0)
        X = make_scene(key)
        R_gt, t_gt = se3.se3_exp(jnp.asarray([0.1, -0.05, 0.02, 0.03, -0.02, 0.05]))
        uv, ur = project_points(R_gt, t_gt, X)
        # perturb initial pose
        R0, t0 = se3.se3_exp(jnp.asarray([0.15, 0.1, -0.1, 0.05, 0.04, -0.06]))
        R0, t0 = se3.compose(R0, t0, R_gt, t_gt)
        inv_sigma2 = jnp.ones(X.shape[0])
        valid = jnp.ones(X.shape[0], dtype=bool)
        res = pose_opt.pose_optimize(CAM, R0, t0, X, uv, ur, inv_sigma2, valid)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_gt), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=1e-3)
        assert int(res.n_inliers) == X.shape[0]

    def test_rejects_outliers(self):
        key = jax.random.PRNGKey(1)
        X = make_scene(key)
        R_gt, t_gt = se3.identity()
        uv, ur = project_points(R_gt, t_gt, X)
        # corrupt 30% of observations
        n = X.shape[0]
        n_bad = int(0.3 * n)
        noise = jax.random.uniform(jax.random.PRNGKey(2), (n_bad, 2),
                                   minval=-100.0, maxval=100.0) + 30.0
        uv = uv.at[:n_bad].add(noise)
        R0, t0 = se3.se3_exp(jnp.asarray([0.05, 0.02, -0.03, 0.01, 0.02, -0.01]))
        inv_sigma2 = jnp.ones(n)
        valid = jnp.ones(n, dtype=bool)
        res = pose_opt.pose_optimize(CAM, R0, t0, X, uv, ur, inv_sigma2, valid)
        inl = np.asarray(res.inliers)
        assert inl[:n_bad].sum() < 5           # outliers flagged
        assert inl[n_bad:].mean() > 0.95       # inliers kept
        np.testing.assert_allclose(np.asarray(res.t), np.zeros(3), atol=5e-3)

    def test_mono_only(self):
        X = make_scene(jax.random.PRNGKey(3))
        R_gt, t_gt = se3.identity()
        uv, _ = project_points(R_gt, t_gt, X)
        ur = jnp.full(X.shape[0], -1.0)
        R0, t0 = se3.se3_exp(jnp.asarray([0.02, 0.02, -0.02, 0.02, -0.02, 0.01]))
        res = pose_opt.pose_optimize(CAM, R0, t0, X, uv, ur,
                                     jnp.ones(X.shape[0]),
                                     jnp.ones(X.shape[0], dtype=bool))
        np.testing.assert_allclose(np.asarray(res.t), np.zeros(3), atol=5e-3)


class TestHorn:
    def test_rigid_recovery(self):
        key = jax.random.PRNGKey(4)
        A = jax.random.normal(key, (20, 3))
        R_gt, t_gt = se3.se3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.4, 0.1, -0.3]))
        B = A @ R_gt.T + t_gt
        R, t, s = horn.absolute_orientation(A, B)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-5)
        assert float(s) == pytest.approx(1.0)

    def test_scale_recovery(self):
        A = jax.random.normal(jax.random.PRNGKey(5), (15, 3))
        R_gt, t_gt = se3.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.2, -0.3, 0.1]))
        B = 2.7 * (A @ R_gt.T) + t_gt
        R, t, s = horn.absolute_orientation(A, B, with_scale=True)
        assert float(s) == pytest.approx(2.7, rel=1e-5)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-5)

    def test_batched(self):
        A = jax.random.normal(jax.random.PRNGKey(6), (5, 10, 3))
        B = A + jnp.asarray([1.0, 2.0, 3.0])
        R, t, s = horn.absolute_orientation(A, B)
        assert R.shape == (5, 3, 3)
        np.testing.assert_allclose(np.asarray(t),
                                   np.tile([1.0, 2.0, 3.0], (5, 1)), atol=1e-5)


class TestEPnP:
    def test_exact_solve(self):
        X = make_scene(jax.random.PRNGKey(7), 30)
        R_gt, t_gt = se3.se3_exp(jnp.asarray([0.2, -0.1, 0.3, 0.1, -0.2, 0.15]))
        uv, _ = project_points(R_gt, t_gt, X)
        R, t, err = epnp.epnp_solve(CAM, X, uv)
        assert float(err) < 1.0
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=2e-2)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-2)

    def test_ransac_with_outliers(self):
        n = 128
        X = make_scene(jax.random.PRNGKey(8), n)
        R_gt, t_gt = se3.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, 0.1, -0.05]))
        uv, _ = project_points(R_gt, t_gt, X)
        n_bad = 50
        uv = uv.at[:n_bad].add(
            jax.random.uniform(jax.random.PRNGKey(9), (n_bad, 2),
                               minval=25.0, maxval=120.0))
        res = epnp.pnp_ransac(CAM, X, uv, jnp.ones(n), jnp.ones(n, dtype=bool),
                              jax.random.PRNGKey(10))
        assert bool(res.ok)
        assert int(res.n_inliers) >= n - n_bad - 5
        inl = np.asarray(res.inliers)
        assert inl[:n_bad].sum() <= 3
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=0.05)


class TestTriangulate:
    def test_dlt_exact(self):
        X = make_scene(jax.random.PRNGKey(11), 50)
        R1, t1 = se3.identity()
        R2, t2 = se3.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))
        uv1, _ = project_points(R1, t1, X)
        uv2, _ = project_points(R2, t2, X)
        P1 = triangulate.projection_matrix(CAM, R1, t1)
        P2 = triangulate.projection_matrix(CAM, R2, t2)
        Xr = triangulate.triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), atol=1e-2)

    def test_gates_accept_good_points(self):
        X = make_scene(jax.random.PRNGKey(12), 50)
        R1, t1 = se3.identity()
        R2, t2 = se3.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))
        uv1, ur1 = project_points(R1, t1, X)
        uv2, ur2 = project_points(R2, t2, X)
        ok = triangulate.acceptance_gates(
            CAM, R1, t1, R2, t2, X, uv1, uv2, ur1, ur2,
            jnp.ones(50), jnp.ones(50))
        assert np.asarray(ok).mean() > 0.95

    def test_gates_reject_behind_camera(self):
        X = make_scene(jax.random.PRNGKey(13), 10)
        X = X.at[:, 2].set(-2.0)
        R1, t1 = se3.identity()
        R2, t2 = se3.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.0, 0.0]))
        uv = jnp.zeros((10, 2))
        ur = jnp.full(10, -1.0)
        ok = triangulate.acceptance_gates(
            CAM, R1, t1, R2, t2, X, uv, uv, ur, ur, jnp.ones(10), jnp.ones(10))
        assert not np.asarray(ok).any()


class TestLocalBA:
    def _make_problem(self, key, P=256, K=4, F=2, noise_px=0.5,
                      perturb=0.02):
        """K free cams + F fixed cams all observing P points."""
        X_gt = make_scene(key, P, depth_range=(2.0, 8.0))
        ks = jax.random.split(key, K + F + 2)
        poses = []
        for i in range(K + F):
            xi = jax.random.normal(ks[i], (6,)) * 0.05
            xi = xi.at[:3].add(jnp.asarray([0.2 * i - 0.3, 0.0, 0.0]))
            poses.append(se3.se3_exp(xi))
        uv_all, ur_all = [], []
        for R, t in poses:
            uv, ur = project_points(R, t, X_gt)
            uv_all.append(uv)
            ur_all.append(ur)
        uv_all = jnp.stack(uv_all, axis=1)    # [P, K+F, 2]
        ur_all = jnp.stack(ur_all, axis=1)
        uv_all = uv_all + noise_px * jax.random.normal(ks[-1], uv_all.shape)

        R_free = jnp.stack([p[0] for p in poses[:K]])
        t_free = jnp.stack([p[1] for p in poses[:K]])
        R_fix = jnp.stack([p[0] for p in poses[K:]])
        t_fix = jnp.stack([p[1] for p in poses[K:]])

        # perturb free poses + points (simulate drift)
        dxi = jax.random.normal(ks[-2], (K, 6)) * perturb
        dR, dt = se3.se3_exp(dxi)
        R0, t0 = se3.compose(dR, dt, R_free, t_free)
        X0 = X_gt + jax.random.normal(ks[-2], X_gt.shape) * perturb

        prob = local_ba.BAProblem(
            R_free=R0, t_free=t0, R_fix=R_fix, t_fix=t_fix, X=X0,
            cam_valid=jnp.ones(K, dtype=bool),
            point_valid=jnp.ones(P, dtype=bool),
            uv_free=uv_all[:, :K], ur_free=ur_all[:, :K],
            inv_sigma2_free=jnp.ones((P, K)),
            mask_free=jnp.ones((P, K), dtype=bool),
            uv_fix=uv_all[:, K:], ur_fix=ur_all[:, K:],
            inv_sigma2_fix=jnp.ones((P, F)),
            mask_fix=jnp.ones((P, F), dtype=bool),
        )
        return prob, (R_free, t_free), X_gt

    def test_converges_to_ground_truth(self):
        prob, (R_gt, t_gt), X_gt = self._make_problem(jax.random.PRNGKey(20),
                                                      noise_px=0.0)
        res = local_ba.local_ba(CAM, prob)
        np.testing.assert_allclose(np.asarray(res.t_free), np.asarray(t_gt),
                                   atol=5e-3)
        err = np.linalg.norm(np.asarray(res.X) - np.asarray(X_gt), axis=1)
        assert np.median(err) < 5e-3

    def test_with_noise_improves(self):
        prob, (R_gt, t_gt), X_gt = self._make_problem(jax.random.PRNGKey(21),
                                                      noise_px=0.5)
        before = np.linalg.norm(np.asarray(prob.t_free) - np.asarray(t_gt), axis=1).mean()
        res = local_ba.local_ba(CAM, prob)
        after = np.linalg.norm(np.asarray(res.t_free) - np.asarray(t_gt), axis=1).mean()
        assert after < before * 0.3
        assert np.asarray(res.inlier_free).mean() > 0.9

    def test_outlier_observations_pruned(self):
        prob, _, _ = self._make_problem(jax.random.PRNGKey(22), noise_px=0.3)
        # corrupt some observations of cam 0
        uv = prob.uv_free.at[:30, 0].add(60.0)
        prob = prob._replace(uv_free=uv)
        res = local_ba.local_ba(CAM, prob)
        inl = np.asarray(res.inlier_free)
        assert inl[:30, 0].sum() <= 2
        assert inl[30:].mean() > 0.9

    def test_fixed_cams_unchanged(self):
        prob, _, _ = self._make_problem(jax.random.PRNGKey(23))
        R_fix_before = np.asarray(prob.R_fix).copy()
        res = local_ba.local_ba(CAM, prob)
        np.testing.assert_array_equal(np.asarray(prob.R_fix), R_fix_before)
