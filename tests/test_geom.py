import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_map_tpu.geom import se3, sim3, camera
from orb_slam2_map_tpu.config import tum1_camera


def random_rotations(key, n):
    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return se3.from_quaternion(q)


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        mag = jax.random.uniform(jax.random.PRNGKey(1), (64, 1), minval=0.0, maxval=3.0)
        phi = d * mag
        R = se3.so3_exp(phi)
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2), atol=2e-4)

    def test_log_near_pi(self):
        d = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.6, 0.8]])
        for mag in (3.05, 3.12):
            phi = d * mag
            R = se3.so3_exp(phi)
            phi2 = se3.so3_log(R)
            np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2), atol=5e-3)

    def test_exp_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        R = random_rotations(jax.random.PRNGKey(1), 32)
        RtR = jnp.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(
            np.asarray(RtR), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
        )


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(2)
        xi = jax.random.normal(key, (64, 6)) * 0.7
        R, t = se3.se3_exp(xi)
        xi2 = se3.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=3e-4)

    def test_compose_inverse(self):
        key = jax.random.PRNGKey(3)
        xi = jax.random.normal(key, (8, 6))
        R, t = se3.se3_exp(xi)
        Ri, ti = se3.inverse(R, t)
        Rc, tc = se3.compose(R, t, Ri, ti)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)

    def test_quaternion_roundtrip(self):
        R = random_rotations(jax.random.PRNGKey(4), 64)
        q = se3.to_quaternion(R)
        R2 = se3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_matrix_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(5), (4, 6))
        R, t = se3.se3_exp(xi)
        T = se3.to_matrix(R, t)
        R2, t2 = se3.from_matrix(T)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2))
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2))


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(6)
        xi = jax.random.normal(key, (32, 7)) * 0.6
        R, t, s = sim3.exp(xi)
        xi2 = sim3.log(R, t, s)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-3)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(7), (8, 7)) * 0.5
        R, t, s = sim3.exp(xi)
        Ri, ti, si = sim3.inverse(R, t, s)
        Rc, tc, sc = sim3.compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(
            np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sc), np.ones(8), atol=1e-5)

    def test_act_matches_composition(self):
        xi = jax.random.normal(jax.random.PRNGKey(8), (7,)) * 0.5
        R, t, s = sim3.exp(xi)
        X = jax.random.normal(jax.random.PRNGKey(9), (10, 3))
        Y = sim3.act(R, t, s, X)
        Y2 = s * (X @ np.asarray(R).T) + t
        np.testing.assert_allclose(np.asarray(Y), np.asarray(Y2), atol=1e-5)

    def test_identity_scale_matches_se3(self):
        xi6 = jax.random.normal(jax.random.PRNGKey(10), (6,))
        xi7 = jnp.concatenate([xi6, jnp.zeros(1)])
        R7, t7, s7 = sim3.exp(xi7)
        R6, t6 = se3.se3_exp(xi6)
        np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-4)
        assert abs(float(s7) - 1.0) < 1e-6


class TestCamera:
    def test_project_unproject(self):
        cam = tum1_camera()
        key = jax.random.PRNGKey(11)
        X = jnp.stack(
            [
                jax.random.uniform(key, (100,), minval=-1, maxval=1),
                jax.random.uniform(key, (100,), minval=-1, maxval=1),
                jax.random.uniform(key, (100,), minval=0.5, maxval=5.0),
            ],
            axis=-1,
        )
        uv = camera.project(cam, X)
        X2 = camera.unproject(cam, uv, X[..., 2])
        np.testing.assert_allclose(np.asarray(X), np.asarray(X2), atol=1e-4)

    def test_undistort_roundtrip(self):
        cam = tum1_camera()
        xn = jax.random.uniform(jax.random.PRNGKey(12), (50, 2), minval=-0.3, maxval=0.3)
        xd = camera.distort(cam, xn)
        uv_dist = xd * jnp.array([cam.fx, cam.fy]) + jnp.array([cam.cx, cam.cy])
        uv_und = camera.undistort_points(cam, uv_dist, iters=20)
        expected = xn * jnp.array([cam.fx, cam.fy]) + jnp.array([cam.cx, cam.cy])
        np.testing.assert_allclose(np.asarray(uv_und), np.asarray(expected), atol=0.05)

    def test_stereo_projection(self):
        cam = tum1_camera()
        X = jnp.array([[0.5, -0.2, 2.0]])
        uvr = camera.project_stereo(cam, X)
        assert uvr.shape == (1, 3)
        assert float(uvr[0, 2]) == pytest.approx(float(uvr[0, 0]) - cam.bf / 2.0, abs=1e-4)
