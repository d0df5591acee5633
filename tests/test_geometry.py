import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covins_tpu.utils import geometry as geo


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return geo.quat_normalize(q)


def rand_pose(key, shape=()):
    k1, k2 = jax.random.split(key)
    q = rand_quat(k1, shape)
    t = jax.random.normal(k2, shape + (3,))
    return geo.pose_from_qt(q, t)


class TestQuaternion:
    def test_multiply_identity(self):
        key = jax.random.PRNGKey(0)
        q = rand_quat(key, (5,))
        qi = jnp.broadcast_to(geo.quat_identity(q.dtype), q.shape)
        np.testing.assert_allclose(geo.quat_multiply(q, qi), q, atol=1e-12)

    def test_rotate_matches_matrix(self):
        key = jax.random.PRNGKey(1)
        q = rand_quat(key, (7,))
        v = jax.random.normal(jax.random.PRNGKey(2), (7, 3))
        R = geo.quat_to_matrix(q)
        np.testing.assert_allclose(
            geo.quat_rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-10
        )

    def test_matrix_roundtrip(self):
        key = jax.random.PRNGKey(3)
        q = rand_quat(key, (100,))
        q2 = geo.matrix_to_quat(geo.quat_to_matrix(q))
        np.testing.assert_allclose(q2, q, atol=1e-8)

    def test_matrix_roundtrip_near_pi(self):
        # 180-degree rotations stress every Shepperd branch.
        for axis in [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [0.3, -0.8, 0.5]]:
            w = np.pi * np.asarray(axis, np.float64) / np.linalg.norm(axis)
            q = geo.quat_exp(jnp.asarray(w))
            R = geo.quat_to_matrix(q)
            q2 = geo.matrix_to_quat(R)
            np.testing.assert_allclose(
                geo.quat_to_matrix(q2), R, atol=1e-8, err_msg=f"axis={axis}"
            )

    def test_exp_log_roundtrip(self):
        # Restrict to |w| < pi: beyond that the log returns the equivalent
        # wrapped rotation (sign-canonicalized quaternions), by design.
        key = jax.random.PRNGKey(4)
        w = jax.random.normal(key, (50, 3))
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * 3.0
        w = w * jax.random.uniform(jax.random.PRNGKey(44), (50, 1))
        np.testing.assert_allclose(geo.quat_log(geo.quat_exp(w)), w, atol=1e-8)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-10, 0, 0], [0.0, 0, 0]])
        q = geo.quat_exp(w)
        np.testing.assert_allclose(q[1], geo.quat_identity(q.dtype), atol=1e-12)
        np.testing.assert_allclose(geo.quat_log(q), w, atol=1e-12)


class TestSE3:
    def test_compose_inverse(self):
        key = jax.random.PRNGKey(5)
        p = rand_pose(key, (10,))
        ident = geo.pose_compose(p, geo.pose_inverse(p))
        np.testing.assert_allclose(
            ident, jnp.broadcast_to(geo.pose_identity(p.dtype), p.shape), atol=1e-10
        )

    def test_matrix_homomorphism(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        p1, p2 = rand_pose(k1, (4,)), rand_pose(k2, (4,))
        T = geo.pose_to_matrix(geo.pose_compose(p1, p2))
        T2 = geo.pose_to_matrix(p1) @ geo.pose_to_matrix(p2)
        np.testing.assert_allclose(T, T2, atol=1e-10)

    def test_apply_matches_matrix(self):
        p = rand_pose(jax.random.PRNGKey(7), (4,))
        x = jax.random.normal(jax.random.PRNGKey(8), (4, 3))
        T = geo.pose_to_matrix(p)
        expected = jnp.einsum("nij,nj->ni", T[:, :3, :3], x) + T[:, :3, 3]
        np.testing.assert_allclose(geo.pose_apply(p, x), expected, atol=1e-10)

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(9), (30, 6))
        np.testing.assert_allclose(geo.se3_log(geo.se3_exp(xi)), xi, atol=1e-7)

    def test_boxplus_boxminus(self):
        p = rand_pose(jax.random.PRNGKey(10), (5,))
        xi = 0.1 * jax.random.normal(jax.random.PRNGKey(11), (5, 6))
        p2 = geo.pose_boxplus(p, xi)
        np.testing.assert_allclose(geo.pose_boxminus(p2, p), xi, atol=1e-8)

    def test_relative(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(12))
        pa, pb = rand_pose(k1), rand_pose(k2)
        rel = geo.pose_relative(pa, pb)
        np.testing.assert_allclose(geo.pose_compose(pa, rel), pb, atol=1e-10)


class TestSim3:
    def test_compose_apply(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(13), 3)
        g1 = geo.sim3_from_pose_scale(rand_pose(k1), jnp.asarray(2.0, jnp.float64))
        g2 = geo.sim3_from_pose_scale(rand_pose(k2), jnp.asarray(0.5, jnp.float64))
        x = jax.random.normal(k3, (6, 3))
        np.testing.assert_allclose(
            geo.sim3_apply(geo.sim3_compose(g1, g2), x),
            geo.sim3_apply(g1, geo.sim3_apply(g2, x)),
            atol=1e-9,
        )

    def test_inverse(self):
        g = geo.sim3_from_pose_scale(
            rand_pose(jax.random.PRNGKey(14)), jnp.asarray(3.0, jnp.float64)
        )
        x = jax.random.normal(jax.random.PRNGKey(15), (5, 3))
        np.testing.assert_allclose(
            geo.sim3_apply(geo.sim3_inverse(g), geo.sim3_apply(g, x)), x, atol=1e-9
        )


class TestAlignment:
    def test_umeyama_exact(self):
        key = jax.random.PRNGKey(16)
        src = jax.random.normal(key, (40, 3))
        g_true = geo.sim3_from_pose_scale(
            rand_pose(jax.random.PRNGKey(17)), jnp.asarray(1.7, jnp.float64)
        )
        dst = geo.sim3_apply(g_true, src)
        g = geo.umeyama_alignment(src, dst)
        np.testing.assert_allclose(geo.sim3_apply(g, src), dst, atol=1e-8)
        np.testing.assert_allclose(g[7], 1.7, atol=1e-8)

    def test_umeyama_masked(self):
        key = jax.random.PRNGKey(18)
        src = jax.random.normal(key, (40, 3))
        g_true = geo.sim3_from_pose_scale(rand_pose(jax.random.PRNGKey(19)), 1.0)
        dst = geo.sim3_apply(g_true, src)
        # corrupt masked-out points
        dst = dst.at[30:].set(1e3)
        w = jnp.concatenate([jnp.ones(30), jnp.zeros(10)])
        g = geo.umeyama_alignment(src, dst, weights=w, with_scale=False)
        np.testing.assert_allclose(geo.sim3_apply(g, src[:30]), dst[:30], atol=1e-8)

    def test_ate_rmse_zero(self):
        src = jax.random.normal(jax.random.PRNGKey(20), (25, 3))
        g = geo.sim3_from_pose_scale(rand_pose(jax.random.PRNGKey(21)), 2.2)
        rmse, _ = geo.ate_rmse(src, geo.sim3_apply(g, src))
        assert float(rmse) < 1e-8

    def test_jit_compatible(self):
        f = jax.jit(lambda p1, p2: geo.pose_boxminus(p1, p2))
        p1 = rand_pose(jax.random.PRNGKey(22))
        p2 = rand_pose(jax.random.PRNGKey(23))
        np.testing.assert_allclose(f(p1, p2), geo.pose_boxminus(p1, p2), atol=1e-12)


class TestEuler:
    def test_ypr(self):
        yaw, pitch, roll = 0.3, -0.2, 0.7
        qz = geo.quat_exp(jnp.array([0, 0, yaw], jnp.float64))
        qy = geo.quat_exp(jnp.array([0, pitch, 0], jnp.float64))
        qx = geo.quat_exp(jnp.array([roll, 0, 0], jnp.float64))
        R = geo.quat_to_matrix(geo.quat_multiply(geo.quat_multiply(qz, qy), qx))
        np.testing.assert_allclose(
            geo.rotation_to_ypr(R), [yaw, pitch, roll], atol=1e-10
        )

    def test_normalize_angle(self):
        a = jnp.array([0.0, 3.5, -3.5, 7.0, -7.0])
        n = geo.normalize_angle(a)
        np.testing.assert_allclose(jnp.cos(n), jnp.cos(a), atol=1e-12)
        np.testing.assert_allclose(jnp.sin(n), jnp.sin(a), atol=1e-12)
        assert bool(jnp.all((n > -np.pi - 1e-9) & (n <= np.pi + 1e-9)))
