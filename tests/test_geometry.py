import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvio_fusion_tpu.geometry import (
    exp_so3, log_so3, quat_mul, quat_conj, quat_rotate, quat_to_mat,
    mat_to_quat, slerp, rpy_to_quat, quat_to_rpy, g2R,
    se3_identity, se3_make, se3_mul, se3_inv, se3_apply, se3_exp, se3_log,
    se3_boxplus, se3_slerp, rpyxyz_to_se3, se3_to_rpyxyz, se3_to_mat,
)

KEY = jax.random.PRNGKey(0)


def rand_quat(key, shape=()):
    v = jax.random.normal(key, shape + (4,))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v * jnp.where(v[..., :1] < 0, -1.0, 1.0)


def rand_se3(key, shape=()):
    k1, k2 = jax.random.split(key)
    return se3_make(rand_quat(k1, shape), jax.random.normal(k2, shape + (3,)))


class TestSO3:
    def test_exp_log_roundtrip(self):
        # stay on the principal chart: |phi| < pi
        phi = jax.random.normal(KEY, (64, 3))
        phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True)
        phi = phi * jax.random.uniform(KEY, (64, 1), minval=0.0, maxval=3.0)
        np.testing.assert_allclose(log_so3(exp_so3(phi)), phi, atol=1e-5)

    def test_exp_log_small_angle(self):
        phi = jax.random.normal(KEY, (16, 3)) * 1e-6
        np.testing.assert_allclose(log_so3(exp_so3(phi)), phi, atol=1e-9)

    def test_exp_zero(self):
        q = exp_so3(jnp.zeros(3))
        np.testing.assert_allclose(q, jnp.array([1.0, 0, 0, 0]), atol=1e-7)

    def test_rotate_matches_matrix(self):
        q = rand_quat(KEY, (32,))
        v = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        np.testing.assert_allclose(
            quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", quat_to_mat(q), v),
            atol=1e-5,
        )

    def test_mat_quat_roundtrip(self):
        q = rand_quat(KEY, (128,))
        q2 = mat_to_quat(quat_to_mat(q))
        # same rotation up to sign (we canonicalize w >= 0)
        np.testing.assert_allclose(jnp.abs(jnp.sum(q * q2, -1)), 1.0, atol=1e-5)

    def test_mul_conj_inverse(self):
        q = rand_quat(KEY, (8,))
        qi = quat_mul(q, quat_conj(q))
        np.testing.assert_allclose(qi[..., 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(qi[..., 1:], 0.0, atol=1e-6)

    def test_slerp_endpoints_and_midpoint(self):
        q0, q1 = rand_quat(KEY), rand_quat(jax.random.PRNGKey(3))
        np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-5)
        d0 = jnp.abs(jnp.sum(slerp(q0, q1, 1.0) * q1, -1))
        np.testing.assert_allclose(d0, 1.0, atol=1e-5)

    def test_rpy_roundtrip(self):
        rpy = jnp.array([[0.1, -0.2, 0.3], [1.0, 0.5, -2.0]])
        np.testing.assert_allclose(quat_to_rpy(rpy_to_quat(rpy)), rpy, atol=1e-5)

    def test_g2R_aligns_gravity(self):
        g = jnp.array([0.3, -0.4, 9.5])
        q = g2R(g)
        aligned = quat_rotate(q, g / jnp.linalg.norm(g))
        np.testing.assert_allclose(aligned, jnp.array([0.0, 0, 1.0]), atol=1e-5)
        # yaw must be zero
        assert abs(float(quat_to_rpy(q)[2])) < 1e-5


class TestSE3:
    def test_mul_inv_identity(self):
        T = rand_se3(KEY, (16,))
        I = se3_mul(T, se3_inv(T))
        np.testing.assert_allclose(I[..., 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(I[..., 1:], 0.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        T = rand_se3(KEY, (16,))
        p = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
        M = se3_to_mat(T)
        expected = jnp.einsum("nij,nj->ni", M[:, :3, :3], p) + M[:, :3, 3]
        np.testing.assert_allclose(se3_apply(T, p), expected, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (64, 6))
        # keep the rotation part on the principal chart
        phin = jnp.linalg.norm(xi[:, :3], axis=-1, keepdims=True)
        xi = xi.at[:, :3].mul(jnp.minimum(1.0, 3.0 / phin))
        np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=1e-4)

    def test_log_exp_roundtrip(self):
        T = rand_se3(KEY, (32,))
        T2 = se3_exp(se3_log(T))
        np.testing.assert_allclose(T2, T, atol=1e-5)

    def test_boxplus_zero(self):
        T = rand_se3(KEY)
        np.testing.assert_allclose(se3_boxplus(T, jnp.zeros(6)), T, atol=1e-6)

    def test_composition_associative(self):
        a, b, c = (rand_se3(jax.random.PRNGKey(i)) for i in range(3))
        np.testing.assert_allclose(
            se3_mul(se3_mul(a, b), c), se3_mul(a, se3_mul(b, c)), atol=1e-5
        )

    def test_slerp_endpoints(self):
        T0, T1 = rand_se3(KEY), rand_se3(jax.random.PRNGKey(7))
        np.testing.assert_allclose(se3_slerp(T0, T1, 0.0), T0, atol=1e-5)
        np.testing.assert_allclose(se3_slerp(T0, T1, 1.0)[4:], T1[4:], atol=1e-5)

    def test_rpyxyz_roundtrip(self):
        v = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, -3.0])
        np.testing.assert_allclose(se3_to_rpyxyz(rpyxyz_to_se3(v)), v, atol=1e-5)

    def test_differentiable_through_boxplus(self):
        T = rand_se3(KEY)
        p = jnp.array([1.0, 2.0, 3.0])

        def f(xi):
            return jnp.sum(se3_apply(se3_boxplus(T, xi), p) ** 2)

        g = jax.grad(f)(jnp.zeros(6))
        assert jnp.all(jnp.isfinite(g))
        # finite-difference check (f32 => generous eps/tolerance)
        eps = 1e-3
        for i in range(6):
            d = jnp.zeros(6).at[i].set(eps)
            fd = (float(f(d)) - float(f(-d))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), fd, rtol=5e-2, atol=5e-3)
