"""Lie group identity tests (SURVEY.md §7.2 step 1: 'tests vs Sophus-derived
identities')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_tpu.ops import lie

KEY = jax.random.PRNGKey(0)


def rand_w(key, n=64, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(KEY)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_exp_is_rotation(self):
        w = rand_w(KEY, scale=5.0)
        R = lie.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0], [1e-5, 2e-5, -1e-5]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(lie.so3_log(R), w, atol=1e-7)

    def test_near_pi(self):
        axis = np.array([[1.0, 0, 0], [0, 1, 0], [1, 1, 1] / np.sqrt(3)])
        for th in [np.pi - 1e-4, np.pi - 1e-7, np.pi]:
            w = jnp.asarray(axis * th)
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            R2 = lie.so3_exp(w2)
            np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_right_jacobian_numeric(self):
        w = rand_w(KEY, n=8, scale=1.5)
        Jr = lie.so3_right_jacobian(w)
        eps = 1e-4
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            # exp(w + dw) ~ exp(w) exp(Jr dw)
            lhs = lie.so3_exp(w + dw)
            rhs = lie.so3_exp(w) @ lie.so3_exp((Jr @ dw)[..., :])
            np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_right_jacobian_inv(self):
        w = rand_w(KEY, n=16, scale=1.5)
        J = lie.so3_right_jacobian(w) @ lie.so3_right_jacobian_inv(w)
        np.testing.assert_allclose(J, jnp.broadcast_to(jnp.eye(3), J.shape), atol=1e-5)

    def test_gradients_finite_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        g2 = jax.grad(lambda w: jnp.sum(lie.so3_right_jacobian(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(g2))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 6))
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-5)

    def test_mul_inv(self):
        xi = jax.random.normal(KEY, (16, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Re, te = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(Re, jnp.broadcast_to(jnp.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(te, 0.0, atol=1e-5)

    def test_apply(self):
        xi = jax.random.normal(KEY, (4, 6))
        R, t = lie.se3_exp(xi)
        X = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        Y = lie.se3_apply(R, t, X)
        np.testing.assert_allclose(Y, (R @ X[..., None])[..., 0] + t, atol=1e-6)

    def test_rplus_matches_composition(self):
        xi = jax.random.normal(KEY, (4, 6))
        R, t = lie.se3_exp(xi)
        d = 1e-3 * jax.random.normal(jax.random.PRNGKey(2), (4, 6))
        R2, t2 = lie.se3_rplus(R, t, d)
        # rplus: Rwb <- Rwb ExpSO3(dphi), twb <- twb + Rwb dt
        np.testing.assert_allclose(R2, R @ lie.so3_exp(d[..., 3:]), atol=1e-6)
        np.testing.assert_allclose(t2, t + (R @ d[..., :3, None])[..., 0], atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 7)) * jnp.array([1, 1, 1, 1, 1, 1, 0.3])
        R, t, s = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(xi, xi2, atol=2e-4)

    def test_mul_inv(self):
        xi = jax.random.normal(KEY, (8, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inv(R, t, s)
        Re, te, se = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Re, jnp.broadcast_to(jnp.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(te, 0.0, atol=1e-5)
        np.testing.assert_allclose(se, 1.0, atol=1e-5)

    def test_sim3_exp_reduces_to_se3(self):
        xi6 = jax.random.normal(KEY, (8, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(R7, R6, atol=1e-5)
        np.testing.assert_allclose(t7, t6, atol=1e-5)
        np.testing.assert_allclose(s7, 1.0, atol=1e-6)

    def test_exp_numeric_integral(self):
        # V rho must equal the integral int_0^1 e^{s sg} exp(s phi^) rho ds
        rng = np.random.default_rng(3)
        xi = jnp.asarray(
            rng.normal(size=(5, 7)) * np.array([1, 1, 1, 0.8, 0.8, 0.8, 0.4])
        )
        _, t, _ = lie.sim3_exp(xi)
        u = jnp.linspace(0.0, 1.0, 2001)  # [U]
        rho, phi, sg = xi[:, :3], xi[:, 3:6], xi[:, 6]
        Ru = lie.so3_exp(u[:, None, None] * phi[None])  # [U, 5, 3, 3]
        integrand = jnp.exp(u[:, None] * sg[None])[..., None] * (
            Ru @ rho[None, ..., None]
        )[..., 0]  # [U, 5, 3]
        acc = jnp.trapezoid(integrand, u, axis=0)
        np.testing.assert_allclose(np.array(t), np.array(acc), atol=2e-3)


class TestQuat:
    def test_rot_quat_roundtrip(self):
        w = rand_w(KEY, n=64, scale=3.0)
        R = lie.so3_exp(w)
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_identity(self):
        q = lie.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, jnp.array([0.0, 0, 0, 1]), atol=1e-6)


class TestNormalize:
    def test_normalize_rotation(self):
        w = rand_w(KEY, n=8)
        R = lie.so3_exp(w) + 1e-3 * jax.random.normal(KEY, (8, 3, 3))
        Rn = lie.normalize_rotation(R)
        eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
        np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(Rn), 1.0, atol=1e-5)
