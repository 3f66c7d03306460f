"""Unit test for the jitted motion-only pose optimizer (tracking hot path)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.tracking import track as track_mod

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)


def test_pose_optimize_converges_from_offset():
    key = jax.random.PRNGKey(0)
    n = 300
    X = jnp.concatenate(
        [
            jax.random.uniform(key, (n, 2), minval=-3, maxval=3),
            jax.random.uniform(jax.random.PRNGKey(1), (n, 1), minval=4, maxval=9),
        ],
        axis=-1,
    )
    xi = jnp.array([0.05, -0.02, 0.03, 0.01, -0.02, 0.005])
    R_gt, t_gt = lie.se3_exp(xi)
    uv = cam.pinhole_project(K, lie.se3_apply(R_gt, t_gt, X))
    uv = uv + 0.3 * jax.random.normal(jax.random.PRNGKey(2), uv.shape)

    # start ~10 px off
    xi0 = xi + jnp.array([0.06, 0.03, -0.04, 0.01, 0.015, -0.008])
    R0, t0 = lie.se3_exp(xi0)
    res0 = jnp.linalg.norm(
        uv - cam.pinhole_project(K, lie.se3_apply(R0, t0, X)), axis=-1
    )
    assert float(jnp.median(res0)) > 4.0  # starting offset is real

    R, t, inl, ninl = track_mod.pose_optimize(
        cam.PINHOLE, K, R0, t0, uv, X, jnp.ones(n), jnp.ones(n, bool)
    )
    assert int(ninl) > 0.9 * n
    np.testing.assert_allclose(np.array(R), np.array(R_gt), atol=2e-3)
    np.testing.assert_allclose(np.array(t), np.array(t_gt), atol=5e-3)


def test_pose_optimize_rejects_outliers():
    n = 200
    X = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(3), (n, 2), minval=-3, maxval=3),
            jax.random.uniform(jax.random.PRNGKey(4), (n, 1), minval=4, maxval=9),
        ],
        axis=-1,
    )
    R_gt, t_gt = lie.se3_exp(jnp.array([0.1, 0.0, 0.0, 0.0, 0.05, 0.0]))
    uv = cam.pinhole_project(K, lie.se3_apply(R_gt, t_gt, X))
    uv = uv.at[:30].add(
        40.0 * jax.random.rademacher(jax.random.PRNGKey(5), (30, 2)).astype(jnp.float32)
    )
    R, t, inl, ninl = track_mod.pose_optimize(
        cam.PINHOLE, K, R_gt, t_gt, uv, X, jnp.ones(n), jnp.ones(n, bool)
    )
    inl = np.array(inl)
    assert inl[:30].sum() <= 2
    assert inl[30:].mean() > 0.95
