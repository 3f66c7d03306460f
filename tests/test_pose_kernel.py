"""Pallas motion-only pose BA kernel vs the XLA reference implementation.

The kernel (tracking/pose_kernel.py) must reproduce track.pose_optimize —
same staged rounds / Huber schedule / chi2 gates (Optimizer.cc:814-1113) —
it only changes the execution strategy. Run in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.tracking import pose_kernel
from orb_slam3_tpu.tracking import track as track_mod


@pytest.mark.parametrize("n,n_out", [(300, 30), (130, 0)])
def test_pose_kernel_matches_xla(n, n_out):
    rng = np.random.default_rng(3)
    K = cam.make_pinhole(450.0, 450.0, 376.0, 240.0)
    Xw = jnp.asarray(
        np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(4, 9, (n, 1))], 1),
        jnp.float32,
    )
    xi_true = jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32)
    Rt, tt = lie.se3_exp(xi_true)
    uv = cam.pinhole_project(K, lie.se3_apply(Rt, tt, Xw))
    uv = uv + jnp.asarray(rng.normal(size=(n, 2)) * 0.5, jnp.float32)
    if n_out:
        uv = uv.at[:n_out].add(
            jnp.asarray(rng.uniform(20, 60, (n_out, 2)), jnp.float32)
        )
    valid = jnp.ones(n, bool)
    isig = jnp.ones(n, jnp.float32)
    R0, t0 = jnp.eye(3), jnp.zeros(3)

    R_x, t_x, inl_x, n_x = track_mod.pose_optimize(
        cam.PINHOLE, K, R0, t0, uv, Xw, isig, valid
    )
    with pltpu.force_tpu_interpret_mode():
        R_p, t_p, inl_p, n_p = pose_kernel.pose_optimize_pallas(
            K, R0, t0, uv, Xw, isig, valid
        )

    assert int(n_p) == int(n_x)
    assert bool(jnp.all(inl_p == inl_x))
    np.testing.assert_allclose(np.array(R_p), np.array(R_x), atol=5e-6)
    np.testing.assert_allclose(np.array(t_p), np.array(t_x), atol=5e-5)
    # and both recover the true pose
    assert float(jnp.linalg.norm(t_p - tt)) < 0.02


def test_pose_kernel_stereo_matches_xla():
    rng = np.random.default_rng(11)
    n = 256
    bf = 0.1 * 450.0
    K = cam.make_pinhole(450.0, 450.0, 376.0, 240.0)
    Xw = jnp.asarray(
        np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(4, 9, (n, 1))], 1),
        jnp.float32,
    )
    xi_true = jnp.asarray(rng.normal(size=6) * 0.04, jnp.float32)
    Rt, tt = lie.se3_exp(xi_true)
    Xc = lie.se3_apply(Rt, tt, Xw)
    uv = cam.pinhole_project(K, Xc)
    uv = uv + jnp.asarray(rng.normal(size=(n, 2)) * 0.4, jnp.float32)
    ur = uv[:, 0] - bf / Xc[:, 2] + jnp.asarray(
        rng.normal(size=n) * 0.4, jnp.float32
    )
    ur = jnp.where(jnp.asarray(rng.uniform(size=n) < 0.5), ur, -1.0)  # mixed
    valid = jnp.ones(n, bool)
    isig = jnp.ones(n, jnp.float32)
    R0, t0 = jnp.eye(3), jnp.zeros(3)

    R_x, t_x, inl_x, n_x = track_mod.pose_optimize_stereo(
        cam.PINHOLE, K, bf, R0, t0, uv, ur, Xw, isig, valid
    )
    with pltpu.force_tpu_interpret_mode():
        R_p, t_p, inl_p, n_p = pose_kernel.pose_optimize_stereo_pallas(
            K, bf, R0, t0, uv, ur, Xw, isig, valid
        )

    assert int(n_p) == int(n_x)
    assert bool(jnp.all(inl_p == inl_x))
    np.testing.assert_allclose(np.array(R_p), np.array(R_x), atol=5e-6)
    np.testing.assert_allclose(np.array(t_p), np.array(t_x), atol=1e-4)
    assert float(jnp.linalg.norm(t_p - tt)) < 0.02
