"""Distributed BA on the virtual 8-device CPU mesh must agree with the
single-chip Schur solver (SURVEY.md §2.4 / §7.2 step 10)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.lm import edges, schur
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.parallel import dist_ba

from test_lm_schur import multi_view_scene, build_ba_problem, K


def _scene_problem(noise=0.3):
    key = jax.random.PRNGKey(0)
    X, R, t, uv = multi_view_scene(key, n_cams=5, n_pts=160, noise_px=noise)
    X0 = X + 0.08 * jax.random.normal(jax.random.PRNGKey(1), X.shape)
    dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(2), (5, 6))
    dxi = dxi.at[0].set(0.0).at[1].set(0.0)
    dR, dt = lie.se3_exp(dxi)
    R0, t0 = lie.se3_mul(dR, dt, R, t)
    fixed = jnp.zeros(5, bool).at[0].set(True).at[1].set(True)
    return X, R, t, uv, X0, R0, t0, fixed


def test_dist_ba_matches_single_chip():
    X, R, t, uv, X0, R0, t0, fixed = _scene_problem()
    bap = build_ba_problem(R0, t0, X0, uv, fixed)
    single, stats = schur.solve(bap, num_iters=10, lam0=1e-6)

    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("lm",))
    n_dev = 8
    sharded = dist_ba.shard_ba_problem(
        n_dev,
        np.array(X0), np.zeros(X0.shape[0], bool),
        np.array(bap.cam_idx), np.array(bap.lm_idx),
        np.array(bap.obs_data["uv"]), np.array(bap.obs_info),
        np.array(bap.obs_mask),
    )
    res = edges.make_mono_residual(cam.PINHOLE)

    def ba_residual(cam_state, x, data):
        return res(cam_state, {"x": x}, data)

    cam_state = {"R": R0, "t": t0}
    cams_out, pts_out, costs = dist_ba.dist_ba_solve(
        mesh, ba_residual, edges.se3_retract, cam_state, fixed, K,
        *sharded, num_iters=10, lam0=1e-6,
    )
    assert costs[-1] < costs[0] * 0.05
    # camera poses agree with the single-chip solution
    np.testing.assert_allclose(
        np.array(cams_out["t"]), np.array(single.cams.state["t"]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.array(cams_out["R"]), np.array(single.cams.state["R"]), atol=5e-3
    )
    # landmark shards map back to the right rows and agree
    L = X0.shape[0]
    Lp = -(-L // n_dev)
    flat = np.array(pts_out).reshape(-1, 3)[:L]
    np.testing.assert_allclose(flat, np.array(single.points), atol=2e-2)
