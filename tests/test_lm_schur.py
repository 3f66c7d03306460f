"""Schur-complement BA solver tests: must agree with the dense engine on the
same problem and scale to a multi-view local-BA-sized synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.lm import dense, edges, schur
from orb_slam3_tpu.lm.problem import EdgeBatch, Problem
from orb_slam3_tpu.ops import lie

K = cam.make_pinhole(450.0, 450.0, 320.0, 240.0)


def multi_view_scene(key, n_cams=6, n_pts=300, noise_px=0.3):
    """Cameras on an arc looking at a landmark cloud; full visibility."""
    k1, k2, k3 = jax.random.split(key, 3)
    X = jnp.concatenate(
        [
            jax.random.uniform(k1, (n_pts, 2), minval=-3.0, maxval=3.0),
            jax.random.uniform(k2, (n_pts, 1), minval=6.0, maxval=12.0),
        ],
        axis=-1,
    )
    xis = []
    for i in range(n_cams):
        xis.append(
            jnp.array([0.4 * i, 0.02 * i, 0.01 * i, 0.0, 0.05 * i, 0.0])
        )
    xi = jnp.stack(xis)
    R, t = lie.se3_exp(xi)
    uv = jax.vmap(
        lambda Ri, ti: cam.pinhole_project(K, lie.se3_apply(Ri, ti, X))
    )(R, t)
    uv = uv + noise_px * jax.random.normal(k3, uv.shape)
    return X, R, t, uv  # uv: [n_cams, n_pts, 2]


def build_ba_problem(R0, t0, X0, uv, cam_fixed, huber=None):
    n_cams, n_pts = uv.shape[0], uv.shape[1]
    cam_idx = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), n_pts)
    lm_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), n_cams)
    E = n_cams * n_pts
    res = edges.make_mono_residual(cam.PINHOLE)

    def ba_residual(cam_state, x, data):
        return res(cam_state, {"x": x}, data)

    return schur.BAProblem(
        cams=edges.make_pose_block(R0, t0, fixed=cam_fixed),
        points=X0,
        point_fixed=jnp.zeros(n_pts, bool),
        cam_idx=cam_idx,
        lm_idx=lm_idx,
        obs_data={"uv": uv.reshape(E, 2), "K": jnp.tile(K[None], (E, 1))},
        obs_info=jnp.ones(E),
        obs_mask=jnp.ones(E, bool),
        cam_edges=(),
        residual_dim=2,
        residual=ba_residual,
        huber_delta=huber,
    )


class TestSchurBA:
    def test_matches_dense_engine(self):
        """Schur and dense paths must produce the same solution on a problem
        small enough for both."""
        key = jax.random.PRNGKey(0)
        X, R, t, uv = multi_view_scene(key, n_cams=3, n_pts=40, noise_px=0.2)
        kp = jax.random.PRNGKey(1)
        X0 = X + 0.1 * jax.random.normal(kp, X.shape)
        dxi = 0.03 * jax.random.normal(jax.random.PRNGKey(2), (3, 6))
        dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_mul(dR, dt, R, t)
        fixed = jnp.array([True, True, False])  # two fixed -> no gauge freedom

        bap = build_ba_problem(R0, t0, X0, uv, fixed)
        solved_s, stats_s = schur.solve(bap, num_iters=15, lam0=1e-6)

        # dense equivalent
        n_pts = X.shape[0]
        res = edges.make_mono_residual(cam.PINHOLE)
        eb = EdgeBatch(
            indices=(bap.cam_idx, bap.lm_idx),
            data=bap.obs_data,
            info=bap.obs_info,
            mask=bap.obs_mask,
            vertex_blocks=("pose", "point"),
            residual_dim=2,
            residual=res,
            huber_delta=None,
        )
        dp = Problem(
            blocks={
                "pose": edges.make_pose_block(R0, t0, fixed=fixed),
                "point": edges.make_point_block(X0, fixed=jnp.zeros(n_pts, bool)),
            },
            edges=(eb,),
        )
        solved_d, stats_d = dense.solve(dp, num_iters=15, lam0=1e-6)

        np.testing.assert_allclose(
            float(stats_s.cost), float(stats_d.cost), rtol=0.05
        )
        np.testing.assert_allclose(
            np.array(solved_s.cams.state["t"][2]),
            np.array(solved_d.blocks["pose"].state["t"][2]),
            atol=2e-3,
        )

    def test_local_ba_scale_converges(self):
        """Local-BA-sized problem: 6 cams, 300 pts, 1800 edges."""
        key = jax.random.PRNGKey(3)
        X, R, t, uv = multi_view_scene(key, n_cams=6, n_pts=300, noise_px=0.3)
        X0 = X + 0.1 * jax.random.normal(jax.random.PRNGKey(4), X.shape)
        dxi = 0.02 * jax.random.normal(jax.random.PRNGKey(5), (6, 6))
        dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_mul(dR, dt, R, t)
        fixed = jnp.zeros(6, bool).at[0].set(True).at[1].set(True)

        bap = build_ba_problem(R0, t0, X0, uv, fixed, huber=float(np.sqrt(5.991)))
        solved, stats = jax.jit(lambda p: schur.solve(p, num_iters=12, lam0=1e-6))(bap)
        assert float(stats.cost) < float(stats.cost0) * 0.05
        # poses recovered
        np.testing.assert_allclose(
            np.array(solved.cams.state["t"]), np.array(t), atol=0.02
        )
        # landmarks recovered
        err = jnp.linalg.norm(solved.points - X, axis=-1)
        assert float(jnp.median(err)) < 0.03

    def test_outlier_gating_roundtrip(self):
        """chi2 query + mask + re-solve (the reference's 4-round pattern)."""
        key = jax.random.PRNGKey(6)
        X, R, t, uv = multi_view_scene(key, n_cams=3, n_pts=60, noise_px=0.2)
        # corrupt view 2's obs of 6 landmarks with random (non-rigid) offsets
        off = 60.0 * jax.random.rademacher(jax.random.PRNGKey(42), (6, 2)).astype(
            jnp.float32
        ) + 10.0 * jax.random.normal(jax.random.PRNGKey(43), (6, 2))
        uv = uv.at[2, :6].add(off)
        X0 = X + 0.05 * jax.random.normal(jax.random.PRNGKey(7), X.shape)
        fixed = jnp.array([True, True, False])
        bap = build_ba_problem(R, t, X0, uv, fixed, huber=float(np.sqrt(5.991)))
        solved, _ = schur.solve(bap, num_iters=8, lam0=1e-6)
        chi2 = schur.obs_chi2(solved)
        new_mask = jnp.logical_and(bap.obs_mask, chi2 < 5.991)
        # corrupted edges must be flagged
        flagged = ~new_mask.reshape(3, 60)[2, :6]
        assert bool(jnp.all(flagged))
        import dataclasses as dc

        bap2 = dc.replace(solved, obs_mask=new_mask)
        solved2, stats2 = schur.solve(bap2, num_iters=8, lam0=1e-6)
        err = jnp.linalg.norm(solved2.points[6:] - X[6:], axis=-1)
        # 3-view triangulation floor at these depths/baselines is ~0.1
        assert float(jnp.median(err)) < 0.15
