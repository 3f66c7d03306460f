"""Dense LM engine tests on synthetic scenes with known ground truth
(SURVEY.md §4: 'golden-file tests per pipeline stage on tiny synthetic
scenes (known poses/landmarks)')."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.lm import dense, edges
from orb_slam3_tpu.lm.problem import EdgeBatch, Problem
from orb_slam3_tpu.ops import lie

K = cam.make_pinhole(450.0, 450.0, 320.0, 240.0)


def synth_scene(key, n_pts=120, noise_px=0.5):
    """Landmarks in a box in front of the camera, ground-truth pose, pixel obs."""
    k1, k2, k3 = jax.random.split(key, 3)
    X = jnp.concatenate(
        [
            jax.random.uniform(k1, (n_pts, 2), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (n_pts, 1), minval=4.0, maxval=8.0),
        ],
        axis=-1,
    )
    xi = jnp.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01])
    R_cw, t_cw = lie.se3_exp(xi)
    uv = cam.pinhole_project(K, lie.se3_apply(R_cw, t_cw, X))
    uv = uv + noise_px * jax.random.normal(k3, uv.shape)
    return X, (R_cw, t_cw), uv


class TestPoseOnly:
    def test_motion_only_ba_converges(self):
        """PoseOptimization analogue: single pose vertex, landmarks fixed as data."""
        X, (R_gt, t_gt), uv = synth_scene(jax.random.PRNGKey(0))
        n = X.shape[0]

        pose0 = edges.make_pose_block(
            jnp.eye(3)[None], jnp.zeros((1, 3)), fixed=jnp.zeros(1, bool)
        )
        eb = EdgeBatch(
            indices=(jnp.zeros(n, jnp.int32),),
            data={"uv": uv, "K": jnp.tile(K[None], (n, 1)), "Xw": X},
            info=jnp.ones(n),
            mask=jnp.ones(n, bool),
            vertex_blocks=("pose",),
            residual_dim=2,
            residual=edges.make_mono_pose_only_residual(cam.PINHOLE),
            huber_delta=float(np.sqrt(5.991)),
        )
        problem = Problem(blocks={"pose": pose0}, edges=(eb,))
        solved, stats = jax.jit(lambda p: dense.solve(p, num_iters=10))(problem)
        R = solved.blocks["pose"].state["R"][0]
        t = solved.blocks["pose"].state["t"][0]
        assert float(stats.cost) < float(stats.cost0) * 0.01
        np.testing.assert_allclose(np.array(R), np.array(R_gt), atol=2e-3)
        np.testing.assert_allclose(np.array(t), np.array(t_gt), atol=5e-3)

    def test_outliers_rejected_by_huber(self):
        X, (R_gt, t_gt), uv = synth_scene(jax.random.PRNGKey(1), noise_px=0.2)
        n = X.shape[0]
        # corrupt 15% of observations badly
        n_out = n // 7
        uv = uv.at[:n_out].add(80.0)
        pose0 = edges.make_pose_block(
            jnp.eye(3)[None], jnp.zeros((1, 3)), fixed=jnp.zeros(1, bool)
        )
        eb = EdgeBatch(
            indices=(jnp.zeros(n, jnp.int32),),
            data={"uv": uv, "K": jnp.tile(K[None], (n, 1)), "Xw": X},
            info=jnp.ones(n),
            mask=jnp.ones(n, bool),
            vertex_blocks=("pose",),
            residual_dim=2,
            residual=edges.make_mono_pose_only_residual(cam.PINHOLE),
            huber_delta=float(np.sqrt(5.991)),
        )
        problem = Problem(blocks={"pose": pose0}, edges=(eb,))
        solved, _ = dense.solve(problem, num_iters=15)
        t = solved.blocks["pose"].state["t"][0]
        np.testing.assert_allclose(np.array(t), np.array(t_gt), atol=0.05)


class TestSmallBA:
    def test_two_view_ba(self):
        """Two poses (first fixed) + landmarks, mono edges both views."""
        key = jax.random.PRNGKey(2)
        X, (R1, t1), uv1 = synth_scene(key, n_pts=80, noise_px=0.05)
        xi2 = jnp.array([0.4, 0.05, -0.1, -0.05, 0.1, 0.03])
        R2, t2 = lie.se3_exp(xi2)
        uv2 = cam.pinhole_project(K, lie.se3_apply(R2, t2, X)) + 0.05 * jax.random.normal(
            jax.random.PRNGKey(3), (80, 2)
        )
        n = X.shape[0]

        # perturb initial geometry
        key_p = jax.random.PRNGKey(4)
        X0 = X + 0.05 * jax.random.normal(key_p, X.shape)
        xi2_0 = xi2 + 0.02 * jax.random.normal(jax.random.PRNGKey(5), (6,))
        R2_0, t2_0 = lie.se3_exp(xi2_0)

        poses = edges.make_pose_block(
            jnp.stack([R1, R2_0]), jnp.stack([t1, t2_0]),
            fixed=jnp.array([True, False]),
        )
        points = edges.make_point_block(X0, fixed=jnp.zeros(n, bool))
        res = edges.make_mono_residual(cam.PINHOLE)
        ebs = []
        for pid, uv in [(0, uv1), (1, uv2)]:
            ebs.append(
                EdgeBatch(
                    indices=(jnp.full(n, pid, jnp.int32), jnp.arange(n, dtype=jnp.int32)),
                    data={"uv": uv, "K": jnp.tile(K[None], (n, 1))},
                    info=jnp.ones(n),
                    mask=jnp.ones(n, bool),
                    vertex_blocks=("pose", "point"),
                    residual_dim=2,
                    residual=res,
                    huber_delta=float(np.sqrt(5.991)),
                )
            )
        problem = Problem(blocks={"pose": poses, "point": points}, edges=tuple(ebs))
        solved, stats = jax.jit(lambda p: dense.solve(p, num_iters=12))(problem)
        assert float(stats.cost) < float(stats.cost0)
        # mono BA has a scale gauge (first camera fixed): compare rotation
        # exactly and translation up to scale
        # tolerance = statistical (ML) error at 0.3 px noise / 80 points
        R2_est = solved.blocks["pose"].state["R"][1]
        np.testing.assert_allclose(np.array(R2_est), np.array(R2), atol=4e-3)
        # align the scale gauge about camera-1's center and compare landmarks
        X_est = solved.blocks["point"].state["x"]
        c1 = -(R1.T @ t1)
        a, b = X_est - c1, X - c1
        s = float(jnp.sum(a * b) / jnp.sum(a * a))
        err0 = float(jnp.mean(jnp.linalg.norm(X0 - X, axis=-1)))
        err1 = float(jnp.mean(jnp.linalg.norm(c1 + s * a - X, axis=-1)))
        assert err1 < err0 * 0.5
        # camera-2 center must match after the same gauge alignment
        c2_gt = -(R2.T @ t2)
        R2e = solved.blocks["pose"].state["R"][1]
        t2e = solved.blocks["pose"].state["t"][1]
        c2_est = -(R2e.T @ t2e)
        c2_aligned = c1 + s * (c2_est - c1)
        np.testing.assert_allclose(np.array(c2_aligned), np.array(c2_gt), atol=0.02)


class TestPoseGraph:
    def test_se3_chain_closes(self):
        """Odometry chain with drift + loop edge: graph optimization corrects."""
        n = 12
        # ground truth: poses around a circle
        angles = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)
        t_gt = jnp.stack([jnp.cos(angles), jnp.sin(angles), jnp.zeros(n)], axis=-1)
        R_gt = lie.so3_exp(
            jnp.stack([jnp.zeros(n), jnp.zeros(n), angles], axis=-1)
        )
        # noisy odometry initialization (drift)
        key = jax.random.PRNGKey(6)
        noise = 0.05 * jax.random.normal(key, (n, 6))
        noise = noise.at[0].set(0.0)
        R0, t0 = [], []
        for i in range(n):
            dR, dt = lie.se3_exp(noise[i])
            Ri, ti = lie.se3_mul(dR, dt, R_gt[i], t_gt[i])
            R0.append(Ri)
            t0.append(ti)
        R0, t0 = jnp.stack(R0), jnp.stack(t0)

        # relative measurements from ground truth for consecutive + loop edge
        src = jnp.arange(n, dtype=jnp.int32)
        dst = jnp.roll(src, -1)
        # T_ji = T_j * T_i^{-1}
        Rm, tm = [], []
        for i in range(n):
            j = (i + 1) % n
            Ri_inv, ti_inv = lie.se3_inv(R_gt[i], t_gt[i])
            Rji, tji = lie.se3_mul(R_gt[j], t_gt[j], Ri_inv, ti_inv)
            Rm.append(Rji)
            tm.append(tji)
        Rm, tm = jnp.stack(Rm), jnp.stack(tm)

        fixed = jnp.zeros(n, bool).at[0].set(True)
        poses = edges.make_pose_block(R0, t0, fixed=fixed)
        eb = EdgeBatch(
            indices=(src, dst),
            data={"R_ji": Rm, "t_ji": tm},
            info=jnp.ones(n),
            mask=jnp.ones(n, bool),
            vertex_blocks=("pose", "pose"),
            residual_dim=6,
            residual=edges.relative_se3_residual,
            huber_delta=None,
        )
        problem = Problem(blocks={"pose": poses}, edges=(eb,))
        solved, stats = dense.solve(problem, num_iters=20, lam0=1e-8)
        assert float(stats.cost) < 1e-3  # f32 convergence floor
        t_est = solved.blocks["pose"].state["t"]
        np.testing.assert_allclose(np.array(t_est), np.array(t_gt), atol=1e-2)
