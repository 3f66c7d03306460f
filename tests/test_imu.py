"""IMU preintegration + inertial factor tests on analytically-known motion."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.imu import factors, preintegration as pre
from orb_slam3_tpu.ops import lie

NOISE = dict(noise_gyro=1.7e-4, noise_acc=2e-3, walk_gyro=1.9e-5, walk_acc=3e-3)


def simulate_trajectory(T=1.0, hz=200, seed=0):
    """Body rotating at constant rate + sinusoid acceleration in world frame.
    Returns per-sample ideal IMU measurements and the ground-truth end state."""
    n = int(T * hz)
    dt = 1.0 / hz
    rng = np.random.default_rng(seed)
    omega = np.array([0.3, -0.2, 0.5])  # body rate, rad/s
    acc_w_fn = lambda t: np.array(
        [0.5 * np.sin(2 * t), 0.3 * np.cos(3 * t), 0.2 * np.sin(t)]
    )

    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    g = np.array([0.0, 0.0, -pre.GRAVITY])
    accs, gyros = [], []
    # fine integration (substeps) for ground truth; measurements at hz
    sub = 10
    for i in range(n):
        t = i * dt
        a_w = acc_w_fn(t)
        # measurement: specific force in body frame at sample start
        accs.append(R.T @ (a_w - g))
        gyros.append(omega)
        for k in range(sub):
            ts = t + k * dt / sub
            a_ws = acc_w_fn(ts)
            p = p + v * (dt / sub) + 0.5 * a_ws * (dt / sub) ** 2
            v = v + a_ws * (dt / sub)
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega * dt / sub)))
    return (
        np.array(accs, np.float32),
        np.array(gyros, np.float32),
        np.full(n, dt, np.float32),
        (R, v, p),
    )


class TestPreintegration:
    def test_matches_ground_truth_motion(self):
        accs, gyros, dts, (R_gt, v_gt, p_gt) = simulate_trajectory()
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(len(dts)), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        # recover world state from deltas: R_end = dR; v = g*T + dV; p = 0.5gT^2 + dP
        T = float(st.dT)
        g = np.array([0, 0, -pre.GRAVITY])
        np.testing.assert_allclose(float(st.dT), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.array(st.dR), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.array(st.dV), v_gt - g * T, atol=2e-2)
        np.testing.assert_allclose(
            np.array(st.dP), p_gt - 0.5 * g * T * T, atol=2e-2
        )

    def test_masked_padding_no_effect(self):
        accs, gyros, dts, _ = simulate_trajectory(T=0.5)
        n = len(dts)
        pad = 64
        a2 = jnp.concatenate([jnp.asarray(accs), jnp.ones((pad, 3)) * 99])
        g2 = jnp.concatenate([jnp.asarray(gyros), jnp.ones((pad, 3)) * 99])
        d2 = jnp.concatenate([jnp.asarray(dts), jnp.ones(pad) * 0.1])
        v2 = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
        st_pad = pre.integrate(a2, g2, d2, v2, jnp.zeros(3), jnp.zeros(3), **NOISE)
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(n), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        np.testing.assert_allclose(np.array(st_pad.dP), np.array(st.dP), atol=1e-6)
        np.testing.assert_allclose(np.array(st_pad.C), np.array(st.C), atol=1e-9)

    def test_bias_jacobian_first_order(self):
        """J*db correction must match re-integration with shifted bias."""
        accs, gyros, dts, _ = simulate_trajectory(T=0.5)
        n = len(dts)
        args = (jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts), jnp.ones(n))
        st0 = pre.integrate(*args, jnp.zeros(3), jnp.zeros(3), **NOISE)
        db_g = jnp.array([0.002, -0.001, 0.0015])
        db_a = jnp.array([0.01, -0.02, 0.015])
        st1 = pre.integrate(*args, db_g, db_a, **NOISE)
        np.testing.assert_allclose(
            np.array(pre.delta_rotation(st0, db_g)), np.array(st1.dR), atol=1e-4
        )
        np.testing.assert_allclose(
            np.array(pre.delta_velocity(st0, db_g, db_a)), np.array(st1.dV), atol=1e-3
        )
        np.testing.assert_allclose(
            np.array(pre.delta_position(st0, db_g, db_a)), np.array(st1.dP), atol=1e-3
        )

    def test_covariance_psd_and_growth(self):
        accs, gyros, dts, _ = simulate_trajectory(T=1.0)
        n = len(dts)
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(n), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        C = np.array(st.C)
        ev = np.linalg.eigvalsh(0.5 * (C + C.T))
        assert ev.min() > -1e-12
        assert C[0, 0] > 0 and C[3, 3] > 0 and C[6, 6] > 0 and C[9, 9] > 0

    def test_predict_state_consistency(self):
        accs, gyros, dts, (R_gt, v_gt, p_gt) = simulate_trajectory()
        n = len(dts)
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(n), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        R2, p2, v2 = pre.predict_state(
            st, jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3)
        )
        np.testing.assert_allclose(np.array(R2), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.array(v2), v_gt, atol=2e-2)
        np.testing.assert_allclose(np.array(p2), p_gt, atol=2e-2)


class TestInertialResidual:
    def test_zero_residual_on_consistent_states(self):
        accs, gyros, dts, (R_gt, v_gt, p_gt) = simulate_trajectory()
        n = len(dts)
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(n), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        data, info = factors.preint_edge_data(st)
        r = factors.inertial_residual(
            {"R": jnp.eye(3), "t": jnp.zeros(3)},
            {"v": jnp.zeros(3)},
            {"b": jnp.zeros(3)},
            {"b": jnp.zeros(3)},
            {"R": jnp.asarray(R_gt, jnp.float32), "t": jnp.asarray(p_gt, jnp.float32)},
            {"v": jnp.asarray(v_gt, jnp.float32)},
            data,
        )
        assert float(jnp.abs(r).max()) < 3e-2

    def test_gs_residual_scale_gravity(self):
        """With scaled states and rotated gravity, the GS residual is ~zero
        only at the true (s, Rwg)."""
        accs, gyros, dts, (R_gt, v_gt, p_gt) = simulate_trajectory()
        n = len(dts)
        st = pre.integrate(
            jnp.asarray(accs), jnp.asarray(gyros), jnp.asarray(dts),
            jnp.ones(n), jnp.zeros(3), jnp.zeros(3), **NOISE
        )
        data, info = factors.preint_edge_data(st)
        s_true = 2.5
        args = (
            {"R": jnp.eye(3), "t": jnp.zeros(3)},
            {"v": jnp.zeros(3)},  # start at rest
            {"b": jnp.zeros(3)},
            {"b": jnp.zeros(3)},
            {"R": jnp.asarray(R_gt, jnp.float32),
             "t": jnp.asarray(p_gt / s_true, jnp.float32)},
            {"v": jnp.asarray(v_gt / s_true, jnp.float32)},
        )
        r_true = factors.inertial_gs_residual(
            *args, {"R": jnp.eye(3)}, {"s": jnp.asarray(s_true)}, data
        )
        r_wrong = factors.inertial_gs_residual(
            *args, {"R": jnp.eye(3)}, {"s": jnp.asarray(1.0)}, data
        )
        assert float(jnp.abs(r_true).max()) < 5e-2
        assert float(jnp.abs(r_wrong).max()) > 0.1
