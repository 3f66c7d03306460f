"""Inertial initialization: recover metric scale + gravity direction from a
visually-tracked (scale-free, gravity-misaligned) trajectory + IMU.
(LocalMapping::InitializeIMU contract, config #3 of BASELINE.md.)"""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.imu import factors, initialization, preintegration as pre
from orb_slam3_tpu.ops import lie

NOISE = dict(noise_gyro=1.7e-4, noise_acc=2e-3, walk_gyro=1.9e-5, walk_acc=3e-3)


def simulate_vi(n_kf=6, kf_dt=0.5, hz=200, seed=0):
    """True trajectory with known IMU; returns per-interval measurements and
    true KF states."""
    g = np.array([0.0, 0.0, -pre.GRAVITY])
    omega_fn = lambda t: np.array(
        [0.4 * np.sin(0.8 * t), 0.3 * np.cos(0.5 * t), 0.25]
    )
    acc_w_fn = lambda t: np.array(
        [1.2 * np.sin(2.0 * t), 0.8 * np.cos(2.6 * t), 0.5 * np.sin(1.3 * t)]
    )
    dt = 1.0 / hz
    T = n_kf * kf_dt
    n = int(T * hz)
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    kf_states = [(R.copy(), p.copy(), v.copy())]
    measurements = [[]]
    per_kf = int(kf_dt * hz)
    sub = 6  # fine substeps for ground truth; measurement taken at midpoint
    for i in range(n):
        t = i * dt
        R_mid = None
        for k in range(sub):
            ts = t + k * dt / sub
            if k == sub // 2:
                R_mid = R.copy()
            a = acc_w_fn(ts)
            p = p + v * (dt / sub) + 0.5 * a * (dt / sub) ** 2
            v = v + a * (dt / sub)
            R = R @ np.array(lie.so3_exp(jnp.asarray(omega_fn(ts) * dt / sub)))
        # midpoint-sampled measurement (2nd-order accurate w.r.t. the
        # piecewise-constant preintegration model)
        tm = t + 0.5 * dt
        measurements[-1].append((R_mid.T @ (acc_w_fn(tm) - g), omega_fn(tm), dt))
        if (i + 1) % per_kf == 0:
            kf_states.append((R.copy(), p.copy(), v.copy()))
            if i + 1 < n:
                measurements.append([])
    return kf_states, measurements


def test_inertial_init_recovers_scale_and_gravity():
    kf_states, meas = simulate_vi()
    n_kf = len(kf_states)

    preints = []
    for m in meas:
        accs = jnp.asarray(np.stack([x[0] for x in m]), jnp.float32)
        gyros = jnp.asarray(np.stack([x[1] for x in m]), jnp.float32)
        dts = jnp.asarray(np.array([x[2] for x in m]), jnp.float32)
        preints.append(
            pre.integrate(accs, gyros, dts, jnp.ones(len(m)),
                          jnp.zeros(3), jnp.zeros(3), **NOISE)
        )

    # visual world: rotated by Rmis, scaled by 1/s_true
    s_true = 3.0
    Rmis = np.array(lie.so3_exp(jnp.array([0.15, -0.1, 0.3])))
    R_wb = jnp.asarray(
        np.stack([Rmis @ st[0] for st in kf_states]), jnp.float32
    )
    t_wb = jnp.asarray(
        np.stack([(Rmis @ st[1]) / s_true for st in kf_states]), jnp.float32
    )

    out = initialization.inertial_only_optimization(R_wb, t_wb, preints)
    s_est = float(out["scale"])
    assert abs(s_est - s_true) / s_true < 0.05, s_est

    # gravity in the visual frame must match Rmis*g
    g_est = np.array(out["Rwg"] @ jnp.array([0.0, 0.0, -pre.GRAVITY]))
    g_true = Rmis @ np.array([0.0, 0.0, -pre.GRAVITY])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.999, (g_est, g_true)

    # velocities (scaled into the visual frame = v_true/s... the GS model
    # estimates visual-frame velocities v_vis with s*v_vis = world velocity)
    v_est = np.array(out["velocities"])
    v_true = np.stack([Rmis @ st[2] for st in kf_states]) / s_true
    err = np.linalg.norm(v_est - v_true, axis=1)
    assert np.median(err) < 0.1 * np.linalg.norm(v_true, axis=1).max()

    # biases near zero (unbiased simulation)
    assert float(jnp.linalg.norm(out["bg"])) < 0.01


def test_linear_alignment_recovers_scale_under_pose_noise():
    """The errors-in-variables-correct closed-form alignment must stay
    unbiased when the visual translations carry noise — the regime where
    the MAP formulation (scale multiplying the noisy displacement,
    Optimizer.cc:3042 EdgeInertialGS) attenuates the scale toward zero."""
    kf_states, meas = simulate_vi(n_kf=10, kf_dt=0.3)

    preints = []
    for m in meas:
        accs = jnp.asarray(np.stack([x[0] for x in m]), jnp.float32)
        gyros = jnp.asarray(np.stack([x[1] for x in m]), jnp.float32)
        dts = jnp.asarray(np.array([x[2] for x in m]), jnp.float32)
        preints.append(
            pre.integrate(accs, gyros, dts, jnp.ones(len(m)),
                          jnp.zeros(3), jnp.zeros(3), **NOISE)
        )

    s_true = 6.0
    Rmis = np.array(lie.so3_exp(jnp.array([0.1, -0.2, 0.25])))
    rng = np.random.default_rng(7)
    R_wb = jnp.asarray(
        np.stack([Rmis @ st[0] for st in kf_states]), jnp.float32
    )
    # 10 % relative translation noise — the level the synthetic SLAM
    # drives actually produce
    t_clean = np.stack([(Rmis @ st[1]) / s_true for st in kf_states])
    step = np.median(np.linalg.norm(np.diff(t_clean, axis=0), axis=1))
    t_noisy = t_clean + rng.normal(0, 0.1 * step, t_clean.shape)
    t_wb = jnp.asarray(t_noisy, jnp.float32)

    s, s_q, Rwg, v_vis = initialization.linear_alignment(R_wb, t_wb, preints)
    assert abs(s - s_true) / s_true < 0.15, (s, s_q)
    assert abs(s_q - s_true) / s_true < 0.3, (s, s_q)
    g_est = np.array(Rwg @ jnp.array([0.0, 0.0, -pre.GRAVITY]))
    g_true = Rmis @ np.array([0.0, 0.0, -pre.GRAVITY])
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.995, (g_est, g_true)
