"""Pose-inertial tracking optimization (PoseInertialOptimizationLast{KeyFrame,
Frame}, Optimizer.cc:4491/4875): the current frame's 15-dof state must be
recovered from visual + inertial factors, and the marginalized prior chain
must propagate information frame to frame."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.imu import factors, preintegration as pre
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.tracking import vi_pose_opt
from test_vi_ba import NOISE, K, simulate_vi_exact


def _setup():
    kf_states, meas = simulate_vi_exact(n_kf=3, kf_dt=0.3)
    states = []
    for R, p, v in kf_states:
        states.append({
            "R": jnp.asarray(R, jnp.float32),
            "t": jnp.asarray(p, jnp.float32),
            "v": jnp.asarray(v, jnp.float32),
            "bg": jnp.zeros(3),
            "ba": jnp.zeros(3),
        })
    packed = []
    for m in meas:
        accs = jnp.asarray(np.stack([x[0] for x in m]), jnp.float32)
        gyros = jnp.asarray(np.stack([x[1] for x in m]), jnp.float32)
        dts = jnp.asarray(np.array([x[2] for x in m]), jnp.float32)
        p = pre.integrate(accs, gyros, dts, jnp.ones(len(m)),
                          jnp.zeros(3), jnp.zeros(3), **NOISE)
        d, info = factors.preint_edge_data(p)
        rw = jnp.zeros((6, 6))
        rw = rw.at[:3, :3].set(factors.gyro_rw_info(p))
        rw = rw.at[3:, 3:].set(factors.acc_rw_info(p))
        packed.append((d, info, rw))
    return states, packed


def _observations(state, n=120, noise=0.3, outlier_frac=0.0, seed=0):
    """Visual pose-only edges: world landmarks in front of the body
    (camera = body here) with pixel noise and optional gross outliers."""
    rng = np.random.default_rng(seed)
    rays = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.4, 0.4, n), np.ones(n)], -1
    )
    depths = rng.uniform(5, 12, n)
    Xc = rays * depths[:, None]
    R = np.array(state["R"], np.float64)
    t = np.array(state["t"], np.float64)
    Xw = Xc @ R.T + t
    uv = np.array(cam.pinhole_project(K, jnp.asarray(Xc, jnp.float32)))
    uv += noise * rng.standard_normal(uv.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        uv[:n_out] += rng.uniform(30, 80, (n_out, 2)) * rng.choice(
            [-1, 1], (n_out, 2)
        )
    return (jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
            n_out)


def _perturb(state, key, dp=0.03, dv=0.15):
    k1, k2 = jax.random.split(key)
    R, t = lie.se3_rplus(state["R"], state["t"],
                         dp * jax.random.normal(k1, (6,)))
    return {
        "R": R, "t": t,
        "v": state["v"] + dv * jax.random.normal(k2, (3,)),
        "bg": state["bg"], "ba": state["ba"],
    }


def _pose_err(a, b):
    dR = float(jnp.linalg.norm(lie.so3_log(a["R"].T @ b["R"])))
    dt = float(jnp.linalg.norm(a["t"] - b["t"]))
    return dR, dt


def test_last_keyframe_variant_recovers_state():
    states, packed = _setup()
    prev, cur_true = states[0], states[1]
    d, info, rw = packed[0]
    Xw, uv, _ = _observations(cur_true, seed=1)
    N = uv.shape[0]
    cur0 = _perturb(cur_true, jax.random.PRNGKey(5))

    cur, inlier, n_inl, H15 = vi_pose_opt.pose_inertial_optimize(
        cam.PINHOLE, K, 0.0, jnp.eye(3), jnp.zeros(3),
        prev, cur0, d, info, rw,
        uv, -jnp.ones(N), Xw, jnp.ones(N), jnp.ones(N, bool),
    )
    dR, dt = _pose_err(cur, cur_true)
    assert dt < 0.02 and dR < 0.01, (dt, dR)
    assert float(jnp.linalg.norm(cur["v"] - cur_true["v"])) < 0.08
    assert int(n_inl) > 0.9 * N
    # marginal prior must be PSD and carry real information
    w = np.linalg.eigvalsh(np.array(H15))
    assert w.min() > -1e-3 and w.max() > 1.0


def test_last_frame_variant_with_prior_chain():
    states, packed = _setup()
    # frame 1 optimized against KF0 -> produces the prior
    d0, i0, rw0 = packed[0]
    Xw1, uv1, _ = _observations(states[1], seed=2)
    N = uv1.shape[0]
    f1, _, _, H1 = vi_pose_opt.pose_inertial_optimize(
        cam.PINHOLE, K, 0.0, jnp.eye(3), jnp.zeros(3),
        states[0], _perturb(states[1], jax.random.PRNGKey(6)),
        d0, i0, rw0,
        uv1, -jnp.ones(N), Xw1, jnp.ones(N), jnp.ones(N, bool),
    )
    # frame 2 against free frame 1 + prior (LastFrame variant)
    d1, i1, rw1 = packed[1]
    Xw2, uv2, n_out = _observations(states[2], outlier_frac=0.15, seed=3)
    prior_data = {
        "R0": f1["R"], "t0": f1["t"], "v0": f1["v"],
        "bg0p": f1["bg"], "ba0p": f1["ba"],
    }
    cur0 = _perturb(states[2], jax.random.PRNGKey(7))
    cur, inlier, n_inl, H2 = vi_pose_opt.pose_inertial_optimize(
        cam.PINHOLE, K, 0.0, jnp.eye(3), jnp.zeros(3),
        f1, cur0, d1, i1, rw1,
        uv2, -jnp.ones(N), Xw2, jnp.ones(N), jnp.ones(N, bool),
        prior_data=prior_data, prior_H=H1, free_prev=True,
    )
    dR, dt = _pose_err(cur, states[2])
    assert dt < 0.03 and dR < 0.015, (dt, dR)
    # gross outliers must be gated out
    inl = np.array(inlier)
    assert inl[:n_out].sum() <= 0.2 * n_out
    assert inl[n_out:].mean() > 0.85
    w = np.linalg.eigvalsh(np.array(H2))
    assert w.min() > -1e-3


def test_stereo_edges_contribute():
    states, packed = _setup()
    prev, cur_true = states[0], states[1]
    d, info, rw = packed[0]
    Xw, uv, _ = _observations(cur_true, n=80, seed=4)
    N = uv.shape[0]
    bf = 40.0
    # synthesize right-cam u from ground truth depth
    Rcw, tcw = lie.se3_inv(cur_true["R"], cur_true["t"])
    z = (jnp.einsum("ij,nj->ni", Rcw, Xw) + tcw)[:, 2]
    ur = uv[:, 0] - bf / z
    cur0 = _perturb(cur_true, jax.random.PRNGKey(8))
    cur, inlier, n_inl, _ = vi_pose_opt.pose_inertial_optimize(
        cam.PINHOLE, K, bf, jnp.eye(3), jnp.zeros(3),
        prev, cur0, d, info, rw,
        uv, ur, Xw, jnp.ones(N), jnp.ones(N, bool),
    )
    dR, dt = _pose_err(cur, cur_true)
    assert dt < 0.02 and dR < 0.01, (dt, dR)
    assert int(n_inl) > 0.85 * N
