"""Visual-inertial BA window test: velocities/biases only observable through
the inertial chain must be recovered alongside poses and landmarks."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.imu import factors, preintegration as pre, vi_ba
from orb_slam3_tpu.ops import lie
from test_imu_init import NOISE as NOISE_RAW

# inflated noise (10x), as real VI configs use (discretization + model error
# must live inside the modeled noise or the inertial factors overpower)
NOISE = {k: v * 10.0 for k, v in NOISE_RAW.items()}

K = cam.make_pinhole(400.0, 400.0, 320.0, 240.0)


def simulate_vi_exact(n_kf=5, kf_dt=0.4, hz=200):
    """Ground truth propagated with EXACTLY the discrete recursion the
    preintegration model assumes (piecewise-constant body-frame specific
    force/rate; position/velocity updated with the old rotation) — so the
    true states are exactly consistent with the factors and the solver is
    tested in isolation from discretization modeling error."""
    g = np.array([0.0, 0.0, -pre.GRAVITY])
    dt = 1.0 / hz
    n = int(n_kf * kf_dt * hz)
    per_kf = int(kf_dt * hz)
    R = np.eye(3)
    v = np.zeros(3)
    p = np.zeros(3)
    kf_states = [(R.copy(), p.copy(), v.copy())]
    measurements = [[]]
    for i in range(n):
        t = i * dt
        w_b = np.array([0.4 * np.sin(0.8 * t), 0.3 * np.cos(0.5 * t), 0.25])
        a_b = np.array(
            [1.2 * np.sin(2.0 * t), 0.8 * np.cos(2.6 * t), 0.5 * np.sin(1.3 * t)]
        ) - R.T @ g  # specific force for this body acceleration profile
        measurements[-1].append((a_b.copy(), w_b.copy(), dt))
        a_w = R @ a_b + g
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.array(lie.so3_exp(jnp.asarray(w_b * dt)))
        if (i + 1) % per_kf == 0:
            kf_states.append((R.copy(), p.copy(), v.copy()))
            if i + 1 < n:
                measurements.append([])
    return kf_states, measurements


def test_local_inertial_ba_recovers_states():
    kf_states, meas = simulate_vi_exact(n_kf=5, kf_dt=0.4)
    W = len(kf_states)
    Rwb = jnp.asarray(np.stack([s[0] for s in kf_states]), jnp.float32)
    twb = jnp.asarray(np.stack([s[1] for s in kf_states]), jnp.float32)
    vel = jnp.asarray(np.stack([s[2] for s in kf_states]), jnp.float32)

    preints = []
    for m in meas:
        accs = jnp.asarray(np.stack([x[0] for x in m]), jnp.float32)
        gyros = jnp.asarray(np.stack([x[1] for x in m]), jnp.float32)
        dts = jnp.asarray(np.array([x[2] for x in m]), jnp.float32)
        preints.append(
            pre.integrate(accs, gyros, dts, jnp.ones(len(m)),
                          jnp.zeros(3), jnp.zeros(3), **NOISE)
        )

    datas, infos, rws = [], [], []
    for p in preints:
        d, info = factors.preint_edge_data(p)
        datas.append(d)
        infos.append(info)
        rw = jnp.zeros((6, 6))
        rw = rw.at[:3, :3].set(factors.gyro_rw_info(p))
        rw = rw.at[3:, 3:].set(factors.acc_rw_info(p))
        rws.append(rw)
    preint_data = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    preint_info = jnp.stack(infos)
    rw_info = jnp.stack(rws)

    # landmarks visible from the bodies (camera = body, z forward)
    rng = np.random.default_rng(0)
    L = 150
    # place points in front of the FIRST camera, deep enough to stay visible
    rays = np.stack(
        [rng.uniform(-0.5, 0.5, L), rng.uniform(-0.4, 0.4, L), np.ones(L)], -1
    )
    depths = rng.uniform(6, 14, L)
    X = jnp.asarray((rays * depths[:, None]) @ np.array(Rwb[0]).T + np.array(twb[0]), jnp.float32)

    cam_idx = jnp.repeat(jnp.arange(W, dtype=jnp.int32), L)
    lm_idx = jnp.tile(jnp.arange(L, dtype=jnp.int32), W)
    Rcw = jnp.swapaxes(Rwb, 1, 2)
    tcw = -jnp.einsum("kij,kj->ki", Rcw, twb)
    Xc = jnp.einsum("kij,lj->kli", Rcw, X) + tcw[:, None, :]
    uv = cam.pinhole_project(K, Xc.reshape(-1, 3)).reshape(W, L, 2)
    vis = (Xc[..., 2] > 1.0).reshape(-1)
    uv = uv.reshape(-1, 2) + 0.4 * jax.random.normal(jax.random.PRNGKey(1), (W * L, 2))
    in_img = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
    obs_mask = vis & in_img
    assert int(obs_mask.sum()) > 300

    # perturb everything except KF0
    key = jax.random.PRNGKey(2)
    dpose = 0.02 * jax.random.normal(key, (W, 6))
    dpose = dpose.at[0].set(0.0)
    Rp, tp = jax.vmap(lambda R, t, d: lie.se3_rplus(R, t, d))(Rwb, twb, dpose)
    vp = vel + 0.2 * jax.random.normal(jax.random.PRNGKey(3), (W, 3))
    vp = vp.at[0].set(vel[0])
    Xp = X + 0.08 * jax.random.normal(jax.random.PRNGKey(4), (L, 3))

    fixed = jnp.zeros(W, bool).at[0].set(True)
    src = jnp.arange(W - 1, dtype=jnp.int32)
    Ro, to, vo, bgo, bao, Xo, stats = vi_ba.local_inertial_ba(
        cam.PINHOLE, K, jnp.eye(3), jnp.zeros(3),
        Rp, tp, vp, jnp.zeros((W, 3)), jnp.zeros((W, 3)), fixed,
        Xp, jnp.zeros(L, bool),
        cam_idx, lm_idx, uv, jnp.ones(W * L), obs_mask,
        preint_data, preint_info, rw_info,
        src, src + 1, jnp.ones(W - 1, bool),
        iters=12,
    )
    assert float(stats.cost) < float(stats.cost0) * 0.1, (
        float(stats.cost0), float(stats.cost), int(stats.accepted))

    terr0 = float(jnp.linalg.norm(tp - twb, axis=1).max())
    terr = float(jnp.linalg.norm(to - twb, axis=1).max())
    assert terr < 0.3 * terr0, (terr, terr0)

    verr0 = float(jnp.linalg.norm(vp - vel, axis=1).max())
    verr = float(jnp.linalg.norm(vo - vel, axis=1).max())
    assert verr < 0.35 * verr0, (verr, verr0)
