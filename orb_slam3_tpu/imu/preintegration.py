"""On-manifold IMU preintegration with covariance + bias Jacobians.

Reimplements `IMU::Preintegrated` (`/root/reference/src/ImuTypes.cc:177-235`
IntegrateNewMeasurement, `/root/reference/include/ImuTypes.h:143-251`) as a
`lax.scan` over a fixed-capacity measurement buffer with a validity mask —
one fused XLA kernel per preintegration window instead of a per-sample C++
loop.

State (ImuTypes.h:211-221): elapsed dT; 15x15 covariance C ordered
(theta, v, p, bg, ba); deltas dR/dV/dP; bias Jacobians JRg, JVg, JVa, JPg,
JPa; integration order matches the reference exactly (position before
velocity before rotation, old dR used for the dP/dV update).

Bias-corrected getters apply the first-order update J*db
(GetDeltaRotation/Velocity/Position, ImuTypes.cc:283-307).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie

GRAVITY = 9.81  # IMU::GRAVITY_VALUE (ImuTypes.h:43)
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preintegrated:
    dT: jnp.ndarray        # []
    C: jnp.ndarray         # [15, 15] covariance (theta, v, p, bg, ba)
    dR: jnp.ndarray        # [3, 3]
    dV: jnp.ndarray        # [3]
    dP: jnp.ndarray        # [3]
    JRg: jnp.ndarray       # [3, 3]
    JVg: jnp.ndarray       # [3, 3]
    JVa: jnp.ndarray       # [3, 3]
    JPg: jnp.ndarray       # [3, 3]
    JPa: jnp.ndarray       # [3, 3]
    bias_gyro: jnp.ndarray  # [3] bias used during integration (b in ref)
    bias_acc: jnp.ndarray   # [3]
    avgA: jnp.ndarray       # [3] running mean of dR*(a-ba) (init excitation check)
    avgW: jnp.ndarray       # [3]


def init_state(bias_gyro=None, bias_acc=None, dtype=jnp.float32) -> Preintegrated:
    z3 = jnp.zeros(3, dtype)
    z33 = jnp.zeros((3, 3), dtype)
    return Preintegrated(
        dT=jnp.zeros((), dtype),
        C=jnp.zeros((15, 15), dtype),
        dR=jnp.eye(3, dtype=dtype),
        dV=z3,
        dP=z3,
        JRg=z33,
        JVg=z33,
        JVa=z33,
        JPg=z33,
        JPa=z33,
        bias_gyro=z3 if bias_gyro is None else bias_gyro,
        bias_acc=z3 if bias_acc is None else bias_acc,
        avgA=z3,
        avgW=z3,
    )


def _step(state: Preintegrated, meas, noise_cov, walk_cov):
    """One IntegrateNewMeasurement (ImuTypes.cc:177-235). meas = (acc [3],
    gyro [3], dt [], valid [])."""
    acc_m, gyro_m, dt, valid = meas
    acc = acc_m - state.bias_acc
    w = gyro_m - state.bias_gyro

    dt2 = dt * dt
    dR, dV, dP = state.dR, state.dV, state.dP
    denom = jnp.maximum(state.dT + dt, 1e-9)
    avgA = (state.dT * state.avgA + (dR @ acc) * dt) / denom
    avgW = (state.dT * state.avgW + w * dt) / denom

    # position & velocity with the OLD rotation
    dP_new = dP + dV * dt + 0.5 * (dR @ acc) * dt2
    dV_new = dV + (dR @ acc) * dt

    Wacc = lie.hat(acc)
    # A/B for covariance propagation of (theta, v, p)
    dRi = lie.so3_exp(w * dt)
    Jr = lie.so3_right_jacobian(w * dt)

    A = jnp.eye(9)
    A = A.at[3:6, 0:3].set(-dR @ Wacc * dt)
    A = A.at[6:9, 0:3].set(-0.5 * dR @ Wacc * dt2)
    A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
    A = A.at[0:3, 0:3].set(dRi.T)

    B = jnp.zeros((9, 6))
    B = B.at[3:6, 3:6].set(dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * dR * dt2)
    B = B.at[0:3, 0:3].set(Jr * dt)

    # bias jacobians (ImuTypes.cc:212-218), old dR / JRg / JVg / JVa
    JPa_new = state.JPa + state.JVa * dt - 0.5 * dR * dt2
    JPg_new = state.JPg + state.JVg * dt - 0.5 * (dR @ Wacc) * dt2 @ state.JRg
    JVa_new = state.JVa - dR * dt
    JVg_new = state.JVg - (dR @ Wacc * dt) @ state.JRg

    dR_new = lie.normalize_rotation(dR @ dRi)
    JRg_new = dRi.T @ state.JRg - Jr * dt

    C9 = A @ state.C[:9, :9] @ A.T + B @ (noise_cov / dt) @ B.T
    C = state.C.at[:9, :9].set(C9)
    C = C.at[9:15, 9:15].add(walk_cov * dt)

    new = Preintegrated(
        dT=state.dT + dt,
        C=C,
        dR=dR_new,
        dV=dV_new,
        dP=dP_new,
        JRg=JRg_new,
        JVg=JVg_new,
        JVa=JVa_new,
        JPg=JPg_new,
        JPa=JPa_new,
        bias_gyro=state.bias_gyro,
        bias_acc=state.bias_acc,
        avgA=avgA,
        avgW=avgW,
    )
    # masked update for padded slots
    keep = valid > 0
    return jax.tree.map(
        lambda n, o: jnp.where(jnp.reshape(keep, (1,) * jnp.ndim(n)), n, o), new, state
    )


def integrate(acc, gyro, dts, valid, bias_gyro, bias_acc,
              noise_gyro: float, noise_acc: float,
              walk_gyro: float, walk_acc: float) -> Preintegrated:
    """Preintegrate a masked measurement window.

    acc/gyro: [M, 3]; dts/valid: [M]. noise_* are continuous-time densities
    as in IMU::Calib (`ImuTypes.h:92-126`: Cov = diag(ng^2*freq) — we take
    noise_cov/dt inside the step, matching the reference's use of
    sigma^2 * freq with dt = 1/freq).
    """
    noise_cov = jnp.diag(
        jnp.array([noise_gyro**2] * 3 + [noise_acc**2] * 3, jnp.float32)
    )
    walk_cov = jnp.diag(
        jnp.array([walk_gyro**2] * 3 + [walk_acc**2] * 3, jnp.float32)
    )
    state = init_state(bias_gyro, bias_acc)

    def body(s, m):
        return _step(s, m, noise_cov, walk_cov), None

    state, _ = jax.lax.scan(body, state, (acc, gyro, dts, valid))
    return state


# ---------------------------------------------------------------------------
# Bias-corrected getters (first-order update, ImuTypes.cc:283-307)
# ---------------------------------------------------------------------------

def delta_rotation(p: Preintegrated, bias_gyro):
    db = bias_gyro - p.bias_gyro
    return lie.normalize_rotation(p.dR @ lie.so3_exp(p.JRg @ db))


def delta_velocity(p: Preintegrated, bias_gyro, bias_acc):
    dbg = bias_gyro - p.bias_gyro
    dba = bias_acc - p.bias_acc
    return p.dV + p.JVg @ dbg + p.JVa @ dba


def delta_position(p: Preintegrated, bias_gyro, bias_acc):
    dbg = bias_gyro - p.bias_gyro
    dba = bias_acc - p.bias_acc
    return p.dP + p.JPg @ dbg + p.JPa @ dba


def predict_state(p: Preintegrated, R_wb, t_wb, v_w, bias_gyro, bias_acc):
    """IMU state prediction over the window (Tracking::PredictStateIMU,
    `/root/reference/src/Tracking.cc:1738-1793`)."""
    dt = p.dT
    R2 = lie.normalize_rotation(R_wb @ delta_rotation(p, bias_gyro))
    t2 = t_wb + v_w * dt + 0.5 * GRAVITY_VEC * dt * dt + R_wb @ delta_position(
        p, bias_gyro, bias_acc
    )
    v2 = v_w + GRAVITY_VEC * dt + R_wb @ delta_velocity(p, bias_gyro, bias_acc)
    return R2, t2, v2


def merge_windows(acc_a, gyro_a, dts_a, valid_a,
                  acc_b, gyro_b, dts_b, valid_b,
                  bias_gyro, bias_acc, **noise):
    """Merge two consecutive preintegration windows by re-integrating the
    concatenated measurement buffers — exactly what
    Preintegrated::MergePrevious does (`/root/reference/src/ImuTypes.cc:237-265`:
    it copies both measurement lists and re-runs IntegrateNewMeasurement).
    Raw buffers are kept per keyframe precisely to allow this and
    `Reintegrate` (ImuTypes.cc:168) on bias updates."""
    acc = jnp.concatenate([acc_a, acc_b])
    gyro = jnp.concatenate([gyro_a, gyro_b])
    dts = jnp.concatenate([dts_a, dts_b])
    valid = jnp.concatenate([valid_a, valid_b])
    return integrate(acc, gyro, dts, valid, bias_gyro, bias_acc, **noise)
