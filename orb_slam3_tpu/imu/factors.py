"""Inertial factors for the LM engine.

Residual-function equivalents of the custom g2o types in
`/root/reference/src/G2oTypes.cc` / `include/G2oTypes.h`:
EdgeInertial (`:495-544`), EdgeInertialGS (`:548-631`), EdgeGyroRW/EdgeAccRW
(`:635-704`), EdgePriorPoseImu (`:732-765`), EdgePriorAcc/Gyro (`:768-814`),
and the world-from-body pose vertex with right-multiplicative update
(ImuCamPose::Update, `G2oTypes.h:74-110`).

Vertex blocks:
  "vipose": {"R": Rwb [N,3,3], "t": twb [N,3]}, retract = se3_rplus
  "vel":    {"v": [N,3]}
  "bg"/"ba": {"b": [N,3]}
  "gdir":   {"R": Rwg [N,3,3]} with a 2-dof (x,y) rotation update
  "scale":  {"s": [N]} with multiplicative exp update (VertexScale :296-317)

Edge data carries the preintegration tensors so the bias-corrected deltas
(J*db first-order updates) are recomputed inside the residual — autodiff
then yields exactly the reference's bias Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import lie
from ..frontend import camera as cam
from .preintegration import GRAVITY
from ..lm.problem import VertexBlock

G_VEC = jnp.array([0.0, 0.0, -GRAVITY])
G_I = jnp.array([0.0, 0.0, -1.0])


# ---------------------------------------------------------------------------
# Vertex blocks
# ---------------------------------------------------------------------------

def vipose_retract(state, delta):
    R, t = lie.se3_rplus(state["R"], state["t"], delta)
    return {"R": R, "t": t}


def make_vipose_block(Rwb, twb, fixed):
    return VertexBlock(
        state={"R": Rwb, "t": twb}, fixed=fixed, tangent_dim=6, retract=vipose_retract
    )


def vec3_retract(state, delta):
    return {"v": state["v"] + delta}


def vec3_retract_b(state, delta):
    return {"b": state["b"] + delta}


def make_vec3_block(v, fixed):
    return VertexBlock(state={"v": v}, fixed=fixed, tangent_dim=3, retract=vec3_retract)


def gdir_retract(state, delta):
    """2-dof gravity-direction update: Rwg <- Rwg * Exp(dx, dy, 0)
    (VertexGDir, G2oTypes.h:257-293)."""
    d = jnp.concatenate([delta, jnp.zeros_like(delta[..., :1])], axis=-1)
    return {"R": state["R"] @ lie.so3_exp(d)}


def make_gdir_block(Rwg, fixed):
    return VertexBlock(state={"R": Rwg}, fixed=fixed, tangent_dim=2, retract=gdir_retract)


def scale_retract(state, delta):
    """Multiplicative: s <- s * exp(ds) (VertexScale, G2oTypes.h:296-317)."""
    return {"s": state["s"] * jnp.exp(delta[..., 0])}


def make_scale_block(s, fixed):
    return VertexBlock(state={"s": s}, fixed=fixed, tangent_dim=1, retract=scale_retract)


# ---------------------------------------------------------------------------
# Bias-corrected deltas from edge data (ImuTypes.cc:283-307)
# ---------------------------------------------------------------------------

def _corrected_deltas(data, bg, ba):
    dbg = bg - data["bg0"]
    dba = ba - data["ba0"]
    dR = data["dR"] @ lie.so3_exp(data["JRg"] @ dbg)
    dV = data["dV"] + data["JVg"] @ dbg + data["JVa"] @ dba
    dP = data["dP"] + data["JPg"] @ dbg + data["JPa"] @ dba
    return dR, dV, dP


# ---------------------------------------------------------------------------
# Edge residuals
# ---------------------------------------------------------------------------

def inertial_residual(pose1, vel1, bg, ba, pose2, vel2, data):
    """EdgeInertial::computeError (G2oTypes.cc): 9-dim (er, ev, ep)."""
    dt = data["dT"]
    dR, dV, dP = _corrected_deltas(data, bg["b"], ba["b"])
    R1T = pose1["R"].T
    er = lie.so3_log(dR.T @ R1T @ pose2["R"])
    ev = R1T @ (vel2["v"] - vel1["v"] - G_VEC * dt) - dV
    ep = R1T @ (
        pose2["t"] - pose1["t"] - vel1["v"] * dt - 0.5 * G_VEC * dt * dt
    ) - dP
    return jnp.concatenate([er, ev, ep])


def inertial_gs_residual(pose1, vel1, bg, ba, pose2, vel2, gdir, scale, data):
    """EdgeInertialGS::computeError (G2oTypes.cc:617-641): adds gravity
    direction Rwg and scale s vertices for inertial-only initialization."""
    dt = data["dT"]
    dR, dV, dP = _corrected_deltas(data, bg["b"], ba["b"])
    g = gdir["R"] @ (G_I * GRAVITY)
    s = scale["s"]
    R1T = pose1["R"].T
    er = lie.so3_log(dR.T @ R1T @ pose2["R"])
    ev = R1T @ (s * (vel2["v"] - vel1["v"]) - g * dt) - dV
    ep = R1T @ (
        s * (pose2["t"] - pose1["t"] - vel1["v"] * dt) - 0.5 * g * dt * dt
    ) - dP
    return jnp.concatenate([er, ev, ep])


def bias_rw_residual(b1, b2, data):
    """EdgeGyroRW / EdgeAccRW: b2 - b1 (G2oTypes.h:635-704)."""
    return b2["b"] - b1["b"]


def bias_prior_residual(b, data):
    """EdgePriorAcc/Gyro: b - prior (G2oTypes.h:768-814)."""
    return b["b"] - data["prior"]


def prior_pose_imu_residual(pose, vel, bg, ba, data):
    """EdgePriorPoseImu (G2oTypes.cc): 15-dim residual against a marginalized
    prior state (Rwb0, twb0, v0, bg0p, ba0p) — used by the tracking-time
    pose-inertial optimizations (Optimizer.cc:4491/4875)."""
    er = lie.so3_log(data["R0"].T @ pose["R"])
    et = pose["t"] - data["t0"]
    ev = vel["v"] - data["v0"]
    ebg = bg["b"] - data["bg0p"]
    eba = ba["b"] - data["ba0p"]
    return jnp.concatenate([er, et, ev, ebg, eba])


def make_vi_mono_residual(kind: int):
    """Monocular reprojection from a world-from-body pose: EdgeMono
    (G2oTypes.h:342-423) projects via Tcw = (Twb * Tbc)^{-1}.
    data: {"uv": [2], "K": [8], "Rbc": [3,3], "tbc": [3]}."""

    def residual(pose, point, data):
        Rwc = pose["R"] @ data["Rbc"]
        twc = pose["R"] @ data["tbc"] + pose["t"]
        Rcw, tcw = lie.se3_inv(Rwc, twc)
        Xc = lie.se3_apply(Rcw, tcw, point["x"])
        return data["uv"] - cam.project(kind, data["K"], Xc)

    return residual


def make_vi_mono_pose_only_residual(kind: int):
    """EdgeMonoOnlyPose: landmark in data (G2oTypes.h:383-423)."""

    def residual(pose, data):
        Rwc = pose["R"] @ data["Rbc"]
        twc = pose["R"] @ data["tbc"] + pose["t"]
        Rcw, tcw = lie.se3_inv(Rwc, twc)
        Xc = lie.se3_apply(Rcw, tcw, data["Xw"])
        return data["uv"] - cam.project(kind, data["K"], Xc)

    return residual


def preint_edge_data(p, K_extra=None):
    """Pack a Preintegrated state into per-edge data arrays (single edge;
    callers stack for batches). info9 = symmetrized inverse of C[:9,:9]
    (EdgeInertial ctor, G2oTypes.cc:555-566)."""
    C9 = p.C[:9, :9]
    C9 = 0.5 * (C9 + C9.T) + 1e-10 * jnp.eye(9)
    info = jnp.linalg.inv(C9)
    info = 0.5 * (info + info.T)
    d = {
        "dT": p.dT,
        "dR": p.dR,
        "dV": p.dV,
        "dP": p.dP,
        "JRg": p.JRg,
        "JVg": p.JVg,
        "JVa": p.JVa,
        "JPg": p.JPg,
        "JPa": p.JPa,
        "bg0": p.bias_gyro,
        "ba0": p.bias_acc,
    }
    if K_extra:
        d.update(K_extra)
    return d, info


def gyro_rw_info(p):
    """Inverse of the gyro random-walk block C[9:12,9:12] (EdgeGyroRW info,
    Optimizer.cc FullInertialBA usage)."""
    return jnp.linalg.inv(p.C[9:12, 9:12] + 1e-12 * jnp.eye(3))


def acc_rw_info(p):
    return jnp.linalg.inv(p.C[12:15, 12:15] + 1e-12 * jnp.eye(3))
