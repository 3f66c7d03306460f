"""Standard vertex parameterizations and edge residuals for the LM engine.

Covers the edge-type census of the reference's optimizers (SURVEY.md §2.1
Optimizer row; `/root/reference/src/OptimizableTypes.cpp`, `G2oTypes.cc`):
mono/stereo reprojection (pose-only and full BA), relative-SE3 and Sim3
pose-graph edges. Inertial edges live in `orb_slam3_tpu/imu/factors.py`.

Pose vertices store Tcw (camera-from-world) as {"R": [N,3,3], "t": [N,3]}
with the g2o left-multiplicative update Tcw <- exp(dxi) * Tcw
(`se3quat.h::oplusImpl`). Landmarks are Euclidean. Residuals are written for
a single edge and vmapped by the engine; Jacobians come from jacfwd, which
for these small algebra chains XLA fuses into the same kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..frontend import camera as cam
from ..ops import lie
from .problem import VertexBlock


# ---------------------------------------------------------------------------
# Retracts
# ---------------------------------------------------------------------------

def se3_retract(state, delta):
    """Left-multiplicative SE3: T <- exp(delta) T (g2o SE3Quat convention)."""
    R, t = lie.se3_lplus(state["R"], state["t"], delta)
    return {"R": R, "t": t}


def point_retract(state, delta):
    return {"x": state["x"] + delta}


def sim3_retract(state, delta):
    """Sim3 left-multiplicative: S <- exp(delta) S, delta = (rho, phi, sigma)
    (g2o VertexSim3Expmap, `/root/reference/Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h`)."""
    dR, dt, ds = lie.sim3_exp(delta)
    R, t, s = lie.sim3_mul(dR, dt, ds, state["R"], state["t"], state["s"])
    return {"R": R, "t": t, "s": s}


def velocity_retract(state, delta):
    return {"v": state["v"] + delta}


def bias_retract(state, delta):
    return {"b": state["b"] + delta}


def make_pose_block(R, t, fixed):
    return VertexBlock(
        state={"R": R, "t": t}, fixed=fixed, tangent_dim=6, retract=se3_retract
    )


def make_point_block(x, fixed):
    return VertexBlock(state={"x": x}, fixed=fixed, tangent_dim=3, retract=point_retract)


def make_sim3_block(R, t, s, fixed):
    return VertexBlock(
        state={"R": R, "t": t, "s": s}, fixed=fixed, tangent_dim=7, retract=sim3_retract
    )


# ---------------------------------------------------------------------------
# Reprojection residuals (visual)
# ---------------------------------------------------------------------------

def make_mono_residual(kind: int):
    """obs - project(Tcw * Xw): EdgeSE3ProjectXYZ::computeError
    (`/root/reference/src/OptimizableTypes.cpp`). data = {"uv": [2], "K": [8]}."""

    def residual(pose, point, data):
        Xc = lie.se3_apply(pose["R"], pose["t"], point["x"])
        return data["uv"] - cam.project(kind, data["K"], Xc)

    return residual


def make_mono_pose_only_residual(kind: int):
    """Motion-only BA edge: landmark is data (EdgeSE3ProjectXYZOnlyPose).
    data = {"uv": [2], "K": [8], "Xw": [3]}."""

    def residual(pose, data):
        Xc = lie.se3_apply(pose["R"], pose["t"], data["Xw"])
        return data["uv"] - cam.project(kind, data["K"], Xc)

    return residual


def make_tobody_residual(kind: int):
    """Right-camera reprojection edge for non-rectified (fisheye) stereo:
    obs_r - project_r(T_rl * T_lw * Xw) with the FIXED left->right
    extrinsics T_rl (EdgeSE3ProjectXYZToBody,
    `/root/reference/src/OptimizableTypes.h:59-87` / `.cpp:83-130` — the
    vertex is the LEFT-camera pose; mTrl composes in front).
    data = {"uv": [2], "K": [8] (right intrinsics), "R_rl": [3,3],
    "t_rl": [3]}."""

    def residual(pose, point, data):
        Xl = lie.se3_apply(pose["R"], pose["t"], point["x"])
        Xr = data["R_rl"] @ Xl + data["t_rl"]
        return data["uv"] - cam.project(kind, data["K"], Xr)

    return residual


def make_tobody_pose_only_residual(kind: int):
    """Motion-only variant (EdgeSE3ProjectXYZOnlyPoseToBody,
    OptimizableTypes.h:59): landmark is data.
    data = {"uv": [2], "K": [8], "Xw": [3], "R_rl": [3,3], "t_rl": [3]}."""

    def residual(pose, data):
        Xl = lie.se3_apply(pose["R"], pose["t"], data["Xw"])
        Xr = data["R_rl"] @ Xl + data["t_rl"]
        return data["uv"] - cam.project(kind, data["K"], Xr)

    return residual


def make_stereo_residual(kind: int):
    """3-dim (uL, v, uR) rectified-stereo residual (g2o EdgeStereoSE3ProjectXYZ,
    used at `/root/reference/src/Optimizer.cc:1325-1352`): uR = uL - bf/z.
    data = {"uvr": [3], "K": [8], "bf": []}."""

    def residual(pose, point, data):
        Xc = lie.se3_apply(pose["R"], pose["t"], point["x"])
        uv = cam.project(kind, data["K"], Xc)
        z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
        ur = uv[0] - data["bf"] / z
        return data["uvr"] - jnp.stack([uv[0], uv[1], ur])

    return residual


def make_stereo_pose_only_residual(kind: int):
    def residual(pose, data):
        Xc = lie.se3_apply(pose["R"], pose["t"], data["Xw"])
        uv = cam.project(kind, data["K"], Xc)
        z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
        ur = uv[0] - data["bf"] / z
        return data["uvr"] - jnp.stack([uv[0], uv[1], ur])

    return residual


# ---------------------------------------------------------------------------
# Pose-graph residuals
# ---------------------------------------------------------------------------

def relative_se3_residual(pose_i, pose_j, data):
    """log(T_ji_meas * T_i * T_j^{-1}) — 6-dim relative-pose factor.

    Poses are Tcw; the measured constraint is T_ji = T_j * T_i^{-1}.
    """
    Rji, tji = data["R_ji"], data["t_ji"]
    Ri, ti = pose_i["R"], pose_i["t"]
    Rj_inv, tj_inv = lie.se3_inv(pose_j["R"], pose_j["t"])
    # err = T_ji_meas * T_i * T_j^{-1}
    Ra, ta = lie.se3_mul(Ri, ti, Rj_inv, tj_inv)
    Re, te = lie.se3_mul(Rji, tji, Ra, ta)
    return lie.se3_log(Re, te)


def relative_sim3_residual(sim_i, sim_j, data):
    """7-dim Sim3 essential-graph edge: log(S_ji_meas * S_i * S_j^{-1})
    (g2o EdgeSim3, used by OptimizeEssentialGraph
    `/root/reference/src/Optimizer.cc:1501-1782`)."""
    Ri, ti, si = sim_i["R"], sim_i["t"], sim_i["s"]
    Rji, tji, sji = data["R_ji"], data["t_ji"], data["s_ji"]
    Rj_i, tj_i, sj_i = lie.sim3_inv(sim_j["R"], sim_j["t"], sim_j["s"])
    Ra, ta, sa = lie.sim3_mul(Ri, ti, si, Rj_i, tj_i, sj_i)
    Re, te, se = lie.sim3_mul(Rji, tji, sji, Ra, ta, sa)
    return lie.sim3_log(Re, te, se)


def make_sim3_point_residual(kind: int, inverse: bool):
    """Sim3 refinement edges (OptimizeSim3, `/root/reference/src/Optimizer.cc:2115`):
    project the other KF's matched landmark through S12 (or S12^{-1}).
    data = {"uv": [2], "K": [8], "Xc": [3]} with Xc in the source camera frame."""

    def residual(sim, data):
        R, t, s = sim["R"], sim["t"], sim["s"]
        if inverse:
            R, t, s = lie.sim3_inv(R, t, s)
        Xc = lie.sim3_apply(R, t, s, data["Xc"])
        return data["uv"] - cam.project(kind, data["K"], Xc)

    return residual
