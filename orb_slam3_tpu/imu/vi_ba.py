"""Visual-inertial bundle adjustment on the Schur engine.

Role of `Optimizer::LocalInertialBA` (`/root/reference/src/Optimizer.cc:
2383-2958`) and `FullInertialBA` (`:392-811`): a temporal keyframe window
where each keyframe carries (pose, velocity, gyro bias, acc bias) and the
factors are visual reprojections + the preintegrated inertial chain + bias
random walks.

Mapping onto `lm/schur.py`: the "camera" is a 15-dof state
{Rwb, twb, v, bg, ba} (pose part uses the reference's right-multiplicative
update, G2oTypes.h:74-110); visual edges touch only the pose slice (autodiff
yields zero blocks for the rest); the inertial chain and bias walks enter as
`cam_edges` — camera-camera factors assembled densely into Hcc. Landmarks
are Schur-eliminated exactly as in the visual case.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..frontend import camera as cam_mod
from ..lm import schur
from ..lm.problem import EdgeBatch, VertexBlock
from ..ops import lie, robust
from . import factors


def vi_cam_retract(state, delta):
    """15-dim tangent: (dt, dphi) right-multiplicative on (Rwb, twb), then
    additive velocity / gyro bias / acc bias."""
    R, t = lie.se3_rplus(state["R"], state["t"], delta[..., :6])
    return {
        "R": R,
        "t": t,
        "v": state["v"] + delta[..., 6:9],
        "bg": state["bg"] + delta[..., 9:12],
        "ba": state["ba"] + delta[..., 12:15],
    }


def make_vi_cam_block(Rwb, twb, vel, bg, ba, fixed):
    return VertexBlock(
        state={"R": Rwb, "t": twb, "v": vel, "bg": bg, "ba": ba},
        fixed=fixed,
        tangent_dim=15,
        retract=vi_cam_retract,
    )


def make_vi_obs_residual(kind: int):
    """Visual reprojection from the 15-dof body state (EdgeMono semantics,
    projecting through the body-camera extrinsics in data)."""

    def residual(cam_state, x, data):
        Rwc = cam_state["R"] @ data["Rbc"]
        twc = cam_state["R"] @ data["tbc"] + cam_state["t"]
        Rcw, tcw = lie.se3_inv(Rwc, twc)
        Xc = lie.se3_apply(Rcw, tcw, x)
        return data["uv"] - cam_mod.project(kind, data["K"], Xc)

    return residual


def _vi_inertial_residual(cam1, cam2, data):
    """EdgeInertial between two 15-dof body states (both biases from cam1,
    like the reference's b1, G2oTypes.cc EdgeInertial)."""
    return factors.inertial_residual(
        {"R": cam1["R"], "t": cam1["t"]},
        {"v": cam1["v"]},
        {"b": cam1["bg"]},
        {"b": cam1["ba"]},
        {"R": cam2["R"], "t": cam2["t"]},
        {"v": cam2["v"]},
        data,
    )


def _bias_rw_residual(cam1, cam2, data):
    """EdgeGyroRW + EdgeAccRW stacked: 6-dim."""
    return jnp.concatenate(
        [cam2["bg"] - cam1["bg"], cam2["ba"] - cam1["ba"]]
    )


def build_inertial_chain_edges(preint_data, preint_info9, rw_info6,
                               src, dst, valid):
    """EdgeBatches for the preintegration chain + bias random walks.

    preint_data: stacked pytree from factors.preint_edge_data per interval.
    preint_info9: [E, 9, 9]; rw_info6: [E, 6, 6] block-diag(gyroRW, accRW).
    """
    inertial = EdgeBatch(
        indices=(src, dst),
        data=preint_data,
        info=preint_info9,
        mask=valid,
        vertex_blocks=("cam", "cam"),
        residual_dim=9,
        residual=_vi_inertial_residual,
        huber_delta=None,
    )
    bias_rw = EdgeBatch(
        indices=(src, dst),
        data={"dummy": jnp.zeros(src.shape[0])},
        info=rw_info6,
        mask=valid,
        vertex_blocks=("cam", "cam"),
        residual_dim=6,
        residual=_bias_rw_residual,
        huber_delta=None,
    )
    return (inertial, bias_rw)


def _bias_prior_residual(cam, data):
    """EdgePriorAcc/EdgePriorGyro (G2oTypes.h:768-814): zero-mean priors
    pulling the first keyframe's biases toward 0 during FullInertialBA's
    staged initialization (Optimizer.cc:392-811)."""
    return jnp.concatenate([cam["bg"], cam["ba"]], axis=-1)


@partial(jax.jit, static_argnames=("kind", "iters"))
def local_inertial_ba(kind: int, K8, Rbc, tbc,
                      Rwb, twb, vel, bg, ba, cam_fixed,
                      points, point_fixed,
                      cam_idx, lm_idx, uv, inv_sigma2, obs_mask,
                      preint_data, preint_info9, rw_info6,
                      chain_src, chain_dst, chain_valid,
                      iters: int = 8, bias_prior=None):
    """Windowed VI-BA — ONE compiled program per (window bucket, iters)
    shape. Shapes: W body states, L landmarks (full arena with point_fixed
    for out-of-window), E visual edges, W-1 chain edges.

    The global cost normalization info_scale (f32 conditioning — see
    imu/initialization.py) is computed in-graph from the inertial info.
    bias_prior: [2] array (priorG, priorA) — zero-mean bias priors on the
    first camera, the FullInertialBA staging knob (Optimizer.cc:392:
    1e2/1e10 at init, 1/1e5 at VIBA1, 0 disables — a zero-information
    edge contributes nothing, so the prior edge is always present and the
    jit signature does not fork on it).
    Returns (Rwb, twb, vel, bg, ba, points, stats).
    """
    info_scale = jnp.maximum(
        jnp.max(jax.vmap(jnp.diag)(preint_info9)), 1.0
    )
    if bias_prior is None:
        bias_prior = jnp.zeros((2,), jnp.float32)
    E = uv.shape[0]
    res = make_vi_obs_residual(kind)
    obs_data = {
        "uv": uv,
        "K": jnp.tile(K8[None], (E, 1)),
        "Rbc": jnp.tile(Rbc[None], (E, 1, 1)),
        "tbc": jnp.tile(tbc[None], (E, 1)),
    }
    cam_edges = build_inertial_chain_edges(
        preint_data, preint_info9 / info_scale, rw_info6 / info_scale,
        chain_src, chain_dst, chain_valid,
    )
    pg, pa = bias_prior[0], bias_prior[1]
    info6 = jnp.diag(jnp.concatenate([jnp.full((3,), pg), jnp.full((3,), pa)]))
    prior = EdgeBatch(
        indices=(jnp.zeros((1,), jnp.int32),),
        data={"dummy": jnp.zeros((1,))},
        info=(info6 / info_scale)[None].astype(jnp.float32),
        mask=jnp.ones((1,), bool),
        vertex_blocks=("cam",),
        residual_dim=6,
        residual=_bias_prior_residual,
        huber_delta=None,
    )
    cam_edges = cam_edges + (prior,)
    bap = schur.BAProblem(
        cams=make_vi_cam_block(Rwb, twb, vel, bg, ba, cam_fixed),
        points=points,
        point_fixed=point_fixed,
        cam_idx=cam_idx,
        lm_idx=lm_idx,
        obs_data=obs_data,
        obs_info=inv_sigma2 / info_scale,
        obs_mask=obs_mask,
        cam_edges=cam_edges,
        residual_dim=2,
        residual=res,
        # the Huber threshold lives in scaled-chi2 space: chi2' = chi2/scale
        huber_delta=(robust.CHI2_2DOF / info_scale) ** 0.5,
    )
    solved, stats = schur.solve(bap, num_iters=iters, lam0=1e-4)
    st = solved.cams.state
    return (
        st["R"], st["t"], st["v"], st["bg"], st["ba"], solved.points, stats
    )
