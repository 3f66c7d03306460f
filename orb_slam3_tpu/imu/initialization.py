"""Inertial initialization: inertial-only MAP optimization + gauge transform.

Role of `LocalMapping::InitializeIMU` (`/root/reference/src/LocalMapping.cc:
1173-1427`) and `Optimizer::InertialOptimization` (`Optimizer.cc:3042-3226`):
given a visually-tracked keyframe trajectory and per-interval IMU
preintegrations, estimate gravity direction, scale, velocities, and biases
by MAP optimization with the visual poses FIXED (EdgeInertialGS factors),
then apply the similarity gauge transform to the whole map
(`Map::ApplyScaledRotation`, `Map.cc:252`) so gravity aligns with -z and
scale is metric.

Stages mirror the reference's schedule: initial MAP with strong priors
(priorG=1e2, priorA=1e10 — accel bias frozen first), then refinements
(VIBA1/VIBA2 run full visual-inertial BA elsewhere).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..lm import dense
from ..lm.problem import EdgeBatch, Problem, VertexBlock
from ..ops import lie
from . import factors
from .preintegration import GRAVITY


def initial_gravity_estimate(kf_R_wb, dV_list, dT_list):
    """Gravity direction from the mean preintegrated velocity change
    (`LocalMapping.cc:1228-1252`: dirG = -sum(Rwb * dV)); returns Rwg."""
    dirG = jnp.zeros(3)
    for R, dV in zip(kf_R_wb, dV_list):
        dirG = dirG - R @ dV
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0])
    v = jnp.cross(gI, dirG)
    nv = jnp.linalg.norm(v)
    cosg = jnp.dot(gI, dirG)
    ang = jnp.arctan2(nv, cosg)
    axis = v / jnp.maximum(nv, 1e-9)
    return lie.so3_exp(axis * ang)


def inertial_only_optimization(
    R_wb, t_wb, preints, prior_gyro: float = 1e2, prior_acc: float = 1e10,
    fix_scale: bool = False, iters: int = 60,
    bg0=None, ba0=None, fix_bias: bool = False,
):
    """MAP estimation of (scale, Rwg, per-KF velocities, shared biases) with
    poses fixed (InertialOptimization, Optimizer.cc:3042: 200 iterations,
    EdgeInertialGS with GDir + Scale vertices, bias priors).

    R_wb/t_wb: [K, 3, 3]/[K, 3] world-from-body keyframe poses (visual,
    up-to-scale). preints: list of K-1 Preintegrated (i -> i+1).

    bg0/ba0 warm-start the shared biases (refinement calls re-enter with the
    current estimate; preints must be re-integrated at the same bias).
    fix_bias freezes both biases — the scale+gravity-only variant
    (Optimizer::InertialOptimization(Map*, scale, Rwg), Optimizer.cc:3389)
    used by LocalMapping::ScaleRefinement (LocalMapping.cc:1429).
    Returns dict(scale, Rwg, bg, ba, velocities, stats).
    """
    Kn = R_wb.shape[0]
    n_e = Kn - 1
    bg0 = jnp.zeros((1, 3)) if bg0 is None else jnp.reshape(bg0, (1, 3))
    ba0 = jnp.zeros((1, 3)) if ba0 is None else jnp.reshape(ba0, (1, 3))

    # initial velocities from finite differences (last KF repeats previous)
    dTs = jnp.asarray([p.dT for p in preints])[:, None]
    v_mid = (t_wb[1:] - t_wb[:-1]) / jnp.maximum(dTs, 1e-3)
    v0 = jnp.concatenate([v_mid, v_mid[-1:]], axis=0)  # [K, 3]

    Rwg0 = initial_gravity_estimate(
        [R_wb[i] for i in range(n_e)], [p.dV for p in preints],
        [p.dT for p in preints],
    )

    blocks = {
        "pose": VertexBlock(
            state={"R": R_wb, "t": t_wb},
            fixed=jnp.ones(Kn, bool),  # poses fixed
            tangent_dim=6,
            retract=factors.vipose_retract,
        ),
        "vel": factors.make_vec3_block(v0, jnp.zeros(Kn, bool)),
        "bg": VertexBlock(
            state={"b": bg0}, fixed=jnp.full(1, fix_bias),
            tangent_dim=3, retract=factors.vec3_retract_b,
        ),
        "ba": VertexBlock(
            state={"b": ba0}, fixed=jnp.full(1, fix_bias),
            tangent_dim=3, retract=factors.vec3_retract_b,
        ),
        "gdir": factors.make_gdir_block(Rwg0[None], jnp.zeros(1, bool)),
        "scale": factors.make_scale_block(
            jnp.ones((1,)), jnp.asarray([fix_scale])
        ),
    }

    datas, infos = [], []
    for p in preints:
        d, info = factors.preint_edge_data(p)
        datas.append(d)
        infos.append(info)
    data = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    info = jnp.stack(infos)

    # normalize the information globally: preintegration infos reach 1e8+
    # (tiny covariances over short windows), which destroys the f32 normal
    # equations (the reference's g2o runs double). The MAP optimum is
    # invariant to a global cost scale, so divide everything (including the
    # bias priors) by the largest information entry.
    c = jnp.maximum(jnp.max(jax.vmap(jnp.diag)(info)), 1e-12)
    info = info / c
    prior_gyro = prior_gyro / float(c)
    prior_acc = prior_acc / float(c)

    src = jnp.arange(n_e, dtype=jnp.int32)
    zeros = jnp.zeros(n_e, jnp.int32)
    gs_edge = EdgeBatch(
        indices=(src, src, zeros, zeros, src + 1, src + 1, zeros, zeros),
        data=data,
        info=info,
        mask=jnp.ones(n_e, bool),
        vertex_blocks=("pose", "vel", "bg", "ba", "pose", "vel", "gdir", "scale"),
        residual_dim=9,
        residual=factors.inertial_gs_residual,
        huber_delta=None,
    )
    prior_bg = EdgeBatch(
        indices=(jnp.zeros(1, jnp.int32),),
        data={"prior": jnp.zeros((1, 3))},
        info=jnp.full((1,), prior_gyro, jnp.float32),
        mask=jnp.ones(1, bool),
        vertex_blocks=("bg",),
        residual_dim=3,
        residual=factors.bias_prior_residual,
        huber_delta=None,
    )
    prior_ba = EdgeBatch(
        indices=(jnp.zeros(1, jnp.int32),),
        data={"prior": jnp.zeros((1, 3))},
        info=jnp.full((1,), prior_acc, jnp.float32),
        mask=jnp.ones(1, bool),
        vertex_blocks=("ba",),
        residual_dim=3,
        residual=factors.bias_prior_residual,
        huber_delta=None,
    )
    problem = Problem(blocks=blocks, edges=(gs_edge, prior_bg, prior_ba))
    solved, stats = dense.solve(problem, num_iters=iters, lam0=1e-2)

    out = solved.blocks
    return {
        "scale": out["scale"].state["s"][0],
        "Rwg": out["gdir"].state["R"][0],
        "bg": out["bg"].state["b"][0],
        "ba": out["ba"].state["b"][0],
        "velocities": out["vel"].state["v"],
        "stats": stats,
    }
