"""Pose-inertial tracking optimization with a marginalized prior.

TPU-native equivalents of the reference's tracking-time VI optimizers
(`/root/reference/src/Optimizer.cc`):

- `PoseInertialOptimizationLastKeyFrame` (`Optimizer.cc:4491`): optimize the
  current frame's 15-dof body state {Rwb, twb, v, bg, ba} against (a) visual
  pose-only reprojection edges, (b) an `EdgeInertial` to the last keyframe
  (fixed), and (c) gyro/acc random-walk edges to the keyframe biases.
- `PoseInertialOptimizationLastFrame` (`Optimizer.cc:4875`): same, but the
  previous FRAME is a free second 15-dof vertex constrained by the prior
  `EdgePriorPoseImu` produced by the previous call's marginalization
  (`ConstraintPoseImu`, `G2oTypes.h:706-730`); after solving, the previous
  frame is marginalized out (Schur — `Optimizer::Marginalize:2960`) to yield
  the next frame's 15x15 prior.

Both are one fixed-shape jitted kernel (`pose_inertial_optimize`,
free_prev static flag selects the variant) in the style of
`track.pose_optimize`: lax.scan GN/LM iterations inside chi2-gated outlier
reclassification rounds. The reference runs 4 rounds x 10 iterations with
the decreasing visual gate schedule {12, 7.5, 5.991} / {15.6, 9.8, 7.815}
(`Optimizer.cc:4698-4701`); rounds/iters are static parameters here.

Mixed mono/stereo visual edges use the (uL, v, uR) residual with the third
component masked for mono observations (ur < 0 sentinel), exactly like
`track.pose_optimize_stereo`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontend import camera as cam
from ..imu import factors
from ..ops import lie

# decreasing visual gates per round (Optimizer.cc:4698-4699); rounds beyond
# the schedule reuse the last entry
_GATES_MONO = (12.0, 7.5, 5.991, 5.991)
_GATES_STEREO = (15.6, 9.8, 7.815, 7.815)


def retract15(state, d):
    """Right-multiplicative SE3 update + additive v/bg/ba (the reference's
    VertexPose/VertexVelocity/VertexGyroBias/VertexAccBias updates,
    G2oTypes.h:74-110,191-255)."""
    R, t = lie.se3_rplus(state["R"], state["t"], d[:6])
    return {
        "R": R,
        "t": t,
        "v": state["v"] + d[6:9],
        "bg": state["bg"] + d[9:12],
        "ba": state["ba"] + d[12:15],
    }


def _split(state):
    pose = {"R": state["R"], "t": state["t"]}
    return pose, {"v": state["v"]}, {"b": state["bg"]}, {"b": state["ba"]}


def _inertial_res(prev, cur, preint_data):
    p1, v1, bg1, ba1 = _split(prev)
    p2, v2, _, _ = _split(cur)
    return factors.inertial_residual(p1, v1, bg1, ba1, p2, v2, preint_data)


def _rw_res(prev, cur):
    return jnp.concatenate([cur["bg"] - prev["bg"], cur["ba"] - prev["ba"]])


def _prior_res(prev, prior_data):
    p, v, bg, ba = _split(prev)
    return factors.prior_pose_imu_residual(p, v, bg, ba, prior_data)


def _psd_project(H):
    """ConstraintPoseImu's eigenvalue clamp (G2oTypes.h:706-730): negative
    eigenvalues of the marginal information are zeroed."""
    H = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, 0.0)
    return (V * w[None, :]) @ V.T


@partial(jax.jit, static_argnames=("kind", "rounds", "iters", "free_prev"))
def pose_inertial_optimize(kind: int, K, bf, Rbc, tbc,
                           prev_state, cur_state,
                           preint_data, preint_info9, rw_info6,
                           uv, ur, Xw, inv_sigma2, valid,
                           prior_data=None, prior_H=None,
                           rounds: int = 3, iters: int = 6,
                           free_prev: bool = False):
    """Optimize the current frame's body state with inertial coupling.

    prev_state/cur_state: {"R","t","v","bg","ba"} body states (world-from-
    body). preint_*: packed preintegration between prev and cur
    (factors.preint_edge_data + gyro/acc RW info as one [6,6] block-diag).
    uv [N,2] / ur [N] (-1 = mono) / Xw [N,3] / inv_sigma2 [N] / valid [N]:
    visual pose-only edges on the CURRENT frame. prior_data/prior_H: 15-dim
    marginal prior on prev (required when free_prev=True).

    Returns (cur_state, inlier_mask [N], n_inliers, H15) where H15 is the
    current frame's marginal information after Schur elimination of the
    previous state — the next frame's ConstraintPoseImu.
    """
    D = 30 if free_prev else 15
    has_ur = ur >= 0.0
    obs3 = jnp.concatenate([uv, jnp.where(has_ur, ur, 0.0)[:, None]], axis=1)
    comp_w = jnp.concatenate(
        [jnp.ones_like(uv), has_ur.astype(jnp.float32)[:, None]], axis=1
    )

    def states_at(prev, cur, dx):
        cur2 = retract15(cur, dx[:15])
        prev2 = retract15(prev, dx[15:30]) if free_prev else prev
        return prev2, cur2

    def vis_res_one(cur, uv_i, ur_i, Xw_i, cw_i):
        """(uL, v, uR) residual via the body pose (EdgeMonoOnlyPose /
        EdgeStereoOnlyPose, G2oTypes.h:383-493)."""
        Rwc = cur["R"] @ Rbc
        twc = cur["R"] @ tbc + cur["t"]
        Rcw, tcw = lie.se3_inv(Rwc, twc)
        Xc = lie.se3_apply(Rcw, tcw, Xw_i)
        p2 = cam.project(kind, K, Xc)
        z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
        pred = jnp.concatenate([p2, (p2[0] - bf / z)[None]])
        obs = jnp.concatenate([uv_i, jnp.where(ur_i >= 0, ur_i, 0.0)[None]])
        return (obs - pred) * cw_i, Xc[2]

    def vis_depths(cur):
        Rwc = cur["R"] @ Rbc
        twc = cur["R"] @ tbc + cur["t"]
        Rcw, tcw = lie.se3_inv(Rwc, twc)
        return (jnp.einsum("ij,nj->ni", Rcw, Xw) + tcw)[:, 2]

    def vis_chi2(prev, cur):
        r, z = jax.vmap(lambda u, o, x, c: vis_res_one(cur, u, o, x, c))(
            uv, ur, Xw, comp_w
        )
        c2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        return jnp.where(z > 0, c2, 1e9)

    def other_chi2(prev, cur):
        ri = _inertial_res(prev, cur, preint_data)
        c = ri @ preint_info9 @ ri
        rw = _rw_res(prev, cur)
        c = c + rw @ rw_info6 @ rw
        if free_prev:
            rp = _prior_res(prev, prior_data)
            c = c + rp @ prior_H @ rp
        return c

    gate = jnp.stack([
        jnp.where(
            has_ur,
            jnp.asarray([_GATES_STEREO[min(i, 3)] for i in range(rounds)])[r_i],
            jnp.asarray([_GATES_MONO[min(i, 3)] for i in range(rounds)])[r_i],
        )
        for r_i in range(rounds)
    ])  # [rounds, N]

    def total_cost(prev, cur, mask, gate_r):
        c2 = vis_chi2(prev, cur)
        return jnp.sum(jnp.minimum(c2, gate_r) * mask) + other_chi2(prev, cur)

    def gn_round(carry, round_i):
        prev, cur, mask = carry
        gate_r = gate[round_i]
        use_huber = round_i < rounds - 1
        delta = jnp.sqrt(gate_r)

        def gn_iter(carry2, _):
            prev, cur, lam = carry2

            # per-edge visual jacobians wrt the full tangent
            def vres_d(dx, uv_i, ur_i, Xw_i, cw_i):
                p2s, c2s = states_at(prev, cur, dx)
                r, _ = vis_res_one(c2s, uv_i, ur_i, Xw_i, cw_i)
                return r

            z0 = jnp.zeros(D, jnp.float32)
            rv, zdep = jax.vmap(
                lambda u, o, x, c: vis_res_one(cur, u, o, x, c)
            )(uv, ur, Xw, comp_w)
            Jv = jax.vmap(jax.jacfwd(vres_d), in_axes=(None, 0, 0, 0, 0))(
                z0, uv, ur, Xw, comp_w
            )
            c2 = jnp.sum(rv * rv, axis=-1) * inv_sigma2
            w_rob = jnp.where(
                use_huber,
                jnp.minimum(1.0, delta / jnp.sqrt(jnp.maximum(c2, 1e-12))),
                1.0,
            )
            w = w_rob * inv_sigma2 * mask * (zdep > 0)
            wJ = Jv * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", Jv, wJ)
            g = jnp.einsum("nri,nr->i", wJ, rv)

            def other_res_d(dx):
                p2s, c2s = states_at(prev, cur, dx)
                out = [_inertial_res(p2s, c2s, preint_data), _rw_res(p2s, c2s)]
                if free_prev:
                    out.append(_prior_res(p2s, prior_data))
                return tuple(out)

            rs = other_res_d(z0)
            Js = jax.jacfwd(other_res_d)(z0)
            infos = [preint_info9, rw_info6] + ([prior_H] if free_prev else [])
            for r_o, J_o, I_o in zip(rs, Js, infos):
                IJ = I_o @ J_o
                H = H + J_o.T @ IJ
                g = g + IJ.T @ r_o

            dx = jnp.linalg.solve(H + lam * jnp.eye(D), -g)
            okf = jnp.all(jnp.isfinite(dx))
            dx = jnp.where(okf, dx, 0.0)
            prev_n, cur_n = states_at(prev, cur, dx)
            c_old = total_cost(prev, cur, mask, gate_r)
            c_new = total_cost(prev_n, cur_n, mask, gate_r)
            accept = c_new < c_old
            sel = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(accept, x, y), a, b
            )
            return (sel(prev_n, prev), sel(cur_n, cur),
                    jnp.where(accept, lam * 0.5, lam * 4.0)), None

        (prev, cur, _), _ = jax.lax.scan(
            gn_iter, (prev, cur, jnp.asarray(1e-3)), None, length=iters
        )
        c2 = vis_chi2(prev, cur)
        mask_new = jnp.where(c2 < gate_r, valid.astype(jnp.float32), 0.0)
        return (prev, cur, mask_new), None

    mask0 = valid.astype(jnp.float32)
    (prev_f, cur_f, mask), _ = jax.lax.scan(
        gn_round, (prev_state, cur_state, mask0), jnp.arange(rounds)
    )

    # ---- marginal information for the next frame's prior -----------------
    def vres_final(dx, uv_i, ur_i, Xw_i, cw_i):
        p2s, c2s = states_at(prev_f, cur_f, dx)
        r, _ = vis_res_one(c2s, uv_i, ur_i, Xw_i, cw_i)
        return r

    z0 = jnp.zeros(D, jnp.float32)
    zdep = vis_depths(cur_f)
    Jv = jax.vmap(jax.jacfwd(vres_final), in_axes=(None, 0, 0, 0, 0))(
        z0, uv, ur, Xw, comp_w
    )
    w = inv_sigma2 * mask * (zdep > 0)
    Hfull = jnp.einsum("nri,nrj->ij", Jv * w[:, None, None], Jv)

    def other_res_final(dx):
        p2s, c2s = states_at(prev_f, cur_f, dx)
        out = [_inertial_res(p2s, c2s, preint_data), _rw_res(p2s, c2s)]
        if free_prev:
            out.append(_prior_res(p2s, prior_data))
        return tuple(out)

    Js = jax.jacfwd(other_res_final)(z0)
    infos = [preint_info9, rw_info6] + ([prior_H] if free_prev else [])
    for J_o, I_o in zip(Js, infos):
        Hfull = Hfull + J_o.T @ I_o @ J_o

    if free_prev:
        # Schur-marginalize the previous frame (Optimizer::Marginalize:2960)
        Hcc = Hfull[:15, :15]
        Hcp = Hfull[:15, 15:]
        Hpp = Hfull[15:, 15:]
        Hpp_inv = jnp.linalg.pinv(0.5 * (Hpp + Hpp.T), rcond=1e-8)
        H15 = Hcc - Hcp @ Hpp_inv @ Hcp.T
    else:
        H15 = Hfull[:15, :15]
    H15 = _psd_project(H15)

    inlier = mask > 0
    return cur_f, inlier, jnp.sum(inlier), H15
