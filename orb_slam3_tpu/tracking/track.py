"""Jitted tracking-step kernels: pose optimization and local-map tracking.

These are the hot per-frame computations of `Tracking::Track()`
(`/root/reference/src/Tracking.cc:1794-2332`), reformulated as fixed-shape
jitted functions. The host-side state machine lives in `tracker.py`.

- `pose_optimize`: motion-only BA — 1 SE3 vertex, mono unary edges, LM
  rounds with chi2-gated outlier reclassification between rounds
  (Optimizer::PoseOptimization, `/root/reference/src/Optimizer.cc:814-1113`:
  4 rounds x 10 iterations there; 3x6 here — the per-frame prediction is
  close and the sequential depth is the latency cost on TPU).
- `track_local_map_step`: frustum-cull + project the local-map snapshot,
  windowed descriptor search, then pose_optimize
  (Tracking::TrackLocalMap / SearchLocalPoints, `Tracking.cc:2949-3061,3343`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontend import camera as cam
from ..frontend import matching
from ..ops import lie, robust


def _project_points(kind, K, R, t, X):
    Xc = lie.se3_apply(R, t, X)
    return cam.project(kind, K, Xc), Xc[..., 2]


@partial(jax.jit, static_argnames=("kind", "rounds", "iters"))
def pose_optimize(kind: int, K, R0, t0, uv, Xw, inv_sigma2, valid,
                  rounds: int = 3, iters: int = 6):
    """Motion-only BA with staged outlier gating.

    R0/t0: initial Tcw. uv [N,2] observations of world points Xw [N,3];
    inv_sigma2 [N] per-octave information; valid [N].
    Returns (R, t, inlier_mask [N], n_inliers).

    On TPU the pinhole case dispatches to the single-kernel Pallas
    implementation (pose_kernel.py) — same staged-round semantics, ~5x less
    launch latency. The XLA path below remains the CPU / fisheye / reference
    implementation.
    """
    if kind == cam.PINHOLE and jax.default_backend() == "tpu":
        from . import pose_kernel

        return pose_kernel.pose_optimize_pallas(
            K, R0, t0, uv, Xw, inv_sigma2, valid, rounds=rounds, iters=iters
        )

    delta = jnp.sqrt(robust.CHI2_2DOF)

    def chi2_of(R, t, mask):
        pred, z = _project_points(kind, K, R, t, Xw)
        r = uv - pred
        c2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        return jnp.where(z > 0, c2, 1e9), r

    def gated_cost(R, t, mask):
        c2, _ = chi2_of(R, t, mask)
        return jnp.sum(jnp.minimum(c2, 5.991) * mask)

    def gn_round(carry, round_i):
        R, t, mask = carry
        use_huber = round_i < 2  # kernel dropped for rounds 3/4 (Optimizer.cc:999)

        def gn_iter(carry2, _):
            # carry the gated cost so acceptance needs ONE trial projection
            # (jacfwd + LU solve measured fastest for this XLA fallback path
            # on v5e — the TPU pinhole case uses the Pallas kernel instead)
            R, t, lam, c_cur = carry2

            def residual_flat(dxi):
                Rn, tn = lie.se3_lplus(R, t, dxi)
                pred, _ = _project_points(kind, K, Rn, tn, Xw)
                return (uv - pred).reshape(-1)

            r = residual_flat(jnp.zeros(6))
            J = jax.jacfwd(residual_flat)(jnp.zeros(6))  # [2N, 6]
            r2 = r.reshape(-1, 2)
            c2 = jnp.sum(r2 * r2, axis=-1) * inv_sigma2
            w_rob = jnp.where(
                use_huber, robust.huber_weight(c2, delta), jnp.ones_like(c2)
            )
            w = w_rob * inv_sigma2 * mask
            wJ = J.reshape(-1, 2, 6) * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", J.reshape(-1, 2, 6), wJ)
            g = jnp.einsum("nri,nr->i", wJ, r2)
            dxi = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
            ok = jnp.all(jnp.isfinite(dxi))
            dxi = jnp.where(ok, dxi, 0.0)
            Rn, tn = lie.se3_lplus(R, t, dxi)
            c_new = gated_cost(Rn, tn, mask)
            accept = c_new < c_cur
            R2 = jnp.where(accept, Rn, R)
            t2 = jnp.where(accept, tn, t)
            lam2 = jnp.where(accept, lam * 0.5, lam * 4.0)
            c2_ = jnp.where(accept, c_new, c_cur)
            return (R2, t2, lam2, c2_), None

        (R, t, _, _), _ = jax.lax.scan(
            gn_iter,
            (R, t, jnp.asarray(1e-3), gated_cost(R, t, mask)),
            None, length=iters,
        )
        # reclassify
        c2, _ = chi2_of(R, t, mask)
        mask_new = jnp.where(c2 < robust.CHI2_2DOF, valid.astype(jnp.float32), 0.0)
        return (R, t, mask_new), None

    mask0 = valid.astype(jnp.float32)
    (R, t, mask), _ = jax.lax.scan(
        gn_round, (R0, t0, mask0), jnp.arange(rounds)
    )
    return R, t, mask > 0, jnp.sum(mask > 0)


@partial(jax.jit, static_argnames=("kind", "rounds", "iters"))
def pose_optimize_stereo(kind: int, K, bf, R0, t0, uv, ur, Xw, inv_sigma2,
                         valid, rounds: int = 3, iters: int = 6):
    """Motion-only BA with mixed mono/stereo edges.

    Stereo edges (ur >= 0) contribute the 3-dim (uL, v, uR) residual of
    g2o::EdgeStereoSE3ProjectXYZOnlyPose with uR = uL - bf/z; mono edges
    (ur < 0) have the third component masked. Gates use chi2 5.991 (mono) /
    7.815 (stereo) like PoseOptimization (Optimizer.cc:871-872, 999-1046).

    On TPU the pinhole case dispatches to the Pallas kernel (pose_kernel.py).
    """
    if kind == cam.PINHOLE and jax.default_backend() == "tpu":
        from . import pose_kernel

        return pose_kernel.pose_optimize_stereo_pallas(
            K, bf, R0, t0, uv, ur, Xw, inv_sigma2, valid,
            rounds=rounds, iters=iters,
        )

    has_ur = ur >= 0.0
    obs3 = jnp.concatenate([uv, jnp.where(has_ur, ur, 0.0)[:, None]], axis=1)
    comp_w = jnp.concatenate(
        [jnp.ones_like(uv), has_ur.astype(jnp.float32)[:, None]], axis=1
    )  # [N, 3]
    gate = jnp.where(has_ur, robust.CHI2_3DOF, robust.CHI2_2DOF)
    delta_m = robust.CHI2_2DOF ** 0.5
    delta_s = robust.CHI2_3DOF ** 0.5
    deltas = jnp.where(has_ur, delta_s, delta_m)

    def residuals(R, t):
        Xc = lie.se3_apply(R, t, Xw)
        p2 = cam.project(kind, K, Xc)
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        ur_pred = p2[:, 0] - bf / z
        pred = jnp.concatenate([p2, ur_pred[:, None]], axis=1)
        r = (obs3 - pred) * comp_w
        return r, Xc[:, 2]

    def chi2_of(R, t):
        r, z = residuals(R, t)
        c2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        return jnp.where(z > 0, c2, 1e9)

    def gated_cost(R, t, mask):
        c2 = chi2_of(R, t)
        return jnp.sum(jnp.minimum(c2, gate) * mask)

    def gn_round(carry, round_i):
        R, t, mask = carry
        use_huber = round_i < 2

        def gn_iter(carry2, _):
            R, t, lam, c_cur = carry2

            def res_flat(dxi):
                Rn, tn = lie.se3_lplus(R, t, dxi)
                r, _ = residuals(Rn, tn)
                return r.reshape(-1)

            r = res_flat(jnp.zeros(6)).reshape(-1, 3)
            J = jax.jacfwd(res_flat)(jnp.zeros(6)).reshape(-1, 3, 6)
            c2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            w_rob = jnp.where(
                use_huber, robust.huber_weight(c2, deltas), jnp.ones_like(c2)
            )
            w = w_rob * inv_sigma2 * mask
            wJ = J * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", J, wJ)
            g = jnp.einsum("nri,nr->i", wJ, r)
            dxi = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
            okf = jnp.all(jnp.isfinite(dxi))
            dxi = jnp.where(okf, dxi, 0.0)
            Rn, tn = lie.se3_lplus(R, t, dxi)
            c_new = gated_cost(Rn, tn, mask)
            accept = c_new < c_cur
            return (
                jnp.where(accept, Rn, R),
                jnp.where(accept, tn, t),
                jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, c_new, c_cur),
            ), None

        (R, t, _, _), _ = jax.lax.scan(
            gn_iter,
            (R, t, jnp.asarray(1e-3), gated_cost(R, t, mask)),
            None, length=iters,
        )
        c2 = chi2_of(R, t)
        mask_new = jnp.where(c2 < gate, valid.astype(jnp.float32), 0.0)
        return (R, t, mask_new), None

    (R, t, mask), _ = jax.lax.scan(
        gn_round, (R0, t0, valid.astype(jnp.float32)), jnp.arange(rounds)
    )
    return R, t, mask > 0, jnp.sum(mask > 0)


@partial(jax.jit, static_argnames=("kind", "rounds", "iters"))
def pose_optimize_two_cam(kind: int, K_l, K_r, R_rl, t_rl, R0, t0,
                          uv_l, Xw_l, info_l, valid_l,
                          uv_r, Xw_r, info_r, valid_r,
                          rounds: int = 3, iters: int = 6):
    """Motion-only BA over TWO physical cameras of a non-rectified stereo
    rig: left-camera mono edges + right-camera reprojection edges through
    the fixed extrinsics T_rl (the reference's PoseOptimization with
    EdgeSE3ProjectXYZOnlyPose + ...ToBody for fisheye stereo,
    `/root/reference/src/Optimizer.cc:871-977`,
    `OptimizableTypes.h:31-87`). The right-camera observations constrain
    metric scale directly — including features visible ONLY in the right
    camera (non-overlap region).

    Returns (R, t, inlier_l, inlier_r, n_inliers_total)."""
    delta = jnp.sqrt(robust.CHI2_2DOF)

    def residuals(R, t):
        Xl = lie.se3_apply(R, t, Xw_l)
        rl = uv_l - cam.project(kind, K_l, Xl)
        Xr = lie.se3_apply(R, t, Xw_r) @ R_rl.T + t_rl
        rr = uv_r - cam.project(kind, K_r, Xr)
        return rl, rr, Xl[:, 2], Xr[:, 2]

    def chi2_of(R, t):
        rl, rr, zl, zr = residuals(R, t)
        c2l = jnp.sum(rl * rl, axis=-1) * info_l
        c2r = jnp.sum(rr * rr, axis=-1) * info_r
        return (jnp.where(zl > 0, c2l, 1e9), jnp.where(zr > 0, c2r, 1e9))

    def gated_cost(R, t, ml, mr):
        c2l, c2r = chi2_of(R, t)
        return (jnp.sum(jnp.minimum(c2l, robust.CHI2_2DOF) * ml)
                + jnp.sum(jnp.minimum(c2r, robust.CHI2_2DOF) * mr))

    def gn_round(carry, round_i):
        R, t, ml, mr = carry
        use_huber = round_i < 2

        def gn_iter(carry2, _):
            R, t, lam, c_cur = carry2

            def res_flat(dxi):
                Rn, tn = lie.se3_lplus(R, t, dxi)
                rl, rr, _, _ = residuals(Rn, tn)
                return jnp.concatenate([rl.reshape(-1), rr.reshape(-1)])

            r = res_flat(jnp.zeros(6))
            J = jax.jacfwd(res_flat)(jnp.zeros(6))
            r2 = r.reshape(-1, 2)
            J2 = J.reshape(-1, 2, 6)
            info = jnp.concatenate([info_l, info_r])
            mask = jnp.concatenate([ml, mr])
            c2 = jnp.sum(r2 * r2, axis=-1) * info
            w_rob = jnp.where(
                use_huber, robust.huber_weight(c2, delta), jnp.ones_like(c2)
            )
            w = w_rob * info * mask
            wJ = J2 * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", J2, wJ)
            g = jnp.einsum("nri,nr->i", wJ, r2)
            dxi = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
            okf = jnp.all(jnp.isfinite(dxi))
            dxi = jnp.where(okf, dxi, 0.0)
            Rn, tn = lie.se3_lplus(R, t, dxi)
            c_new = gated_cost(Rn, tn, ml, mr)
            accept = c_new < c_cur
            return (
                jnp.where(accept, Rn, R), jnp.where(accept, tn, t),
                jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, c_new, c_cur),
            ), None

        (R, t, _, _), _ = jax.lax.scan(
            gn_iter, (R, t, jnp.asarray(1e-3), gated_cost(R, t, ml, mr)),
            None, length=iters,
        )
        c2l, c2r = chi2_of(R, t)
        ml = jnp.where(c2l < robust.CHI2_2DOF,
                       valid_l.astype(jnp.float32), 0.0)
        mr = jnp.where(c2r < robust.CHI2_2DOF,
                       valid_r.astype(jnp.float32), 0.0)
        return (R, t, ml, mr), None

    (R, t, ml, mr), _ = jax.lax.scan(
        gn_round,
        (R0, t0, valid_l.astype(jnp.float32), valid_r.astype(jnp.float32)),
        jnp.arange(rounds),
    )
    return R, t, ml > 0, mr > 0, jnp.sum(ml > 0) + jnp.sum(mr > 0)


@partial(jax.jit, static_argnames=("kind",))
def match_local_map(kind: int, K, R, t, lm_pos, lm_desc, lm_valid,
                    lm_max_dist, lm_min_dist, lm_normal,
                    kp_xy, kp_desc, kp_octave, kp_valid,
                    radius_px, scale_factors,
                    view_cos_th: float = 0.5,
                    img_wh=(640.0, 480.0)):
    """SearchLocalPoints: frustum cull (Frame::isInFrustum, Frame.cc:512) +
    projection-window descriptor search. Returns per-landmark (kp index,
    ok, uv_pred) and per-landmark visibility mask."""
    uv_pred, z = _project_points(kind, K, R, t, lm_pos)
    Ow = -R.T @ t
    d_vec = lm_pos - Ow
    dist = jnp.linalg.norm(d_vec, axis=-1)
    in_depth = (z > 0.0) & (dist >= 0.8 * lm_min_dist) & (dist <= 1.2 * lm_max_dist)
    in_img = (
        (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < img_wh[0])
        & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < img_wh[1])
    )
    vcos = jnp.sum(d_vec * lm_normal, axis=-1) / jnp.maximum(
        dist * jnp.linalg.norm(lm_normal, axis=-1), 1e-9
    )
    has_normal = jnp.linalg.norm(lm_normal, axis=-1) > 1e-6
    view_ok = jnp.where(has_normal, vcos > view_cos_th, True)
    visible = lm_valid & in_depth & in_img & view_ok

    # predicted octave from distance
    ratio = jnp.maximum(lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    n_levels = scale_factors.shape[0]
    pred_oct = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(1.2)).astype(jnp.int32), 0, n_levels - 1
    )

    idx, d, ok = matching.search_by_projection(
        uv_pred, pred_oct, lm_desc, visible,
        kp_xy, kp_octave, kp_desc, kp_valid,
        radius_px, scale_factors,
        max_dist=matching.TH_HIGH, ratio=0.8, level_lo=-1, level_hi=1,
    )
    return idx, ok, visible, uv_pred, d


# ---------------------------------------------------------------------------
# Fused per-frame visual tracking step
# ---------------------------------------------------------------------------

NO_LM_I32 = jnp.int32(-1)


@partial(jax.jit, static_argnames=("kind", "use_stereo", "use_two_cam",
                                   "chain_pred", "with_census"))
def track_frame_visual(kind: int, K, bf,
                       lm_pos, lm_desc, in_map, lm_max_dist, lm_min_dist,
                       lm_normal,
                       ref_desc, ref_has_lm, ref_lm_rows,
                       feat_xy, feat_desc, feat_octave, feat_valid, frame_ur,
                       R_pred, t_pred, R_last, t_last,
                       have_velocity, tracked_lms, last_inliers,
                       radius_coarse, radius_fine, min_inliers,
                       scale_factors, img_w, img_h,
                       use_stereo: bool,
                       use_two_cam: bool = False,
                       rfeat_xy=None, rfeat_desc=None, rfeat_octave=None,
                       rfeat_valid=None, K_r=None, R_rl=None, t_rl=None,
                       chain_pred: bool = False,
                       with_census: bool = False,
                       feat_depth=None, min_depth=None, th_depth_m=None,
                       R_kf=None, t_kf=None):
    """One visual tracking step as a single compiled program: stage-1
    coarse match+optimize at the predicted pose (with the widened-window
    retry from the last pose under a `lax.cond`), stage-2 fine match, the
    TrackReferenceKeyFrame appearance fallback, SO(3) projection, motion
    model, and the per-feature landmark assignment.

    Role of Tracking::TrackWithMotionModel + TrackLocalMap +
    TrackReferenceKeyFrame (`/root/reference/src/Tracking.cc:2720-3061`).
    Fusing the whole step removes ~10 separate dispatches and host syncs
    per frame — measured 5x on the per-frame wall time (the same win the
    hot-path entry() fusion shows).

    Returns dict with R, t (normalized), n_inliers, tracked [L], feat_lm
    [F], vis32/fnd32 [L], Rv/tv (velocity), vel_poisoned flag.
    """
    from ..ops import lie as lie_mod

    L = lm_pos.shape[0]
    n_feat = feat_xy.shape[0]
    n_levels = scale_factors.shape[0]

    if chain_pred:
        # motion-model prediction chained from the previous in-flight
        # step's device outputs (software pipeline). Folding it into this
        # program removes 4-6 eager micro-dispatches per frame — on the
        # tunnel each eager op costs real device-queue quanta
        Rm, tm = lie_mod.se3_mul(R_pred, t_pred, R_last, t_last)
        R_pred = jnp.where(have_velocity, Rm, R_last)
        t_pred = jnp.where(have_velocity, tm, t_last)

    cont = in_map & tracked_lms
    stage1_mask = jnp.where(
        jnp.sum(cont) > 2 * min_inliers, cont, in_map
    )

    def match_opt(R0, t0, mask, radius):
        idx, ok, visible, _, mdist = match_local_map(
            kind, K, R0, t0, lm_pos, lm_desc, mask,
            lm_max_dist, lm_min_dist, lm_normal,
            feat_xy, feat_desc, feat_octave, feat_valid,
            radius, scale_factors, img_wh=(img_w, img_h),
        )
        inv_sig2 = 1.0 / (
            scale_factors[jnp.clip(feat_octave[idx], 0, n_levels - 1)] ** 2
        )
        uv = feat_xy[idx]
        if use_stereo:
            ur_edge = jnp.where(ok, frame_ur[idx], -1.0)
            R, t, inlier, n = pose_optimize_stereo(
                kind, K, bf, R0, t0, uv, ur_edge, lm_pos, inv_sig2, ok
            )
        else:
            R, t, inlier, n = pose_optimize(
                kind, K, R0, t0, uv, lm_pos, inv_sig2, ok
            )
        return R, t, inlier, n, idx, visible

    # stage 1 at the predicted pose
    R1, t1, _, n1, _, _ = match_opt(R_pred, t_pred, stage1_mask,
                                    radius_coarse)

    # widened retry from the last pose when the motion model is poisoned
    # (Tracking.cc:2892-2897)
    do_fb = have_velocity & (
        n1 < jnp.maximum(2 * min_inliers, 0.5 * last_inliers)
    )

    def fb(_):
        Rb, tb, _, nb, _, _ = match_opt(R_last, t_last, in_map,
                                        2.0 * radius_coarse)
        # the wide window admits lattice-aliased associations on
        # repetitive texture, and pose_optimize will happily converge to
        # them — accept the retry only on a DECISIVE improvement, not a
        # marginal one (measured: a 35-vs-30 "win" at 2x radius snapped
        # the pose 0.4 units onto a texture alias and corrupted the map)
        better = (nb > 2 * n1) & (nb > 2 * min_inliers)
        return (jnp.where(better, Rb, R1), jnp.where(better, tb, t1),
                jnp.where(better, nb, n1), better)

    def keep(_):
        return (R1, t1, n1, jnp.asarray(False))

    R1f, t1f, n1f, vel_poisoned = jax.lax.cond(do_fb, fb, keep, None)

    # stage 2: fine matching at the refined pose
    R2, t2, inlier, n2, idx, visible = match_opt(
        R1f, t1f, in_map, radius_fine
    )

    # TrackReferenceKeyFrame appearance fallback (Tracking.cc:2720-2779)
    def refkf(_):
        midx, _, mok = matching.search_by_brute_force(
            feat_desc, feat_valid, ref_desc, ref_has_lm,
            ratio=0.7, max_dist=matching.TH_LOW,
        )
        enough = jnp.sum(mok) >= 15
        rows = jnp.clip(ref_lm_rows[midx], 0, L - 1)
        okr = mok & in_map[rows]
        inv_all = 1.0 / (
            scale_factors[jnp.clip(feat_octave, 0, n_levels - 1)] ** 2
        )
        Rr, tr, _, nr = pose_optimize(
            kind, K, R_last, t_last, feat_xy, lm_pos[rows], inv_all, okr
        )
        good = enough & (nr >= 10)
        Rb, tb, inlb, nb, idxb, visb = match_opt(Rr, tr, in_map, radius_fine)
        use = good & (nb > n2)
        return (jnp.where(use, Rb, R2), jnp.where(use, tb, t2),
                jnp.where(use[None], inlb, inlier),
                jnp.where(use, nb, n2),
                jnp.where(use[None], idxb, idx),
                jnp.where(use[None], visb, visible))

    def keep2(_):
        return (R2, t2, inlier, n2, idx, visible)

    R2f, t2f, inlier, n2f, idx, visible = jax.lax.cond(
        n2 < min_inliers, refkf, keep2, None
    )

    if use_two_cam:
        # right-camera stage (fisheye stereo): match the local map through
        # the fixed extrinsics T_rl and jointly refine the LEFT pose over
        # both cameras' reprojection edges (PoseOptimization with ToBody
        # edges, Optimizer.cc:871-977). Right-ONLY features — the
        # non-overlap region — contribute tracked inliers here.
        R_r = R_rl @ R2f
        t_r = R_rl @ t2f + t_rl
        idx_r, ok_r, vis_r, _, _ = match_local_map(
            kind, K_r, R_r, t_r, lm_pos, lm_desc, in_map,
            lm_max_dist, lm_min_dist, lm_normal,
            rfeat_xy, rfeat_desc, rfeat_octave, rfeat_valid,
            radius_fine, scale_factors, img_wh=(img_w, img_h),
        )
        inv_l = 1.0 / (
            scale_factors[jnp.clip(feat_octave[idx], 0, n_levels - 1)] ** 2
        )
        inv_r = 1.0 / (
            scale_factors[jnp.clip(rfeat_octave[idx_r], 0, n_levels - 1)]
            ** 2
        )
        R2f, t2f, inl_l, inl_r, n_tc = pose_optimize_two_cam(
            kind, K, K_r, R_rl, t_rl, R2f, t2f,
            feat_xy[idx], lm_pos, inv_l, inlier,
            rfeat_xy[idx_r], lm_pos, inv_r, ok_r,
        )
        inlier = inl_l
        n2f = n_tc
        # landmark stats: a point is visible/found through EITHER camera
        visible = visible | vis_r
        tracked_any = inl_l | inl_r
    else:
        tracked_any = inlier

    R2f = lie_mod.normalize_rotation(R2f)
    # motion model velocity = T_cur T_last^-1 (Tracking.cc:2207)
    Rl_inv, tl_inv = lie_mod.se3_inv(R_last, t_last)
    Rv, tv = lie_mod.se3_mul(R2f, t2f, Rl_inv, tl_inv)
    Rv = lie_mod.normalize_rotation(Rv)

    # per-feature landmark assignment (newest-wins scatter-max; see
    # Tracker._assign_features)
    feat_lm = jnp.full((n_feat,), NO_LM_I32, jnp.int32)
    feat_lm = feat_lm.at[jnp.where(inlier, idx, n_feat)].max(
        jnp.where(inlier, jnp.arange(L, dtype=jnp.int32), NO_LM_I32),
        mode="drop",
    )

    # close-point census for NeedNewKeyFrame c1c (Tracking.cc:3106-3128),
    # folded into the frame program so the host reads ONE stacked scalar
    # vector per frame (each extra fetch pays a ~25 ms completion-
    # notification quantum on the tunnel)
    if with_census:
        close = ((feat_depth > min_depth) & (feat_depth < th_depth_m)
                 & feat_valid)
        trk_f = feat_lm >= 0
        census_trk = jnp.sum(close & trk_f).astype(jnp.int32)
        census_untrk = jnp.sum(close & ~trk_f).astype(jnp.int32)
    else:
        census_trk = jnp.int32(-1)
        census_untrk = jnp.int32(-1)

    out = dict(
        R=R2f, t=t2f, n=n2f, tracked=tracked_any, feat_lm=feat_lm,
        vis32=visible.astype(jnp.int32), fnd32=tracked_any.astype(jnp.int32),
        Rv=Rv, tv=tv, vel_poisoned=vel_poisoned,
        # device-side motion-model validity for the NEXT frame's chained
        # dispatch (software pipeline: the host never reads this)
        has_vel=(n2f >= min_inliers) & ~vel_poisoned,
        # stacked scalars: ONE host fetch per frame reads all four
        scal=jnp.stack([n2f.astype(jnp.int32),
                        vel_poisoned.astype(jnp.int32),
                        census_trk, census_untrk]),
    )
    if R_kf is not None:
        # trajectory record relative to the reference keyframe
        # (Tracker._record_frame), folded in to kill 2 eager ops/frame
        Rk_inv, tk_inv = lie_mod.se3_inv(R_kf, t_kf)
        out["R_rel"], out["t_rel"] = lie_mod.se3_mul(R2f, t2f, Rk_inv,
                                                     tk_inv)
    return out


@jax.jit
def local_map_mask(kf_feat_lm, kf_feat_valid, kf_valid, lm_valid, lm_map_id,
                   active_map, covis_W_row, ref_row, max_kfs: int = 80):
    """Landmarks of the covisibility-local map of `ref_row`
    (Tracking::UpdateLocalKeyFrames/UpdateLocalPoints, Tracking.cc:
    3417-3607: the K1 observers + K2 neighbors, capped at 80 KFs, define
    mvpLocalMapPoints). Tracking matches ONLY against this set — scoping is
    what routes genuine revisits through place recognition instead of
    silently re-binding old structure, and it bounds per-frame match cost.

    covis_W_row: [K] covisibility weights of the reference KF."""
    K, F = kf_feat_lm.shape[0], kf_feat_lm.shape[1]
    L = lm_valid.shape[0]
    row = jnp.where(jnp.arange(K) == ref_row, 0, covis_W_row)
    row = jnp.where(kf_valid, row, 0)
    topw, topi = jax.lax.top_k(row, min(max_kfs, K))
    in_local = jnp.zeros((K,), bool).at[topi].max(topw > 0)
    in_local = in_local.at[jnp.clip(ref_row, 0, K - 1)].set(True)
    bound = (kf_feat_lm >= 0) & kf_feat_valid & in_local[:, None]
    mask = jnp.zeros((L,), bool).at[
        jnp.clip(kf_feat_lm, 0, L - 1).reshape(-1)
    ].max(bound.reshape(-1), mode="drop")
    return mask & lm_valid & (lm_map_id == active_map)
