"""Local mapping: triangulation of new landmarks, local BA, culling.

Role of the LocalMapping thread pipeline (`/root/reference/src/LocalMapping.cc:64-282`):
per new keyframe — create map points by two-view triangulation against
neighbor KFs (`CreateNewMapPoints:388`), run windowed local BA
(`Optimizer::LocalBundleAdjustment:1116`), cull low-quality landmarks
(`MapPointCulling:346`). Here each stage is a fixed-shape jitted function
over the SoA MapState; the window is a static-size array of KF rows.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..atlas import ops as atlas_ops
from ..atlas.state import NO_LM, MapState
from ..frontend import camera as cam
from ..frontend import matching
from ..lm import edges as lm_edges
from ..lm import schur
from ..ops import lie, robust
from ..frontend.two_view import triangulate as dlt_triangulate


def _fundamental_from_poses(K, R1, t1, R2, t2):
    """F21 mapping image-1 points to epipolar lines in image 2
    (GeometricTools::ComputeF12 analogue)."""
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Kinv = jnp.linalg.inv(Km)
    E = lie.hat(t21) @ R21
    return Kinv.T @ E @ Kinv


@partial(jax.jit, static_argnames=("kind", "max_new", "use_depth"))
def triangulate_pair(kind: int, K, s: MapState, kf1, kf2,
                     scale_factors, max_new: int = 256,
                     use_depth: bool = False, min_depth: float = 0.0):
    """Match unbound features of kf1 against unbound features of kf2 (ratio +
    epipolar gate), triangulate, and run the acceptance checks of
    CreateNewMapPoints (`LocalMapping.cc:388-712`): cheirality, reprojection
    chi2 < 5.991*sigma2 in both views, parallax.

    Returns (xw [F,3], src_feat [F], dst_feat [F], accept [F]) where F = fmax
    and accept marks triangulated candidates bound to kf1's features.
    """
    F = s.fmax
    R1, t1 = s.kf_R[kf1], s.kf_t[kf1]
    R2, t2 = s.kf_R[kf2], s.kf_t[kf2]

    free1 = s.kf_feat_valid[kf1] & (s.kf_feat_lm[kf1] == NO_LM)
    free2 = s.kf_feat_valid[kf2] & (s.kf_feat_lm[kf2] == NO_LM)

    d1 = s.kf_feat_desc[kf1]
    d2 = s.kf_feat_desc[kf2]
    xy1 = s.kf_feat_xy[kf1]
    xy2 = s.kf_feat_xy[kf2]

    dist = matching.hamming_matrix(d1, d2)
    m = free1[:, None] & free2[None, :]
    # epipolar gate: point in 1 -> line in 2
    Fm = _fundamental_from_poses(K, R1, t1, R2, t2)
    ph1 = jnp.concatenate([xy1, jnp.ones((F, 1))], axis=-1)
    lines = ph1 @ Fm.T  # [F, 3] lines in image 2
    ph2 = jnp.concatenate([xy2, jnp.ones((F, 1))], axis=-1)
    dnum = jnp.abs(lines @ ph2.T)  # [F1, F2] point-line numerator
    dden = jnp.sqrt(jnp.maximum(lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2, 1e-12))
    ep_dist2 = (dnum / dden) ** 2
    sig2 = scale_factors[jnp.clip(s.kf_feat_octave[kf2], 0, scale_factors.shape[0] - 1)] ** 2
    m = m & (ep_dist2 < 3.84 * sig2[None, :])

    idx, dmin, ok = matching.masked_best_match(
        dist, m, max_dist=matching.TH_LOW, ratio=0.8
    )
    # mutual check
    idx_back, _, _ = matching.masked_best_match(dist.T, m.T, max_dist=matching.TH_LOW)
    ok = matching.mutual_filter(idx, ok, idx_back)

    # triangulate
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    P1 = Km @ jnp.concatenate([R1, t1[:, None]], axis=1)
    P2 = Km @ jnp.concatenate([R2, t2[:, None]], axis=1)
    Xw = dlt_triangulate(P1, P2, xy1, xy2[idx])

    # stereo/RGB-D: a feature with a measured depth beats low-parallax DLT
    # (CreateNewMapPoints prefers UnprojectStereo when bStereo1 and ray
    # parallax is below the stereo parallax, LocalMapping.cc:557-604). The
    # measured point also waives the parallax gate: the depth sensor IS
    # the baseline.
    has_meas = jnp.zeros((F,), bool)
    if use_depth:
        d1 = s.kf_feat_depth[kf1]
        has_meas = d1 > min_depth
        rays = cam.unproject(kind, K, xy1)
        Xc_meas = rays * d1[:, None]
        R1w, t1w = lie.se3_inv(R1, t1)
        Xw_meas = lie.se3_apply(R1w, t1w, Xc_meas)
        Xw = jnp.where(has_meas[:, None], Xw_meas, Xw)

    # acceptance checks
    Xc1 = lie.se3_apply(R1, t1, Xw)
    Xc2 = lie.se3_apply(R2, t2, Xw)
    depth_ok = (Xc1[:, 2] > 0) & (Xc2[:, 2] > 0)
    uv1p = cam.project(kind, K, Xc1)
    uv2p = cam.project(kind, K, Xc2)
    s1 = scale_factors[jnp.clip(s.kf_feat_octave[kf1], 0, scale_factors.shape[0] - 1)] ** 2
    e1 = jnp.sum((uv1p - xy1) ** 2, axis=-1)
    e2 = jnp.sum((uv2p - xy2[idx]) ** 2, axis=-1)
    reproj_ok = (e1 < 5.991 * s1) & (e2 < 5.991 * sig2[idx])
    # parallax
    O1 = -R1.T @ t1
    O2 = -R2.T @ t2
    r1 = Xw - O1
    r2 = Xw - O2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    parallax_ok = cosp < 0.9998
    finite = jnp.all(jnp.isfinite(Xw), axis=-1)

    accept = ok & depth_ok & reproj_ok & (parallax_ok | has_meas) & finite
    # cap the number of new landmarks per call (keeps allocation bounded)
    order = jnp.cumsum(accept.astype(jnp.int32))
    accept = accept & (order <= max_new)
    return Xw, jnp.arange(F, dtype=jnp.int32), idx.astype(jnp.int32), accept


def insert_triangulated(s: MapState, kf1, kf2, Xw, f1, f2, accept) -> MapState:
    """Allocate accepted landmarks, bind to both keyframes' features."""
    desc = s.kf_feat_desc[kf1]
    s2, rows = atlas_ops.add_landmarks(
        s, Xw, desc, jnp.full(f1.shape, kf1, jnp.int32), accept,
        jnp.full(f1.shape, kf1, jnp.int32), f1,
    )
    s3 = atlas_ops.add_observations(s2, kf2, f2, rows, accept & (rows >= 0))
    return s3


@partial(jax.jit, static_argnames=("kind", "window", "iters", "stereo"))
def local_ba(kind: int, K, s: MapState, window_rows, n_fixed: int = 2,
             window: int = 8, iters: int = 10, scale_factors=None,
             stereo: bool = False, bf: float = 0.0):
    """Windowed local BA over `window` keyframe rows (padded with repeats).

    window_rows: [window] int32 KF rows, the LAST `window` valid KFs; the
    first n_fixed entries are held fixed (gauge anchoring — the reference
    fixes the frontier KFs instead, Optimizer.cc:1118-1186).
    Landmarks observed in the window are free; all others fixed.
    Writes back optimized poses/landmarks and detaches outlier observations
    (chi2 > 5.991, Optimizer.cc:1413-1475).
    """
    W = window
    Fc = s.fmax
    L = s.lmax
    rows = window_rows

    # padded windows may repeat rows: only the FIRST occurrence of a row is a
    # real camera vertex; duplicates are frozen and contribute no edges
    eq = rows[:, None] == rows[None, :]
    first_occ = jnp.sum(
        jnp.tril(eq, k=-1), axis=1
    ) == 0  # [W] True if rows[i] not seen before slot i

    # observations: all (window kf, feature) pairs with a landmark
    lm_idx = s.kf_feat_lm[rows]            # [W, F]
    feat_ok = (
        s.kf_feat_valid[rows] & (lm_idx >= 0) & first_occ[:, None]
    )
    lm_safe = jnp.clip(lm_idx, 0, L - 1)
    obs_ok = feat_ok & s.lm_valid[lm_safe]

    cam_idx = jnp.broadcast_to(jnp.arange(W)[:, None], (W, Fc)).reshape(-1)
    lm_edge = lm_safe.reshape(-1)
    uv = s.kf_feat_xy[rows].reshape(-1, 2)
    oct_ = s.kf_feat_octave[rows].reshape(-1)
    if scale_factors is None:
        scale_factors = 1.2 ** jnp.arange(8)
    inv_sigma2 = 1.0 / (
        scale_factors[jnp.clip(oct_, 0, scale_factors.shape[0] - 1)] ** 2
    )
    mask = obs_ok.reshape(-1)

    # free landmarks: observed in the window
    observed = jnp.zeros((L,), bool).at[lm_edge].max(mask)
    point_fixed = ~observed

    cam_fixed = (jnp.arange(W) < n_fixed) | ~first_occ

    E = W * Fc
    if stereo:
        # 3-dim (uL, v, uR) residual; mono rows (ur < 0) mask the third
        # component through a zeroed info entry (EdgeStereoSE3ProjectXYZ,
        # Optimizer.cc:1325-1352)
        ur = s.kf_feat_ur[rows].reshape(-1)
        has_ur = ur >= 0.0
        uvr = jnp.concatenate([uv, jnp.where(has_ur, ur, 0.0)[:, None]], axis=1)
        info3 = (
            jnp.stack(
                [
                    jnp.ones_like(ur),
                    jnp.ones_like(ur),
                    has_ur.astype(jnp.float32),
                ],
                axis=-1,
            )
            * inv_sigma2[:, None]
        )
        obs_info = jax.vmap(jnp.diag)(info3)  # [E, 3, 3]
        sres = lm_edges.make_stereo_residual(kind)

        def ba_residual(cam_state, x, data):
            r3 = sres(cam_state, {"x": x}, data)
            return r3

        obs_data = {
            "uvr": uvr,
            "K": jnp.tile(K[None], (E, 1)),
            "bf": jnp.full((E,), bf, jnp.float32),
        }
        residual_dim = 3
        huber = robust.CHI2_3DOF ** 0.5
        gate = 7.815
    else:
        res = lm_edges.make_mono_residual(kind)

        def ba_residual(cam_state, x, data):
            return res(cam_state, {"x": x}, data)

        obs_data = {"uv": uv, "K": jnp.tile(K[None], (E, 1))}
        obs_info = inv_sigma2
        residual_dim = 2
        huber = robust.CHI2_2DOF ** 0.5
        gate = 9.21

    bap = schur.BAProblem(
        cams=lm_edges.make_pose_block(s.kf_R[rows], s.kf_t[rows], cam_fixed),
        points=s.lm_pos,
        point_fixed=point_fixed,
        cam_idx=cam_idx,
        lm_idx=lm_edge,
        obs_data=obs_data,
        obs_info=obs_info,
        obs_mask=mask,
        cam_edges=(),
        residual_dim=residual_dim,
        residual=ba_residual,
        huber_delta=huber,
    )
    solved, stats = schur.solve(bap, num_iters=iters, lam0=1e-5)

    # outlier detach at the optimized state. NOTE: detaching is permanent
    # until a fuse pass re-binds, so the gate is set loosely (99% quantile)
    # rather than the reference's 95% — our round-1 graph is thinner than the
    # reference's and over-trimming starves the scale coupling
    chi2 = schur.obs_chi2(solved)
    inlier = chi2 < gate
    new_feat_lm = jnp.where(
        (mask & ~inlier).reshape(W, Fc), NO_LM, s.kf_feat_lm[rows]
    )

    rows_w = jnp.where(first_occ, rows, s.kmax)  # drop duplicate-slot writes
    # SO(3) projection of the written poses: repeated per-KF BA runs
    # otherwise accumulate f32 composition error in the stored rotations
    # (det drift absorbs map scale — see tracker._match_and_optimize)
    R_out = lie.normalize_rotation(solved.cams.state["R"])
    s_out = dataclasses.replace(
        s,
        kf_R=s.kf_R.at[rows_w].set(R_out, mode="drop"),
        kf_t=s.kf_t.at[rows_w].set(solved.cams.state["t"], mode="drop"),
        lm_pos=solved.points,
        kf_feat_lm=s.kf_feat_lm.at[rows_w].set(new_feat_lm, mode="drop"),
    )
    return s_out, stats


def cull_landmarks(s: MapState, min_found_ratio: float = 0.25,
                   min_obs: int = 2, grace_kfs: int = 2) -> MapState:
    """MapPointCulling (`LocalMapping.cc:346-386`): kill landmarks whose
    found/visible ratio is poor, or that still have too few observations
    once `grace_kfs` keyframes have passed since their creation (the
    reference's '<=2/3 observers within 2-3 KFs of birth' rule — fresh
    points get time to accumulate observations via tracking and fuse)."""
    L = s.lmax
    obs_cnt = jnp.zeros((L,), jnp.int32).at[
        jnp.clip(s.kf_feat_lm, 0, L - 1)
    ].add(((s.kf_feat_lm >= 0) & s.kf_feat_valid).astype(jnp.int32))
    ratio = s.lm_found.astype(jnp.float32) / jnp.maximum(
        s.lm_visible.astype(jnp.float32), 1.0
    )
    seen = s.lm_visible > 3  # only judge once it has been tested a few times
    mature = (s.n_kf - 1 - s.lm_first_kf) >= grace_kfs
    bad = s.lm_valid & (
        (mature & (obs_cnt < min_obs))
        | (seen & (ratio < min_found_ratio))
        | (obs_cnt == 0)
    )
    rows = jnp.arange(L, dtype=jnp.int32)
    return atlas_ops.invalidate_landmarks(s, rows, bad)


def cull_keyframes(s: MapState, window_rows, min_redundancy: float = 0.9,
                   protect_last: int = 2) -> MapState:
    """KeyFrameCulling (`/root/reference/src/LocalMapping.cc:902-1170`): a
    keyframe is redundant if >= 90% of its bound landmarks are observed by
    at least 3 other keyframes; redundant KFs are invalidated, their
    observations detached, and their children re-parented.

    Only considers `window_rows` (the recent window, like the reference's
    covisible-of-current scope); the newest `protect_last` rows are kept.
    """
    L = s.lmax
    K = s.kmax
    obs_cnt = jnp.zeros((L,), jnp.int32).at[
        jnp.clip(s.kf_feat_lm, 0, L - 1)
    ].add(((s.kf_feat_lm >= 0) & s.kf_feat_valid).astype(jnp.int32))

    lm = s.kf_feat_lm[window_rows]                       # [W, F]
    bound = (lm >= 0) & s.kf_feat_valid[window_rows]
    cnt = obs_cnt[jnp.clip(lm, 0, L - 1)]
    redundant_obs = bound & (cnt >= 4)                    # >=3 OTHER observers
    n_bound = jnp.sum(bound, axis=1)
    frac = jnp.sum(redundant_obs, axis=1) / jnp.maximum(n_bound, 1)

    n_kf = s.n_kf
    protect = (window_rows >= n_kf - protect_last) | (window_rows <= 1)
    kill = (frac > min_redundancy) & (n_bound > 10) & ~protect
    kill = kill & s.kf_valid[window_rows]
    # never kill two adjacent window KFs in one pass (avoid graph holes)
    kill = kill & jnp.concatenate([jnp.asarray([True]), ~kill[:-1]])

    kill_rows = jnp.where(kill, window_rows, K)
    kf_valid = s.kf_valid.at[kill_rows].set(False, mode="drop")
    # detach observations of killed KFs
    killed_mask = jnp.zeros((K,), bool).at[kill_rows].set(True, mode="drop")
    detach = killed_mask[:, None] & (s.kf_feat_lm >= 0)
    kf_feat_lm = jnp.where(detach, NO_LM, s.kf_feat_lm)
    # re-parent children of killed KFs to the first SURVIVING ancestor
    # (KeyFrame::SetBadFlag child re-parenting): iterate the one-hop remap
    # until chains of same-round kills are resolved (chain length is
    # bounded by the window size)
    parent0 = s.kf_parent
    new_parent = parent0
    for _ in range(int(window_rows.shape[0])):
        new_parent = jnp.where(
            killed_mask[jnp.clip(new_parent, 0, K - 1)] & (new_parent >= 0),
            parent0[jnp.clip(new_parent, 0, K - 1)],
            new_parent,
        )
    # splice the temporal prev chain past killed KFs the same way (the
    # reference rewires mPrevKF/mNextKF in SetBadFlag; leaving a culled row
    # linked breaks the chain invariant and, after compaction, can point a
    # survivor at a recycled tail row)
    prev0 = s.kf_prev
    new_prev = prev0
    for _ in range(int(window_rows.shape[0])):
        new_prev = jnp.where(
            killed_mask[jnp.clip(new_prev, 0, K - 1)] & (new_prev >= 0),
            prev0[jnp.clip(new_prev, 0, K - 1)],
            new_prev,
        )
    return dataclasses.replace(
        s, kf_valid=kf_valid, kf_feat_lm=kf_feat_lm, kf_parent=new_parent,
        kf_prev=new_prev,
    )
