"""Closed-form Sim(3) estimation between matched 3D point sets + RANSAC.

Role of `Sim3Solver` (`/root/reference/src/Sim3Solver.cc`): Horn's method on
3-point minimal sets inside RANSAC, inliers gated by reprojection in BOTH
keyframes (`CheckInliers`), optional fixed scale for stereo/RGBD.

Batched: all hypotheses are solved with one vmapped closed form; scoring is
one [H, N] projection test per camera.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..frontend import camera as cam
from ..ops import lie


def horn_sim3(P, Q, w, fix_scale: bool = False):
    """Weighted Horn alignment: find (R, t, s) with Q ~= s R P + t.

    P, Q: [N, 3]; w: [N] weights. (Sim3Solver::ComputeSim3, Horn 1987 —
    closed-form via the 4x4 quaternion eigenproblem; we use the SVD form.)
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mp = jnp.sum(P * w[:, None], axis=0) / wsum
    mq = jnp.sum(Q * w[:, None], axis=0) / wsum
    Pc = (P - mp) * w[:, None]
    Qc = Q - mq
    W = Pc.T @ Qc  # [3, 3]
    U, S, Vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(jnp.sign(det))
    R = Vt.T @ D @ U.T
    if fix_scale:
        s = jnp.asarray(1.0)
    else:
        var_p = jnp.sum(w[:, None] * (P - mp) ** 2)
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_p, 1e-12)
    t = mq - s * R @ mp
    return R, t, s


def sim3_ransac(key, kind: int, K8,
                X1, X2, valid,
                R1, t1, R2, t2,
                uv1, uv2,
                n_hyp: int = 128, inlier_px: float = 6.0,
                fix_scale: bool = False):
    """RANSAC Sim3 between matched landmark sets of two keyframes.

    X1/X2: [N, 3] world-frame positions of the MATCHED landmarks as seen by
    map 1 / map 2 (same index = match). R1,t1 / R2,t2: the two KFs' Tcw.
    uv1/uv2: [N, 2] observed keypoints in each KF (for the two-sided
    reprojection gate, Sim3Solver::CheckInliers).

    Returns (R12, t12, s12, inliers, n_inl): the similarity mapping
    camera-2 coordinates into camera-1 coordinates (reference's S12).
    """
    # camera-frame points (the reference solves in camera frames)
    P1 = lie.se3_apply(R1, t1, X1)  # [N, 3] in cam1
    P2 = lie.se3_apply(R2, t2, X2)  # [N, 3] in cam2

    n = X1.shape[0]
    g = jax.random.uniform(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -1.0)
    _, sets = jax.lax.top_k(g, 3)

    def solve_one(idx):
        return horn_sim3(P2[idx], P1[idx], jnp.ones(3), fix_scale)

    Rs, ts, ss = jax.vmap(solve_one)(sets)  # S12 candidates

    # gate: project the other KF's points through the hypothesis
    def score(Rh, th, sh):
        p1_from_2 = sh * jnp.einsum("ij,nj->ni", Rh, P2) + th
        p2_from_1 = (1.0 / sh) * jnp.einsum("ji,nj->ni", Rh, P1 - th)
        e1 = jnp.linalg.norm(cam.project(kind, K8, p1_from_2) - uv1, axis=-1)
        e2 = jnp.linalg.norm(cam.project(kind, K8, p2_from_1) - uv2, axis=-1)
        ok = (e1 < inlier_px) & (e2 < inlier_px)
        ok = ok & (p1_from_2[:, 2] > 0) & (p2_from_1[:, 2] > 0) & valid
        return ok

    inls = jax.vmap(score)(Rs, ts, ss)
    counts = jnp.sum(inls, axis=1)
    best = jnp.argmax(counts)

    # refit on inliers
    w = inls[best].astype(jnp.float32)
    R_r, t_r, s_r = horn_sim3(P2, P1, w, fix_scale)
    inl_r = score(R_r, t_r, s_r)
    better = jnp.sum(inl_r) >= counts[best]
    R_out = jnp.where(better, R_r, Rs[best])
    t_out = jnp.where(better, t_r, ts[best])
    s_out = jnp.where(better, s_r, ss[best])
    inl_out = jnp.where(better, inl_r, inls[best])
    return R_out, t_out, s_out, inl_out, jnp.sum(inl_out)


def optimize_sim3(kind: int, K8, P1, P2, uv1, uv2, valid, R12, t12, s12,
                  valid_inv=None, iters: int = 10, th2: float = 10.0,
                  fix_scale: bool = False):
    """Sim3 LM refinement with bidirectional reprojection residuals — the
    role of `Optimizer::OptimizeSim3` (`/root/reference/src/Optimizer.cc:
    2115-2380`): one Sim3 vertex, fixed camera-frame points, paired
    EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ Huber edges (delta =
    sqrt(th2)), outlier edges dropped halfway and the refined inlier count
    returned.

    P1/P2: [N,3] matched points in camera-1 / camera-2 frames; uv1/uv2:
    their observed keypoints in each image. valid: forward-edge mask (the
    matched point P2 projected through S12 against uv1 — every match has
    one). valid_inv: inverse-edge mask (P1 through S21 against uv2) — only
    matches where the current feature has its OWN map point carry it, like
    the reference's one-sided handling of vIdsOnlyInKF2. (R12,t12,s12):
    initial S12 mapping cam-2 coords into cam-1.
    Returns (R, t, s, inlier_mask, n_inl).
    """
    delta_h = jnp.sqrt(th2)
    if valid_inv is None:
        valid_inv = valid

    def residuals(params):
        R, t, s = params
        p1 = s * jnp.einsum("ij,nj->ni", R, P2) + t
        Ri, ti, si = lie.sim3_inv(R, t, s)
        p2 = si * jnp.einsum("ij,nj->ni", Ri, P1) + ti
        r1 = cam.project(kind, K8, p1) - uv1
        r2 = cam.project(kind, K8, p2) - uv2
        pos1 = p1[:, 2] > 1e-3
        pos2 = p2[:, 2] > 1e-3
        return r1, r2, pos1, pos2

    def chi2(params):
        r1, r2, pos1, pos2 = residuals(params)
        c1 = jnp.sum(r1 ** 2, axis=-1)
        c2 = jnp.sum(r2 ** 2, axis=-1)
        big = jnp.float32(1e9)
        return jnp.where(pos1, c1, big), jnp.where(pos2, c2, big)

    n_dof = 6 if fix_scale else 7

    def gn_pass(RTS, m1, m2, n_iters):
        def step(carry, _):
            R, t, s = carry

            # IRLS: Huber weights evaluated at the CURRENT state and held
            # fixed through the GN step (differentiating sqrt(w) NaNs at
            # masked rows where w == 0)
            r1c, r2c, pos1c, pos2c = residuals((R, t, s))
            c1c = jnp.sum(r1c ** 2, -1)
            c2c = jnp.sum(r2c ** 2, -1)
            w1 = (m1 & pos1c).astype(jnp.float32) * jnp.minimum(
                1.0, delta_h / jnp.sqrt(c1c + 1e-12))
            w2 = (m2 & pos2c).astype(jnp.float32) * jnp.minimum(
                1.0, delta_h / jnp.sqrt(c2c + 1e-12))
            sw1 = jnp.sqrt(w1)[:, None]
            sw2 = jnp.sqrt(w2)[:, None]

            def res_flat(dxi):
                if fix_scale:
                    dxi = jnp.concatenate([dxi, jnp.zeros((1,))])
                dR, dt, ds = lie.sim3_exp(dxi)
                R2_, t2_, s2_ = lie.sim3_mul(dR, dt, ds, R, t, s)
                r1, r2, _, _ = residuals((R2_, t2_, s2_))
                return jnp.concatenate(
                    [(r1 * sw1).ravel(), (r2 * sw2).ravel()]
                )

            z = jnp.zeros((n_dof,))
            r0 = res_flat(z)
            J = jax.jacfwd(res_flat)(z)
            H = J.T @ J + 1e-6 * jnp.eye(n_dof)
            g = J.T @ r0
            dxi = -jnp.linalg.solve(H, g)
            if fix_scale:
                dxi = jnp.concatenate([dxi, jnp.zeros((1,))])
            dR, dt, ds = lie.sim3_exp(dxi)
            return lie.sim3_mul(dR, dt, ds, R, t, s), None

        out, _ = jax.lax.scan(step, RTS, None, length=n_iters)
        return out

    def inliers_of(RTS, m1, m2):
        c1, c2 = chi2(RTS)
        # a pair is an inlier if every edge it carries passes its gate
        # (the reference removes both edges when either is an outlier)
        return m1 & (c1 < th2) & (~m2 | (c2 < th2))

    RTS = (R12, t12, jnp.asarray(s12, jnp.float32))
    half = iters // 2
    RTS = gn_pass(RTS, valid, valid_inv, half)
    inl = inliers_of(RTS, valid, valid_inv)
    RTS = gn_pass(RTS, inl, inl & valid_inv, iters - half)
    inl = inliers_of(RTS, valid, valid_inv)
    R, t, s = RTS
    return R, t, s, inl, jnp.sum(inl)
