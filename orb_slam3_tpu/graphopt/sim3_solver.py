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
