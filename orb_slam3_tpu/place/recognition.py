"""Keyframe database, relocalization, and loop/merge candidate detection.

Roles of `KeyFrameDatabase` (`/root/reference/src/KeyFrameDatabase.cc`:
DetectRelocalizationCandidates :733, DetectNBestCandidates :604),
`Tracking::Relocalization` (`Tracking.cc:3609-3761`: BoW candidates ->
PnP RANSAC -> pose optimization -> guided re-projection), and the MLPnP
RANSAC solver (`/root/reference/src/MLPnPsolver.cpp`).

The inverted file becomes a dense [Kmax, W] BoW matrix: a query is one
masked matmul-style reduction against every keyframe at once. PnP is a
batched 6-point DLT RANSAC: all hypotheses solved in one batched SVD.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import camera as cam
from ..frontend import matching
from ..ops import lie
from . import vocab as vocab_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KeyframeDB:
    bows: jnp.ndarray    # [Kmax, W]
    valid: jnp.ndarray   # [Kmax]

    @staticmethod
    def empty(kmax: int, n_words: int) -> "KeyframeDB":
        return KeyframeDB(
            bows=jnp.zeros((kmax, n_words), jnp.float32),
            valid=jnp.zeros((kmax,), bool),
        )

    def add(self, kf_row, bow) -> "KeyframeDB":
        return KeyframeDB(
            bows=self.bows.at[kf_row].set(bow),
            valid=self.valid.at[kf_row].set(True),
        )


def query(db: KeyframeDB, bow, exclude_mask=None):
    """L1 scores against every stored keyframe; [Kmax]."""
    s = vocab_mod.score_matrix(bow, db.bows)
    s = jnp.where(db.valid, s, -1.0)
    if exclude_mask is not None:
        s = jnp.where(exclude_mask, -1.0, s)
    return s


def reloc_candidates(db: KeyframeDB, bow, top_n: int = 3):
    """DetectRelocalizationCandidates: best-scoring KFs above 0.75 * max
    (KeyFrameDatabase.cc:733-850's minScoreToRetain rule)."""
    s = query(db, bow)
    vals, idx = jax.lax.top_k(s, top_n)
    ok = vals >= 0.75 * jnp.maximum(vals[0], 1e-9)
    ok = ok & (vals > 0.0)
    return idx, vals, ok


def loop_candidates(db: KeyframeDB, bow, query_kf, covis_row, min_covis_score,
                    top_n: int = 3, covis_W=None, group_size: int = 10):
    """DetectNBestCandidates for loop/merge: exclude the query KF and its
    covisible neighbors; require score >= the worst covisible score
    (LoopClosing.cc:491, KeyFrameDatabase.cc:604-729).

    covis_row: [Kmax] bool — covisible-with-query mask.
    covis_W: optional [Kmax, Kmax] covisibility weights. When given, applies
    the reference's covisibility-group accumulation (KeyFrameDatabase.cc:
    674-729): each candidate's score is summed over its best-`group_size`
    covisible neighbors, groups are ranked by that accumulated score, and
    the best-scoring MEMBER of each winning group is returned — a candidate
    weakly matched directly but surrounded by strong matches still surfaces.
    """
    K = db.valid.shape[0]
    exclude = covis_row.at[query_kf].set(True)
    s = query(db, bow, exclude_mask=exclude)
    s = jnp.where(s >= min_covis_score, s, -1.0)
    if covis_W is None:
        vals, idx = jax.lax.top_k(s, top_n)
        return idx, vals, vals > 0.0

    sp = jnp.maximum(s, 0.0)  # excluded/invalid rows contribute 0
    k = min(group_size, K - 1)
    topw, topi = jax.lax.top_k(covis_W, k)          # [K, k] best covisibles
    member = sp[topi] * (topw > 0)                   # [K, k]
    acc = sp + jnp.sum(member, axis=1)               # group score per candidate
    acc = jnp.where(s > 0, acc, -1.0)                # candidate must score itself
    # best-scoring member of each group (self included)
    mem_scores = jnp.concatenate([sp[:, None], member], axis=1)   # [K, k+1]
    mem_ids = jnp.concatenate(
        [jnp.arange(K, dtype=topi.dtype)[:, None], topi], axis=1
    )
    best_m = jnp.argmax(mem_scores, axis=1)
    best_kf = jnp.take_along_axis(mem_ids, best_m[:, None], axis=1)[:, 0]

    vals, gidx = jax.lax.top_k(acc, top_n)
    return best_kf[gidx], vals, vals > 0.0


# ---------------------------------------------------------------------------
# Batched DLT PnP RANSAC (role of MLPnPsolver::iterate)
# ---------------------------------------------------------------------------

def _dlt_pnp(Xw, xn, w):
    """[P, 3] world points + [P, 2] normalized image coords (+ row weights
    [P]) -> (R, t) via the 11-dof DLT with orthogonalization."""
    X, Y, Z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
    u, v = xn[:, 0], xn[:, 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], -1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.sign(det)) @ Vt2
    scale = jnp.mean(S) * jnp.sign(det)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return R, t


def pnp_ransac(key, kind: int, K8, uv, Xw, valid, n_hyp: int = 128,
               inlier_px: float = 4.0, min_set: int = 6):
    """Batched RANSAC PnP: returns (R, t, inlier_mask, n_inliers).

    uv [N, 2] pixels, Xw [N, 3] world points (same index = correspondence).
    """
    n = uv.shape[0]
    fx, fy, cx, cy = K8[0], K8[1], K8[2], K8[3]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)

    g = jax.random.uniform(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -1.0)
    _, sets = jax.lax.top_k(g, min_set)  # [H, 6]

    def solve_one(idx):
        return _dlt_pnp(Xw[idx], xn[idx], jnp.ones(min_set))

    Rs, ts = jax.vmap(solve_one)(sets)  # [H, 3, 3], [H, 3]

    # score: reprojection inliers
    Xc = jnp.einsum("hij,nj->hni", Rs, Xw) + ts[:, None, :]
    zc = Xc[..., 2]
    pred = cam.pinhole_project(
        K8, Xc.reshape(-1, 3)
    ).reshape(n_hyp, n, 2) if kind == cam.PINHOLE else cam.kb8_project(
        K8, Xc.reshape(-1, 3)
    ).reshape(n_hyp, n, 2)
    err = jnp.linalg.norm(pred - uv[None], axis=-1)
    inl = (err < inlier_px) & (zc > 0) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # refine the winning hypothesis on all of its inliers (weighted DLT),
    # then re-score — the 6-point minimal estimate is noisy
    w_ref = inl[best].astype(jnp.float32)
    R_r, t_r = _dlt_pnp(Xw, xn, w_ref)
    Xc_r = lie.se3_apply(R_r, t_r, Xw)
    pred_r = cam.project(kind, K8, Xc_r)
    err_r = jnp.linalg.norm(pred_r - uv, axis=-1)
    inl_r = (err_r < inlier_px) & (Xc_r[:, 2] > 0) & valid
    better = jnp.sum(inl_r) >= scores[best]
    R_out = jnp.where(better, R_r, Rs[best])
    t_out = jnp.where(better, t_r, ts[best])
    inl_out = jnp.where(better, inl_r, inl[best])
    return R_out, t_out, inl_out, jnp.sum(inl_out)
