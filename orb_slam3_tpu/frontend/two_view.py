"""Two-view reconstruction for monocular map initialization.

Role of `TwoViewReconstruction` (`/root/reference/src/TwoViewReconstruction.cc`):
parallel RANSAC of a homography and a fundamental matrix (200 iterations of
8-point sets, `:42-119`), model selection by score ratio, and motion
recovery — E decomposition (4 candidates, `DecomposeE:887-905`) or Faugeras
homography decomposition (8 candidates, `ReconstructH:582-752`) — followed by
cheirality/parallax/reprojection checks (`CheckRT:753-871`).

TPU formulation: the 200 hypotheses are one batch axis — model estimation is
a batched SVD, scoring is a [hyp, match] dense map-reduce. No loops, no
threads; one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie

N_HYP = 200
CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991  # both models score against this (TwoViewReconstruction.cc:285,346)


def _normalize(pts, valid):
    """Mean/abs-dev normalization (Normalize, TwoViewReconstruction.cc:487-530)."""
    wsum = jnp.sum(valid)
    mean = jnp.sum(pts * valid[:, None], axis=0) / jnp.maximum(wsum, 1.0)
    d = jnp.abs(pts - mean) * valid[:, None]
    meandev = jnp.sum(d, axis=0) / jnp.maximum(wsum, 1.0)
    s = 1.0 / jnp.maximum(meandev, 1e-8)
    pn = (pts - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return pn, T


def _sample_minimal_sets(key, valid, n_hyp=N_HYP, k=8):
    """[n_hyp, k] indices drawn from valid matches (with replacement across
    hypotheses; near-duplicate picks within a set only weaken that hypothesis)."""
    n = valid.shape[0]
    # sample among valid via gumbel-top-k on masked uniforms per hypothesis
    g = jax.random.uniform(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -1.0)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _homography_dlt(p0, p1, w=None):
    """DLT homography per hypothesis: [H, P, 2] x2 -> [H, 3, 3].
    Optional row weights w [H, P] (0 removes a correspondence)."""
    x, y = p0[..., 0], p0[..., 1]
    u, v = p1[..., 0], p1[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)  # [H, 2P, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    h = Vt[..., -1, :]
    return h.reshape(*h.shape[:-1], 3, 3)


def _fundamental_8pt(p0, p1, w=None):
    """8-point fundamental with rank-2 projection: [H, P, 2] x2 -> [H, 3, 3].
    Optional row weights w [H, P]."""
    x, y = p0[..., 0], p0[..., 1]
    u, v = p1[..., 0], p1[..., 1]
    o = jnp.ones_like(x)
    A = jnp.stack(
        [u * x, u * y, u, v * x, v * y, v, x, y, o], axis=-1
    )  # [H, P, 9]
    if w is not None:
        A = A * w[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[..., -1, :].reshape(*x.shape[:-1], 3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    return U @ (S[..., None] * Vt2)


def _score_homography(H, Hinv, p0, p1, valid, sigma=1.0):
    """Symmetric transfer error score (CheckHomography,
    TwoViewReconstruction.cc:237-330)."""
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(M, a, b):
        ph = jnp.concatenate([a, jnp.ones_like(a[..., :1])], axis=-1)
        q = jnp.einsum("hij,nj->hni", M, ph)
        q = q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-12, 1e-12, q[..., 2:])
        return jnp.sum((b[None] - q) ** 2, axis=-1) * inv_s2  # [H, N]

    chi2_1 = transfer(Hinv, p1, p0)
    chi2_2 = transfer(H, p0, p1)
    in1 = chi2_1 < CHI2_H
    in2 = chi2_2 < CHI2_H
    sc = jnp.where(in1, SCORE_TH - chi2_1, 0.0) + jnp.where(in2, SCORE_TH - chi2_2, 0.0)
    sc = sc * valid[None, :]
    inlier = in1 & in2 & valid[None, :].astype(bool)
    return jnp.sum(sc, axis=1), inlier


def _score_fundamental(F, p0, p1, valid, sigma=1.0):
    """Epipolar (point-line) error both directions (CheckFundamental,
    TwoViewReconstruction.cc:332-430)."""
    inv_s2 = 1.0 / (sigma * sigma)
    ph0 = jnp.concatenate([p0, jnp.ones_like(p0[..., :1])], axis=-1)  # [N, 3]
    ph1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)

    l1 = jnp.einsum("hij,nj->hni", F, ph0)  # line in image 1
    num1 = jnp.einsum("hni,ni->hn", l1, ph1)
    chi2_1 = num1**2 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12) * inv_s2

    l0 = jnp.einsum("hji,nj->hni", F, ph1)  # F^T x1
    num0 = jnp.einsum("hni,ni->hn", l0, ph0)
    chi2_0 = num0**2 / jnp.maximum(l0[..., 0] ** 2 + l0[..., 1] ** 2, 1e-12) * inv_s2

    in1 = chi2_1 < CHI2_F
    in0 = chi2_0 < CHI2_F
    sc = jnp.where(in1, SCORE_TH - chi2_1, 0.0) + jnp.where(in0, SCORE_TH - chi2_0, 0.0)
    sc = sc * valid[None, :]
    inlier = in1 & in0 & valid[None, :].astype(bool)
    return jnp.sum(sc, axis=1), inlier


def triangulate(P0, P1, p0, p1):
    """Batched DLT triangulation (GeometricTools::Triangulate,
    `/root/reference/src/GeometricTools.cc:41-68`). P* [3,4], p* [N,2] -> [N,3]."""
    A = jnp.stack(
        [
            p0[:, 0, None] * P0[2] - P0[0],
            p0[:, 1, None] * P0[2] - P0[1],
            p1[:, 0, None] * P1[2] - P1[0],
            p1[:, 1, None] * P1[2] - P1[1],
        ],
        axis=1,
    )  # [N, 4, 4]
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[:, -1, :]
    w = Xh[:, 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[:, :3] / w[:, None]


def _check_rt(R, t, p0, p1, valid, K, sigma2=1.0, th_parallax_deg=0.36):
    """Cheirality + reprojection + parallax scoring of one (R, t) candidate
    (CheckRT, TwoViewReconstruction.cc:753-871). Returns (n_good, good mask,
    parallax_deg, X [N,3])."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    P0 = Km @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = Km @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P0, P1, p0, p1)

    finite = jnp.all(jnp.isfinite(X), axis=-1)
    O1 = jnp.zeros(3)
    O2 = -R.T @ t
    n1 = X - O1
    n2 = X - O2
    cosp = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    z1 = X[:, 2]
    Xc2 = (R @ X.T).T + t
    z2 = Xc2[:, 2]
    depth_ok = (z1 > 0) & (z2 > 0)

    uv0 = jnp.stack([fx * X[:, 0] / jnp.maximum(z1, 1e-9) + cx,
                     fy * X[:, 1] / jnp.maximum(z1, 1e-9) + cy], axis=-1)
    uv1 = jnp.stack([fx * Xc2[:, 0] / jnp.maximum(z2, 1e-9) + cx,
                     fy * Xc2[:, 1] / jnp.maximum(z2, 1e-9) + cy], axis=-1)
    e0 = jnp.sum((uv0 - p0) ** 2, axis=-1)
    e1 = jnp.sum((uv1 - p1) ** 2, axis=-1)
    reproj_ok = (e0 < 4.0 * sigma2) & (e1 < 4.0 * sigma2)

    good = finite & depth_ok & reproj_ok & valid.astype(bool) & (cosp < 0.99998)
    n_good = jnp.sum(good)
    # parallax: 50th-largest good parallax like the reference's percentile trick
    cosp_good = jnp.where(good, cosp, 1.0)
    cos_sorted = jnp.sort(cosp_good)
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    return n_good, good, parallax, X


def _decompose_E(E):
    """4 (R, t) candidates from an essential matrix (DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    return [(R1, t), (R1, -t), (R2, t), (R2, -t)]


def _decompose_H(H, K):
    """Faugeras SVD decomposition of a homography into 8 (R, t) candidates
    (ReconstructH, TwoViewReconstruction.cc:582-752)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Km = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    Kinv = jnp.array(
        [[1.0 / fx, 0, -cx / fx], [0, 1.0 / fy, -cy / fy], [0, 0, 1.0]]
    )
    A = Kinv @ H @ Km
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    out = []
    # case d' = d2
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 + d3) * d2)
    ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        st = eps * aux_st
        Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(ct)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        out.append((R, t))
    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / ((d1 - d3) * d2)
    cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        sp = eps * aux_sp
        Rp = jnp.array([[cp, 0, sp], [0, -1.0, 0], [sp, 0, -cp]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        out.append((R, t))
    return out


@partial(jax.jit,
         static_argnames=("sigma", "min_triangulated", "min_parallax_deg"))
def reconstruct(key, p0, p1, valid, K, sigma=1.0,
                min_triangulated=50, min_parallax_deg=1.0):
    """Full two-view reconstruction.

    p0/p1: [N, 2] matched undistorted pixel coords (same index = match),
    valid: [N] bool. Returns dict with success, R, t (cam1-from-cam0,
    unit-norm t), X [N, 3] triangulated points, good [N] mask, used_h flag.
    """
    k0, k1 = jax.random.split(key)
    n = p0.shape[0]
    vf = valid.astype(jnp.float32)

    pn0, T0 = _normalize(p0, vf)
    pn1, T1 = _normalize(p1, vf)

    sets = _sample_minimal_sets(k0, valid)
    s0 = pn0[sets]  # [H, 8, 2]
    s1 = pn1[sets]

    Hn = _homography_dlt(s0, s1)
    T1inv = jnp.linalg.inv(T1)
    Hmat = jnp.einsum("ij,hjk,kl->hil", T1inv, Hn, T0)  # denormalized H21
    Hmat = Hmat / jnp.where(
        jnp.abs(Hmat[:, 2:3, 2:3]) < 1e-12, 1e-12, Hmat[:, 2:3, 2:3]
    )
    Hinv = jnp.linalg.inv(Hmat)
    h_scores, h_inliers = _score_homography(Hmat, Hinv, p0, p1, vf, sigma)

    Fn = _fundamental_8pt(s0, s1)
    Fmat = jnp.einsum("ji,hjk,kl->hil", T1, Fn, T0)  # T1^T Fn T0
    f_scores, f_inliers = _score_fundamental(Fmat, p0, p1, vf, sigma)

    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH, SF = h_scores[bh], f_scores[bf]
    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.50  # TwoViewReconstruction.cc:133

    # refit each model on all inliers of its best hypothesis (least-squares
    # DLT with masked rows): the 8-point minimal estimate is too noisy in
    # f32 for direct motion recovery
    wh = h_inliers[bh].astype(jnp.float32)[None]
    wf = f_inliers[bf].astype(jnp.float32)[None]
    Hn_r = _homography_dlt(pn0[None], pn1[None], wh)[0]
    bestH = T1inv @ Hn_r @ T0
    bestH = bestH / jnp.where(jnp.abs(bestH[2, 2]) < 1e-12, 1e-12, bestH[2, 2])
    Fn_r = _fundamental_8pt(pn0[None], pn1[None], wf)[0]
    bestF = T1.T @ Fn_r @ T0
    h_scores_r, inl_h = _score_homography(
        bestH[None], jnp.linalg.inv(bestH)[None], p0, p1, vf, sigma
    )
    f_scores_r, inl_f = _score_fundamental(bestF[None], p0, p1, vf, sigma)
    inl_h, inl_f = inl_h[0], inl_f[0]
    inl = jnp.where(use_h, inl_h, inl_f)

    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    Kmat = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    E = Kmat.T @ bestF @ Kmat

    cands = _decompose_E(E) + _decompose_H(bestH, K)  # 4 E + 8 H candidates
    results_f = [
        _check_rt(R, t, p0, p1, inl_f, K, sigma2=sigma * sigma)
        for R, t in cands[:4]
    ]
    results_h = [
        _check_rt(R, t, p0, p1, inl_h, K, sigma2=sigma * sigma)
        for R, t in cands[4:]
    ]

    def pick(results, inl_mask):
        n_goods = jnp.stack([r[0] for r in results])
        best = jnp.argmax(n_goods)
        max_good = n_goods[best]
        n_similar = jnp.sum(n_goods > 0.7 * max_good)
        min_good = jnp.maximum(
            jnp.asarray(0.9, jnp.float32) * jnp.sum(inl_mask), min_triangulated
        )
        parallax = jnp.stack([r[2] for r in results])[best]
        ok = (
            (max_good >= min_good)
            & (n_similar == 1)
            & (parallax > min_parallax_deg)
        )
        return best, max_good, ok

    bi_f, ng_f, ok_f = pick(results_f, inl_f)
    bi_h, ng_h, ok_h = pick(results_h, inl_h)

    # prefer the score-selected model; if its reconstruction fails its own
    # acceptance criteria, fall back to the other model (all candidates are
    # already evaluated — the reference instead fails the whole init and
    # retries on a later frame, TwoViewReconstruction.cc:119-136)
    take_h = jnp.where(use_h, ok_h | ~ok_f, ok_h & ~ok_f)
    success = ok_f | ok_h

    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    goods = jnp.stack([r[1] for r in results_f + results_h])
    Xs = jnp.stack([r[3] for r in results_f + results_h])
    best = jnp.where(take_h, 4 + bi_h, bi_f)

    return {
        "success": success,
        "R": Rs[best],
        "t": ts[best],
        "X": Xs[best],
        "good": goods[best],
        "used_h": take_h,
        "n_good": jnp.where(take_h, ng_h, ng_f),
    }
