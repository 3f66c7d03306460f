"""Schur-complement Levenberg-Marquardt for bundle adjustment.

TPU-native replacement for g2o's BlockSolver_6_3 with marginalized landmarks
(`setMarginalized(true)` + Schur elimination, used by every BA entry point:
`/root/reference/src/Optimizer.cc:60` BundleAdjustment, `:1116`
LocalBundleAdjustment, `:2383` LocalInertialBA, `:3498` welding BA).

Structure exploited: visual (reprojection) edges couple exactly one *camera*
(a generic per-keyframe state of tangent dim C — 6 for visual BA; 15+ when
velocity/biases ride along in inertial BA) with one *landmark* (3-dim).
Camera-camera factors (inertial links, priors, relative-pose constraints) are
assembled densely through the generic engine (`dense.assemble_normal_equations`).

Per LM iteration (all fixed-shape, batched):
  1. vmapped linearization of the E visual edges -> Jc [E,Dr,C], Jl [E,Dr,3]
  2. Hll [L,3,3] by segment-sum over landmarks; damped; batch-inverted
  3. reduced camera system S = Hcc + lam*I - B W B^T via one big matmul over
     the landmark axis (B is the landmark-major scatter of the Hcl blocks)
  4. dense Cholesky of S [K*C, K*C] (MXU), landmark back-substitution
The reduced solve is exact (no CG truncation), matching g2o's behavior.

Memory note: the landmark-major B tensor is [L, K*C, 3]; for local-BA-scale
problems (K<=100, L<=16k) this is <100 MB and XLA streams it through one
matmul. The distributed path (parallel/dist_ba.py) shards the landmark axis
over the device mesh and psums S — SURVEY.md §2.4.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import robust
from . import dense
from .problem import EdgeBatch, Problem, VertexBlock, _apply_info


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Camera-landmark bundle adjustment problem with optional camera-camera
    factors.

    cams: VertexBlock of K camera states (tangent dim C).
    points: [L, 3] landmark positions.
    point_fixed: [L] bool.
    cam_idx/lm_idx: [E] observation incidence.
    obs_data: pytree of per-observation arrays [E, ...] (uv, K, bf, ...).
    obs_info: [E] or [E, Dr, Dr].
    obs_mask: [E] bool.
    cam_edges: extra factors among cameras only (EdgeBatch over block "cam").
    """

    cams: VertexBlock
    points: jnp.ndarray
    point_fixed: jnp.ndarray
    cam_idx: jnp.ndarray
    lm_idx: jnp.ndarray
    obs_data: Any
    obs_info: jnp.ndarray
    obs_mask: jnp.ndarray
    cam_edges: Tuple[EdgeBatch, ...]
    residual_dim: int = dataclasses.field(metadata=dict(static=True))
    # residual(cam_state, point [3], data_slice) -> [Dr]
    residual: Callable = dataclasses.field(metadata=dict(static=True))
    # dynamic leaf (see lm/problem.py EdgeBatch.huber_delta)
    huber_delta: Optional[float] = None


class BAStats(NamedTuple):
    cost0: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    accepted: jnp.ndarray


def inv3x3(M):
    """Closed-form adjugate inverse of [..., 3, 3] SPD blocks.

    jnp.linalg.inv lowers to batched LU with pivoting — measured 8.5 ms for
    the [L, 3, 3] landmark blocks on one v5e chip, the single largest term
    of a local-BA iteration (VERDICT r4 weak #4). The cofactor formula is
    pure elementwise VPU work (~50 us) and equally accurate at 3x3."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                              jnp.where(det < 0, -1e-30, 1e-30), det)
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _linearize_obs(p: BAProblem):
    """Residuals + Jacobians of the visual edges at the current state."""
    cam_states = jax.tree.map(lambda a: a[p.cam_idx], p.cams.state)
    X = p.points[p.lm_idx]
    C = p.cams.tangent_dim
    retract = p.cams.retract

    def f(dc, dx, cam_s, x, data):
        return p.residual(retract(cam_s, dc), x + dx, data)

    E = p.cam_idx.shape[0]
    zc = jnp.zeros((E, C), jnp.float32)
    zx = jnp.zeros((E, 3), jnp.float32)
    r = jax.vmap(p.residual)(cam_states, X, p.obs_data)
    Jc, Jl = jax.vmap(jax.jacfwd(f, argnums=(0, 1)))(
        zc, zx, cam_states, X, p.obs_data
    )
    return r, Jc, Jl


def _obs_cost_and_weights(p: BAProblem, r):
    chi2 = jnp.sum(r * _apply_info(p.obs_info, r), axis=-1)
    if p.huber_delta is None:
        w = jnp.ones_like(chi2)
        rho = chi2
    else:
        w = robust.huber_weight(chi2, p.huber_delta)
        rho = robust.huber_rho(chi2, p.huber_delta)
    w = jnp.where(p.obs_mask, w, 0.0)
    cost = jnp.sum(jnp.where(p.obs_mask, rho, 0.0))
    return w, cost, chi2


def _cam_only_problem(p: BAProblem) -> Problem:
    return Problem(blocks={"cam": p.cams}, edges=p.cam_edges)


def ba_cost(p: BAProblem):
    from .problem import total_cost

    cam_states = jax.tree.map(lambda a: a[p.cam_idx], p.cams.state)
    X = p.points[p.lm_idx]
    r = jax.vmap(p.residual)(cam_states, X, p.obs_data)
    _, cost, _ = _obs_cost_and_weights(p, r)
    if p.cam_edges:
        cost = cost + total_cost(_cam_only_problem(p))
    return cost


def _apply_step(p: BAProblem, dc, dl):
    dc = jnp.where(p.cams.fixed[:, None], 0.0, dc)
    dl = jnp.where(p.point_fixed[:, None], 0.0, dl)
    new_cam_state = jax.vmap(p.cams.retract)(p.cams.state, dc)
    return dataclasses.replace(
        p,
        cams=dataclasses.replace(p.cams, state=new_cam_state),
        points=p.points + dl,
    )


def _schur_solve(p: BAProblem, lam):
    """One damped Gauss-Newton step via landmark Schur elimination.

    Returns (dc [K,C], dl [L,3], cost_at_linearization).
    """
    K = p.cams.num
    C = p.cams.tangent_dim
    L = p.points.shape[0]
    KC = K * C

    r, Jc, Jl = _linearize_obs(p)
    w, cost, _ = _obs_cost_and_weights(p, r)

    # weighted residual/jacobians: fold info+robust weight into r and Jl/Jc
    Wr = w[:, None] * _apply_info(p.obs_info, r)  # [E, Dr]
    if p.obs_info.ndim == 1:
        WJc = (w * p.obs_info)[:, None, None] * Jc
        WJl = (w * p.obs_info)[:, None, None] * Jl
    else:
        WJc = w[:, None, None] * jnp.einsum("eij,ejc->eic", p.obs_info, Jc)
        WJl = w[:, None, None] * jnp.einsum("eij,ejc->eic", p.obs_info, Jl)

    # per-edge blocks
    Hcc_e = jnp.einsum("erc,erd->ecd", Jc, WJc)  # [E, C, C]
    Hll_e = jnp.einsum("era,erb->eab", Jl, WJl)  # [E, 3, 3]
    Hcl_e = jnp.einsum("erc,era->eca", Jc, WJl)  # [E, C, 3]
    gc_e = jnp.einsum("erc,er->ec", Jc, Wr)  # [E, C]
    gl_e = jnp.einsum("era,er->ea", Jl, Wr)  # [E, 3]

    # camera mask (fixed cameras contribute nothing and get identity rows)
    cam_free = jnp.where(p.cams.fixed, 0.0, 1.0)  # [K]
    lm_free = jnp.where(p.point_fixed, 0.0, 1.0)  # [L]
    Hcl_e = Hcl_e * cam_free[p.cam_idx][:, None, None] * lm_free[p.lm_idx][:, None, None]

    # assemble Hcc (visual part: diagonal blocks) + camera-camera factors.
    # Visual edges touch ONE camera, so their Hcc contribution is block
    # diagonal: segment-sum into [K, C, C] and expand with an identity
    # outer product (the 4D fancy-index scatter this replaces was 3.5 ms
    # on-chip — scatter index arithmetic, not compute).
    idxK = p.cam_idx
    Hcc_diag = jnp.zeros((K, C, C), jnp.float32).at[idxK].add(Hcc_e)
    Hcc = jnp.einsum("kcd,kj->kcjd", Hcc_diag, jnp.eye(K, dtype=jnp.float32))
    gc = jnp.zeros((K, C), jnp.float32).at[idxK].add(gc_e)

    cost_cam = jnp.asarray(0.0, jnp.float32)
    if p.cam_edges:
        Hcam, gcam, cost_cam = dense.assemble_normal_equations(_cam_only_problem(p))
        Hcc = Hcc + Hcam.reshape(K, C, K, C)
        gc = gc + gcam.reshape(K, C)
    cost = cost + cost_cam

    # landmark-axis segment sums as ONE-HOT MATMULS on the MXU: scatter-add
    # on TPU serializes (measured 1.6 ms Hll + 2.2 ms B per iteration at
    # L=8k/E=6k); a [E, L] one-hot contraction is dense MXU work (<0.5 ms
    # for all three uses). The one-hot is exact 0/1 so the sums are
    # bit-identical to the scatter version up to f32 add order.
    onehot_l = (p.lm_idx[:, None] == jnp.arange(L)[None, :]).astype(
        jnp.float32
    )

    # landmark system with RELATIVE (Marquardt) damping: lam scales the
    # local diagonal. Absolute lam*I damping is invisible in f32 against
    # Hll entries ~ fx^2 * n_obs (1e5-1e6): degenerate landmark blocks
    # (2 near-parallel rays) then invert to garbage and poison the Schur
    # complement (NaN Cholesky at every usable lam — the round-2 BA stall).
    # g2o gets away with absolute damping only because it runs double.
    Hll = jnp.einsum("el,eab->lab", onehot_l, Hll_e)
    dHll = jnp.diagonal(Hll, axis1=-2, axis2=-1)          # [L, 3]
    floor_l = 1e-6 * jnp.maximum(jnp.max(dHll), 1.0)
    Hll = Hll + jax.vmap(jnp.diag)(lam * dHll + floor_l)
    # fixed landmarks -> identity blocks (their delta is zeroed later anyway)
    Hll = jnp.where(
        p.point_fixed[:, None, None], jnp.eye(3)[None], Hll
    )
    Hll_inv = inv3x3(Hll)  # batched 3x3 (closed form; see inv3x3)
    gl = jnp.einsum("el,ea->la", onehot_l, gl_e)
    gl = gl * lm_free[:, None]

    # landmark-major assembly of Hcl blocks: B [L, K*C, 3] via the same
    # one-hot (edge -> camera placement first: [E, K, C, 3] is small)
    onehot_k = (p.cam_idx[:, None] == jnp.arange(K)[None, :]).astype(
        jnp.float32
    )
    Bk = jnp.einsum("ek,eca->ekca", onehot_k, Hcl_e)
    B2 = jnp.einsum("el,ekca->lkca", onehot_l, Bk).reshape(L, KC, 3)
    BW = jnp.einsum("lkc,lcd->lkd", B2, Hll_inv)  # [L, KC, 3]
    S_fill = jnp.einsum("lkd,ljd->kj", BW, B2)  # [KC, KC]
    b_fill = jnp.einsum("lkd,ld->k", BW, gl)  # [KC]

    # masked, damped reduced system (relative damping, as for Hll)
    m = (cam_free[:, None] * jnp.ones((K, C))).reshape(KC)
    S = Hcc.reshape(KC, KC) - S_fill
    S = S * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    dS = jnp.diag(S)
    floor_s = 1e-6 * jnp.maximum(jnp.max(dS), 1.0)
    S = S + jnp.diag(lam * dS + floor_s)
    rhs = (-gc.reshape(KC) + b_fill) * m

    # the reduced system can mix visual (~1e-3) and inertial (~1) curvatures
    # (g2o runs double); a Cholesky solve + two rounds of f32 iterative
    # refinement recovers the stiff-valley directions without paying for f64
    Lc, low = jax.scipy.linalg.cho_factor(S, lower=True)
    dc = jax.scipy.linalg.cho_solve((Lc, low), rhs)  # [KC]
    for _ in range(2):
        resid = rhs - S @ dc
        dc = dc + jax.scipy.linalg.cho_solve((Lc, low), resid)

    # back-substitute landmarks: dl = Hll_inv (-gl - Hlc dc)
    Hlc_dc = jnp.einsum("lkd,k->ld", B2, dc)
    dl = jnp.einsum("lab,lb->la", Hll_inv, -gl - Hlc_dc)
    dl = dl * lm_free[:, None]

    # LM predicted decrease 0.5*(lam*d'Dd - g'd) for the gain ratio
    pred = 0.5 * (
        lam * (jnp.sum(dS * dc * dc) + jnp.sum(dHll * dl * dl))
        - (jnp.sum(gc.reshape(KC) * m * dc) + jnp.sum(gl * dl))
    )
    return dc.reshape(K, C), dl, cost, pred


def solve(p: BAProblem, num_iters: int, lam0: float = 1e-5) -> tuple[BAProblem, BAStats]:
    """LM loop with g2o-style gain-ratio damping (see dense.solve)."""

    def body(carry, _):
        prob, lam, ni, accepted = carry
        dc, dl, cost, pred = _schur_solve(prob, lam)
        bad = jnp.logical_or(
            jnp.any(~jnp.isfinite(dc)), jnp.any(~jnp.isfinite(dl))
        )
        dc = jnp.where(bad, 0.0, dc)
        dl = jnp.where(bad, 0.0, dl)
        cand = _apply_step(prob, dc, dl)
        new_cost = ba_cost(cand)

        rho = (cost - new_cost) / jnp.maximum(pred, 1e-12)
        accept = jnp.logical_and(new_cost < cost, ~bad)

        lam_next = jnp.clip(
            jnp.where(
                accept,
                lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                lam * ni,
            ),
            1e-12,
            1e10,
        )
        ni_next = jnp.where(accept, 2.0, ni * 2.0)
        prob_next = jax.tree.map(
            lambda a, b: jnp.where(jnp.reshape(accept, (1,) * jnp.ndim(a)), b, a),
            prob,
            cand,
        )
        return (prob_next, lam_next, ni_next, accepted + accept.astype(jnp.int32)), cost

    cost0 = ba_cost(p)
    (pf, lam, _, accepted), _ = jax.lax.scan(
        body,
        (p, jnp.asarray(lam0, jnp.float32), jnp.asarray(2.0), jnp.asarray(0)),
        None,
        length=num_iters,
    )
    return pf, BAStats(cost0=cost0, cost=ba_cost(pf), lam=lam, accepted=accepted)


def obs_chi2(p: BAProblem):
    """Per-observation chi2 at the current state (for outlier gating between
    IRLS rounds, mirroring e.g. Optimizer.cc:1413-1475 outlier erase)."""
    cam_states = jax.tree.map(lambda a: a[p.cam_idx], p.cams.state)
    X = p.points[p.lm_idx]
    r = jax.vmap(p.residual)(cam_states, X, p.obs_data)
    return jnp.sum(r * _apply_info(p.obs_info, r), axis=-1)
