"""Dense Levenberg-Marquardt solver over a factor-graph Problem.

Serves every small/medium optimizer entry point of the reference where the
total tangent dimension is at most a few thousand: motion-only pose
optimization (`/root/reference/src/Optimizer.cc:814`), Sim3 refinement
(`:2115`), inertial-only MAP initialization (`:3042`), pose-inertial
tracking priors (`:4491/:4875`), and essential-graph optimization
(`:1501/:5292`, a few hundred Sim3 vertices). Bundle-adjustment-scale
problems use the Schur path in `schur.py`.

The normal equations are assembled as one dense [D, D] matrix via
scatter-add of per-edge J^T W J blocks — a TPU-friendly formulation: the
assembly is a handful of vectorized scatters and the solve is a single
Cholesky that XLA maps onto the MXU.

Damping follows g2o's Levenberg implementation
(`/root/reference/Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp`):
additive lambda*I, gain-ratio-based lambda update with ni-doubling on
rejection; the per-call lambda overrides the reference uses (1e-16 ... 1e3)
are honored via `lam0`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .problem import (
    EdgeBatch,
    Problem,
    VertexBlock,
    _apply_info,
    edge_chi2,
    edge_cost,
    linearize_edge,
    robust_weights,
)


def block_layout(problem: Problem):
    """Static layout: name -> (offset, tangent_dim, num). Total dim last."""
    layout = {}
    off = 0
    for name, b in problem.blocks.items():
        layout[name] = (off, b.tangent_dim, b.num)
        off += b.tangent_dim * b.num
    return layout, off


def assemble_normal_equations(problem: Problem):
    """Build dense H [D, D], g [D] (g = J^T W r), and the total robust cost.

    Applies robust IRLS weights and edge masks; fixed vertices are projected
    out afterwards by `fix_mask`.
    """
    layout, dim = block_layout(problem)
    H = jnp.zeros((dim, dim), dtype=jnp.float32)
    g = jnp.zeros((dim,), dtype=jnp.float32)
    cost = 0.0

    for edge in problem.edges:
        r, jacs = linearize_edge(problem, edge)
        chi2 = edge_chi2(edge, r)
        w = robust_weights(edge, chi2)  # [E]
        cost = cost + edge_cost(edge, chi2)
        wr = w[:, None] * _apply_info(edge.info, r)  # [E, Dr]

        row_idx = []
        for slot, bname in enumerate(edge.vertex_blocks):
            off, d, _ = layout[bname]
            base = off + edge.indices[slot] * d  # [E]
            row_idx.append(base[:, None] + jnp.arange(d)[None, :])  # [E, d]

        for a, Ja in enumerate(jacs):
            # gradient: J_a^T W r
            ga = jnp.einsum("eri,er->ei", Ja, wr)  # [E, da]
            g = g.at[row_idx[a]].add(ga)
            for b, Jb in enumerate(jacs):
                if edge.info.ndim == 1:
                    WJb = (w * edge.info)[:, None, None] * Jb
                else:
                    WJb = w[:, None, None] * jnp.einsum(
                        "eij,ejb->eib", edge.info, Jb
                    )
                Hab = jnp.einsum("eri,erj->eij", Ja, WJb)  # [E, da, db]
                H = H.at[row_idx[a][:, :, None], row_idx[b][:, None, :]].add(Hab)

    return H, g, cost


def fix_mask(problem: Problem):
    """[D] float mask: 1 for free coordinates, 0 for fixed vertices."""
    layout, dim = block_layout(problem)
    m = jnp.ones((dim,), dtype=jnp.float32)
    for name, b in problem.blocks.items():
        off, d, n = layout[name]
        mb = jnp.where(b.fixed[:, None], 0.0, 1.0) * jnp.ones((n, d))
        m = m.at[off + jnp.arange(n * d)].set(mb.reshape(-1))
    return m


def apply_delta(problem: Problem, delta):
    """Retract a flat tangent step onto every vertex block."""
    layout, _ = block_layout(problem)
    new_blocks = {}
    for name, b in problem.blocks.items():
        off, d, n = layout[name]
        db = delta[off : off + n * d].reshape(n, d)
        db = jnp.where(b.fixed[:, None], 0.0, db)
        new_state = jax.vmap(b.retract)(b.state, db)
        new_blocks[name] = dataclasses.replace(b, state=new_state)
    return Problem(blocks=new_blocks, edges=problem.edges)


class LMStats(NamedTuple):
    cost0: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    accepted: jnp.ndarray  # number of accepted iterations


def solve(problem: Problem, num_iters: int, lam0: float = 1e-5) -> tuple[Problem, LMStats]:
    """Run `num_iters` Levenberg-Marquardt iterations. Jit-compatible.

    One linearization + one linear solve per iteration; rejected steps keep
    the state and raise lambda (the relinearization at an unchanged state is
    cached work we accept for jit-simplicity).
    """
    mask = None  # built inside first linearization (static layout)

    def cost_only(p):
        from .problem import total_cost

        return total_cost(p)

    def body(carry, _):
        p, lam, ni, accepted = carry
        H, g, cost = assemble_normal_equations(p)
        m = fix_mask(p)
        # project out fixed coords, keep SPD: H = M H M + (1-M) I
        H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        g = g * m
        D = H.shape[0]
        # relative (Marquardt) damping: absolute lam*I is invisible in f32
        # against curvature entries ~ fx^2 * n_obs (see lm/schur.py note)
        dH = jnp.diag(H)
        damp = lam * dH + 1e-6 * jnp.maximum(jnp.max(dH), 1.0)
        Hd = H + jnp.diag(damp)
        # Cholesky solve; fall back handled by damping growth on failure
        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        delta = jax.scipy.linalg.cho_solve((L, low), -g)
        bad = jnp.any(~jnp.isfinite(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta)

        p_new = apply_delta(p, delta)
        new_cost = cost_only(p_new)

        # g2o gain ratio: rho = (F - F') / (0.5 * delta^T (damp*delta - g))
        denom = jnp.maximum(jnp.dot(delta, damp * delta - g), 1e-12)
        rho = (cost - new_cost) / denom
        accept = jnp.logical_and(new_cost < cost, ~bad)

        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = lam * ni
        lam_next = jnp.clip(jnp.where(accept, lam_acc, lam_rej), 1e-12, 1e10)
        ni_next = jnp.where(accept, 2.0, ni * 2.0)

        p_next = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), b, a
            )
            if isinstance(a, jnp.ndarray)
            else a,
            p,
            p_new,
        )
        return (p_next, lam_next, ni_next, accepted + accept.astype(jnp.int32)), cost

    from .problem import total_cost

    cost0 = total_cost(problem)
    (p_final, lam, ni, accepted), _ = jax.lax.scan(
        body, (problem, jnp.asarray(lam0, jnp.float32), jnp.asarray(2.0), jnp.asarray(0)), None,
        length=num_iters,
    )
    cost_final = total_cost(p_final)
    return p_final, LMStats(cost0=cost0, cost=cost_final, lam=lam, accepted=accepted)
