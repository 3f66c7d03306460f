"""Factor-graph problem representation for the batched LM engine.

This replaces g2o's pointer hypergraph (`/root/reference/Thirdparty/g2o/g2o/core/
{hyper_graph.h,sparse_optimizer.h}`) with flat, batched, fixed-shape data:

- a *vertex block* is an array of homogeneous vertices (e.g. all KF poses)
  with a manifold `retract` applying a tangent update to one vertex;
- an *edge batch* is an array of homogeneous factors (e.g. all mono
  reprojection edges) storing per-edge vertex indices into the blocks,
  per-edge data (measurements, calibration), an information matrix, a robust
  kernel delta, and a validity mask.

Residuals and Jacobians are computed by `vmap` + `jacfwd` over the per-edge
tangent, so every edge type is defined by a single scalar-edge residual
function — the moral equivalent of g2o's `computeError`/`linearizeOplus`
pairs (`/root/reference/src/G2oTypes.cc`, `OptimizableTypes.cpp`) but with
autodiff Jacobians guaranteed consistent with the residual.

Everything is a pytree whose static structure (names, callables, dims) lives
in aux data, so whole problems can cross jit boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import robust


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VertexBlock:
    """A batch of N homogeneous manifold vertices.

    state: pytree of arrays with leading dim N (e.g. {"R": [N,3,3], "t": [N,3]}).
    fixed: [N] bool — True rows receive no update (g2o setFixed analogue).
    tangent_dim / retract are static.
    """

    state: Any
    fixed: jnp.ndarray
    tangent_dim: int = dataclasses.field(metadata=dict(static=True))
    # retract(single_state, delta [tangent_dim]) -> single_state
    retract: Callable = dataclasses.field(metadata=dict(static=True))

    @property
    def num(self) -> int:
        return jax.tree_util.tree_leaves(self.state)[0].shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeBatch:
    """A batch of E homogeneous factors.

    vertex_blocks: names of the blocks each slot connects to (static).
    indices: tuple of [E] int arrays, one per slot.
    data: pytree of per-edge arrays with leading dim E.
    info: [E] scalar information (isotropic) or [E, Dr, Dr] full matrix.
    mask: [E] bool validity (False edges contribute nothing).
    residual: (vertex_state_1, ..., vertex_state_S, data_slice) -> [Dr]
    huber_delta: robust kernel threshold on sqrt(chi2), or None.
    """

    indices: Tuple[jnp.ndarray, ...]
    data: Any
    info: jnp.ndarray
    mask: jnp.ndarray
    vertex_blocks: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    residual_dim: int = dataclasses.field(metadata=dict(static=True))
    residual: Callable = dataclasses.field(metadata=dict(static=True))
    # dynamic pytree leaf (None = no kernel, an empty subtree): a traced
    # value is allowed so info-rescaled thresholds can cross jit boundaries
    huber_delta: Optional[float] = None

    @property
    def num(self) -> int:
        return self.indices[0].shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    blocks: dict[str, VertexBlock]
    edges: Tuple[EdgeBatch, ...]


def _gather_states(block: VertexBlock, idx):
    return jax.tree.map(lambda a: a[idx], block.state)


def edge_residuals(problem: Problem, edge: EdgeBatch):
    """Raw residuals [E, Dr] for one edge batch at the problem's current state."""
    states = [_gather_states(problem.blocks[n], i)
              for n, i in zip(edge.vertex_blocks, edge.indices)]
    return jax.vmap(edge.residual)(*states, edge.data)


def _apply_info(info, r):
    """Omega @ r for scalar or full info."""
    if info.ndim == 1:
        return info[:, None] * r
    return jnp.einsum("eij,ej->ei", info, r)


def edge_chi2(edge: EdgeBatch, r):
    """Per-edge chi2 = r^T Omega r, [E]."""
    return jnp.sum(r * _apply_info(edge.info, r), axis=-1)


def robust_weights(edge: EdgeBatch, chi2):
    """IRLS robust weight per edge (1 inside the kernel), masked."""
    if edge.huber_delta is None:
        w = jnp.ones_like(chi2)
    else:
        w = robust.huber_weight(chi2, edge.huber_delta)
    return jnp.where(edge.mask, w, 0.0)


def edge_cost(edge: EdgeBatch, chi2):
    """Total robust cost of an edge batch (g2o activeRobustChi2 analogue)."""
    if edge.huber_delta is None:
        rho = chi2
    else:
        rho = robust.huber_rho(chi2, edge.huber_delta)
    return jnp.sum(jnp.where(edge.mask, rho, 0.0))


def total_cost(problem: Problem) -> jnp.ndarray:
    c = 0.0
    for e in problem.edges:
        r = edge_residuals(problem, e)
        c = c + edge_cost(e, edge_chi2(e, r))
    return c


def linearize_edge(problem: Problem, edge: EdgeBatch):
    """Residuals and per-slot tangent Jacobians for one edge batch.

    Returns (r [E, Dr], jacs: tuple of [E, Dr, d_s]). Jacobians are with
    respect to each connected vertex's tangent via the block's retract at 0.
    """
    blocks = [problem.blocks[n] for n in edge.vertex_blocks]
    states = [_gather_states(b, i) for b, i in zip(blocks, edge.indices)]
    dims = [b.tangent_dim for b in blocks]
    retracts = [b.retract for b in blocks]

    def with_deltas(deltas, *states_and_data):
        states_ = states_and_data[:-1]
        data = states_and_data[-1]
        new_states = [ret(s, d) for ret, s, d in zip(retracts, states_, deltas)]
        return edge.residual(*new_states, data)

    zeros = tuple(jnp.zeros((edge.num, d), dtype=jnp.float32) for d in dims)

    r = jax.vmap(edge.residual)(*states, edge.data)
    jac_fn = jax.jacfwd(with_deltas, argnums=0)
    jacs = jax.vmap(jac_fn)(zeros, *states, edge.data)
    return r, jacs


__all__ = [
    "VertexBlock",
    "EdgeBatch",
    "Problem",
    "edge_residuals",
    "edge_chi2",
    "robust_weights",
    "edge_cost",
    "total_cost",
    "linearize_edge",
]
