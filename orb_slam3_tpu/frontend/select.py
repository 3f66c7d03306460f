"""Spatially-distributed keypoint selection to a fixed budget.

TPU-native reformulation of `ORBextractor::DistributeOctTree`
(`/root/reference/src/ORBextractor.cc:555`): the quadtree splits until there
are ~N nodes and keeps the best-response corner per node, i.e. it enforces
*spatial spread with best-response-per-region*. Here we get the same output
contract with fixed shapes: top-k per spatial cell, then a global top-N that
prefers covering distinct cells before taking second-best corners from the
same cell (round-robin by per-cell rank, response-sorted within a rank).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def select_keypoints(resp, n_max: int, cell: int = 32, per_cell: int = 4):
    """resp [H, W] response map (0 = invalid) -> fixed-size keypoint set.

    Returns (xy [n_max, 2] float32 (x, y), score [n_max], valid [n_max]).
    Selection: per-cell top-`per_cell` by response; global ordering by
    (cell-rank, -response) so every cell contributes its best corner before
    any cell contributes a second one — the quadtree contract.
    """
    h, w = resp.shape
    ph, pw = (-h) % cell, (-w) % cell
    rp = jnp.pad(resp, ((0, ph), (0, pw)))
    hp, wp = rp.shape
    ncy, ncx = hp // cell, wp // cell
    cells = rp.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )

    k = min(per_cell, cell * cell)
    top_vals, top_idx = jax.lax.top_k(cells, k)  # [C, k]

    cell_ids = jnp.arange(ncy * ncx)
    cy = (cell_ids // ncx) * cell
    cx = (cell_ids % ncx) * cell
    yy = cy[:, None] + top_idx // cell
    xx = cx[:, None] + top_idx % cell

    valid = top_vals > 0.0
    rank = jnp.broadcast_to(jnp.arange(k)[None, :], top_vals.shape)

    flat_vals = top_vals.reshape(-1)
    flat_rank = rank.reshape(-1)
    flat_valid = valid.reshape(-1)
    flat_y = yy.reshape(-1).astype(jnp.float32)
    flat_x = xx.reshape(-1).astype(jnp.float32)

    # order: valid first, then low rank, then high response
    big = 1e9
    key = (
        jnp.where(flat_valid, 0.0, 4.0 * big)
        + flat_rank.astype(jnp.float32) * big
        - flat_vals
    )
    order = jnp.argsort(key)[:n_max]

    xy = jnp.stack([flat_x[order], flat_y[order]], axis=-1)
    return xy, flat_vals[order], flat_valid[order]
