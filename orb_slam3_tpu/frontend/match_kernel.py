"""Projection-windowed descriptor search as ONE fused Pallas TPU kernel.

The XLA formulation (matching.search_by_projection) materializes several
[N, M] intermediates in HBM — the Hamming matrix, the window/octave masks,
the masked distances, and a second masked copy for the ratio test; at
local-map shapes (2048 landmarks x 1024 keypoints) that is ~40 MB of
round-trips for ~1 GFLOP of matmul. Here one kernel computes the Hamming
tile on the MXU ((256 - dot(a', b'))/2 with +/-1 bit expansions — exact in
f32) and applies the window / octave / validity gates, the best/second-best
argmin, and the TH/ratio acceptance entirely in VMEM.

Semantics identical to matching.search_by_projection
(`/root/reference/src/ORBmatcher.cc:43-222`: radius by predicted octave's
scale, level window, TH_HIGH gate, best < ratio * second-best).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 100000.0
TILE_N = 256
LANES = 128


def _match_kernel(a_bits, ax, ay, arad, aoct, avalid,
                  b_bits_t, bx, by, boct, bvalid,
                  out_ref,
                  *, max_dist: float, ratio, level_lo: int, level_hi: int):
    # b bits arrive pre-transposed [256, M] (standard contracting layout);
    # f32 operands — this Mosaic build rejects bf16 matmul with f32
    # accumulation, and the +/-1 dot is exact in f32 regardless
    dot = jnp.dot(
        a_bits[:], b_bits_t[:], preferred_element_type=jnp.float32
    )                                   # [TILE_N, M]
    dist = (256.0 - dot) * 0.5

    px = ax[0].reshape(TILE_N, 1)
    py = ay[0].reshape(TILE_N, 1)
    r = arad[0].reshape(TILE_N, 1)
    po = aoct[0].reshape(TILE_N, 1)
    pv = avalid[0].reshape(TILE_N, 1)
    kx = bx[0].reshape(1, -1)
    ky = by[0].reshape(1, -1)
    ko = boct[0].reshape(1, -1)
    kv = bvalid[0].reshape(1, -1)

    mask = (
        (jnp.abs(px - kx) <= r)
        & (jnp.abs(py - ky) <= r)
        & (ko >= po + level_lo)
        & (ko <= po + level_hi)
        & (pv > 0)
        & (kv > 0)
    )
    d = jnp.where(mask, dist, BIG)
    best = jnp.min(d, axis=1)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    m = d.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, m), 1)
    d2 = jnp.where(lanes == idx[:, None], BIG, d)
    second = jnp.min(d2, axis=1)
    ok = best <= max_dist
    if ratio is not None:
        ok = ok & (best < ratio * second)

    # pack (idx, dist, ok) into the rows of one (8, TILE_N) tile — Mosaic
    # needs output sublanes in multiples of 8 (idx < 2^24: exact in f32)
    out_ref[0, 0] = idx.astype(jnp.float32)
    out_ref[0, 1] = best
    out_ref[0, 2] = ok.astype(jnp.float32)


def _bits_pm1(d):
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    bits = bits.reshape(d.shape[0], 256).astype(jnp.float32)
    return 2.0 * bits - 1.0


@functools.partial(
    jax.jit, static_argnames=("max_dist", "ratio", "level_lo", "level_hi")
)
def search_by_projection_pallas(uv_pred, pred_octave, pred_desc, pred_valid,
                                kp_xy, kp_octave, kp_desc, kp_valid,
                                radius, *, max_dist, ratio,
                                level_lo, level_hi):
    """Fused drop-in for matching.search_by_projection's core.
    radius: [N] per-landmark pixel window (already octave-scaled)."""
    n = uv_pred.shape[0]
    m = kp_xy.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    m_pad = -(-m // LANES) * LANES

    def padn(a, fill=0.0):
        return jnp.pad(a.astype(jnp.float32), (0, n_pad - n), constant_values=fill)

    def padm(a, fill=0.0):
        return jnp.pad(a.astype(jnp.float32), (0, m_pad - m), constant_values=fill)

    a_bits = jnp.pad(_bits_pm1(pred_desc), ((0, n_pad - n), (0, 0)))
    b_bits_t = jnp.pad(_bits_pm1(kp_desc), ((0, m_pad - m), (0, 0))).T
    row = lambda a: a.reshape(1, -1)

    grid = n_pad // TILE_N
    a_spec = lambda: pl.BlockSpec(
        (TILE_N, 256), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    a_row = lambda: pl.BlockSpec(
        (1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    b_full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(
            _match_kernel, max_dist=float(max_dist),
            ratio=None if ratio is None else float(ratio),
            level_lo=int(level_lo), level_hi=int(level_hi),
        ),
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((grid, 8, TILE_N), jnp.float32),
        in_specs=[
            a_spec(),
            a_row(), a_row(), a_row(), a_row(), a_row(),
            b_full((256, m_pad)),
            b_full((1, m_pad)), b_full((1, m_pad)), b_full((1, m_pad)),
            b_full((1, m_pad)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(
        a_bits,
        row(padn(uv_pred[:, 0])), row(padn(uv_pred[:, 1])),
        row(padn(radius, fill=-1.0)), row(padn(pred_octave)),
        row(padn(pred_valid)),
        b_bits_t,
        row(padm(kp_xy[:, 0])), row(padm(kp_xy[:, 1])),
        row(padm(kp_octave, fill=1e9)), row(padm(kp_valid)),
    )
    idx = out[:, 0].reshape(-1)[:n].astype(jnp.int32)
    dist = out[:, 1].reshape(-1)[:n].astype(jnp.int32)
    ok = out[:, 2].reshape(-1)[:n] > 0
    return idx, dist, ok
