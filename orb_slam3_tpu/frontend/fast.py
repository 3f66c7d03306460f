"""FAST-9/16 corner detection as dense masked XLA ops.

Role of the per-cell cv::FAST calls in `ORBextractor::ComputeKeyPointsOctTree`
(`/root/reference/src/ORBextractor.cc:781-896`): segment test on the 16-pixel
Bresenham circle (arc length >= 9), OpenCV-compatible corner score (the
maximum threshold at which the pixel stays a corner), 3x3 non-max
suppression, and the reference's two-threshold policy (iniThFAST=20 with
minThFAST=7 fallback in cells where the high threshold fires nothing).

Everything is computed for ALL pixels as [H, W] maps — the TPU-native
reformulation of the reference's scalar double loop: 16 shifted copies, VPU
compares, and windowed AND/min reductions that XLA fuses into one pass.
Selection to a fixed keypoint budget happens in `select.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bresenham circle radius 3, OpenCV pixel order (dx, dy), clockwise from top
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC = 9  # contiguous arc length for FAST-9/16


def _shifted(img, dx, dy):
    """img[y+dy, x+dx] with edge replication (borders are masked anyway)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def _arc_reduce_bool(m16):
    """[16, H, W] bool -> [16, H, W]: AND over the 9-length arc starting at
    each index (circular). log-step windowed reduction."""
    m = jnp.concatenate([m16, m16], axis=0)  # [32, H, W]
    w2 = m[:16] & m[1:17]
    m2 = jnp.concatenate([w2, w2], axis=0)
    w4 = m2[:16] & m2[2:18]
    m4 = jnp.concatenate([w4, w4], axis=0)
    w8 = m4[:16] & m4[4:20]
    m8 = jnp.concatenate([w8, w8], axis=0)
    return m8[:16] & m[8:24]  # 8 + 1 = 9


def _arc_reduce_min(v16):
    """[16, H, W] float -> min over the 9-length arc starting at each index."""
    v = jnp.concatenate([v16, v16], axis=0)
    w2 = jnp.minimum(v[:16], v[1:17])
    v2 = jnp.concatenate([w2, w2], axis=0)
    w4 = jnp.minimum(v2[:16], v2[2:18])
    v4 = jnp.concatenate([w4, w4], axis=0)
    w8 = jnp.minimum(v4[:16], v4[4:20])
    v8 = jnp.concatenate([w8, w8], axis=0)
    return jnp.minimum(v8[:16], v[8:24])


def fast_score(img):
    """Threshold-free FAST-9/16 score map.

    Returns [H, W] float32 S = max over all 16 arc starts of the arc-min
    signed difference (bright) or its negation (dark). A pixel is a corner
    at threshold t exactly when S > t, and its OpenCV corner score (the max
    t' at which the segment test still passes) is S: the best-passing arc at
    any threshold is the globally best arc, so one score map serves every
    threshold — the dual-threshold policy needs one pass, not two.
    """
    img = img.astype(jnp.float32)
    diffs = jnp.stack([_shifted(img, dx, dy) for dx, dy in CIRCLE]) - img[None]
    score_b = jnp.max(_arc_reduce_min(diffs), axis=0)
    score_d = jnp.max(_arc_reduce_min(-diffs), axis=0)
    return jnp.maximum(score_b, score_d)


def fast_response(img, threshold: float):
    """OpenCV-compatible FAST-9/16 response map.

    Returns [H, W] float32: 0 where not a corner at `threshold`, else the
    corner score = max t' for which the segment test still passes
    (max over passing arcs of the arc-min absolute difference).
    """
    s = fast_score(img)
    return jnp.where(s > threshold, s, 0.0)


def nonmax_3x3(score):
    """Keep pixels that are the strict-ish max of their 3x3 neighborhood."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= mx) & (score > 0.0), score, 0.0)


def detect(img, hi_threshold: float = 20.0, lo_threshold: float = 7.0,
           cell: int = 35, border: int = 16):
    """Dual-threshold FAST with per-cell fallback + NMS.

    Mirrors the reference policy (`ORBextractor.cc:785-859`): run at
    iniThFAST; any `cell`-sized cell with no response retries at minThFAST.
    Returns the final [H, W] response map (0 = no corner), border-masked.
    """
    h, w = img.shape
    s = fast_score(img)  # one pass serves both thresholds
    r_hi = jnp.where(s > hi_threshold, s, 0.0)
    r_lo = jnp.where(s > lo_threshold, s, 0.0)

    # pad to cell multiples for the per-cell any() reduction
    ph, pw = (-h) % cell, (-w) % cell
    rh = jnp.pad(r_hi, ((0, ph), (0, pw)))
    has_hi = (
        rh.reshape(-1, cell, (w + pw) // cell, cell).transpose(0, 2, 1, 3)
        .max(axis=(2, 3)) > 0.0
    )  # [nCy, nCx]
    use_lo = ~has_hi
    use_lo_full = jnp.repeat(jnp.repeat(use_lo, cell, axis=0), cell, axis=1)[:h, :w]
    resp = jnp.where(use_lo_full, r_lo, r_hi)

    resp = nonmax_3x3(resp)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_border = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    return jnp.where(in_border, resp, 0.0)
