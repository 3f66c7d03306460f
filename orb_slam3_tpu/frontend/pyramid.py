"""Image pyramid + Gaussian blur.

Role of `ORBextractor::ComputePyramid` (`/root/reference/src/ORBextractor.cc:1170`,
8 levels, scale factor 1.2) and the 7x7 sigma=2 GaussianBlur applied before
descriptor sampling (`ORBextractor.cc:1131-1138`) — as XLA ops: bilinear
resize per level (static shapes derived from config) and a separable
depthwise convolution for the blur, which XLA fuses into adjacent elementwise
work on TPU.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (H, W) list, mirroring the reference's rounding."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale ** lvl)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def _bilinear_weight_np(n_out: int, n_in: int):
    """[n_out, n_in] bilinear resampling matrix with half-pixel centers —
    exactly jax.image.resize(method='bilinear', antialias=False) semantics
    (in_coord = (out + 0.5) * n_in/n_out - 0.5, edge-clamped)."""
    W = np.zeros((n_out, n_in), np.float32)
    s = n_in / n_out
    for o in range(n_out):
        c = (o + 0.5) * s - 0.5
        lo = int(np.floor(c))
        frac = c - lo
        W[o, np.clip(lo, 0, n_in - 1)] += 1.0 - frac
        W[o, np.clip(lo + 1, 0, n_in - 1)] += frac
    return W


@lru_cache(maxsize=16)
def _resize_weights(h: int, w: int, n_levels: int, scale: float):
    # cache NUMPY arrays: jnp constants created inside a jit trace are
    # tracer-staged and must not leak across traces via this cache
    shapes = level_shapes(h, w, n_levels, scale)
    return [
        (_bilinear_weight_np(hl, h), _bilinear_weight_np(wl, w).T)
        for hl, wl in shapes[1:]
    ]


def build_pyramid(img, n_levels: int = 8, scale: float = 1.2):
    """img [H, W] float32 in [0, 255] -> list of [H_l, W_l] arrays.

    Plain bilinear like the reference's cv::resize INTER_LINEAR
    (ORBextractor::ComputePyramid). Each level resamples the LEVEL-0 image
    (no error accumulation) as two constant-weight matmuls on the MXU —
    measured ~4x faster than jax.image.resize, which rebuilds its weights
    as traced ops inside the jit."""
    h, w = img.shape
    levels = [img]
    for Wh, Ww in _resize_weights(h, w, n_levels, float(scale)):
        levels.append(
            jnp.einsum(
                "oh,hw,wq->oq",
                jnp.asarray(Wh), img, jnp.asarray(Ww),
                precision="highest",
            )
        )
    return levels


def _gauss_kernel1d(ksize: int, sigma: float):
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding, [H, W] -> [H, W].
    Matches cv::GaussianBlur(…, Size(7,7), 2, 2, BORDER_REFLECT_101).

    Implemented as 2x ksize shifted weighted adds (pure VPU elementwise that
    XLA fuses into one pass) — a 1-channel conv lowers to a degenerate MXU
    layout on TPU and is ~20x slower at these shapes."""
    k = _gauss_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    h = img.shape[0]
    acc = None
    for i in range(ksize):
        term = k[i] * jax.lax.dynamic_slice_in_dim(x, i, h, axis=0)
        acc = term if acc is None else acc + term
    x = jnp.pad(acc, ((0, 0), (pad, pad)), mode="reflect")
    w = img.shape[1]
    acc = None
    for i in range(ksize):
        term = k[i] * jax.lax.dynamic_slice_in_dim(x, i, w, axis=1)
        acc = term if acc is None else acc + term
    return acc
