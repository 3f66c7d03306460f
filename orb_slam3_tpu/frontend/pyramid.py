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
from functools import partial

import jax
import jax.numpy as jnp


def level_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (H, W) list, mirroring the reference's rounding."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale ** lvl)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return shapes


def build_pyramid(img, n_levels: int = 8, scale: float = 1.2):
    """img [H, W] float32 in [0, 255] -> list of [H_l, W_l] arrays."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for lvl in range(1, n_levels):
        # plain bilinear like the reference's cv::resize INTER_LINEAR
        # (ORBextractor::ComputePyramid); antialias=True lowers to degenerate
        # 1-channel convs on TPU (~ms each), antialias=False lowers to two
        # small matmuls on the MXU
        levels.append(
            jax.image.resize(img, shapes[lvl], method="bilinear", antialias=False)
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
