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
        levels.append(
            jax.image.resize(img, shapes[lvl], method="bilinear", antialias=True)
        )
    return levels


def _gauss_kernel1d(ksize: int, sigma: float):
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding, [H, W] -> [H, W].
    Matches cv::GaussianBlur(…, Size(7,7), 2, 2, BORDER_REFLECT_101)."""
    k = _gauss_kernel1d(ksize, sigma)
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return x
