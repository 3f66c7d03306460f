"""Stereo rectification remapping.

Role of the reference's rectification path: the legacy EuRoC stereo YAML
ships per-camera (K, D, R, P) blocks (`/root/reference/Examples_old/Stereo/
EuRoC.yaml:50-81`) consumed by `cv::initUndistortRectifyMap` in
`Tracking::ParseCamParamFile` / `Settings` (`Settings.h:157,184-185`), and
`System::TrackStereo` remaps both images before tracking
(`System.cc:253-265`).

`build_remap` precomputes the backward map once on the host (pure numpy —
the exact initUndistortRectifyMap algorithm); `remap_bilinear` applies it
per frame as four gathers + a weighted sum under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_remap(K: np.ndarray, D: np.ndarray, R: np.ndarray, P: np.ndarray,
                width: int, height: int) -> np.ndarray:
    """Backward map [H, W, 2] (x, y source pixel per rectified pixel).

    For each rectified pixel: unproject through P, rotate by R^-1 into the
    original camera, apply rad-tan distortion D, project through K —
    cv::initUndistortRectifyMap semantics.
    """
    K = np.asarray(K, np.float64).reshape(3, 3)
    D = np.asarray(D, np.float64).ravel()
    D = np.pad(D, (0, max(0, 5 - len(D))))[:5]
    R = np.asarray(R, np.float64).reshape(3, 3)
    P = np.asarray(P, np.float64).reshape(3, -1)[:, :3]

    u, v = np.meshgrid(np.arange(width), np.arange(height))
    # rectified pixel -> normalized rectified ray
    Pinv = np.linalg.inv(P)
    ones = np.ones_like(u)
    ray = np.stack([u, v, ones], axis=-1) @ Pinv.T
    # into the original camera frame
    ray = ray @ R  # R^-1 = R.T applied as row-vector multiply by R
    x = ray[..., 0] / ray[..., 2]
    y = ray[..., 1] / ray[..., 2]
    # rad-tan distortion
    k1, k2, p1, p2, k3 = D
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    map_x = K[0, 0] * xd + K[0, 2]
    map_y = K[1, 1] * yd + K[1, 2]
    return np.stack([map_x, map_y], axis=-1).astype(np.float32)


def remap_bilinear(img, map_xy):
    """Apply a backward map: img [H, W], map_xy [H', W', 2] -> [H', W'].
    Out-of-bounds samples read the clamped border (cv::remap
    BORDER_CONSTANT differs only outside the valid stereo overlap)."""
    H, W = img.shape
    mx = map_xy[..., 0]
    my = map_xy[..., 1]
    x0 = jnp.clip(jnp.floor(mx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(my).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(mx - x0, 0.0, 1.0)
    fy = jnp.clip(my - y0, 0.0, 1.0)
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


class StereoRectifier:
    """Precomputed left/right remap, jitted apply (System.cc:253-265)."""

    def __init__(self, left: dict, right: dict, width: int, height: int):
        """left/right: dicts with K [3,3], D [N], R [3,3], P [3,4]."""
        self.map_l = jnp.asarray(build_remap(
            left["K"], left["D"], left["R"], left["P"], width, height))
        self.map_r = jnp.asarray(build_remap(
            right["K"], right["D"], right["R"], right["P"], width, height))
        self._remap = jax.jit(
            lambda l, r: (remap_bilinear(l, self.map_l),
                          remap_bilinear(r, self.map_r))
        )

    def __call__(self, img_left, img_right):
        return self._remap(jnp.asarray(img_left, jnp.float32),
                           jnp.asarray(img_right, jnp.float32))
