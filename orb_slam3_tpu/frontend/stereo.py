"""Rectified stereo matching and RGB-D depth binding.

Role of `Frame::ComputeStereoMatches` (`/root/reference/src/Frame.cc:811-981`)
and `Frame::ComputeStereoFromRGBD` (`:984-1006`): for every left keypoint,
find the right-image keypoint on the same (octave-tolerant) row inside the
disparity range, by descriptor distance; refine disparity to subpixel with a
SAD parabola over an 11-px window on the blurred level images; reject
outliers by the median-distance rule.

Dense-masked reformulation: one [Nl, Nr] distance matrix gated by row-band
and disparity-range masks, argmin per row, then a vectorized SAD sweep on
gathered strips — no per-keypoint loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import matching

SAD_W = 5    # half window (11x11 patch, Frame.cc:906-949 uses w=5)
SAD_L = 5    # disparity search half-range for subpixel refine


@partial(jax.jit, static_argnames=())
def match_stereo(xy_l, oct_l, desc_l, valid_l,
                 xy_r, oct_r, desc_r, valid_r,
                 img_l, img_r, scale_factors,
                 bf, min_z, max_desc_dist: float = 75.0):
    """Match left keypoints to right keypoints on rectified images.

    Returns (ur [Nl], depth [Nl], has_depth [Nl]). ur < 0 where unmatched.
    min_z: minimum depth = bf / max_disparity (Frame.cc:840: minD=0, maxD=bf/minZ).
    """
    Nl = xy_l.shape[0]

    # row band: |v_l - v_r| <= 2 * scale of left octave (row table r=2*sf)
    sf_l = scale_factors[jnp.clip(oct_l, 0, scale_factors.shape[0] - 1)]
    row_tol = 2.0 * sf_l
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    m = dv <= row_tol[:, None]
    # octave gate: right kp within one level (Frame.cc:836-838)
    m = m & (jnp.abs(oct_l[:, None] - oct_r[None, :]) <= 1)
    # disparity range: 0 < uL - uR <= maxD
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    maxD = bf / jnp.maximum(min_z, 1e-6)
    m = m & (disp > 0.1) & (disp <= maxD)
    m = m & valid_l[:, None] & valid_r[None, :]

    dist = matching.hamming_matrix(desc_l, desc_r)
    idx, best, ok = matching.masked_best_match(dist, m, max_dist=max_desc_dist)

    # subpixel refinement: SAD around the matched column on the images
    # (reference slides +-5 px at the left octave's scale; we do it at level 0)
    ul = xy_l[:, 0]
    v = xy_l[:, 1].astype(jnp.int32)
    ur0 = xy_r[idx, 0]

    h, w = img_l.shape
    pad = SAD_W + SAD_L + 2
    il = jnp.pad(img_l, pad, mode="edge")
    ir = jnp.pad(img_r, pad, mode="edge")

    def sad_one(uli, vi, uri):
        yy = vi + pad
        xl = uli.astype(jnp.int32) + pad
        patch_l = jax.lax.dynamic_slice(
            il, (yy - SAD_W, xl - SAD_W), (2 * SAD_W + 1, 2 * SAD_W + 1)
        )
        xr = uri.astype(jnp.int32) + pad

        def sad_at(o):
            patch_r = jax.lax.dynamic_slice(
                ir, (yy - SAD_W, xr - SAD_W + o - SAD_L),
                (2 * SAD_W + 1, 2 * SAD_W + 1),
            )
            return jnp.sum(jnp.abs(patch_l - patch_r))

        sads = jax.vmap(sad_at)(jnp.arange(2 * SAD_L + 1))
        k = jnp.argmin(sads)
        k_c = jnp.clip(k, 1, 2 * SAD_L - 1)
        s1, s2, s3 = sads[k_c - 1], sads[k_c], sads[k_c + 1]
        denom = jnp.maximum(s1 + s3 - 2.0 * s2, 1e-6)
        delta = jnp.clip(0.5 * (s1 - s3) / denom, -1.0, 1.0)
        return uri + (k_c.astype(jnp.float32) - SAD_L) + delta

    ur = jax.vmap(sad_one)(ul, v, ur0)
    disparity = ul - ur
    ok = ok & (disparity > 0.1) & (disparity <= maxD)

    # median-based outlier rejection (Frame.cc:967-980): reject disparities
    # whose descriptor distance deviates from the median by >1.5*1.4*median
    dist_best = jnp.where(ok, best.astype(jnp.float32), jnp.nan)
    med = jnp.nanmedian(dist_best)
    thr = 1.5 * 1.4 * jnp.where(jnp.isnan(med), 1e9, med)
    ok = ok & (best.astype(jnp.float32) <= thr)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), 0.0)
    ur = jnp.where(ok, ur, -1.0)
    return ur, depth, ok


def depth_from_rgbd(xy, depth_map, bf, depth_factor: float = 1.0,
                    max_rel_spread: float = 0.05):
    """ComputeStereoFromRGBD (`Frame.cc:984-1006`): sample the depth map at
    keypoint locations; synthesize the virtual right coordinate
    ur = u - bf/z. Returns (ur [N], depth [N], has_depth [N]).

    Keypoints sitting on depth discontinuities (relative spread of the 3x3
    neighborhood above max_rel_spread) are rejected: occlusion-boundary
    corners carry a mixed-appearance descriptor whose 3D anchor slides with
    viewpoint — poison for the map.
    """
    h, w = depth_map.shape
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
    z = depth_map[yi, xi] * depth_factor

    pad = jnp.pad(depth_map, 1, mode="edge") * depth_factor
    neigh = jnp.stack(
        [
            pad[yi + dy, xi + dx]
            for dy in (0, 1, 2)
            for dx in (0, 1, 2)
        ],
        axis=-1,
    )  # [N, 9]
    zmin = jnp.min(neigh, axis=-1)
    zmax = jnp.max(neigh, axis=-1)
    flat = (zmax - zmin) <= max_rel_spread * jnp.maximum(z, 1e-6)

    ok = (z > 0) & flat & (zmin > 0)
    ur = jnp.where(ok, xy[:, 0] - bf / jnp.maximum(z, 1e-6), -1.0)
    return ur, jnp.where(ok, z, 0.0), ok
