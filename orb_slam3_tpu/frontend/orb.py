"""Oriented FAST + rotated BRIEF descriptors, full-pyramid extraction.

Batched XLA reimplementation of `ORBextractor::operator()`
(`/root/reference/src/ORBextractor.cc:1086-1195`): per-level FAST with
dual-threshold fallback and spatial selection, IC_Angle intensity-centroid
orientation (`:76-105`), 7x7 sigma=2 blur, and the 256-pair steered BRIEF
(`computeOrbDescriptor:107-148`). The sampling pattern is the standard
learned ORB pattern (assets/orb_pattern.npy — public constant shared with
OpenCV; required for descriptor/vocabulary compatibility).

All per-keypoint work (orientation moments, 256 comparisons) happens on
gathered fixed-size patches: [N, 41, 41] tensors that vmap cleanly — no
scalar loops.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_mod
from . import pyramid as pyr_mod
from . import select as select_mod

HALF_PATCH = 15  # IC_Angle radius (ORBextractor.cc:57 HALF_PATCH_SIZE)
PATCH = 41      # gathered patch size (center 20; covers rotated BRIEF ±19)
PR = PATCH // 2

_pattern = np.load(
    os.path.join(os.path.dirname(__file__), "assets", "orb_pattern.npy")
).astype(np.float32)  # [256, 4] = x1, y1, x2, y2
PATTERN_A = jnp.asarray(_pattern[:, 0:2])  # [256, 2] (x, y)
PATTERN_B = jnp.asarray(_pattern[:, 2:4])


def _umax_table():
    """Circular-patch row extents, built exactly like the ORBextractor ctor."""
    hp = HALF_PATCH
    umax = np.zeros(hp + 2, dtype=np.int32)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp * hp - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: hp + 1]


_UMAX = _umax_table()


def _ic_angle_mask_and_coords():
    """Precompute (mask [31,31], u [31,31], v [31,31]) for IC_Angle."""
    us, vs = np.meshgrid(
        np.arange(-HALF_PATCH, HALF_PATCH + 1),
        np.arange(-HALF_PATCH, HALF_PATCH + 1),
    )
    mask = np.abs(us) <= _UMAX[np.abs(vs)]
    return (
        jnp.asarray(mask, jnp.float32),
        jnp.asarray(us, jnp.float32),
        jnp.asarray(vs, jnp.float32),
    )


_IC_MASK, _IC_U, _IC_V = _ic_angle_mask_and_coords()


def gather_patches_flat_multi(imgs, xy_int):
    """imgs [C, H, W] (channel images sharing keypoint coords, e.g. raw +
    blurred), integer coords [N, 2] (x, y) -> [C, N, 1681] flattened 41x41
    patches.

    Three-stage extraction tuned for TPU: per-element gathers serialize on
    the scalar units (measured 2.8 ms for one [N,1681] gather at EuRoC shapes
    on v5e), so instead (1) gather 41 row-segments per keypoint from a
    128-lane-blocked view of the padded image — the patch always fits in two
    adjacent blocks, so this is a minor-dim-contiguous gather of [41, 256]
    windows at full bandwidth (~1/3 the HBM traffic of gathering whole rows);
    (2) slice the 41 columns inside the 256-lane window with a per-keypoint
    one-hot matmul on the MXU ([N,41,256] x [N,256,41], exact in
    f32-highest — one-hot selection commutes with the bf16 splitting).
    ~3x less matmul work and traffic than the whole-row variant it replaces.
    """
    C, h, w = imgs.shape
    BLK = 128
    wp = w + 2 * PR
    nblk = -(-wp // BLK) + 1  # +1 spare so block b+1 always exists
    padded = jnp.pad(
        imgs, ((0, 0), (PR, PR), (PR, nblk * BLK - w - PR)), mode="edge"
    )
    x = jnp.clip(xy_int[:, 0], 0, w - 1)
    y = jnp.clip(xy_int[:, 1], 0, h - 1)
    di = jnp.arange(PATCH)
    blocks = padded.reshape(C, h + 2 * PR, nblk, BLK)
    b = x // BLK                                         # [N] block of col x
    rows_idx = y[:, None] + di[None, :]                  # [N, 41]
    lo = blocks[:, rows_idx, b[:, None]]                 # [C, N, 41, 128]
    hi = blocks[:, rows_idx, b[:, None] + 1]             # [C, N, 41, 128]
    rows = jnp.concatenate([lo, hi], axis=-1)            # [C, N, 41, 256]
    xloc = x - b * BLK                                   # patch col 0 inside window
    onehot = (
        xloc[:, None, None] + di[None, None, :]
        == jnp.arange(2 * BLK)[None, :, None]
    ).astype(jnp.float32)                                # [N, 256, 41]
    patches = jnp.einsum("cnrw,nwk->cnrk", rows, onehot, precision="highest")
    return patches.reshape(C, -1, PATCH * PATCH)


def gather_patches_flat(img, xy_int):
    """img [H, W] -> [N, 1681] flat patches (single-image wrapper)."""
    return gather_patches_flat_multi(img[None], xy_int)[0]


def gather_patches(img, xy_int):
    """Compatibility wrapper: [N, 41, 41] view of gather_patches_flat."""
    return gather_patches_flat(img, xy_int).reshape(-1, PATCH, PATCH)


def refine_corners_flat(raw_flat, win: int = 4, iters: int = 3):
    """Gradient-based subpixel corner refinement on the [N, 1681] raw
    patches (cv::cornerSubPix's normal equations): minimize
    sum_i w_i(p_i - q) (grad I(p_i) . (q - p_i))^2 over a (2*win+1)^2
    window -> q = G^-1 sum w (grad grad^T) p. Iterated with the Gaussian
    weight re-centered on the current estimate (a weight centered on the
    integer pixel biases the solution toward it).

    Returns [N, 2] offsets clamped to +/-1 px (0 where the gradient
    structure tensor is near-singular). NOTE: refining on the FAST score
    map's quadratic peak instead was measured to carry a VIEW-DEPENDENT
    bias (the score maximum is not the geometric corner) that systematically
    drifted metric-depth and visual-inertial tracking; the image-gradient
    normal equations are the principled estimator. No reference counterpart
    (ORB-SLAM3 keeps integer FAST corners).
    """
    n = raw_flat.shape[0]
    P3 = raw_flat.reshape(n, PATCH, PATCH)
    c = PR
    # gradient window needs +/-1 beyond the offset window
    lo, hi = c - win, c + win + 1
    Ix = 0.5 * (P3[:, lo:hi, lo + 1:hi + 1] - P3[:, lo:hi, lo - 1:hi - 1])
    Iy = 0.5 * (P3[:, lo + 1:hi + 1, lo:hi] - P3[:, lo - 1:hi - 1, lo:hi])
    dyy, dxx = np.meshgrid(
        np.arange(-win, win + 1, dtype=np.float32),
        np.arange(-win, win + 1, dtype=np.float32),
        indexing="ij",
    )
    dx = jnp.asarray(dxx)[None]
    dy = jnp.asarray(dyy)[None]
    sig2 = 2.0 * (win / 2.0) ** 2

    Ixx, Ixy, Iyy = Ix * Ix, Ix * Iy, Iy * Iy
    off = jnp.zeros((n, 2), jnp.float32)
    for _ in range(iters):
        wj = jnp.exp(
            -((dx - off[:, 0, None, None]) ** 2
              + (dy - off[:, 1, None, None]) ** 2) / sig2
        )
        gxx = jnp.sum(wj * Ixx, axis=(1, 2))
        gxy = jnp.sum(wj * Ixy, axis=(1, 2))
        gyy = jnp.sum(wj * Iyy, axis=(1, 2))
        bx = jnp.sum(wj * (Ixx * dx + Ixy * dy), axis=(1, 2))
        by = jnp.sum(wj * (Ixy * dx + Iyy * dy), axis=(1, 2))

        det = gxx * gyy - gxy * gxy
        scale = jnp.maximum(gxx + gyy, 1e-9)
        ok = det > 1e-6 * scale * scale
        det_s = jnp.where(ok, det, 1.0)
        ox = (gyy * bx - gxy * by) / det_s
        oy = (gxx * by - gxy * bx) / det_s
        new = jnp.stack([ox, oy], axis=-1)
        off = jnp.where(ok[:, None], jnp.clip(new, -1.0, 1.0), off)
    return off


def _ic_weight_full():
    """[1681, 2] moment weights over the FULL flat 41x41 patch (zero outside
    the 31x31 IC disc) — the moments become one matmul with no slicing."""
    W = np.zeros((PATCH, PATCH, 2), np.float32)
    c = PR
    sl = slice(c - HALF_PATCH, c + HALF_PATCH + 1)
    W[sl, sl, 0] = np.asarray(_IC_MASK * _IC_U)
    W[sl, sl, 1] = np.asarray(_IC_MASK * _IC_V)
    return jnp.asarray(W.reshape(-1, 2))


_IC_W_FULL = _ic_weight_full()


def ic_angle_flat(flat_patches):
    """Intensity-centroid angle for [N, 1681] flat raw-image patches
    (IC_Angle, ORBextractor.cc:76-105): one [N,1681]@[1681,2] matmul."""
    m = flat_patches @ _IC_W_FULL  # [N, 2] = (m10, m01)
    return jnp.arctan2(m[:, 1], m[:, 0])


def ic_angle(patches):
    """Compatibility wrapper for [N, 41, 41] patches."""
    return ic_angle_flat(patches.reshape(patches.shape[0], -1))


def brief_descriptors_flat(flat_patches, angles):
    """Steered BRIEF: [N, 1681] flat blurred patches + [N] angles ->
    [N, 32] uint8.

    Sample-coordinate rotation follows computeOrbDescriptor
    (ORBextractor.cc:107-148): row = round(x sin + y cos), col = round(x cos - y sin).

    Sampling avoids per-element gathers (TPU-serialized on the scalar unit —
    measured ~1 ms/level): rows are selected with a one-hot matmul on the MXU
    ([N,512,41] @ [N,41,41]), columns with a one-hot multiply-reduce on the
    VPU. Exact in f32-highest.
    """
    a = jnp.cos(angles)[:, None]  # [N, 1]
    b = jnp.sin(angles)[:, None]

    def rot(P):
        px, py = P[None, :, 0], P[None, :, 1]  # [1, 256]
        col = jnp.round(px * a - py * b).astype(jnp.int32) + PR
        row = jnp.round(px * b + py * a).astype(jnp.int32) + PR
        return row, col  # each [N, 256]

    ra, ca = rot(PATTERN_A)
    rb, cb = rot(PATTERN_B)
    r_all = jnp.concatenate([ra, rb], axis=1)  # [N, 512]
    c_all = jnp.concatenate([ca, cb], axis=1)

    n = flat_patches.shape[0]
    P3 = flat_patches.reshape(n, PATCH, PATCH)
    k = jnp.arange(PATCH)
    row_oh = (r_all[:, :, None] == k[None, None, :]).astype(jnp.float32)
    rows_sel = jnp.einsum(
        "nkr,nrc->nkc", row_oh, P3, precision="highest"
    )  # [N, 512, 41]
    col_oh = (c_all[:, :, None] == k[None, None, :]).astype(jnp.float32)
    vals = jnp.sum(rows_sel * col_oh, axis=-1)  # [N, 512]
    va, vb = vals[:, :256], vals[:, 256:]
    bits = (va < vb).astype(jnp.uint8)  # [N, 256]
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits.reshape(n, 32, 8) * weights[None, None, :], axis=-1).astype(
        jnp.uint8
    )


def brief_descriptors(blur_patches, angles):
    """Compatibility wrapper for [N, 41, 41] patches."""
    return brief_descriptors_flat(
        blur_patches.reshape(blur_patches.shape[0], -1), angles
    )


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    cell: int = 35
    border: int = 19  # EDGE_THRESHOLD (ORBextractor.cc:73)
    # gradient-based subpixel corner refinement (cornerSubPix-style normal
    # equations on the gathered patch, refine_corners_flat) — beyond the
    # reference's integer keypoints. Default OFF: on the aliased synthetic
    # test renders it biases corners view-dependently and costs accuracy
    # (integer corners measured 7x better on metric-depth tracking there);
    # intended for real, optically band-limited imagery
    subpixel: bool = False

    def features_per_level(self):
        """Geometric feature budget per level (ORBextractor ctor :409-430)."""
        factor = 1.0 / self.scale_factor
        n_first = self.n_features * (1 - factor) / (1 - factor ** self.n_levels)
        per = []
        total = 0
        for lvl in range(self.n_levels - 1):
            k = int(round(n_first * factor ** lvl))
            per.append(k)
            total += k
        per.append(max(self.n_features - total, 0))
        return per


@dataclasses.dataclass
class Features:
    """Fixed-capacity keypoint set in level-0 pixel coordinates."""

    xy: jnp.ndarray        # [N, 2] float32 (x, y) at level-0 scale
    response: jnp.ndarray  # [N]
    angle: jnp.ndarray     # [N] radians
    octave: jnp.ndarray    # [N] int32
    descriptors: jnp.ndarray  # [N, 32] uint8
    valid: jnp.ndarray     # [N] bool


jax.tree_util.register_dataclass(
    Features, data_fields=["xy", "response", "angle", "octave", "descriptors", "valid"],
    meta_fields=[],
)


def extract_level_patches(img, n_max: int, cfg: OrbConfig):
    """Single-level detect + select + patch gather (level coords).
    Returns (xy, score, valid, raw_flat, blur_flat); orientation and
    descriptors are computed once on the concatenated patches of all
    levels (they are per-row independent). xy carries gradient-based
    subpixel offsets (cfg.subpixel, refine_corners_flat); patches are
    gathered at the integer corner like the reference."""
    resp = fast_mod.detect(
        img, cfg.ini_th_fast, cfg.min_th_fast, cell=cfg.cell, border=cfg.border
    )
    xy, score, valid = select_mod.select_keypoints(resp, n_max, cell=cfg.cell)
    xy_int = xy.astype(jnp.int32)
    blurred = pyr_mod.gaussian_blur(img)
    both = gather_patches_flat_multi(jnp.stack([img, blurred]), xy_int)
    if cfg.subpixel:
        xy = xy + refine_corners_flat(both[0])
    return xy, score, valid, both[0], both[1]


def extract_level(img, n_max: int, cfg: OrbConfig):
    """Single-level extraction: detect + select + orient + describe.
    Returns per-level (xy, response, angle, desc, valid) in level coords."""
    xy, score, valid, raw_flat, blur_flat = extract_level_patches(img, n_max, cfg)
    angles = ic_angle_flat(raw_flat)
    desc = brief_descriptors_flat(blur_flat, angles)
    return xy, score, angles, desc, valid


def extract(img, cfg: OrbConfig = OrbConfig()):
    """Full-pyramid ORB extraction: [H, W] uint8/float -> Features.

    Per-level detection/selection/gather on TRUE level shapes, then ONE
    orientation + descriptor pass over the concatenated patches. Cross-level
    batching of the other stages was measured SLOWER on v5e and reverted:
    a fully padded level batch 8x's the FAST compute; a level-padded cell
    stack 8x's the per-cell top_k; a joint 2-index-axis gather over a
    blocked level stack lowers to a generic (slow) XLA gather, where the
    per-level block-column indexing stays a fast contiguous one. Returned
    arrays have static size sum(features_per_level) (padded with
    valid=False), coordinates scaled to level 0 (`ORBextractor.cc:1152-1161`)."""
    img = img.astype(jnp.float32)
    levels = pyr_mod.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = cfg.features_per_level()

    parts = []
    for lvl, (lv_img, n_lvl) in enumerate(zip(levels, budgets)):
        if n_lvl == 0:
            continue
        xy, score, valid, raw_flat, blur_flat = extract_level_patches(
            lv_img, n_lvl, cfg
        )
        scale = cfg.scale_factor ** lvl
        parts.append(
            (
                xy * scale,
                score,
                # select_keypoints may cap below n_lvl when the cell grid
                # of a small level has fewer slots than the budget — size
                # the octave column by what was actually returned
                jnp.full((xy.shape[0],), lvl, jnp.int32),
                valid,
                raw_flat,
                blur_flat,
            )
        )

    # one batched orientation + descriptor pass over ALL levels' patches
    raw_all = jnp.concatenate([p[4] for p in parts])
    blur_all = jnp.concatenate([p[5] for p in parts])
    angles = ic_angle_flat(raw_all)
    desc = brief_descriptors_flat(blur_all, angles)

    return Features(
        xy=jnp.concatenate([p[0] for p in parts]),
        response=jnp.concatenate([p[1] for p in parts]),
        angle=angles,
        octave=jnp.concatenate([p[2] for p in parts]),
        descriptors=desc,
        valid=jnp.concatenate([p[3] for p in parts]),
    )


def extract_batched(img, cfg: OrbConfig = OrbConfig()):
    """EXPERIMENTAL batched-levels extraction (slower than `extract` on v5e
    in round-1 measurements — kept for future tuning).

    Every pyramid level is edge-padded to the level-0 shape
    and stacked, so FAST, blur, selection, patch gather, orientation and
    BRIEF each run as ONE batched kernel over [n_levels, H, W] /
    [n_total_kp, 1681] instead of n_levels small ones (per-level launches
    and odd shapes dominated the runtime). Edge-replicated padding is
    corner-free, so the dead area yields no detections; runtime border masks
    use each level's true extent. Output contract matches `extract_looped`
    (static size sum(features_per_level), level-0 coordinates,
    `ORBextractor.cc:1152-1161`).
    """
    img = img.astype(jnp.float32)
    Lv = cfg.n_levels
    H0, W0 = img.shape
    levels = pyr_mod.build_pyramid(img, Lv, cfg.scale_factor)
    shapes = pyr_mod.level_shapes(H0, W0, Lv, cfg.scale_factor)
    budgets = cfg.features_per_level()
    n_per = max(budgets)

    stack = jnp.stack(
        [
            jnp.pad(lv, ((0, H0 - h), (0, W0 - w)), mode="edge")
            for lv, (h, w) in zip(levels, shapes)
        ]
    )  # [Lv, H0, W0]
    hs = jnp.asarray([h for h, _ in shapes])
    ws = jnp.asarray([w for _, w in shapes])

    # batched FAST + runtime border mask for each level's true extent
    s = jax.vmap(fast_mod.fast_score)(stack)
    resp = jnp.where(s > cfg.ini_th_fast, s, 0.0)
    resp_lo = jnp.where(s > cfg.min_th_fast, s, 0.0)
    # per-cell high-threshold fallback (detect() policy), batched
    cell = cfg.cell
    ph, pw = (-H0) % cell, (-W0) % cell

    def cell_fallback(r_hi, r_lo):
        rh = jnp.pad(r_hi, ((0, ph), (0, pw)))
        has_hi = (
            rh.reshape(-1, cell, (W0 + pw) // cell, cell)
            .transpose(0, 2, 1, 3)
            .max(axis=(2, 3))
            > 0.0
        )
        use_lo = ~has_hi
        use_lo_full = jnp.repeat(
            jnp.repeat(use_lo, cell, axis=0), cell, axis=1
        )[:H0, :W0]
        return jnp.where(use_lo_full, r_lo, r_hi)

    resp = jax.vmap(cell_fallback)(resp, resp_lo)
    resp = jax.vmap(fast_mod.nonmax_3x3)(resp)
    ys = jnp.arange(H0)[None, :, None]
    xs = jnp.arange(W0)[None, None, :]
    b = cfg.border
    in_border = (
        (ys >= b) & (ys < (hs[:, None, None] - b))
        & (xs >= b) & (xs < (ws[:, None, None] - b))
    )
    resp = jnp.where(in_border, resp, 0.0)

    # batched per-level selection to the max budget; mask down per level
    xy, score, valid = jax.vmap(
        lambda r: select_mod.select_keypoints(r, n_per, cell=cfg.cell)
    )(resp)  # [Lv, n_per, 2], [Lv, n_per], [Lv, n_per]
    budget_mask = (
        jnp.arange(n_per)[None, :] < jnp.asarray(budgets)[:, None]
    )
    valid = valid & budget_mask

    # flatten all levels' keypoints into one batch
    lvl_ids = jnp.broadcast_to(
        jnp.arange(Lv, dtype=jnp.int32)[:, None], (Lv, n_per)
    ).reshape(-1)
    xy_f = xy.reshape(-1, 2)
    score_f = score.reshape(-1)
    valid_f = valid.reshape(-1)
    xy_int = xy_f.astype(jnp.int32)

    # two-stage patch gather over the padded level stack (raw + blurred):
    # whole-row gather (minor-dim contiguous, full bandwidth) then one-hot
    # column matmul on the MXU — same trick as gather_patches_flat_multi
    blur = jax.vmap(pyr_mod.gaussian_blur)(stack)
    Hp, Wp = H0 + 2 * PR, W0 + 2 * PR
    both = jnp.stack([stack, blur])                      # [2, Lv, H0, W0]
    padded = jnp.pad(
        both, ((0, 0), (0, 0), (PR, PR), (PR, PR)), mode="edge"
    ).reshape(2, Lv * Hp, Wp)
    di = jnp.arange(PATCH)
    base_row = lvl_ids * Hp + xy_int[:, 1]               # [N]
    rows = padded[:, base_row[:, None] + di[None, :], :]  # [2, N, 41, Wp]
    onehot = (
        xy_int[:, 0][:, None, None] + di[None, None, :]
        == jnp.arange(Wp)[None, :, None]
    ).astype(jnp.float32)                                # [N, Wp, 41]
    patches = jnp.einsum("cnrw,nwk->cnrk", rows, onehot, precision="highest")
    raw_flat = patches[0].reshape(-1, PATCH * PATCH)     # [N, 1681]
    blur_flat = patches[1].reshape(-1, PATCH * PATCH)

    angles = ic_angle_flat(raw_flat)
    desc = brief_descriptors_flat(blur_flat, angles)

    scales = jnp.asarray(
        [cfg.scale_factor ** l for l in range(Lv)], jnp.float32
    )
    xy_scaled = xy_f * scales[lvl_ids][:, None]

    # compact to the static contract size: per-level budget slices
    keep = np.concatenate(
        [np.arange(l * n_per, l * n_per + budgets[l]) for l in range(Lv)]
    )
    keep = jnp.asarray(keep, jnp.int32)
    return Features(
        xy=xy_scaled[keep],
        response=score_f[keep],
        angle=angles[keep],
        octave=lvl_ids[keep],
        descriptors=desc[keep],
        valid=valid_f[keep],
    )
