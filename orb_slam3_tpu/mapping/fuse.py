"""Observation densification: project landmarks into a keyframe and bind
matches (role of ORBmatcher::Fuse + LocalMapping::SearchInNeighbors,
`/root/reference/src/ORBmatcher.cc:1148`, `LocalMapping.cc:714-900`).

Without this step every triangulated landmark keeps only its two birth
observations and the BA graph is too weak — drift accumulates. Fusing binds
each landmark to matching features in the other window keyframes, exactly
the role the reference's bidirectional Fuse plays after CreateNewMapPoints.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..atlas import ops as atlas_ops
from ..atlas.state import NO_LM, MapState
from ..frontend import camera as cam
from ..frontend import matching
from ..ops import lie


@partial(jax.jit, static_argnames=("kind",))
def fuse_into_keyframe(kind: int, K, s: MapState, kf_row, scale_factors,
                       radius_px: float = 2.0, max_dist: int = 35,
                       lm_mask=None):
    """Project valid landmarks of the active map into keyframe `kf_row`
    and bind unambiguous matches to its currently-unbound features.

    lm_mask restricts the candidate set — the per-keyframe mapping fuse
    passes the covisibility-neighborhood pool, matching the reference's
    SearchInNeighbors scope (`LocalMapping.cc:714-900`: points of the
    2-hop target KFs, never the whole map). A map-wide fuse would silently
    weld genuine revisits and starve loop detection of candidates; the
    map-wide behavior remains available (lm_mask=None) for the post-loop
    SearchAndFuse role.

    Returns the updated MapState. Already-bound features and already-observed
    landmarks (by this KF) are skipped.
    """
    L = s.lmax
    F = s.fmax
    R, t = s.kf_R[kf_row], s.kf_t[kf_row]

    lm_ok = s.lm_valid & (s.lm_map_id == s.active_map)
    if lm_mask is not None:
        lm_ok = lm_ok & lm_mask
    # skip landmarks this KF already observes
    already = jnp.zeros((L,), bool).at[
        jnp.clip(s.kf_feat_lm[kf_row], 0, L - 1)
    ].max(s.kf_feat_lm[kf_row] >= 0)
    lm_ok = lm_ok & ~already

    Xc = lie.se3_apply(R, t, s.lm_pos)
    uv = cam.project(kind, K, Xc)
    dist = jnp.linalg.norm(s.lm_pos + (R.T @ t)[None, :], axis=-1)
    in_depth = (
        (Xc[:, 2] > 0)
        & (dist >= 0.8 * s.lm_min_dist)
        & (dist <= 1.3 * s.lm_max_dist)
    )
    lm_ok = lm_ok & in_depth

    feat_free = s.kf_feat_valid[kf_row] & (s.kf_feat_lm[kf_row] == NO_LM)

    pred_oct = jnp.clip(
        jnp.ceil(
            jnp.log(jnp.maximum(s.lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9))
            / jnp.log(1.2)
        ).astype(jnp.int32),
        0,
        scale_factors.shape[0] - 1,
    )
    idx, dham, ok = matching.search_by_projection(
        uv, pred_oct, s.lm_desc, lm_ok,
        s.kf_feat_xy[kf_row], s.kf_feat_octave[kf_row],
        s.kf_feat_desc[kf_row], feat_free,
        radius_px, scale_factors,
        max_dist=max_dist, ratio=0.8, level_lo=-1, level_hi=1,
    )
    # invert landmark->feature to feature->landmark (first write wins on the
    # rare conflicts)
    lm_rows = jnp.arange(L, dtype=jnp.int32)
    feat_lm_new = jnp.full((F,), NO_LM, jnp.int32).at[
        jnp.where(ok, idx, F)
    ].set(jnp.where(ok, lm_rows, 0), mode="drop")
    bind = (feat_lm_new >= 0) & feat_free
    return atlas_ops.add_observations(
        s, kf_row, jnp.arange(F, dtype=jnp.int32), feat_lm_new, bind
    )


@partial(jax.jit, static_argnames=("kind",))
def merge_duplicates_at_keyframe(kind: int, K, s: MapState, kf_row,
                                 scale_factors, radius_px: float = 3.0,
                                 max_dist: int = 35):
    """Fuse duplicated landmarks through keyframe `kf_row`: the Replace path
    of `LoopClosing::SearchAndFuse` (`/root/reference/src/LoopClosing.cc:
    2115-2255`) + `MapPoint::Replace` (`MapPoint.cc:248`).

    Projects every valid landmark into the keyframe; where the best match is
    a feature already BOUND to a different landmark, the two landmarks are
    duplicates — all observations of the less-observed one are redirected to
    the keeper (every `kf_feat_lm` pointer rewritten in one gather) and the
    loser is invalidated. Visible/found counters transfer like Replace.
    """
    L = s.lmax
    R, t = s.kf_R[kf_row], s.kf_t[kf_row]

    lm_ok = s.lm_valid & (s.lm_map_id == s.active_map)
    Xc = lie.se3_apply(R, t, s.lm_pos)
    uv = cam.project(kind, K, Xc)
    dist = jnp.linalg.norm(s.lm_pos + (R.T @ t)[None, :], axis=-1)
    lm_ok = lm_ok & (Xc[:, 2] > 0) & (dist >= 0.8 * s.lm_min_dist) \
        & (dist <= 1.3 * s.lm_max_dist)

    feat_bound = s.kf_feat_valid[kf_row] & (s.kf_feat_lm[kf_row] >= 0)

    pred_oct = jnp.clip(
        jnp.ceil(
            jnp.log(jnp.maximum(s.lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9))
            / jnp.log(1.2)
        ).astype(jnp.int32),
        0,
        scale_factors.shape[0] - 1,
    )
    idx, dham, ok = matching.search_by_projection(
        uv, pred_oct, s.lm_desc, lm_ok,
        s.kf_feat_xy[kf_row], s.kf_feat_octave[kf_row],
        s.kf_feat_desc[kf_row], feat_bound,
        radius_px, scale_factors,
        max_dist=max_dist, ratio=0.9, level_lo=-1, level_hi=1,
    )
    a = jnp.arange(L, dtype=jnp.int32)                 # projected landmark
    b = jnp.clip(s.kf_feat_lm[kf_row][idx], 0, L - 1)  # bound landmark
    pair_ok = ok & (s.kf_feat_lm[kf_row][idx] >= 0) & (b != a) & s.lm_valid[b]

    # keeper = more-observed landmark (MapPoint::Replace keeps nObs-max)
    bound = (s.kf_feat_lm >= 0) & s.kf_feat_valid & s.kf_valid[:, None]
    lm_flat = jnp.where(bound, s.kf_feat_lm, L).reshape(-1)
    n_obs = jnp.zeros((L + 1,), jnp.int32).at[lm_flat].add(1)[:L]

    keep_a = n_obs[a] >= n_obs[b]
    winner = jnp.where(keep_a, a, b)
    loser = jnp.where(keep_a, b, a)

    # replacement map with path-halving (guards against merge chains)
    replace = a.at[jnp.where(pair_ok, loser, L)].set(
        jnp.where(pair_ok, winner, 0), mode="drop"
    )
    replace = replace[replace]
    replace = replace[replace]

    new_feat_lm = jnp.where(
        s.kf_feat_lm >= 0, replace[jnp.clip(s.kf_feat_lm, 0, L - 1)],
        s.kf_feat_lm,
    )
    died = replace != a
    # transfer found/visible to the keeper
    add_vis = jnp.zeros((L + 1,), jnp.int32).at[
        jnp.where(died, replace, L)
    ].add(jnp.where(died, s.lm_visible, 0), mode="drop")[:L]
    add_fnd = jnp.zeros((L + 1,), jnp.int32).at[
        jnp.where(died, replace, L)
    ].add(jnp.where(died, s.lm_found, 0), mode="drop")[:L]
    return dataclasses.replace(
        s,
        kf_feat_lm=new_feat_lm,
        lm_valid=s.lm_valid & ~died,
        lm_visible=s.lm_visible + add_vis,
        lm_found=s.lm_found + add_fnd,
    ), jnp.sum(pair_ok)
