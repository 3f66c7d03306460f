"""Atlas mutation ops: keyframe / landmark insertion, culling, map lifecycle.

Functional equivalents of `Atlas::AddKeyFrame/AddMapPoint`
(`/root/reference/src/Atlas.cc`), `KeyFrame::AddMapPoint`,
`MapPoint::AddObservation`, `Map::ApplyScaledRotation` (`Map.cc:252`) and
`Tracking::CreateMapInAtlas` (`Tracking.cc:2662`): every op returns a new
MapState; allocation uses the n_kf/n_lm bump counters with masked scatter
(compaction-style allocation instead of heap churn). All jit-compatible.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import lie
from . import state as state_mod
from .state import NO_LM, MapState


def add_keyframe(s: MapState, R, t, timestamp,
                 feat_xy, feat_octave, feat_angle, feat_desc, feat_valid,
                 feat_lm=None, feat_ur=None, feat_depth=None,
                 vel=None, bg=None, ba=None, parent=None, prev=None) -> tuple[MapState, jnp.ndarray]:
    """Append one keyframe at row n_kf. Returns (state, kf_row)."""
    k = s.n_kf
    F = s.fmax
    nf = feat_xy.shape[0]
    assert nf <= F, (nf, F)

    def pad(a, fill=0):
        pad_n = F - a.shape[0]
        if pad_n == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad_n,) + a.shape[1:], fill, a.dtype)]
        )

    upd = dict(
        kf_R=s.kf_R.at[k].set(R),
        kf_t=s.kf_t.at[k].set(t),
        kf_timestamp=s.kf_timestamp.at[k].set(timestamp),
        kf_map_id=s.kf_map_id.at[k].set(s.active_map),
        kf_valid=s.kf_valid.at[k].set(True),
        kf_feat_xy=s.kf_feat_xy.at[k].set(pad(feat_xy)),
        kf_feat_octave=s.kf_feat_octave.at[k].set(pad(feat_octave)),
        kf_feat_angle=s.kf_feat_angle.at[k].set(pad(feat_angle)),
        kf_feat_desc=s.kf_feat_desc.at[k].set(pad(feat_desc)),
        kf_feat_valid=s.kf_feat_valid.at[k].set(pad(feat_valid)),
        kf_feat_lm=s.kf_feat_lm.at[k].set(
            pad(feat_lm, NO_LM) if feat_lm is not None
            else jnp.full((F,), NO_LM, jnp.int32)
        ),
        n_kf=s.n_kf + 1,
    )
    if feat_ur is not None:
        upd["kf_feat_ur"] = s.kf_feat_ur.at[k].set(pad(feat_ur, -1.0))
    if feat_depth is not None:
        upd["kf_feat_depth"] = s.kf_feat_depth.at[k].set(pad(feat_depth))
    if vel is not None:
        upd["kf_vel"] = s.kf_vel.at[k].set(vel)
    if bg is not None:
        upd["kf_bg"] = s.kf_bg.at[k].set(bg)
    if ba is not None:
        upd["kf_ba"] = s.kf_ba.at[k].set(ba)
    if parent is not None:
        upd["kf_parent"] = s.kf_parent.at[k].set(parent)
    if prev is not None:
        upd["kf_prev"] = s.kf_prev.at[k].set(prev)
    return dataclasses.replace(s, **upd), k


def add_landmarks(s: MapState, pos, desc, first_kf, new_valid,
                  kf_rows, feat_idx) -> tuple[MapState, jnp.ndarray]:
    """Allocate up to M new landmarks and bind them to (kf_rows, feat_idx)
    observations. pos [M,3], desc [M,32], new_valid [M] bool; kf_rows/feat_idx
    [M] (ignored where ~new_valid). Returns (state, lm_rows [M])."""
    M = pos.shape[0]
    L = s.lmax
    offs = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    rows = s.n_lm + offs
    # arena overflow: REFUSE the landmarks that do not fit (returned as
    # NO_LM, nothing written) instead of clobbering an existing row — the
    # reference's unbounded heap never clobbers (KeyFrame::AddMapPoint); the
    # caller is expected to compact (atlas.compaction) before hitting this.
    fits = new_valid & (rows < L)
    rows = jnp.clip(rows, 0, L - 1)
    # refused/invalid entries scatter to the OUT-OF-BOUNDS index and are
    # dropped. The previous scheme clamped them onto row L-1 and rewrote
    # its old values "as a no-op" — but when row L-1 is legitimately
    # allocated in the SAME call, the duplicate scatter targets resolve
    # nondeterministically and the stale lm_valid=False could beat the
    # fresh True while the feature binding still landed: a dead-landmark
    # observation (caught by atlas.invariants in the compaction-churn e2e).
    safe_rows = jnp.where(fits, rows, L)

    lm_pos = s.lm_pos.at[safe_rows].set(pos, mode="drop")
    lm_desc = s.lm_desc.at[safe_rows].set(desc, mode="drop")
    lm_valid = s.lm_valid.at[safe_rows].set(True, mode="drop")
    lm_map = s.lm_map_id.at[safe_rows].set(s.active_map, mode="drop")
    lm_first = s.lm_first_kf.at[safe_rows].set(first_kf, mode="drop")
    # fresh rows may be reused after compaction: clear stats
    lm_vis = s.lm_visible.at[safe_rows].set(0, mode="drop")
    lm_fnd = s.lm_found.at[safe_rows].set(0, mode="drop")
    # bind observations (refused entries route to feature index F: dropped)
    F = s.kf_feat_lm.shape[1]
    kf_feat_lm = s.kf_feat_lm.at[
        kf_rows, jnp.where(fits, feat_idx, F)
    ].set(rows, mode="drop")
    return (
        dataclasses.replace(
            s,
            lm_pos=lm_pos,
            lm_desc=lm_desc,
            lm_valid=lm_valid,
            lm_map_id=lm_map,
            lm_first_kf=lm_first,
            lm_visible=lm_vis,
            lm_found=lm_fnd,
            kf_feat_lm=kf_feat_lm,
            n_lm=jnp.minimum(
                s.n_lm + jnp.sum(new_valid.astype(jnp.int32)), L
            ),
        ),
        jnp.where(fits, rows, NO_LM),
    )


def add_observations(s: MapState, kf_row, feat_idx, lm_rows, ok) -> MapState:
    """Bind existing landmarks to features of a KF (MapPoint::AddObservation)."""
    new = s.kf_feat_lm.at[kf_row, feat_idx].set(
        jnp.where(ok, lm_rows, s.kf_feat_lm[kf_row, feat_idx])
    )
    return dataclasses.replace(s, kf_feat_lm=new)


def invalidate_landmarks(s: MapState, lm_rows, kill) -> MapState:
    """SetBadFlag for landmarks: clear validity + detach all observations
    (MapPoint::SetBadFlag, MapPoint.cc:215-246)."""
    L = s.lmax
    bad = jnp.zeros((L,), bool).at[jnp.where(kill, lm_rows, L)].set(
        True, mode="drop"
    )
    lm_valid = jnp.where(bad, False, s.lm_valid)
    detach = bad[jnp.clip(s.kf_feat_lm, 0, L - 1)] & (s.kf_feat_lm >= 0)
    kf_feat_lm = jnp.where(detach, NO_LM, s.kf_feat_lm)
    return dataclasses.replace(s, lm_valid=lm_valid, kf_feat_lm=kf_feat_lm)


def replace_landmark(s: MapState, old_rows, new_rows, do) -> MapState:
    """MapPoint::Replace (MapPoint.cc:248-290): repoint observations of
    old -> new, invalidate old. old_rows/new_rows/do: [M]."""
    L = s.lmax
    mapping = jnp.arange(L, dtype=jnp.int32)
    mapping = mapping.at[jnp.where(do, old_rows, L)].set(
        jnp.where(do, new_rows, 0), mode="drop"
    )
    lm = s.kf_feat_lm
    remapped = jnp.where(lm >= 0, mapping[jnp.clip(lm, 0, L - 1)], lm)
    valid = s.lm_valid.at[jnp.where(do, old_rows, L)].set(
        False, mode="drop"
    )
    # merge found/visible counters into the replacement
    add_vis = jnp.zeros((L,), jnp.int32).at[jnp.where(do, new_rows, L)].add(
        s.lm_visible[jnp.clip(old_rows, 0, L - 1)], mode="drop"
    )
    add_fnd = jnp.zeros((L,), jnp.int32).at[jnp.where(do, new_rows, L)].add(
        s.lm_found[jnp.clip(old_rows, 0, L - 1)], mode="drop"
    )
    return dataclasses.replace(
        s,
        kf_feat_lm=remapped,
        lm_valid=valid,
        lm_visible=s.lm_visible + add_vis,
        lm_found=s.lm_found + add_fnd,
    )


def apply_scaled_rotation(s: MapState, Ryw, scale, map_id) -> MapState:
    """Gauge transform of one map: rotate by Ryw and rescale
    (Map::ApplyScaledRotation, `/root/reference/src/Map.cc:252-310`) — the key
    primitive for inertial initialization and merge. Poses here are Tcw:
      Tcw' = Tcw * Tw->w' with world transform X' = s * Ryw X
      => R_cw' = R_cw Ryw^T ; t_cw' = s * t_cw ; X' = s Ryw X ; v' = s Ryw v
    """
    # include CULLED keyframe rows: per-frame trajectory records compose
    # against their reference KF's stored pose even after it is culled
    # (poses() — the reference instead re-chains Tcr through parents at
    # export, System.cc:680-720); a gauge transform is a global similarity,
    # so transforming dead rows keeps those compositions metric. KF rows
    # are bump-allocated (never recycled before compaction), so no live
    # row aliases a dead one.
    kf_in = s.kf_map_id == map_id
    lm_in = s.lm_valid & (s.lm_map_id == map_id)
    RywT = Ryw.T
    new_R = jnp.where(kf_in[:, None, None], s.kf_R @ RywT[None], s.kf_R)
    new_t = jnp.where(kf_in[:, None], scale * s.kf_t, s.kf_t)
    new_v = jnp.where(
        kf_in[:, None], scale * jnp.einsum("ij,kj->ki", Ryw, s.kf_vel), s.kf_vel
    )
    new_x = jnp.where(
        lm_in[:, None], scale * jnp.einsum("ij,lj->li", Ryw, s.lm_pos), s.lm_pos
    )
    # scale-invariance envelopes are distances — they scale with the gauge
    new_min = jnp.where(lm_in, scale * s.lm_min_dist, s.lm_min_dist)
    new_max = jnp.where(lm_in, scale * s.lm_max_dist, s.lm_max_dist)
    return dataclasses.replace(
        s, kf_R=new_R, kf_t=new_t, kf_vel=new_v, lm_pos=new_x,
        lm_min_dist=new_min, lm_max_dist=new_max,
    )


def create_map(s: MapState) -> MapState:
    """Tracking::CreateMapInAtlas (`Tracking.cc:2662`): stored maps keep their
    rows; new insertions tag the fresh map id."""
    return dataclasses.replace(
        s, active_map=s.n_maps, n_maps=s.n_maps + 1
    )


def compact(s: MapState) -> tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Reclaim invalidated rows (SURVEY.md §7.1: compaction replaces the
    reference's culling-by-deletion, `KeyFrame::SetBadFlag`,
    `/root/reference/src/KeyFrame.cc:573`). A stable partition moves every
    valid keyframe/landmark row to a dense prefix, preserving temporal
    order, and rewrites all cross-row references (spanning tree, temporal
    chain, feature->landmark bindings, landmark->first-KF). The freed tail
    is then reusable by the n_kf/n_lm bump allocators.

    Returns (state, kf_new_of_old [K], lm_new_of_old [L]) so host-side
    bookkeeping (trajectory references, IMU buffers, place-recognition DB)
    can be remapped. The permutation is total: invalid rows keep their
    (stale) data at their new position, so references to culled rows stay
    resolvable until the row is actually reused."""
    K, L = s.kmax, s.lmax
    i32 = jnp.int32
    kf_order = jnp.argsort(~s.kf_valid, stable=True)
    lm_order = jnp.argsort(~s.lm_valid, stable=True)
    kf_new = jnp.zeros((K,), i32).at[kf_order].set(jnp.arange(K, dtype=i32))
    lm_new = jnp.zeros((L,), i32).at[lm_order].set(jnp.arange(L, dtype=i32))

    def remap_kf(r):
        return jnp.where(r >= 0, kf_new[jnp.clip(r, 0, K - 1)], r)

    def remap_lm(r):
        return jnp.where(r >= 0, lm_new[jnp.clip(r, 0, L - 1)], r)

    upd = {}
    for f in dataclasses.fields(s):
        name = f.name
        v = getattr(s, name)
        if name.startswith("kf_"):
            v = v[kf_order]
        elif name.startswith("lm_"):
            v = v[lm_order]
        upd[name] = v
    upd["kf_parent"] = remap_kf(upd["kf_parent"])
    upd["kf_prev"] = remap_kf(upd["kf_prev"])
    upd["kf_feat_lm"] = remap_lm(upd["kf_feat_lm"])
    upd["lm_first_kf"] = remap_kf(upd["lm_first_kf"])
    upd["n_kf"] = s.kf_valid.sum().astype(i32)
    upd["n_lm"] = s.lm_valid.sum().astype(i32)
    return dataclasses.replace(s, **upd), kf_new, lm_new


def grow(s: MapState, kmax: int | None = None, lmax: int | None = None) -> MapState:
    """Enlarge the arena (the honest equivalent of the reference's
    unbounded heap sessions): pad every row array to the new capacity.
    Triggers one-time jit recompiles of the fixed-shape stages — rare by
    design (capacity doubles)."""
    new_k = int(kmax) if kmax is not None else s.kmax
    new_l = int(lmax) if lmax is not None else s.lmax
    assert new_k >= s.kmax and new_l >= s.lmax
    fresh = state_mod.empty(kmax=new_k, fmax=s.fmax, lmax=new_l)
    upd = {}
    for f in dataclasses.fields(s):
        name = f.name
        old = getattr(s, name)
        tgt = getattr(fresh, name)
        if name.startswith("kf_"):
            upd[name] = tgt.at[: s.kmax].set(old)
        elif name.startswith("lm_"):
            upd[name] = tgt.at[: s.lmax].set(old)
        else:
            upd[name] = old
    return dataclasses.replace(fresh, **upd)


def reset_active_map(s: MapState) -> MapState:
    """Tracking::ResetActiveMap (`Tracking.cc:3840`): discard every row of
    the active map (bad-IMU bail-out, young-map tracking loss). Rows stay
    in the arena as invalid holes until `compact` reclaims them; a fresh
    map id replaces the active one so stored maps are untouched."""
    kf_in = s.kf_valid & (s.kf_map_id == s.active_map)
    lm_in = s.lm_valid & (s.lm_map_id == s.active_map)
    return dataclasses.replace(
        s,
        kf_valid=s.kf_valid & ~kf_in,
        lm_valid=s.lm_valid & ~lm_in,
        active_map=s.n_maps,
        n_maps=s.n_maps + 1,
    )


def change_map_id(s: MapState, from_id, to_id) -> MapState:
    """Relabel a whole map (KeyFrame::UpdateMap / merge bookkeeping)."""
    kf_map = jnp.where(s.kf_map_id == from_id, to_id, s.kf_map_id)
    lm_map = jnp.where(s.lm_map_id == from_id, to_id, s.lm_map_id)
    return dataclasses.replace(s, kf_map_id=kf_map, lm_map_id=lm_map)
