"""The per-keyframe mapping pipeline as reusable stage functions.

This is the LocalMapping work unit (`/root/reference/src/LocalMapping.cc:
64-282`): keyframe insertion, depth-landmark creation, triangulation of new
map points, fuse, windowed local BA, culling. The stages are pure
`MapState -> MapState` transforms so the SAME code runs

- synchronously inside the tracker (`Tracker._insert_keyframe`, the
  inertial path and `async_mapping=False`), and
- on the background mapper thread (`runtime.mapper.AsyncMapper`, the
  reference's LocalMapping/LoopClosing threads) operating on immutable
  snapshots with atomic commits (SURVEY.md §7.1: snapshots instead of
  locks).

A `KFPackage` is the queue element between tracking and mapping — the role
of `LocalMapping::InsertKeyFrame`'s `mlNewKeyFrames` entry
(`LocalMapping.cc:284-296`), carrying the frame measurements plus the
tracker's buffered per-landmark statistics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..atlas import ops as atlas_ops
from ..atlas import state as atlas_state
from ..frontend import camera as cam
from ..ops import lie
from ..utils.timing import GLOBAL_TIMER
from . import fuse, local_mapper


@dataclasses.dataclass
class KFPackage:
    """One keyframe's worth of tracking output, bound to snapshot rows."""

    R: jnp.ndarray              # [3,3] Tcw at creation (tracker's frame)
    t: jnp.ndarray              # [3]
    timestamp: float
    feat_xy: jnp.ndarray        # [F,2]
    feat_octave: jnp.ndarray    # [F]
    feat_angle: jnp.ndarray     # [F]
    feat_desc: jnp.ndarray      # [F,32]
    feat_valid: jnp.ndarray     # [F]
    feat_lm: jnp.ndarray        # [F] landmark rows vs the tracking snapshot
    feat_ur: Optional[jnp.ndarray]
    feat_depth: Optional[jnp.ndarray]
    n_inliers: int
    # buffered per-landmark tracking statistics since the last package
    # (mnVisible/mnFound, Tracking::SearchLocalPoints bookkeeping)
    stat_vis: Optional[jnp.ndarray] = None    # [L] int32
    stat_found: Optional[jnp.ndarray] = None  # [L] int32
    # inertial sensors: the raw IMU interval (acc, gyro, dts) covering
    # prev-KF -> this KF, cut by the tracker at request time
    # (ImuState.cut_interval) and owned by the mapper's ImuState after
    # delivery (the mlQueueImuData -> preintegration handoff role)
    imu_interval: Optional[tuple] = None
    # mapper commit version whose gauge this package's pose is expressed
    # in (the tracker's last adopted commit): inertial gauge transforms
    # (init/VIBA/scale-refine) that land between enqueue and processing
    # re-gauge the pose on arrival (see AsyncMapper gauge history)
    gauge_version: int = 0


def apply_frame_stats(s: atlas_state.MapState, pkg: KFPackage):
    if pkg.stat_vis is None:
        return s
    return dataclasses.replace(
        s,
        lm_visible=s.lm_visible + pkg.stat_vis,
        lm_found=s.lm_found + pkg.stat_found,
    )


def insert_keyframe_pkg(s: atlas_state.MapState, pkg: KFPackage, cfg,
                        base_sensor: str, parent_row: int,
                        kf_row_host: int | None = None):
    """Add the keyframe row + depth-derived close landmarks
    (Tracking::CreateNewKeyFrame, /root/reference/src/Tracking.cc:3216-3331).

    feat_lm bindings are re-validated against the CURRENT landmark validity:
    rows culled between tracking and mapping detach instead of binding a
    dead landmark (the reference's MapPoint::isBad checks at insertion).
    Returns (state, kf_row)."""
    L = s.lmax
    feat_lm = pkg.feat_lm
    if feat_lm is not None:
        alive = s.lm_valid[jnp.clip(feat_lm, 0, L - 1)] & (feat_lm >= 0)
        feat_lm = jnp.where(alive, feat_lm, atlas_state.NO_LM)
    # NOTE on gauge staleness: the package pose was optimized against the
    # tracker's adopted landmark snapshot, which keeps it aligned to the
    # mapper's gauge up to one commit of lag. Re-anchoring it through the
    # reference keyframe's pose delta was measured to HURT (the newest KF's
    # per-BA wiggle is noisier than the pose's own landmark anchoring), so
    # the package pose is inserted as tracked.
    R_pkg, t_pkg = pkg.R, pkg.t
    s, kf = atlas_ops.add_keyframe(
        s, R_pkg, t_pkg, pkg.timestamp,
        pkg.feat_xy, pkg.feat_octave, pkg.feat_angle, pkg.feat_desc,
        pkg.feat_valid,
        feat_lm=feat_lm, feat_ur=pkg.feat_ur, feat_depth=pkg.feat_depth,
        parent=jnp.asarray(parent_row, jnp.int32),
        prev=jnp.asarray(parent_row, jnp.int32),
    )
    # the mapper mirrors the insertion row host-side (kf == n_kf at entry);
    # taking it from the caller avoids a device->host sync that blocks the
    # mapper thread behind the whole queued device stream (~25 ms through
    # the TPU tunnel)
    kf = int(kf) if kf_row_host is None else int(kf_row_host)

    # stereo/RGBD: create landmarks directly from depth for unbound close
    # points (Tracking.cc:3247-3331). "Close" uses the reference's METRIC
    # threshold mThDepth = bf * thDepth / fx (Tracking.cc:628-633); beyond
    # it only the ~100 nearest are created.
    if base_sensor != "mono" and pkg.feat_depth is not None:
        depth = pkg.feat_depth
        unbound = pkg.feat_valid & (s.kf_feat_lm[kf] < 0)
        has_depth = (depth > cfg.min_depth) & unbound
        th_depth_m = cfg.bf * cfg.th_depth / float(np.asarray(cfg.K)[0])
        d_rank = jnp.where(has_depth, depth, jnp.inf)
        rank = jnp.argsort(jnp.argsort(d_rank))
        close = has_depth & ((depth < th_depth_m) | (rank < 100))
        rays = cam.unproject(cfg.kind, cfg.K, pkg.feat_xy)
        Xc = rays * depth[:, None]
        Rw, tw = lie.se3_inv(R_pkg, t_pkg)
        Xw = lie.se3_apply(Rw, tw, Xc)
        s, _ = atlas_ops.add_landmarks(
            s, Xw, pkg.feat_desc,
            jnp.full((Xw.shape[0],), kf, jnp.int32), close,
            jnp.full((Xw.shape[0],), kf, jnp.int32),
            jnp.arange(Xw.shape[0], dtype=jnp.int32),
        )
    return s, kf


def triangulate_mono(s: atlas_state.MapState, kf: int, cfg, scale_factors,
                     fallback_row: int, n_neighbors: int = 3):
    """CreateNewMapPoints against the best covisible neighbors
    (LocalMapping.cc:391-408 nn-best semantics)."""
    W = np.array(atlas_state.covisibility_weights(s)[kf])
    W[kf] = 0
    order = np.argsort(-W)
    prev_rows = [int(r) for r in order[:n_neighbors] if W[r] >= 15]
    if not prev_rows and fallback_row >= 0:
        prev_rows = [fallback_row]
    use_depth = cfg.sensor.split("-")[0] != "mono"
    for prev in prev_rows:
        Xw, f1, f2, accept = local_mapper.triangulate_pair(
            cfg.kind, cfg.K, s, kf, prev, scale_factors,
            use_depth=use_depth, min_depth=cfg.min_depth,
        )
        s = local_mapper.insert_triangulated(
            s, kf, jnp.asarray(prev), Xw, f1, f2, accept
        )
    return s


def fuse_recent(s: atlas_state.MapState, cfg, scale_factors, n_recent: int = 4,
                n_kf_host: int | None = None):
    """Densify observations into the most recent keyframes
    (SearchInNeighbors role, LocalMapping.cc:714)."""
    n_kf = int(s.n_kf) if n_kf_host is None else int(n_kf_host)
    for krow in range(max(0, n_kf - n_recent), n_kf):
        s = fuse.fuse_into_keyframe(
            cfg.kind, cfg.K, s, jnp.asarray(krow, jnp.int32), scale_factors
        )
    return s


def ba_window(s: atlas_state.MapState, cfg):
    """Select the local-BA window: last `local_window` valid KFs of the
    active map free, up to 4 earlier KFs as the fixed frontier
    (Optimizer::LocalBundleAdjustment's lFixedCameras, Optimizer.cc:1118).
    Returns (rows [w+4] np.int32, n_fixed)."""
    w = cfg.local_window
    # ONE device->host fetch (the mask is combined on device) instead of
    # three sequential ones — each fetch blocks behind the queued device
    # stream, so on the mapper thread this is 1 tunnel RTT, not 3
    mask = np.asarray(s.kf_valid & (s.kf_map_id == s.active_map))
    valid_rows = np.nonzero(mask)[0]
    n_rows = min(len(valid_rows), w + 4)
    rows = valid_rows[-n_rows:]
    n_fixed = max(2, n_rows - w) if n_rows > 2 else 1
    rows = np.concatenate([rows, np.full((w + 4) - len(rows), rows[-1])])
    return rows, n_fixed


def run_visual_ba(s: atlas_state.MapState, cfg, scale_factors, rows, n_fixed,
                  base_sensor: str, iters: int = 8, chunk: int = 2,
                  abort_check=None):
    """Windowed local BA, abortable between iteration chunks — the
    `mbAbortBA` preemption contract (`LocalMapping::InsertKeyFrame` sets
    mbAbortBA, `Optimizer.cc:1203-1204` polls it between LM rounds). Each
    completed chunk is a valid (cost-decreasing) state, so a preempted BA
    commits its partial progress instead of discarding it.

    In background mode (abort_check set) the mapper BLOCKS on each chunk
    before dispatching the next: a single device executes work FIFO, so a
    monolithic BA kernel (~125 ms device) would stall every concurrently
    dispatched tracking step behind it. Yielding between chunks caps the
    tracker's worst-case device-queue delay at one chunk; the mapper eats
    the extra round-trips (it is off the frame critical path). This is the
    single-chip analogue of the reference running LocalMapping on its own
    core (System.cc:197)."""
    import jax

    w = cfg.local_window
    done = 0
    while done < iters:
        it = min(chunk, iters - done) if abort_check is not None else iters
        s, _ = local_mapper.local_ba(
            cfg.kind, cfg.K, s, jnp.asarray(rows, jnp.int32),
            n_fixed=n_fixed, window=w + 4, iters=it,
            scale_factors=scale_factors,
            stereo=(base_sensor != "mono"), bf=cfg.bf,
        )
        done += it
        if abort_check is not None and done < iters:
            jax.block_until_ready(s.kf_R)   # yield the device queue
            if abort_check():
                break
    return s


def cull(s: atlas_state.MapState, cfg, rows, use_imu: bool):
    """MapPoint + (visual) KeyFrame culling (LocalMapping.cc:346,902)."""
    w = cfg.local_window
    s = local_mapper.cull_landmarks(s)
    if not use_imu and int(s.n_kf) > w + 4:
        s = local_mapper.cull_keyframes(s, jnp.asarray(rows[: w + 4], jnp.int32))
    return atlas_state.update_landmark_stats(s)


# ---------------------------------------------------------------------------
# Fused jitted mapping stages (the TPU fast path)
#
# The per-stage functions above compose dozens of small eager dispatches and
# host round-trips per keyframe (neighbor selection via np.argsort of a
# device matrix, int() window bookkeeping, per-pair triangulation calls).
# On one chip every such host sync also serializes the TRACKER's next
# dispatch behind the mapper's queued work — measured 1.9 s of mapping per
# keyframe and 80 ms tracker stalls (BENCH r3 profiling). The fused stages
# trace the whole per-keyframe pipeline into three compiled programs:
#
#   map_stage_pre : stats + insert + depth landmarks + covisible-neighbor
#                   selection (in-jit top-k) + triangulation + fuse +
#                   BA-window selection
#   run_visual_ba : unchanged chunked/abortable local BA (mbAbortBA)
#   map_stage_post: landmark + keyframe culling + landmark stats
#
# Fuse targets are the newest KF plus its best covisible neighbors — the
# reference's SearchInNeighbors 2-hop contract (LocalMapping.cc:714-900) —
# NOT just temporal recents: binding observations into old-but-overlapping
# keyframes is also what keeps the covisibility graph dense enough for the
# keyframe database to exclude them as loop candidates.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("kind", "with_depth", "n_tri", "n_fuse",
                                   "wnd", "local_window"))
def map_stage_pre(kind: int, K8, s: atlas_state.MapState,
                  R, t, timestamp,
                  feat_xy, feat_octave, feat_angle, feat_desc, feat_valid,
                  feat_lm, feat_ur, feat_depth, stat_vis, stat_found,
                  parent_row, scale_factors, bf, th_depth, min_depth,
                  with_depth: bool, n_tri: int = 3, n_fuse: int = 4,
                  wnd: int = 10, local_window: int = 6):
    """Insert one keyframe package and run the pre-BA mapping stages fully
    on device. Returns (state, kf_row, ba_rows [wnd], n_fixed)."""
    K = s.kmax
    L = s.lmax

    # frame statistics buffered by the tracker (mnVisible/mnFound)
    s = dataclasses.replace(
        s, lm_visible=s.lm_visible + stat_vis, lm_found=s.lm_found + stat_found
    )

    # re-validate bindings vs current landmark validity (see
    # insert_keyframe_pkg) and insert the keyframe row
    alive = s.lm_valid[jnp.clip(feat_lm, 0, L - 1)] & (feat_lm >= 0)
    feat_lm = jnp.where(alive, feat_lm, atlas_state.NO_LM)
    s, kf = atlas_ops.add_keyframe(
        s, R, t, timestamp, feat_xy, feat_octave, feat_angle, feat_desc,
        feat_valid, feat_lm=feat_lm, feat_ur=feat_ur, feat_depth=feat_depth,
        parent=jnp.asarray(parent_row, jnp.int32),
        prev=jnp.asarray(parent_row, jnp.int32),
    )

    # depth sensors: close landmarks from measured depth (Tracking.cc:3247)
    if with_depth:
        depth = feat_depth
        unbound = feat_valid & (s.kf_feat_lm[kf] < 0)
        has_depth = (depth > min_depth) & unbound
        th_depth_m = bf * th_depth / K8[0]
        d_rank = jnp.where(has_depth, depth, jnp.inf)
        rank = jnp.argsort(jnp.argsort(d_rank))
        close = has_depth & ((depth < th_depth_m) | (rank < 100))
        rays = cam.unproject(kind, K8, feat_xy)
        Xc = rays * depth[:, None]
        Rw, tw = lie.se3_inv(R, t)
        Xw = lie.se3_apply(Rw, tw, Xc)
        s, _ = atlas_ops.add_landmarks(
            s, Xw, feat_desc,
            jnp.full((Xw.shape[0],), kf, jnp.int32), close,
            jnp.full((Xw.shape[0],), kf, jnp.int32),
            jnp.arange(Xw.shape[0], dtype=jnp.int32),
        )

    # covisibility of the fresh keyframe (one MXU matmul)
    W = atlas_state.covisibility_weights(s)
    W_row = jnp.where(jnp.arange(K) == kf, 0, W[kf])
    W_row = jnp.where(s.kf_valid, W_row, 0)

    # CreateNewMapPoints against the best covisible neighbors
    # (LocalMapping.cc:391-408); fall back to the parent when none reach
    # the covisibility threshold
    top_w, top_rows = jax.lax.top_k(W_row, n_tri)
    for i in range(n_tri):
        nbr = jnp.where(
            top_w[i] >= 15, top_rows[i],
            jnp.where(i == 0, jnp.asarray(parent_row, jnp.int32), kf),
        )
        ok_pair = (nbr >= 0) & (nbr != kf)
        nbr_safe = jnp.clip(nbr, 0, K - 1)
        Xw_t, f1, f2, accept = local_mapper.triangulate_pair(
            kind, K8, s, kf, nbr_safe, scale_factors,
            use_depth=with_depth, min_depth=min_depth,
        )
        accept = accept & ok_pair
        s = local_mapper.insert_triangulated(s, kf, nbr_safe, Xw_t, f1, f2,
                                             accept)

    # SearchInNeighbors fuse: newest KF + its best covisible neighbors,
    # candidate POINTS scoped to the covisibility neighborhood's landmarks
    # (LocalMapping.cc:714-900 — never the whole map: a map-wide fuse
    # would silently weld genuine revisits). The pre-triangulation W is
    # reused — TPU scatters building the observation matrix dominate this
    # stage, and the just-triangulated points are already bound to kf
    # itself, so the slightly stale neighbor weights only delay their fuse
    # into OTHER rows by one keyframe.
    W2_row = jnp.where(jnp.arange(K) == kf, 0, W[kf])
    W2_row = jnp.where(s.kf_valid, W2_row, 0)
    fw, frows = jax.lax.top_k(W2_row, max(n_fuse - 1, 1))
    fuse_rows = [kf] + [
        jnp.where(fw[i] >= 15, frows[i], kf) for i in range(max(n_fuse - 1, 1))
    ]
    # 2-hop neighborhood pool via the (fresh) bound table — one scatter
    nbr_kfs = (W2_row > 0).at[kf].set(True)
    bound_nb = (s.kf_feat_lm >= 0) & s.kf_feat_valid & nbr_kfs[:, None]
    lm_pool = jnp.zeros((L,), bool).at[
        jnp.clip(s.kf_feat_lm, 0, L - 1).reshape(-1)
    ].max(bound_nb.reshape(-1), mode="drop")
    for row in fuse_rows:
        s = fuse.fuse_into_keyframe(kind, K8, s, row, scale_factors,
                                    lm_mask=lm_pool)

    # BA window: last `wnd` valid KFs of the active map, ascending, padded
    # by repeating the newest (duplicates are frozen no-ops in local_ba)
    mask = s.kf_valid & (s.kf_map_id == s.active_map)
    idx = jnp.sort(jnp.where(mask, jnp.arange(K), K))
    n_valid = jnp.sum(mask)
    start = jnp.clip(n_valid - wnd, 0, K - wnd)
    ba_rows = jax.lax.dynamic_slice(idx, (start,), (wnd,))
    newest = idx[jnp.maximum(n_valid - 1, 0)]
    ba_rows = jnp.where(ba_rows >= K, newest, ba_rows).astype(jnp.int32)
    n_rows = jnp.minimum(n_valid, wnd)
    n_fixed = jnp.where(
        n_rows > 2, jnp.maximum(2, n_rows - local_window), 1
    )
    return s, kf, ba_rows, n_fixed


def run_pre_stage(s, pkg: KFPackage, cfg, base_sensor: str, parent_row,
                  scale_factors, kf_row_host: int | None = None):
    """Host wrapper for map_stage_pre: normalizes optional package fields
    to concrete arrays and static flags. Returns (s, kf_row(int), ba_rows,
    n_fixed).

    kf_row_host: the caller-tracked append position (= n_kf before the
    insert — the arena is a bump allocator). When given, the kf row is
    returned without the device fetch that otherwise blocks the caller for
    a full device round-trip (~40 ms through the tunnel)."""
    L = s.lmax
    F = s.fmax
    with_depth = base_sensor != "mono" and pkg.feat_depth is not None
    z_i32 = jnp.zeros((L,), jnp.int32)
    stat_vis = pkg.stat_vis if pkg.stat_vis is not None else z_i32
    stat_found = pkg.stat_found if pkg.stat_found is not None else z_i32
    feat_lm = (pkg.feat_lm if pkg.feat_lm is not None
               else jnp.full((F,), atlas_state.NO_LM, jnp.int32))
    feat_ur = (pkg.feat_ur if pkg.feat_ur is not None
               else -jnp.ones((F,), jnp.float32))
    feat_depth = (pkg.feat_depth if pkg.feat_depth is not None
                  else jnp.zeros((F,), jnp.float32))
    s, kf, ba_rows, n_fixed = map_stage_pre(
        cfg.kind, cfg.K, s,
        pkg.R, pkg.t, jnp.asarray(pkg.timestamp, jnp.float32),
        pkg.feat_xy, pkg.feat_octave, pkg.feat_angle, pkg.feat_desc,
        pkg.feat_valid, feat_lm, feat_ur, feat_depth, stat_vis, stat_found,
        jnp.asarray(parent_row, jnp.int32), scale_factors,
        jnp.asarray(cfg.bf, jnp.float32), jnp.asarray(cfg.th_depth, jnp.float32),
        jnp.asarray(cfg.min_depth, jnp.float32),
        with_depth=with_depth, wnd=cfg.local_window + 4,
        local_window=cfg.local_window,
    )
    return s, (int(kf) if kf_row_host is None else kf_row_host), \
        ba_rows, n_fixed


@jax.jit
def map_stage_post(s: atlas_state.MapState, ba_rows, min_kf_for_cull):
    """Post-BA: landmark culling, keyframe culling over the BA window
    (gated on map size), landmark statistics refresh."""
    s = local_mapper.cull_landmarks(s)
    n_kf_valid = jnp.sum(s.kf_valid)
    s_culled = local_mapper.cull_keyframes(s, ba_rows)
    do_cull = n_kf_valid > min_kf_for_cull
    s = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(do_cull, (1,) * jnp.ndim(a)), b, a
        ),
        s, s_culled,
    )
    return atlas_state.update_landmark_stats(s)
