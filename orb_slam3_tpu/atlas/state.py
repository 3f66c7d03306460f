"""Atlas multi-map state as fixed-capacity struct-of-arrays tensors.

This is the TPU-native replacement for the reference's pointer-graph data
model (`/root/reference/src/{Map.cc,Atlas.cc,KeyFrame.cc,MapPoint.cc}`):

- KeyFrame objects -> rows of padded keyframe arrays (pose, IMU state,
  per-feature arrays, preintegration buffers)
- MapPoint objects -> rows of landmark arrays (position, normal, scale
  range, distinctive descriptor, found/visible stats)
- observations (`MapPoint::mObservations` / `KeyFrame::mvpMapPoints`) ->
  ONE feature-major index array `kf_feat_lm[k, f] = landmark row or -1`
- the covisibility graph (`KeyFrame::UpdateConnections`,
  `/root/reference/src/KeyFrame.cc:379-470`) -> an incidence-matrix matmul
  (shared-observation counts on the MXU), cached as [K, K] weights
- Atlas multi-map (`Atlas.h:49-166`) -> a `map_id` column per KF/landmark
  plus an `active_map` scalar: `CreateMapInAtlas` is a counter increment,
  map merge is a relabeling plus a gauge transform — no pointer surgery

`isBad()` lifecycles become validity masks; culling clears mask bits;
checkpointing is array serialization (SURVEY.md §5.4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NO_LM = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    """Single arena holding every map of the Atlas (rows tagged by map_id)."""

    # --- keyframes ---
    kf_R: jnp.ndarray          # [K, 3, 3] Tcw rotation (reference Frame::GetPose)
    kf_t: jnp.ndarray          # [K, 3]    Tcw translation
    kf_vel: jnp.ndarray        # [K, 3]    world velocity (inertial)
    kf_bg: jnp.ndarray         # [K, 3]    gyro bias
    kf_ba: jnp.ndarray         # [K, 3]    acc bias
    kf_timestamp: jnp.ndarray  # [K]
    kf_map_id: jnp.ndarray     # [K] int32
    kf_valid: jnp.ndarray      # [K] bool
    kf_parent: jnp.ndarray     # [K] int32 spanning-tree parent (-1 root)
    kf_prev: jnp.ndarray       # [K] int32 temporal/IMU chain (mPrevKF)

    # --- per-keyframe features ---
    kf_feat_xy: jnp.ndarray     # [K, F, 2] undistorted level-0 coords
    kf_feat_octave: jnp.ndarray  # [K, F] int32
    kf_feat_angle: jnp.ndarray  # [K, F]
    kf_feat_desc: jnp.ndarray   # [K, F, 32] uint8
    kf_feat_ur: jnp.ndarray     # [K, F] right-cam u (stereo; <0 = mono)
    kf_feat_depth: jnp.ndarray  # [K, F] stereo/RGBD depth (<=0 = none)
    kf_feat_valid: jnp.ndarray  # [K, F] bool
    kf_feat_lm: jnp.ndarray     # [K, F] int32 landmark row or NO_LM

    # --- landmarks ---
    lm_pos: jnp.ndarray        # [L, 3]
    lm_normal: jnp.ndarray     # [L, 3] mean viewing direction
    lm_min_dist: jnp.ndarray   # [L] scale-invariance range (MapPoint.h:150)
    lm_max_dist: jnp.ndarray   # [L]
    lm_desc: jnp.ndarray       # [L, 32] uint8 distinctive descriptor
    lm_map_id: jnp.ndarray     # [L] int32
    lm_valid: jnp.ndarray      # [L] bool
    lm_visible: jnp.ndarray    # [L] int32 (mnVisible)
    lm_found: jnp.ndarray      # [L] int32 (mnFound)
    lm_first_kf: jnp.ndarray   # [L] int32

    # --- counters / atlas ---
    n_kf: jnp.ndarray          # [] int32 next free KF row
    n_lm: jnp.ndarray          # [] int32 next free landmark row
    active_map: jnp.ndarray    # [] int32
    n_maps: jnp.ndarray        # [] int32

    @property
    def kmax(self):
        return self.kf_R.shape[0]

    @property
    def lmax(self):
        return self.lm_pos.shape[0]

    @property
    def fmax(self):
        return self.kf_feat_xy.shape[1]


def empty(kmax: int = 256, fmax: int = 1024, lmax: int = 16384) -> MapState:
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=f32)[None], (kmax, 1, 1)),
        kf_t=jnp.zeros((kmax, 3), f32),
        kf_vel=jnp.zeros((kmax, 3), f32),
        kf_bg=jnp.zeros((kmax, 3), f32),
        kf_ba=jnp.zeros((kmax, 3), f32),
        kf_timestamp=jnp.zeros((kmax,), f32),
        kf_map_id=jnp.full((kmax,), -1, i32),
        kf_valid=jnp.zeros((kmax,), bool),
        kf_parent=jnp.full((kmax,), -1, i32),
        kf_prev=jnp.full((kmax,), -1, i32),
        kf_feat_xy=jnp.zeros((kmax, fmax, 2), f32),
        kf_feat_octave=jnp.zeros((kmax, fmax), i32),
        kf_feat_angle=jnp.zeros((kmax, fmax), f32),
        kf_feat_desc=jnp.zeros((kmax, fmax, 32), jnp.uint8),
        kf_feat_ur=jnp.full((kmax, fmax), -1.0, f32),
        kf_feat_depth=jnp.zeros((kmax, fmax), f32),
        kf_feat_valid=jnp.zeros((kmax, fmax), bool),
        kf_feat_lm=jnp.full((kmax, fmax), NO_LM, i32),
        lm_pos=jnp.zeros((lmax, 3), f32),
        lm_normal=jnp.zeros((lmax, 3), f32),
        lm_min_dist=jnp.zeros((lmax,), f32),
        lm_max_dist=jnp.zeros((lmax,), f32),
        lm_desc=jnp.zeros((lmax, 32), jnp.uint8),
        lm_map_id=jnp.full((lmax,), -1, i32),
        lm_valid=jnp.zeros((lmax,), bool),
        lm_visible=jnp.zeros((lmax,), i32),
        lm_found=jnp.zeros((lmax,), i32),
        lm_first_kf=jnp.full((lmax,), -1, i32),
        n_kf=jnp.zeros((), i32),
        n_lm=jnp.zeros((), i32),
        active_map=jnp.zeros((), i32),
        n_maps=jnp.ones((), i32),
    )


# ---------------------------------------------------------------------------
# Covisibility graph (KeyFrame::UpdateConnections as an incidence matmul)
# ---------------------------------------------------------------------------

def observation_matrix(s: MapState) -> jnp.ndarray:
    """[K, L] bool: keyframe k observes landmark l. One scatter."""
    K, F, L = s.kmax, s.fmax, s.lmax
    lm = s.kf_feat_lm  # [K, F]
    ok = (lm >= 0) & s.kf_feat_valid & s.kf_valid[:, None]
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    M = jnp.zeros((K, L), bool)
    return M.at[rows, jnp.clip(lm, 0, L - 1)].max(ok)


def covisibility_weights(s: MapState) -> jnp.ndarray:
    """[K, K] shared-landmark counts (diagonal zeroed). The reference builds
    this per-KF with hash maps (`KeyFrame.cc:379-470`, threshold th=15); here
    it is one int matmul on the MXU."""
    M = observation_matrix(s).astype(jnp.float32)
    W = (M @ M.T).astype(jnp.int32)
    return W - jnp.diag(jnp.diag(W))


def essential_edges(s: MapState, W: jnp.ndarray, min_weight: int = 100):
    """Essential-graph adjacency: spanning-tree edges + covisibility edges
    with weight >= min_weight (Optimizer.cc:1530 minFeat). Returns [K, K]
    bool (symmetric)."""
    K = s.kmax
    A = W >= min_weight
    parent_ok = (s.kf_parent >= 0) & s.kf_valid
    rows = jnp.arange(K)
    A = A.at[rows, jnp.clip(s.kf_parent, 0, K - 1)].max(parent_ok)
    A = A.at[jnp.clip(s.kf_parent, 0, K - 1), rows].max(parent_ok)
    return A & s.kf_valid[:, None] & s.kf_valid[None, :]


# ---------------------------------------------------------------------------
# Landmark statistics maintenance
# ---------------------------------------------------------------------------

def update_landmark_stats(s: MapState, scale_factor: float = 1.2,
                          n_levels: int = 8) -> MapState:
    """Recompute lm_normal / scale-invariance distances from current
    observations (MapPoint::UpdateNormalAndDepth,
    `/root/reference/src/MapPoint.cc:426-480`), vectorized over all landmarks."""
    K, F, L = s.kmax, s.fmax, s.lmax
    ok = (s.kf_feat_lm >= 0) & s.kf_feat_valid & s.kf_valid[:, None]
    lm = jnp.clip(s.kf_feat_lm, 0, L - 1)

    # camera centers: Ow = -R^T t
    Ow = -jnp.einsum("kij,ki->kj", s.kf_R, s.kf_t)  # [K, 3]
    dirs = s.lm_pos[lm] - Ow[:, None, :]            # [K, F, 3]
    norms = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    unit = dirs / jnp.maximum(norms, 1e-9)

    normal_sum = jnp.zeros((L, 3)).at[lm].add(jnp.where(ok[..., None], unit, 0.0))
    n_obs = jnp.zeros((L,)).at[lm].add(ok.astype(jnp.float32))
    normal = normal_sum / jnp.maximum(n_obs, 1.0)[:, None]

    # reference distance from the FIRST observing keyframe at its octave
    # (approximated as the mean observing distance/octave — same invariance
    # envelope semantics)
    dist_sum = jnp.zeros((L,)).at[lm].add(jnp.where(ok, norms[..., 0], 0.0))
    oct_sum = jnp.zeros((L,)).at[lm].add(
        jnp.where(ok, s.kf_feat_octave.astype(jnp.float32), 0.0)
    )
    mean_dist = dist_sum / jnp.maximum(n_obs, 1.0)
    mean_oct = oct_sum / jnp.maximum(n_obs, 1.0)
    level_factor = scale_factor ** mean_oct
    max_dist = mean_dist * level_factor
    min_dist = max_dist / (scale_factor ** (n_levels - 1))

    has_obs = n_obs > 0
    return dataclasses.replace(
        s,
        lm_normal=jnp.where(has_obs[:, None], normal, s.lm_normal),
        lm_max_dist=jnp.where(has_obs, max_dist, s.lm_max_dist),
        lm_min_dist=jnp.where(has_obs, min_dist, s.lm_min_dist),
    )


def predict_octave(s: MapState, dist, n_levels: int = 8, scale: float = 1.2):
    """MapPoint::PredictScale (`MapPoint.h:150-152`): level from
    log(max_dist/dist)/log(scale), clipped."""
    ratio = jnp.maximum(s.lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale))
    return jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32)


def compute_distinctive_descriptors(s: MapState, lm_rows) -> MapState:
    """Median-Hamming distinctive descriptor per landmark
    (MapPoint::ComputeDistinctiveDescriptors, MapPoint.cc:329-424) for the
    given [R] landmark rows, over up to the first 16 observations."""
    K, F, L = s.kmax, s.fmax, s.lmax
    OBS_CAP = 16
    ok = (s.kf_feat_lm >= 0) & s.kf_feat_valid & s.kf_valid[:, None]
    lm = jnp.clip(s.kf_feat_lm, 0, L - 1)

    # per requested landmark, collect up to OBS_CAP observing (k, f) slots
    flat_lm = jnp.where(ok, lm, L).reshape(-1)  # invalid -> L (sorted last)
    order = jnp.argsort(flat_lm)
    sorted_lm = flat_lm[order]

    def per_row(r):
        start = jnp.searchsorted(sorted_lm, r)
        idx = order[jnp.clip(start + jnp.arange(OBS_CAP), 0, K * F - 1)]
        valid = sorted_lm[jnp.clip(start + jnp.arange(OBS_CAP), 0, K * F - 1)] == r
        descs = s.kf_feat_desc.reshape(-1, 32)[idx]  # [OBS_CAP, 32]
        x = jnp.bitwise_xor(descs[:, None, :], descs[None, :, :])
        d = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
        d = jnp.where(valid[:, None] & valid[None, :], d, 0)
        cnt = jnp.maximum(jnp.sum(valid), 1)
        # median distance to others per observation (reference sorts; we use
        # mean over valid as the robust center at these tiny counts)
        rowsum = jnp.sum(d, axis=1) / cnt
        rowsum = jnp.where(valid, rowsum, jnp.inf)
        bi = jnp.argmin(rowsum)
        return descs[bi], jnp.sum(valid) > 0

    descs, has = jax.vmap(per_row)(lm_rows)
    new_desc = s.lm_desc.at[lm_rows].set(
        jnp.where(has[:, None], descs, s.lm_desc[lm_rows])
    )
    return dataclasses.replace(s, lm_desc=new_desc)
