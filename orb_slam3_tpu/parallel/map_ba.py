"""Distributed global bundle adjustment over a MapState.

The multi-chip path of `Optimizer::GlobalBundleAdjustemnt`
(`/root/reference/src/Optimizer.cc:52`) / `LoopClosing::
RunGlobalBundleAdjustment` (`LoopClosing.cc:2268`): extract the full
observation graph from the SoA Atlas, shard the landmark axis over the
device mesh, run the landmark-sharded Schur LM (`dist_ba.py`), and write
the optimized poses/landmarks back. On one device it degenerates to
single-chip global BA.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..atlas.state import NO_LM, MapState
from ..frontend import camera as cam_mod
from ..lm import edges as lm_edges
from . import dist_ba


def extract_global_problem(s: MapState, scale_factors=None):
    """Flatten the active map's observation graph to numpy arrays.

    Returns (kf_rows, cam_R, cam_t, points, obs arrays...) where cam indices
    in the edges refer to positions in kf_rows.
    """
    kv = np.array(s.kf_valid & (s.kf_map_id == s.active_map))
    kf_rows = np.nonzero(kv)[0]
    row_to_pos = -np.ones(s.kmax, np.int32)
    row_to_pos[kf_rows] = np.arange(len(kf_rows))

    lm = np.array(s.kf_feat_lm)
    fv = np.array(s.kf_feat_valid)
    lv = np.array(s.lm_valid)
    if scale_factors is None:
        scale_factors = 1.2 ** np.arange(8)
    oct_ = np.array(s.kf_feat_octave)
    xy = np.array(s.kf_feat_xy)

    cams, lms, uvs, infos = [], [], [], []
    for k in kf_rows:
        sel = fv[k] & (lm[k] >= 0)
        sel &= lv[np.clip(lm[k], 0, s.lmax - 1)]
        idx = np.nonzero(sel)[0]
        cams.append(np.full(len(idx), row_to_pos[k], np.int32))
        lms.append(lm[k][idx])
        uvs.append(xy[k][idx])
        infos.append(
            1.0 / scale_factors[np.clip(oct_[k][idx], 0, len(scale_factors) - 1)] ** 2
        )
    cam_idx = np.concatenate(cams) if cams else np.zeros(0, np.int32)
    lm_idx = np.concatenate(lms) if lms else np.zeros(0, np.int32)
    uv = np.concatenate(uvs) if uvs else np.zeros((0, 2), np.float32)
    info = np.concatenate(infos) if infos else np.zeros(0, np.float32)
    return kf_rows, cam_idx, lm_idx, uv.astype(np.float32), info.astype(np.float32)


def distributed_global_ba(s: MapState, K8, mesh: Mesh, kind: int = 0,
                          n_fixed: int = 2, num_iters: int = 10,
                          huber_delta: float | None = 5.991 ** 0.5,
                          cam_bucket: int = 8, edge_bucket: int = 1024):
    """Run distributed GBA on the active map; returns the updated MapState.

    Camera/edge capacities are bucketed so repeated campaigns on a growing
    map hit the jit cache instead of recompiling per keyframe count."""
    n_dev = int(np.prod(mesh.devices.shape))
    kf_rows, cam_idx, lm_idx, uv, info = extract_global_problem(s)
    if len(kf_rows) < 3 or len(cam_idx) == 0:
        return s

    sharded = dist_ba.shard_ba_problem(
        n_dev, np.array(s.lm_pos), ~np.array(s.lm_valid),
        cam_idx, lm_idx, uv, info, np.ones(len(cam_idx), bool),
        edge_bucket=edge_bucket,
    )
    res = lm_edges.make_mono_residual(kind)

    def ba_residual(cam_state, x, data):
        return res(cam_state, {"x": x}, data)

    # pad the camera list to the bucket with fixed dummies (row 0 repeated;
    # they carry no edges, so they only pin the jit shape)
    n_real = len(kf_rows)
    n_pad = -(-n_real // cam_bucket) * cam_bucket - n_real
    kf_rows_p = np.concatenate([kf_rows, np.full(n_pad, kf_rows[0])])
    rows_j = jnp.asarray(kf_rows_p, jnp.int32)
    fixed = (jnp.arange(len(kf_rows_p)) < n_fixed) | (
        jnp.arange(len(kf_rows_p)) >= n_real
    )
    cam_state = {"R": s.kf_R[rows_j], "t": s.kf_t[rows_j]}
    cams_out, pts_out, costs = dist_ba.dist_ba_solve(
        mesh, ba_residual, lm_edges.se3_retract, cam_state, fixed,
        jnp.asarray(K8), *sharded, num_iters=num_iters,
        huber_delta=huber_delta,
    )
    L = s.lmax
    new_points = jnp.asarray(np.asarray(pts_out).reshape(-1, 3)[:L])
    rows_real = rows_j[:n_real]
    return dataclasses.replace(
        s,
        kf_R=s.kf_R.at[rows_real].set(cams_out["R"][:n_real]),
        kf_t=s.kf_t.at[rows_real].set(cams_out["t"][:n_real]),
        lm_pos=jnp.where(s.lm_valid[:, None], new_points, s.lm_pos),
    )
