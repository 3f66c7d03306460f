"""Multi-host distributed Atlas: DCN-aware meshes and cross-host maps.

SURVEY.md §2.4 / §5.8: the reference has no distributed story (pthreads +
mutexes only); the TPU-native equivalent is `jax.lax` collectives over ICI
within a host/pod-slice and `jax.distributed` over DCN across hosts. This
module provides the multi-host layer:

- `init_distributed()`: `jax.distributed.initialize()` wrapper for real
  multi-host launches (one process per host; env-driven coordinator).
- `two_level_mesh(n_hosts, devs_per_host)`: a ("host", "dev") mesh. On a
  real pod the "host" axis rides DCN and "dev" rides ICI; on the test
  backend both are virtual CPU devices, so the same program validates the
  sharding + collective structure (the driver's multichip contract).
- `dist_gba_two_level`: global BA with landmarks sharded over BOTH axes.
  The Schur reduction is staged hierarchically — `psum` over "dev" (ICI)
  first, then over "host" (DCN) — so the small reduced camera system is
  the only cross-host traffic per iteration, exactly the
  bandwidth-hierarchy-aware layout the scaling playbook prescribes.
- `HostedAtlas`: multi-map residency across hosts — each host owns a set
  of Atlas maps; a cross-host merge ships ONE map's arrays over DCN (here:
  device-to-device copy) and runs the standard merge on the receiving
  host. Map-level partitioning is the natural DCN boundary because
  intra-map work (tracking, local BA) never crosses it; only
  place-recognition hits and the rare merge do.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..atlas.state import MapState
from ..lm import edges as lm_edges
from ..ops import robust
from . import dist_ba, map_ba


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize jax.distributed for a real multi-host launch (no-op when
    already initialized or single-process). On Cloud TPU the arguments are
    auto-detected from the environment."""
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def two_level_mesh(n_hosts: int, devs_per_host: int) -> Mesh:
    """("host", "dev") mesh over the first n_hosts*devs_per_host devices.
    Axis order puts "host" outermost so XLA stages nested-axis reductions
    innermost-first (ICI before DCN)."""
    n = n_hosts * devs_per_host
    devs = np.array(jax.devices()[:n]).reshape(n_hosts, devs_per_host)
    return Mesh(devs, ("host", "dev"))


def dist_gba_two_level(s: MapState, K8, mesh: Mesh, kind: int = 0,
                       n_fixed: int = 2, num_iters: int = 10,
                       huber_delta: float | None = 5.991 ** 0.5,
                       cam_bucket: int = 8, edge_bucket: int = 1024):
    """Global BA with the landmark axis sharded over host x dev.

    Identical math to map_ba.distributed_global_ba, but the landmark shards
    span BOTH mesh axes (in_specs P(("host","dev"))) and the
    reduced-camera-system `psum` runs over the axis tuple — innermost
    ("dev", ICI) first, then "host" (DCN) — so per-iteration DCN traffic is
    one [KC, KC] matrix + [KC] vector per host, not per device.

    Returns (new MapState, costs). On too-small maps returns (s, [])."""
    n_shards = int(np.prod(mesh.devices.shape))
    kf_rows, cam_idx, lm_idx, uv, info = map_ba.extract_global_problem(s)
    if len(kf_rows) < 3 or len(cam_idx) == 0:
        return s, []

    sharded = dist_ba.shard_ba_problem(
        n_shards, np.array(s.lm_pos), ~np.array(s.lm_valid),
        cam_idx, lm_idx, uv, info, np.ones(len(cam_idx), bool),
        edge_bucket=edge_bucket,
    )
    res = lm_edges.make_mono_residual(kind)

    def ba_residual(cam_state, x, data):
        return res(cam_state, {"x": x}, data)

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
    out = dataclasses.replace(
        s,
        kf_R=s.kf_R.at[rows_real].set(cams_out["R"][:n_real]),
        kf_t=s.kf_t.at[rows_real].set(cams_out["t"][:n_real]),
        lm_pos=jnp.where(s.lm_valid[:, None], new_points, s.lm_pos),
    )
    return out, costs


@dataclasses.dataclass
class HostedAtlas:
    """Multi-map Atlas partitioned across hosts by MAP id.

    Each entry of `host_maps` is the MapState resident on that host. In a
    real deployment each process holds only its own entry and
    `ship_map`/`merge_across_hosts` move arrays over DCN
    (jax.device_put across processes); in the single-process test harness
    the same calls validate the bookkeeping and the merge math."""

    host_maps: list          # host id -> MapState
    host_of_map: dict        # map id -> host id

    @staticmethod
    def create(n_hosts: int, states):
        hm = list(states)
        assert len(hm) == n_hosts
        host_of = {}
        for h, st in enumerate(hm):
            for mid in np.unique(np.array(st.kf_map_id)[np.array(st.kf_valid)]):
                host_of[int(mid)] = h
        return HostedAtlas(host_maps=hm, host_of_map=host_of)

    def ship_map(self, map_id: int, to_host: int):
        """Move one map's keyframes/landmarks to another host's arena —
        the DCN transfer of a cross-host merge. Rows are appended into the
        receiver's arena via the standard add ops (no pointer surgery)."""
        from ..atlas import ops as atlas_ops

        src_host = self.host_of_map[map_id]
        if src_host == to_host:
            return
        src = self.host_maps[src_host]
        dst = self.host_maps[to_host]
        kv = np.array(src.kf_valid) & (np.array(src.kf_map_id) == map_id)
        lv = np.array(src.lm_valid) & (np.array(src.lm_map_id) == map_id)
        kf_rows = np.flatnonzero(kv)
        lm_rows = np.flatnonzero(lv)
        # receiver capacity: grow the arena rather than refuse (r4 weak #9 —
        # cross-host merge only worked when the receiver was pre-sized)
        need_kf = int(dst.n_kf) + len(kf_rows) + 1
        need_lm = int(dst.n_lm) + len(lm_rows) + 1
        if need_kf >= dst.kmax or need_lm >= dst.lmax:
            dst = atlas_ops.grow(
                dst,
                kmax=max(dst.kmax, int(1.5 * need_kf)),
                lmax=max(dst.lmax, int(1.5 * need_lm)),
            )
        # landmarks first: build row remap old -> new
        n0 = int(dst.n_lm)
        lm_remap = {}
        # tag appended rows with the shipped map's id (add_keyframe stamps
        # active_map); the receiver's own active map is restored below
        orig_active = dst.active_map
        dst = dataclasses.replace(dst, active_map=jnp.asarray(map_id, jnp.int32))
        for i, r in enumerate(lm_rows):
            lm_remap[int(r)] = n0 + i
        Xs = np.array(src.lm_pos)[lm_rows]
        Ds = np.array(src.lm_desc)[lm_rows]
        firsts = np.array(src.lm_first_kf)[lm_rows]
        # keyframes
        kf_remap = {}
        for r in kf_rows:
            feat_lm_old = np.array(src.kf_feat_lm[r])
            feat_lm_new = np.array([
                lm_remap.get(int(x), -1) if x >= 0 else -1
                for x in feat_lm_old
            ], np.int32)
            dst, new_r = atlas_ops.add_keyframe(
                dst, src.kf_R[r], src.kf_t[r], src.kf_timestamp[r],
                src.kf_feat_xy[r], src.kf_feat_octave[r],
                src.kf_feat_angle[r], src.kf_feat_desc[r],
                src.kf_feat_valid[r],
                feat_lm=jnp.asarray(feat_lm_new),
                feat_ur=src.kf_feat_ur[r], feat_depth=src.kf_feat_depth[r],
                vel=src.kf_vel[r], bg=src.kf_bg[r], ba=src.kf_ba[r],
            )
            kf_remap[int(r)] = int(new_r)
        # parent/prev links within the shipped map
        kf_parent = np.array(dst.kf_parent)
        kf_prev = np.array(dst.kf_prev)
        src_parent = np.array(src.kf_parent)
        src_prev = np.array(src.kf_prev)
        for r in kf_rows:
            nr = kf_remap[int(r)]
            kf_parent[nr] = kf_remap.get(int(src_parent[r]), -1)
            kf_prev[nr] = kf_remap.get(int(src_prev[r]), -1)
        dst = dataclasses.replace(
            dst, kf_parent=jnp.asarray(kf_parent), kf_prev=jnp.asarray(kf_prev)
        )
        # landmarks: direct row append (bindings were carried through the
        # keyframes' remapped feat_lm tables — no per-landmark bind needed)
        from ..atlas.state import update_landmark_stats

        first_new = np.array([kf_remap.get(int(f), 0) for f in firsts],
                             np.int32)
        n0 = int(dst.n_lm)
        idx = np.arange(n0, n0 + len(Xs))
        assert len(Xs) == 0 or idx[-1] < dst.lmax, "receiver arena full"
        lm_pos = np.array(dst.lm_pos); lm_pos[idx] = Xs
        lm_desc = np.array(dst.lm_desc); lm_desc[idx] = Ds
        lm_valid2 = np.array(dst.lm_valid); lm_valid2[idx] = True
        lm_map = np.array(dst.lm_map_id); lm_map[idx] = map_id
        lm_first = np.array(dst.lm_first_kf); lm_first[idx] = first_new
        dst = dataclasses.replace(
            dst,
            lm_pos=jnp.asarray(lm_pos), lm_desc=jnp.asarray(lm_desc),
            lm_valid=jnp.asarray(lm_valid2), lm_map_id=jnp.asarray(lm_map),
            lm_first_kf=jnp.asarray(lm_first),
            n_lm=jnp.asarray(n0 + len(Xs), jnp.int32),
        )
        dst = dataclasses.replace(
            dst, active_map=orig_active,
            n_maps=jnp.maximum(dst.n_maps, jnp.asarray(map_id + 1, jnp.int32)),
        )
        dst = update_landmark_stats(dst)
        # invalidate the shipped rows on the source host
        src2 = dataclasses.replace(
            src,
            kf_valid=jnp.asarray(np.array(src.kf_valid) & ~kv),
            lm_valid=jnp.asarray(np.array(src.lm_valid) & ~lv),
        )
        self.host_maps[src_host] = src2
        self.host_maps[to_host] = dst
        self.host_of_map[map_id] = to_host
