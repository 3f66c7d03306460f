"""Fleet tracking: data-parallel frame tracking over a device mesh.

The reference is strictly one-session/one-process (SURVEY.md §2.4); for
production serving, the TPU-native scaling axis is SPMD over SESSIONS: a
mesh axis "seq" shards a batch of independent tracking sessions (cameras,
robots, dataset segments), each device running the full per-frame hot path
(ORB extraction -> local-map projection matching -> motion-only pose
optimization, the 30 Hz loop of Tracking.cc:1794-2332) on its own shard.
No cross-device communication is needed per frame — collectives only enter
for the shared-map case (parallel/dist_ba.py, map_ba.py).

`make_fleet_step(mesh, ...)` returns a jitted shard_mapped step:
  step(imgs [B,H,W], lm_pos [B,L,3], lm_desc [B,L,32] u8, lm_valid [B,L],
       lm_maxd [B,L], lm_mind [B,L], lm_normal [B,L,3],
       R0 [B,3,3], t0 [B,3]) -> (R [B,3,3], t [B,3], n_inliers [B])
with every array sharded along B. Per device the local sessions run
sequentially (vmap of the gather-heavy extractor relayouts badly on TPU —
measured slower than the sequential loop on v5e).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frontend import camera as cam
from ..frontend import orb
from ..tracking import track as track_mod


def _track_one(img, lm_pos, lm_desc, lm_valid, lm_maxd, lm_mind, lm_normal,
               R0, t0, *, cfg_orb, kind, K, img_wh, scale_factors,
               match_radius):
    feats = orb.extract(img, cfg_orb)
    idx, ok, visible, _, _d = track_mod.match_local_map(
        kind, K, R0, t0, lm_pos, lm_desc, lm_valid, lm_maxd, lm_mind,
        lm_normal, feats.xy, feats.descriptors, feats.octave, feats.valid,
        match_radius, scale_factors, img_wh=img_wh,
    )
    inv_sig2 = 1.0 / (
        scale_factors[jnp.clip(feats.octave[idx], 0,
                               cfg_orb.n_levels - 1)] ** 2
    )
    R, t, inl, n = track_mod.pose_optimize(
        kind, K, R0, t0, feats.xy[idx], lm_pos, inv_sig2, ok
    )
    return R, t, n


def make_fleet_step(mesh: Mesh, cfg_orb, K, kind=cam.PINHOLE,
                    img_wh=(752.0, 480.0), match_radius: float = 15.0,
                    axis: str = "seq"):
    """Jitted SPMD fleet step over `mesh[axis]`. The batch size must be a
    multiple of the mesh axis size."""
    scale_factors = jnp.asarray(
        [cfg_orb.scale_factor ** i for i in range(cfg_orb.n_levels)],
        jnp.float32,
    )
    one = partial(
        _track_one, cfg_orb=cfg_orb, kind=kind, K=K, img_wh=img_wh,
        scale_factors=scale_factors, match_radius=match_radius,
    )

    def local_step(*shards):
        b_loc = shards[0].shape[0]
        outs = [one(*(a[i] for a in shards)) for i in range(b_loc)]
        return tuple(jnp.stack(x) for x in zip(*outs))

    spec = P(axis)
    fleet = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(spec,) * 9, out_specs=(spec, spec, spec),
        # the pose-opt scan carries unvarying scalar constants (damping
        # seed); per-shard execution is embarrassingly parallel, so the
        # varying-manual-axes check adds nothing here
        check_vma=False,
    )
    return jax.jit(fleet)
