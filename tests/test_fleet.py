"""SPMD fleet tracking: a batch of independent sessions sharded over the
mesh must produce exactly the single-device results (parallel/fleet.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from orb_slam3_tpu.frontend import camera as cam, orb as orb_mod
from orb_slam3_tpu.parallel import fleet


def test_fleet_step_matches_single_device():
    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("seq",))

    cfg_orb = orb_mod.OrbConfig(n_features=200, n_levels=2)
    K = cam.make_pinhole(120.0, 120.0, 96.0, 64.0)
    B, H, W, L = 8, 128, 192, 256
    rng = np.random.default_rng(0)
    imgs = np.zeros((B, H, W), np.float32)
    for b in range(B):
        xs = rng.integers(8, W - 8, 300)
        ys = rng.integers(8, H - 8, 300)
        for x, y in zip(xs, ys):
            imgs[b, y:y + 3, x:x + 3] = rng.uniform(50, 255)
    lm_pos = np.concatenate(
        [rng.uniform(-1, 1, (B, L, 2)), rng.uniform(2, 5, (B, L, 1))], axis=2
    ).astype(np.float32)
    lm_desc = rng.integers(0, 256, (B, L, 32)).astype(np.uint8)
    lm_valid = np.ones((B, L), bool)
    lm_maxd = np.full((B, L), 8.0, np.float32)
    lm_mind = np.full((B, L), 0.5, np.float32)
    lm_normal = np.zeros((B, L, 3), np.float32)
    R0 = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t0 = np.zeros((B, 3), np.float32)

    step = fleet.make_fleet_step(mesh, cfg_orb, K, img_wh=(float(W), float(H)))
    args = (imgs, lm_pos, lm_desc, lm_valid, lm_maxd, lm_mind, lm_normal,
            R0, t0)
    R, t, n = step(*(jnp.asarray(a) for a in args))
    assert R.shape == (B, 3, 3) and t.shape == (B, 3) and n.shape == (B,)

    # reference: per-session single-device execution
    from orb_slam3_tpu.parallel.fleet import _track_one

    sf = jnp.asarray([cfg_orb.scale_factor ** i
                      for i in range(cfg_orb.n_levels)])
    for b in range(0, B, 3):
        Rr, tr, nr = _track_one(
            *(jnp.asarray(a[b]) for a in args),
            cfg_orb=cfg_orb, kind=cam.PINHOLE, K=K,
            img_wh=(float(W), float(H)), scale_factors=sf,
            match_radius=15.0,
        )
        assert int(nr) == int(n[b])
        np.testing.assert_allclose(np.array(R[b]), np.array(Rr),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.array(t[b]), np.array(tr),
                                   rtol=0, atol=1e-5)
