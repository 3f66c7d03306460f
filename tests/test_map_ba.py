"""Distributed global BA over a real MapState (built by the RGB-D tracker)
on the 8-device CPU mesh."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.parallel import map_ba
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)


def test_distributed_gba_on_tracked_map():
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True, seed=4)
    n = 14
    R_gt, t_gt = orbit_trajectory(n)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384), sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=500, n_levels=3),
        kmax=32, lmax=4096, local_window=5,
    )
    t = trk.Tracker(cfg)
    for i in range(n):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    t.settle()
    assert t.state == trk.OK

    s = t.map
    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("lm",))
    s2 = map_ba.distributed_global_ba(s, K, mesh, num_iters=6)

    # poses must not blow up; map should stay metrically consistent
    kv = np.array(s2.kf_valid)
    kc = evaluate.camera_centers(np.array(s2.kf_R)[kv], np.array(s2.kf_t)[kv])
    kts = np.array(s2.kf_timestamp)[kv]
    fr = (kts / 0.05 + 0.5).astype(int)
    gtc = evaluate.camera_centers(R_gt[fr], t_gt[fr])
    rmse, nm, _ = evaluate.ate_rmse(kts, kc, kts, gtc, with_scale=False)
    # pre-GBA baseline
    kc0 = evaluate.camera_centers(np.array(s.kf_R)[kv], np.array(s.kf_t)[kv])
    rmse0, _, _ = evaluate.ate_rmse(kts, kc0, kts, gtc, with_scale=False)
    assert rmse < max(rmse0 * 1.5, 0.08), (rmse, rmse0)
