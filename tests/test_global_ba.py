"""Background global BA: side-thread campaign, abort, and catch-up
reconciliation (LoopClosing::RunGlobalBundleAdjustment semantics,
LoopClosing.cc:2268-2494)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.mapping.global_ba import GlobalBARunner
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)


def _tracked_map(n=12):
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True, seed=7)
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
    return t


def test_background_gba_reconcile():
    t = _tracked_map()
    s = t.map
    runner = GlobalBARunner(K, cam.PINHOLE, num_iters=4, chunk=2)
    runner.launch(s)
    runner.join(timeout=600)
    assert runner.finished and not runner.failed

    # simulate tracking moving on during GBA: add a keyframe after launch
    from orb_slam3_tpu.atlas import ops as atlas_ops

    n_kf = int(s.n_kf)
    parent = n_kf - 1
    # child pose = parent pose shifted; relative pose must be preserved
    dR, dt = jnp.eye(3), jnp.asarray([0.02, 0.0, 0.0])
    R_child, t_child = lie.se3_mul(dR, dt, s.kf_R[parent], s.kf_t[parent])
    F = s.fmax
    s_live, kf_new = atlas_ops.add_keyframe(
        s, R_child, t_child, 99.0,
        jnp.zeros((F, 2)), jnp.zeros(F, jnp.int32), jnp.zeros(F),
        jnp.zeros((F, 32), jnp.uint8), jnp.zeros(F, bool),
        parent=jnp.asarray(parent, jnp.int32),
    )
    gba_R0 = np.array(runner.result.kf_R[0])
    gba_t0 = np.array(runner.result.kf_t[0])
    out = runner.reconcile(s_live)

    # old KFs take the GBA pose
    assert np.allclose(np.array(out.kf_R[0]), gba_R0, atol=1e-6)
    assert np.allclose(np.array(out.kf_t[0]), gba_t0, atol=1e-6)
    # the new KF keeps its relative pose to the parent
    Rp_i, tp_i = lie.se3_inv(out.kf_R[parent], out.kf_t[parent])
    R_rel, t_rel = lie.se3_mul(out.kf_R[int(kf_new)], out.kf_t[int(kf_new)],
                               Rp_i, tp_i)
    assert np.allclose(np.array(R_rel), np.eye(3), atol=2e-3)
    assert np.allclose(np.array(t_rel), [0.02, 0.0, 0.0], atol=2e-3)


def test_gba_abort():
    t = _tracked_map()
    runner = GlobalBARunner(K, cam.PINHOLE, num_iters=50, chunk=1)
    runner.launch(t.map)
    runner.request_abort()
    runner.join(timeout=600)
    assert not runner.running
