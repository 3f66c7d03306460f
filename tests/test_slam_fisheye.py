"""End-to-end KB8 fisheye-stereo tracking: non-rectified matching +
triangulated depth bound as an inverse-depth stereo edge in pose
optimization and BA (the reference's EdgeSE3ProjectXYZToBody role,
Frame::ComputeStereoFishEyeMatches, Frame.cc:1126)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory, render_kb8

W, H = 512, 384
K8 = cam.make_kb8(260.0, 260.0, 256.0, 192.0, 0.01, -0.005, 0.002, -0.001)
BASE = 0.3  # wide baseline: parallax above the cos gate at z~6 m


def test_fisheye_stereo_tracking_end_to_end():
    scene = PlaneScene(np.array([260.0, 260.0, 256.0, 192.0]),
                       img_wh=(W, H), two_planes=True, seed=5)
    n = 10
    R_gt, t_gt = orbit_trajectory(n)
    cfg = trk.TrackerConfig(
        K=jnp.asarray(K8), kind=cam.KB8, img_wh=(W, H), sensor="stereo",
        orb=orb_mod.OrbConfig(n_features=500, n_levels=3),
        kmax=32, lmax=4096, local_window=5, th_depth=20.0,
        stereo_fisheye=True,
        K_right=jnp.asarray(K8),
        R_rl=np.eye(3, dtype=np.float32),
        t_rl=np.array([-BASE, 0.0, 0.0], np.float32),
        bf=260.0 * BASE,
    )
    t = trk.Tracker(cfg)
    for i in range(n):
        left = render_kb8(scene, K8, (W, H), R_gt[i], t_gt[i],
                          cam.kb8_unproject)
        right = render_kb8(scene, K8, (W, H), R_gt[i],
                           t_gt[i] - np.array([BASE, 0.0, 0.0]),
                           cam.kb8_unproject)
        t.process(left, i * 0.05, img_right=right)

    ts, Rs, tts, oks = t.poses()
    assert oks.sum() >= 0.7 * n, f"tracked {oks.sum()}/{n}"
    est_c = evaluate.camera_centers(Rs[oks], tts[oks])
    gt_c = evaluate.camera_centers(R_gt[oks], t_gt[oks])
    # unaligned-scale ATE: the inverse-depth edges must hold metric scale
    rmse, nm, _ = evaluate.ate_rmse(ts[oks], est_c, ts[oks], gt_c,
                                    with_scale=False)
    assert rmse < 0.05, rmse
