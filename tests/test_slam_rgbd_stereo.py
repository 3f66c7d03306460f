"""End-to-end RGB-D and stereo SLAM on the synthetic scene. With metric
depth there is no scale gauge — accuracy should beat the mono path."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def _cfg(sensor, bf):
    return trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor=sensor, bf=bf, th_depth=20.0,
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32, lmax=4096, local_window=6,
        deterministic_mapping=True,
    )


def test_rgbd_end_to_end():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=1)
    n = 25
    R_gt, t_gt = orbit_trajectory(n)
    t = trk.Tracker(_cfg("rgbd", bf=350.0 * 0.1))
    for i in range(n):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    ts, R, tt, ok = t.poses()
    assert ok.sum() >= 0.8 * n, f"tracked {ok.sum()}/{n}"
    est_c = evaluate.camera_centers(R[ok], tt[ok])
    gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    rmse, nm, s = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c, with_scale=False)
    # metric depth: no scale alignment allowed; trajectory is ~0.9 units at
    # mean scene depth 5.5. Measured 0.035 after the metric-thDepth parity
    # fix (mThDepth = bf*thDepth/fx + the <=100-nearest creation rule,
    # Tracking.cc:628,3303-3331); gate with ~3x headroom.
    assert rmse < 0.10, f"RGBD ATE {rmse:.4f}"
    assert abs(1.0 - s) < 1e-6  # with_scale=False


def test_stereo_end_to_end():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=2)
    n = 20
    baseline = 0.12
    R_gt, t_gt = orbit_trajectory(n)
    t = trk.Tracker(_cfg("stereo", bf=350.0 * baseline))
    for i in range(n):
        left, right = scene.render_stereo(R_gt[i], t_gt[i], baseline)
        t.process(left, i * 0.05, img_right=right)
    ts, R, tt, ok = t.poses()
    assert ok.sum() >= 0.8 * n, f"tracked {ok.sum()}/{n}"
    est_c = evaluate.camera_centers(R[ok], tt[ok])
    gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    rmse, nm, s = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c, with_scale=False)
    assert rmse < 0.15, f"stereo ATE {rmse:.4f}"


def test_localization_mode_vo_points_survive_unmapped_region():
    """mbOnlyTracking VO points (Tracking.cc:2788-2851; VERDICT r2 #10):
    with mapping paused, temporal depth points keep RGB-D tracking alive
    through a region the frozen map never covered."""
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=6)
    n_map, n_total = 12, 34
    R_gt, t_gt = orbit_trajectory(n_total)
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32, lmax=4096, local_window=5,
        deterministic_mapping=True,
    )
    t = trk.Tracker(cfg)
    for i in range(n_map):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    t.sync_mapping()  # settle + drain queued mapping work pre-pause
    assert t.state == trk.OK

    # freeze the map; keep moving well past the mapped region (the camera
    # advances ~0.77 units beyond the last mapped viewpoint)
    t.mapping_paused = True
    n_kf_frozen = int(t.map.n_kf)
    for i in range(n_map, n_total):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    t.settle()
    assert int(t.map.n_kf) == n_kf_frozen          # map truly frozen
    assert t.state == trk.OK, f"lost in unmapped region (state={t.state})"
    c_est = -np.array(t.last["R"]).T @ np.array(t.last["t"])
    c_gt = -R_gt[n_total - 1].T @ t_gt[n_total - 1]
    assert np.linalg.norm(c_est - c_gt) < 0.15, np.linalg.norm(c_est - c_gt)
