"""End-to-end stereo-inertial and RGB-D-inertial SLAM (VERDICT round-1
next-steps #7: two of the six sensor configs, System.h:87-94, had no e2e
coverage). Also exercises the accelerometer-excitation init gate
(Tracking.cc:2340-2350): a static/gentle lead-in must NOT anchor the map;
the shake phase then passes the gate and the inertial init makes the map
metric with fixed scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.imu import preintegration as pre
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)
BASELINE = 0.12
FPS = 10.0
N_GENTLE = 6  # frames with sub-threshold acceleration variation


def vi_depth_trajectory(n_frames=36, hz=200.0):
    """Exact-discrete-IMU body trajectory: a gentle lead-in whose
    acceleration changes < 0.5 m/s^2 between frames (must be rejected by
    the excitation gate), then a vigorous shake + drift."""
    g = np.array([0.0, 0.0, -pre.GRAVITY])
    dt = 1.0 / hz
    per_frame = int(hz / FPS)
    R, v, p = np.eye(3), np.zeros(3), np.zeros(3)
    R_cw, t_cw, imu_packets = [], [], []
    t_abs = 0.0
    t_shake = N_GENTLE / FPS
    for f in range(n_frames):
        R_cw.append(R.T.copy())
        t_cw.append((-R.T @ p).copy())
        rows = []
        for k in range(per_frame):
            t = t_abs + k * dt
            if t < t_shake:
                a_w = np.array([0.03 * np.sin(0.8 * t), 0.02, 0.0])
                w_b = np.array([0.01, 0.015, 0.01])
            else:
                ts = t - t_shake
                a_w = np.array(
                    [2.5 * np.sin(12.0 * ts) + 0.5,
                     1.8 * np.cos(9.0 * ts),
                     0.9 * np.sin(7.0 * ts)]
                )
                w_b = np.array(
                    [0.05 * np.sin(0.7 * ts), 0.06 * np.cos(0.9 * ts), 0.04]
                )
            a_b = R.T @ (a_w - g)
            rows.append(np.concatenate([[t + dt], w_b, a_b]))
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.array(lie.so3_exp(jnp.asarray(w_b * dt)))
        t_abs += per_frame * dt
        imu_packets.append(np.array(rows))
    return np.stack(R_cw), np.stack(t_cw), imu_packets


def _cfg(sensor):
    return trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor=sensor, bf=350.0 * BASELINE,
        th_depth=20.0, orb=orb_mod.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=3,
        deterministic_mapping=True,
    )


def _run(sensor, scene, R_gt, t_gt, imu_packets):
    t = trk.Tracker(_cfg(sensor))
    n = len(R_gt)
    for i in range(n):
        if sensor.startswith("stereo"):
            left, right = scene.render_stereo(R_gt[i], t_gt[i], BASELINE)
            t.process(left, (i + 1) / FPS, img_right=right,
                      imu=imu_packets[i])
        else:
            img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
            t.process(img, (i + 1) / FPS, depth_map=depth,
                      imu=imu_packets[i])
        if i == N_GENTLE - 2:
            # excitation gate: no map may exist yet (Tracking.cc:2347)
            assert t.state == trk.NOT_INITIALIZED, (
                "map anchored without accelerometer excitation"
            )
    return t


def _check(t, R_gt, t_gt, n):
    ts, R, tt, ok = t.poses()
    assert ok.sum() >= 0.6 * n, f"tracked {ok.sum()}/{n}"
    assert t.imu.initialized, "IMU never initialized"
    assert not t.imu.bad
    est_c = evaluate.camera_centers(R[ok], tt[ok])
    gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    # depth fixes the scale: NO scale alignment allowed
    rmse, _, s_fit = evaluate.ate_rmse(
        ts[ok], est_c, ts[ok], gt_c, with_scale=False
    )
    assert rmse < 0.25, f"{t.cfg.sensor} ATE {rmse:.3f}"
    from orb_slam3_tpu.atlas import invariants

    v = invariants.check_all(t.map)
    assert not v, v


def test_stereo_inertial_end_to_end():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=8)
    n = 36
    R_gt, t_gt, imu_packets = vi_depth_trajectory(n)
    t = _run("stereo-imu", scene, R_gt, t_gt, imu_packets)
    _check(t, R_gt, t_gt, n)


def test_rgbd_inertial_end_to_end():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=9)
    n = 36
    R_gt, t_gt, imu_packets = vi_depth_trajectory(n)
    t = _run("rgbd-imu", scene, R_gt, t_gt, imu_packets)
    _check(t, R_gt, t_gt, n)
