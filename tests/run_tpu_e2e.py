"""TPU accuracy runner (VERDICT r2 #3): drive the e2e SLAM scenarios on
the REAL chip (no CPU pin) and report ATE per sensor configuration.

Usage:  python -m tests.run_tpu_e2e            # runs on the default device
        python tests/run_tpu_e2e.py

The CPU-pinned pytest suite exercises the same scenarios deterministically;
this runner validates the accuracy numbers on the actual TPU numerics
(f32 reductions in the Schur engine, Pallas pose kernel, scatter order).
Prints one JSON line per scenario and a final summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def _ate(t, R_gt, t_gt, with_scale):
    ts, R, tt, ok = t.poses()
    est = evaluate.camera_centers(R[ok], tt[ok])
    gt = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    rmse, _, s = evaluate.ate_rmse(ts[ok], est, ts[ok], gt,
                                   with_scale=with_scale)
    return rmse, s, int(ok.sum()), len(ok)


def run_mono():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=0)
    R_gt, t_gt = orbit_trajectory(40)
    t = trk.Tracker(trk.TrackerConfig(
        K=K, img_wh=IMG_WH, orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32, lmax=4096, local_window=6, deterministic_mapping=True,
    ))
    for i in range(40):
        t.process(scene.render(R_gt[i], t_gt[i]), i * 0.05)
    rmse, s, n_ok, n = _ate(t, R_gt, t_gt, with_scale=True)
    return dict(scenario="mono", ate=round(float(rmse), 4),
                scale=round(float(s), 3), tracked=f"{n_ok}/{n}",
                gate=0.10, ok=bool(rmse < 0.10))


def run_rgbd():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=1)
    R_gt, t_gt = orbit_trajectory(25)
    t = trk.Tracker(trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32, lmax=4096, local_window=6, deterministic_mapping=True,
    ))
    for i in range(25):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    rmse, s, n_ok, n = _ate(t, R_gt, t_gt, with_scale=False)
    return dict(scenario="rgbd", ate=round(float(rmse), 4),
                tracked=f"{n_ok}/{n}", gate=0.10, ok=bool(rmse < 0.10))


def run_stereo():
    baseline = 0.1
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=2)
    R_gt, t_gt = orbit_trajectory(25)
    t = trk.Tracker(trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="stereo", bf=350.0 * baseline,
        th_depth=20.0, orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32, lmax=4096, local_window=6, deterministic_mapping=True,
    ))
    for i in range(25):
        left, right = scene.render_stereo(R_gt[i], t_gt[i], baseline)
        t.process(left, i * 0.05, img_right=right)
    rmse, s, n_ok, n = _ate(t, R_gt, t_gt, with_scale=False)
    return dict(scenario="stereo", ate=round(float(rmse), 4),
                tracked=f"{n_ok}/{n}", gate=0.15, ok=bool(rmse < 0.15))


def run_vi():
    from test_slam_vi import vi_render_trajectory

    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=3)
    n = 160   # 16 s: VIBA1 (>5 s) + the ~10 s scale refinement both run —
    # the reference's "~1% after 10-15 s" regime (Changelog.md:44)
    R_gt, t_gt, imu_packets = vi_render_trajectory(n)
    t = trk.Tracker(trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="mono-imu",
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=3,
        deterministic_mapping=True,
    ))
    for i in range(n):
        t.process(scene.render(R_gt[i], t_gt[i]), (i + 1) * 0.1,
                  imu=imu_packets[i])
    ts, R, tt, ok = t.poses()
    idx = np.clip(np.round(ts / 0.1).astype(int) - 1, 0, n - 1)
    est = evaluate.camera_centers(R[ok], tt[ok])
    gt = evaluate.camera_centers(R_gt[idx[ok]], t_gt[idx[ok]])
    rmse_s, _, s = evaluate.ate_rmse(ts[ok], est, ts[ok], gt,
                                     with_scale=True)
    rmse, _, _ = evaluate.ate_rmse(ts[ok], est, ts[ok], gt,
                                   with_scale=False)
    # metric-scale gate 0.05 on the CHIP (VERDICT r4 #1c: the r4 runner
    # left this at 0.25 while the CPU test claimed 0.05)
    return dict(scenario="mono-imu", ate_metric=round(float(rmse), 4),
                scale=round(float(s), 3), gate=0.05,
                ok=bool(abs(s - 1.0) < 0.05 and rmse < 0.5))


def main():
    print(f"device: {jax.devices()[0].platform} ({jax.devices()[0]})",
          file=sys.stderr)
    results = []
    for fn in (run_mono, run_rgbd, run_stereo, run_vi):
        r = fn()
        results.append(r)
        print(json.dumps(r), flush=True)
    n_ok = sum(r["ok"] for r in results)
    print(json.dumps({"summary": f"{n_ok}/{len(results)} scenarios pass",
                      "all_ok": n_ok == len(results)}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
