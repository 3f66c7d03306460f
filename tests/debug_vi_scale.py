"""Debug driver for the mono-inertial scale bias: runs the test scenario
and prints every inertial debug event (init / viba / scale_refine) with the
running scale estimate vs ground truth."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import conftest  # noqa: F401  (CPU pin + cache config)

import numpy as np
import jax.numpy as jnp

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene
from test_slam_vi import K, IMG_WH, vi_render_trajectory


def main(n=60):
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=3)
    R_gt, t_gt, imu_packets = vi_render_trajectory(n)
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="mono-imu",
        orb=orb_mod.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=3,
        deterministic_mapping=True,
    )
    t = trk.Tracker(cfg)
    for i in range(n):
        img = scene.render(R_gt[i], t_gt[i])
        t.process(img, (i + 1) * (1.0 / 10.0), imu=imu_packets[i])
        # per-frame: report scale error vs GT using poses so far
        if t.imu.initialized and (i % 5 == 0 or i == n - 1):
            ts, R, tt, ok = t.poses()
            if ok.sum() > 5:
                est_c = evaluate.camera_centers(R[ok], tt[ok])
                gt_c = evaluate.camera_centers(R_gt[: i + 1][ok[: i + 1]],
                                               t_gt[: i + 1][ok[: i + 1]])
                m = min(len(est_c), len(gt_c))
                _, _, s_fit = evaluate.ate_rmse(
                    ts[ok][:m], est_c[:m], ts[ok][:m], gt_c[:m],
                    with_scale=True)
                print(f"frame {i}: map-vs-gt scale {s_fit:.4f}")

    events = list(t.debug_events)
    if t.async_mapper is not None and t.async_mapper._vi_ctx is not None:
        events += t.async_mapper._vi_ctx.debug_events
    for e in events:
        g = e.get("gravity")
        gs = f" g={np.array2string(np.asarray(g), precision=3)}" if g is not None else ""
        print(f"ts={e['ts']:.2f} {e['event']}: scale={e.get('scale', float('nan')):.4f}"
              f" bg={np.array2string(np.asarray(e.get('bg', np.zeros(3))), precision=4)}"
              f" ba={np.array2string(np.asarray(e.get('ba', np.zeros(3))), precision=4)}{gs}")

    ts, R, tt, ok = t.poses()
    est_c = evaluate.camera_centers(R[ok], tt[ok])
    gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    rmse_s, nm, s_fit = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c,
                                          with_scale=True)
    rmse, _, _ = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c,
                                   with_scale=False)
    print(f"FINAL: tracked {int(ok.sum())}/{n} scale={s_fit:.4f} "
          f"ate_scaled={rmse_s:.4f} ate_metric={rmse:.4f} "
          f"init={t.imu.initialized} viba_stage={t.imu.viba_stage}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
