"""End-to-end monocular SLAM on a synthetic photo-consistent sequence —
the round-1 'minimum end-to-end slice' (SURVEY.md §7.2 step 6)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb
from orb_slam3_tpu.tracking import tracker as trk

from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def run_slam(n_frames=40, two_planes=True, seed=0):
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=two_planes, seed=seed)
    R_gt, t_gt = orbit_trajectory(n_frames)
    cfg = trk.TrackerConfig(
        K=K,
        img_wh=IMG_WH,
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=32,
        lmax=4096,
        local_window=6,
        deterministic_mapping=True,
    )
    t = trk.Tracker(cfg)
    for i in range(n_frames):
        img = scene.render(R_gt[i], t_gt[i])
        t.process(img, i * 0.05)
    return t, R_gt, t_gt


class TestMonoSLAM:
    def test_end_to_end_ate(self):
        t, R_gt, t_gt = run_slam()
        ts, R, tt, ok = t.poses()
        assert t.state == trk.OK
        n_ok = ok.sum()
        assert n_ok >= 0.7 * len(ok), f"only {n_ok}/{len(ok)} frames tracked"

        est_c = evaluate.camera_centers(R[ok], tt[ok])
        gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
        rmse, n, s = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c, with_scale=True)
        # trajectory length ~ 1.4 world units. Round-1 accuracy gate: <25%;
        # the reference-level target (<2%) needs subpixel keypoints + richer
        # covisibility — tracked for round 2.
        assert rmse < 0.35, f"ATE {rmse:.4f} (scale {s:.3f}, {n} frames)"

    def test_map_grows_and_stays_consistent(self):
        t, _, _ = run_slam(n_frames=25)
        s = t.map
        assert int(s.n_kf) >= 3
        n_lm = int((s.lm_valid).sum())
        assert n_lm > 150
        # all observations point at valid landmarks
        lm = np.array(s.kf_feat_lm)
        valid = np.array(s.lm_valid)
        bound = lm[lm >= 0]
        assert valid[bound].mean() > 0.95
        from orb_slam3_tpu.atlas import invariants
        v = invariants.check_all(s)
        assert not v, v
