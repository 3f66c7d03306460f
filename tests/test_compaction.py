"""Arena compaction + growth (SURVEY.md §7.1: compaction replaces the
reference's culling-by-deletion; VERDICT round-1 missing #4). Unit-level
permutation checks plus an end-to-end churn run on a deliberately tiny
arena that must compact (and grow) to survive."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.atlas import invariants
from orb_slam3_tpu.atlas import ops as atlas_ops
from orb_slam3_tpu.atlas import state as atlas_state
from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def _toy_map(n_kf=6, n_lm=16, fmax=16):
    rng = np.random.default_rng(0)
    s = atlas_state.empty(kmax=8, fmax=fmax, lmax=64)
    rows = []
    for k in range(n_kf):
        s, r = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.asarray([0.1 * k, 0, 0]), float(k),
            jnp.asarray(rng.uniform(0, 300, (fmax, 2)), jnp.float32),
            jnp.zeros((fmax,), jnp.int32), jnp.zeros((fmax,)),
            jnp.asarray(rng.integers(0, 255, (fmax, 32)), jnp.uint8),
            jnp.ones((fmax,), bool),
            parent=rows[-1] if rows else None,
            prev=rows[-1] if rows else None,
        )
        rows.append(int(r))
    pos = rng.uniform(-1, 1, (n_lm, 3)).astype(np.float32)
    s, lrows = atlas_ops.add_landmarks(
        s, jnp.asarray(pos),
        jnp.asarray(rng.integers(0, 255, (n_lm, 32)), jnp.uint8),
        jnp.zeros((n_lm,), jnp.int32), jnp.ones((n_lm,), bool),
        jnp.zeros((n_lm,), jnp.int32),
        jnp.arange(n_lm, dtype=jnp.int32),
    )
    return s, rows, np.array(lrows)


def test_compact_permutation_consistency():
    s, kf_rows, lm_rows = _toy_map()
    # cull keyframe 2 (re-parent child 3 to 1) and a block of landmarks
    import dataclasses

    s = dataclasses.replace(
        s,
        kf_valid=s.kf_valid.at[2].set(False),
        kf_parent=s.kf_parent.at[3].set(1),
        kf_prev=s.kf_prev.at[3].set(1),
    )
    kill_rows = jnp.asarray(lm_rows[5:10])
    s = atlas_ops.invalidate_landmarks(
        s, kill_rows, jnp.ones((5,), bool)
    )
    pos_before = np.array(s.lm_pos)
    valid_lm_before = np.array(s.lm_valid)
    ts_before = np.array(s.kf_timestamp)
    valid_kf_before = np.array(s.kf_valid)

    s2, kf_new, lm_new = atlas_ops.compact(s)
    kf_new, lm_new = np.array(kf_new), np.array(lm_new)

    # counters now equal the valid counts; valid rows form a dense prefix
    assert int(s2.n_kf) == valid_kf_before.sum()
    assert int(s2.n_lm) == valid_lm_before.sum()
    assert np.array(s2.kf_valid)[: int(s2.n_kf)].all()
    assert not np.array(s2.kf_valid)[int(s2.n_kf):].any()
    assert np.array(s2.lm_valid)[: int(s2.n_lm)].all()

    # data rides the permutation
    for old in range(8):
        assert np.array(s2.kf_timestamp)[kf_new[old]] == ts_before[old]
    np.testing.assert_allclose(
        np.array(s2.lm_pos)[lm_new], pos_before, rtol=0, atol=0
    )
    # feature->landmark bindings still point at the same landmark data
    fl_old = np.array(s.kf_feat_lm)
    fl_new = np.array(s2.kf_feat_lm)
    for old_kf in range(6):
        nk = kf_new[old_kf]
        for f in range(16):
            o = fl_old[old_kf, f]
            if o >= 0:
                assert fl_new[nk, f] == lm_new[o]
    # graph references remapped
    assert np.array(s2.kf_parent)[kf_new[3]] == kf_new[1]
    assert not invariants.check_all(s2)


def test_e2e_churn_compacts_and_grows():
    """Tiny arena: the sequence cannot fit without reclaiming culled rows
    (and growing once culling alone is not enough). The round-1 behavior
    was a silent clip-clobber of row L-1 (VERDICT missing #4)."""
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=11)
    n = 60
    R_gt, t_gt = orbit_trajectory(n, advance=0.02)
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb.OrbConfig(n_features=400, n_levels=4),
        kmax=16, lmax=2048, local_window=5, kf_max_frames=1,
        async_mapping=False,
    )
    t = trk.Tracker(cfg)
    for i in range(n):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    ts, R, tt, ok = t.poses()
    assert ok.sum() >= 0.8 * n, f"tracked {ok.sum()}/{n}"
    est_c = evaluate.camera_centers(R[ok], tt[ok])
    gt_c = evaluate.camera_centers(R_gt[ok], t_gt[ok])
    rmse, _, _ = evaluate.ate_rmse(ts[ok], est_c, ts[ok], gt_c,
                                   with_scale=False)
    assert rmse < 0.15, f"churn ATE {rmse:.3f}"
    assert not invariants.check_all(t.map)
    # the arena actually cycled: with kmax=16 and a KF every frame, row
    # reuse (or growth) must have happened for 60 frames to fit
    assert int(t.map.n_kf) < 60
