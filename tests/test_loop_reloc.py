"""End-to-end relocalization, multi-map creation, and map merging
(configs #4/#5 of BASELINE.md in miniature)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.place import vocab
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def _tracker_with_vocab(scene, sensor="rgbd", kf_max_frames=5):
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor=sensor, bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=kf_max_frames,
        deterministic_mapping=True,
    )
    t = trk.Tracker(cfg)
    # train the vocabulary on scene imagery (offline-vocab stand-in)
    descs = []
    R0, t0 = orbit_trajectory(3)
    for i in range(3):
        f = orb_mod.extract(jnp.asarray(scene.render(R0[i], t0[i])), cfg.orb)
        descs.append(np.array(f.descriptors)[np.array(f.valid)])
    voc = vocab.train(np.concatenate(descs), branching=8, depth=3)
    t.attach_loop_closer(voc)
    return t


def test_relocalization_after_blackout():
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=5)
    n = 14
    R_gt, t_gt = orbit_trajectory(n)
    t = _tracker_with_vocab(scene)
    for i in range(n):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    t.settle()
    assert t.state == trk.OK
    n_kf_before = int(t.map.n_kf)
    assert n_kf_before >= 2

    # blackout: featureless frames until RECENTLY_LOST/LOST
    blank = np.zeros((IMG_WH[1], IMG_WH[0]), np.float32)
    for j in range(3):
        t.process(blank, (n + j) * 0.05, depth_map=np.ones_like(blank))
    t.settle()
    assert t.state in (trk.RECENTLY_LOST, trk.LOST)

    # resume near frame 6's viewpoint -> must relocalize into the SAME map
    img, depth = scene.render_with_depth(R_gt[6], t_gt[6])
    t.process(img, (n + 4) * 0.05, depth_map=depth)
    t.settle()
    assert t.state == trk.OK, f"state={t.state}"
    est_c = evaluate.camera_centers(
        np.array(t.last["R"])[None], np.array(t.last["t"])[None]
    )[0]
    gt_c = evaluate.camera_centers(R_gt[6][None], t_gt[6][None])[0]
    assert np.linalg.norm(est_c - gt_c) < 0.15
    assert int(t.map.n_maps) == 1  # no new map was needed


def test_atlas_resume_relocalizes_into_loaded_map(tmp_path):
    """Save -> reload -> the rebuilt keyframe database lets the resumed
    session merge its fresh map into the loaded one (System::LoadAtlas ->
    Atlas::PostLoad KFDB re-add, /root/reference/src/System.cc:1445-1506;
    resume = localization + extension against prior maps)."""
    from orb_slam3_tpu.api import checkpoint
    from orb_slam3_tpu.api.system import System

    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=7)
    R_gt, t_gt = orbit_trajectory(40, advance=0.05)

    # session 1: build a map over frames 0..19, save the atlas
    t = _tracker_with_vocab(scene, kf_max_frames=2)
    for i in range(20):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    assert t.state == trk.OK
    assert int(t.map.n_kf) >= 8
    voc = t.loop_closer.voc
    path = str(tmp_path / "session1.npz")
    checkpoint.save_atlas(path, t.map, voc)

    # session 2: reload and track through the SAME region
    cfg = t.cfg
    sys2 = System(config=cfg, vocabulary=voc, atlas_path=path)
    t2 = sys2.tracker
    assert int(np.array(t2.loop_closer.db.valid).sum()) >= 8, \
        "KF database was not rebuilt on load"
    merged = False
    for k, i in enumerate(range(2, 40, 2)):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t2.process(img, 100.0 + k * 0.05, depth_map=depth)
        t2.sync_mapping()  # drain the async mapper: deterministic ordering
        if t2.loop_closer.n_merges > 0:
            merged = True
            break
    assert merged, "resumed session never merged into the loaded map"
    ids = np.array(t2.map.kf_map_id)[np.array(t2.map.kf_valid)]
    assert len(np.unique(ids)) == 1


def test_multimap_merge():
    """Lose tracking in unseen territory -> new Atlas map; return to the
    original region -> cross-map merge relabels and aligns the maps."""
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=6)
    R_gt, t_gt = orbit_trajectory(60, advance=0.05)
    t = _tracker_with_vocab(scene, kf_max_frames=2)

    # phase A: frames 0..23 (map A, x in [0, 1.15]) — enough KFs that the
    # Atlas treats map A as mature (>=10 KFs, Tracking.cc:2014-2032)
    for i in range(24):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    assert t.state == trk.OK
    map_a_kfs = int(t.map.n_kf)
    assert map_a_kfs >= 10, map_a_kfs

    # blackout long enough to go LOST and spawn a new map
    blank = np.zeros((IMG_WH[1], IMG_WH[0]), np.float32)
    for j in range(7):
        t.process(blank, (20 + j) * 0.05, depth_map=np.ones_like(blank))
    assert int(t.map.n_maps) == 2, int(t.map.n_maps)

    # phase B: resume far away (frame 40: x=2.0) heading back left
    for k, i in enumerate(range(40, 4, -2)):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, (30 + k) * 0.05, depth_map=depth)
        t.sync_mapping()  # drain the async mapper: deterministic ordering
        if t.loop_closer.n_merges > 0:
            break
    assert t.loop_closer.n_merges >= 1, "maps never merged"
    s = t.map
    # after the merge everything lives in one map id
    ids = np.array(s.kf_map_id)[np.array(s.kf_valid)]
    assert len(np.unique(ids)) == 1
