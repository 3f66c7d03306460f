"""API-layer tests: settings ingestion of a reference-format YAML,
checkpoint round-trip, trajectory export formats, System facade."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_tpu.api import checkpoint, settings as settings_mod, system, trajectory
from orb_slam3_tpu.atlas import ops as atlas_ops, state as atlas_state
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.ops import lie
from orb_slam3_tpu.place import vocab


EUROC_YAML = """%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Stereo.ThDepth: 35.0
Stereo.b: 0.0110074
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0000e-3
IMU.GyroWalk: 1.9393e-05
IMU.AccWalk: 3.0000e-03
IMU.Frequency: 200.0
IMU.T_b_c1: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
         0.0, 0.0, 0.0, 1.0]
ORBextractor.nFeatures: 1250
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_settings_ingests_reference_yaml(tmp_path):
    p = tmp_path / "EuRoC.yaml"
    p.write_text(EUROC_YAML)
    s = settings_mod.load_settings(str(p), sensor="mono")
    assert abs(s.K[0] - 458.654) < 1e-3
    assert s.width == 752 and s.height == 480
    assert s.n_features == 1250
    assert abs(s.noise_gyro - 1.7e-4) < 1e-9
    assert s.Tbc.shape == (4, 4)
    assert abs(s.Tbc[0, 1] + 0.999880929698) < 1e-6
    assert abs(s.bf - 0.0110074 * 458.654) < 1e-3
    cfg = settings_mod.to_tracker_config(s)
    assert cfg.orb.n_features == 1250


def test_checkpoint_roundtrip(tmp_path):
    s = atlas_state.empty(kmax=8, fmax=32, lmax=64)
    rng = np.random.default_rng(0)
    feats_xy = jnp.asarray(rng.random((32, 2)) * 100, jnp.float32)
    s, kf = atlas_ops.add_keyframe(
        s, jnp.eye(3), jnp.ones(3), 1.5, feats_xy,
        jnp.zeros(32, jnp.int32), jnp.zeros(32),
        jnp.asarray(rng.integers(0, 256, (32, 32)), jnp.uint8),
        jnp.ones(32, bool),
    )
    voc = vocab.train(rng.integers(0, 256, (500, 32), dtype=np.uint8), 4, 2)
    path = str(tmp_path / "atlas.npz")
    checkpoint.save_atlas(path, s, voc)
    s2, extra = checkpoint.load_atlas(path, voc)
    assert int(s2.n_kf) == 1
    np.testing.assert_array_equal(np.array(s2.kf_t[0]), np.ones(3))
    np.testing.assert_array_equal(
        np.array(s2.kf_feat_desc), np.array(s.kf_feat_desc)
    )
    # checksum guard fires on a different vocabulary
    voc2 = vocab.train(rng.integers(0, 256, (500, 32), dtype=np.uint8), 4, 2, seed=9)
    with pytest.raises(ValueError):
        checkpoint.load_atlas(path, voc2)


def test_trajectory_formats(tmp_path):
    n = 5
    ts = np.arange(n) * 0.1
    R = np.stack([np.array(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.1 * i]))) for i in range(n)])
    t = np.stack([np.array([0.1 * i, 0.0, 0.0]) for i in range(n)])
    ok = np.ones(n, bool)
    ok[2] = False

    p_tum = str(tmp_path / "t.txt")
    trajectory.save_tum(p_tum, ts, R, t, ok)
    ts2, pos, quat = trajectory.load_tum(p_tum)
    assert len(ts2) == 4  # frame 2 skipped
    # centers = -R^T t
    np.testing.assert_allclose(
        pos[1], -R[1].T @ t[1], atol=1e-5
    )

    trajectory.save_euroc(str(tmp_path / "e.txt"), ts, R, t, ok)
    line = open(tmp_path / "e.txt").readline().split()
    assert len(line) == 8 and int(line[0]) == 0

    trajectory.save_kitti(str(tmp_path / "k.txt"), ts, R, t, ok)
    vals = [float(x) for x in open(tmp_path / "k.txt").readline().split()]
    assert len(vals) == 12


def test_trajectory_body_frame_export(tmp_path):
    """Inertial export is in the IMU BODY frame: Twb = Twc o Tcb
    (System::SaveTrajectoryEuRoC, System.cc:662-882). A camera-frame
    export would be off by exactly the extrinsics."""
    n = 4
    ts = np.arange(n) * 0.1
    R = np.stack([np.array(lie.so3_exp(jnp.asarray([0.05 * i, 0.0, 0.2 * i])))
                  for i in range(n)])
    t = np.stack([np.array([0.1 * i, 0.02 * i, 0.0]) for i in range(n)])
    Tbc = np.eye(4, dtype=np.float32)
    Tbc[:3, :3] = np.array(lie.so3_exp(jnp.asarray([0.0, 0.3, 0.0])))
    Tbc[:3, 3] = [0.1, -0.02, 0.05]

    p = str(tmp_path / "b.txt")
    trajectory.save_euroc(p, ts, R, t, Tbc=Tbc)
    rows = [line.split() for line in open(p)]
    pos = np.array([[float(x) for x in r[1:4]] for r in rows])
    # expected body position: center of T_bw = Tbc o Tcw
    for i in range(n):
        R_bw = Tbc[:3, :3] @ R[i]
        t_bw = Tbc[:3, :3] @ t[i] + Tbc[:3, 3]
        c_b = -R_bw.T @ t_bw
        np.testing.assert_allclose(pos[i], c_b, atol=1e-5)
    # and it differs from the camera-frame export by the extrinsics
    p2 = str(tmp_path / "c.txt")
    trajectory.save_euroc(p2, ts, R, t)
    rows2 = [line.split() for line in open(p2)]
    pos2 = np.array([[float(x) for x in r[1:4]] for r in rows2])
    assert np.abs(pos - pos2).max() > 0.01


def test_system_facade_runs(tmp_path):
    from synthetic_scene import PlaneScene, orbit_trajectory
    from orb_slam3_tpu.frontend import orb as orb_mod
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384), sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=500, n_levels=3),
        kmax=16, lmax=2048, local_window=4,
        deterministic_mapping=True,
    )
    sys_ = system.System(config=cfg)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), seed=9)
    R_gt, t_gt = orbit_trajectory(8)
    for i in range(8):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        pose = sys_.track_rgbd(img, depth, i * 0.05)
    assert pose is not None
    assert sys_.tracking_state() == trk.OK
    sys_.save_trajectory_tum(str(tmp_path / "traj.txt"))
    assert os.path.getsize(tmp_path / "traj.txt") > 0
    sys_.save_keyframe_trajectory_tum(str(tmp_path / "kf.txt"))
    sys_.save_atlas(str(tmp_path / "atlas.npz"))
    assert os.path.getsize(tmp_path / "atlas.npz") > 0


def test_change_dataset_and_timestamp_jump(tmp_path):
    """Multi-sequence support: System::ChangeDataset forces a new Atlas map;
    a >1 s timestamp jump on an inertial run does the same automatically
    (Tracking.cc:1818-1855)."""
    from synthetic_scene import PlaneScene, orbit_trajectory
    from orb_slam3_tpu.frontend import orb as orb_mod
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384), sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=500, n_levels=3),
        kmax=16, lmax=2048, local_window=4,
        deterministic_mapping=True,
    )
    sys_ = system.System(config=cfg)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), seed=9)
    R_gt, t_gt = orbit_trajectory(8)
    for i in range(4):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        sys_.track_rgbd(img, depth, i * 0.05)
    map0 = int(sys_.tracker.map.active_map)
    sys_.change_dataset()
    assert sys_.tracker.state == trk.NOT_INITIALIZED
    for i in range(4):
        img, depth = scene.render_with_depth(R_gt[i + 4], t_gt[i + 4])
        sys_.track_rgbd(img, depth, 100.0 + i * 0.05)
    assert int(sys_.tracker.map.active_map) == map0 + 1
    assert sys_.tracking_state() == trk.OK
    # debug-data export is well-formed even with no inertial events
    sys_.save_debug_data(str(tmp_path / "debug.txt"))
    assert os.path.getsize(tmp_path / "debug.txt") > 0
    sys_.shutdown()


def test_settings_resize_scales_calibration(tmp_path):
    """Camera.newWidth/newHeight (Settings.cc:384-409): calibration scales
    by the per-axis factors and System resizes frames before tracking."""
    s = settings_mod.load_settings(
        "/root/reference/Examples/Monocular/EuRoC.yaml", "mono")
    assert s.resize_wh == (600, 350)
    assert abs(float(s.K[0]) - 458.654 * 600 / 752) < 1e-3
    assert abs(float(s.K[1]) - 457.296 * 350 / 480) < 1e-3
    sys_ = system.System(
        settings_path="/root/reference/Examples/Monocular/EuRoC.yaml",
        sensor="mono")
    img = np.random.default_rng(0).uniform(0, 255, (480, 752))
    sys_.track_monocular(img, 0.05)   # runs through the resize path
    assert sys_.tracker.cfg.img_wh == (600, 350)


def test_live_viewer_serves_map_and_stats():
    """Live HTTP viewer (the Viewer-thread role, Viewer.cc:162): serves
    stats, the top-down map render, and the frame overlay while a session
    runs; localization-mode command works."""
    import json as json_mod
    import urllib.request

    from synthetic_scene import PlaneScene, orbit_trajectory
    from orb_slam3_tpu.frontend import orb as orb_mod
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384), sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=400, n_levels=3),
        kmax=16, lmax=2048, local_window=4, deterministic_mapping=True,
    )
    sys_ = system.System(config=cfg)
    viewer = sys_.start_viewer(port=0)  # ephemeral port
    scene = PlaneScene(np.array(K), img_wh=(512, 384), seed=11)
    R_gt, t_gt = orbit_trajectory(6)
    for i in range(6):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        sys_.track_rgbd(img, depth, i * 0.05)
    base = f"http://127.0.0.1:{viewer.port}"
    stats = json_mod.loads(urllib.request.urlopen(base + "/stats.json",
                                                  timeout=10).read())
    assert stats["state"] == "OK" and stats["n_keyframes"] >= 1
    png = urllib.request.urlopen(base + "/map.png", timeout=30).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    frame = urllib.request.urlopen(base + "/frame.png", timeout=30).read()
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    urllib.request.urlopen(base + "/cmd?localization=1", timeout=10).read()
    assert sys_.localization_only
    page = urllib.request.urlopen(base, timeout=10).read()
    assert b"live session" in page
    # interactive 3D viewer endpoint (MapDrawer role, MapDrawer.cc:135-447)
    html3d = urllib.request.urlopen(base + "/map3d", timeout=30).read()
    assert b"kf_centers" in html3d and b"orbit" in html3d
    sys_.shutdown()


def test_save_map_3d(tmp_path):
    """Offline interactive 3D map export: self-contained HTML whose
    embedded scene has the live map's landmarks/keyframes/trajectory."""
    import json as json_mod
    import re

    from synthetic_scene import PlaneScene, orbit_trajectory
    from orb_slam3_tpu.frontend import orb as orb_mod
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384), sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=400, n_levels=3),
        kmax=16, lmax=2048, local_window=4, deterministic_mapping=True,
    )
    sys_ = system.System(config=cfg)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), seed=11)
    R_gt, t_gt = orbit_trajectory(6)
    for i in range(6):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        sys_.track_rgbd(img, depth, i * 0.05)
    path = str(tmp_path / "map.html")
    sys_.save_map_3d(path)
    html = open(path).read()
    m = re.search(r'<script id="scene" type="application/json">(.*?)</script>',
                  html, re.S)
    assert m, "embedded scene JSON missing"
    scene_js = json_mod.loads(m.group(1))
    assert len(scene_js["points"]) > 50
    assert len(scene_js["kf_centers"]) >= 1
    assert len(scene_js["kf_rot"]) == len(scene_js["kf_centers"])
    assert len(scene_js["trajectory"]) >= 5
    sys_.shutdown()
