"""Stereo rectification: build_remap/remap_bilinear vs OpenCV's
initUndistortRectifyMap/remap on the reference's legacy EuRoC blocks
(Examples_old/Stereo/EuRoC.yaml:50-81), plus keypoint undistortion wiring
(Frame::UndistortKeyPoints role)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.api import settings as settings_mod
from orb_slam3_tpu.frontend import camera as cam, rectify

EUROC_OLD = "/root/reference/Examples_old/Stereo/EuRoC.yaml"


def test_build_remap_matches_opencv():
    import cv2

    s = settings_mod.load_settings(EUROC_OLD, "stereo")
    for side in (s.rect_left, s.rect_right):
        ours = rectify.build_remap(
            side["K"], side["D"], side["R"], side["P"], s.width, s.height
        )
        mx, my = cv2.initUndistortRectifyMap(
            side["K"], side["D"], side["R"], side["P"][:3, :3],
            (s.width, s.height), cv2.CV_32FC1,
        )
        assert np.abs(ours[..., 0] - mx).max() < 1e-2
        assert np.abs(ours[..., 1] - my).max() < 1e-2


def test_remap_bilinear_matches_opencv():
    import cv2

    s = settings_mod.load_settings(EUROC_OLD, "stereo")
    side = s.rect_left
    m = rectify.build_remap(side["K"], side["D"], side["R"], side["P"],
                            s.width, s.height)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (s.height, s.width)).astype(np.float32)
    ours = np.array(rectify.remap_bilinear(jnp.asarray(img), jnp.asarray(m)))
    ref = cv2.remap(img, m[..., 0], m[..., 1], cv2.INTER_LINEAR)
    # compare where the source sample is interior (border handling differs)
    interior = ((m[..., 0] > 1) & (m[..., 0] < s.width - 2)
                & (m[..., 1] > 1) & (m[..., 1] < s.height - 2))
    assert np.abs(ours - ref)[interior].max() < 0.6


def test_tracker_undistorts_keypoints():
    from orb_slam3_tpu.frontend import orb as orb_mod
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(450.0, 450.0, 376.0, 240.0)
    dist = np.array([-0.28, 0.07, 1e-4, -1e-4, 0.0], np.float32)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(752, 480), sensor="mono",
        orb=orb_mod.OrbConfig(n_features=300, n_levels=2),
        dist_coeffs=dist, kmax=8, lmax=1024,
    )
    t = trk.Tracker(cfg)
    rng = np.random.default_rng(1)
    img = np.zeros((480, 752), np.float32)
    xs = rng.integers(20, 730, 800)
    ys = rng.integers(20, 460, 800)
    for x, y in zip(xs, ys):
        img[y:y + 4, x:x + 4] = rng.uniform(60, 255)
    feats = t._extract(jnp.asarray(img))
    raw = orb_mod.extract(jnp.asarray(img), cfg.orb)
    expected = cam.undistort_points_radtan(K, jnp.asarray(dist), raw.xy)
    v = np.array(feats.valid)
    assert np.abs(np.array(feats.xy) - np.array(expected))[v].max() < 1e-2
    # distortion actually moved the points
    assert np.abs(np.array(raw.xy) - np.array(expected))[v].max() > 1.0
