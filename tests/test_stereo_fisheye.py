"""Non-rectified (KB8 fisheye) stereo: descriptor matching + direct
two-view triangulation must recover metric depths
(Frame::ComputeStereoFishEyeMatches + KannalaBrandt8::TriangulateMatches)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import stereo
from orb_slam3_tpu.ops import lie

# TUM-VI-like fisheye calibration (512x512)
K_L = cam.make_kb8(190.98, 190.97, 254.93, 256.90,
                   0.00348, 0.000715, -0.00205, 0.000841)
K_R = cam.make_kb8(190.44, 190.44, 252.59, 254.99,
                   0.00340, 0.000772, -0.00213, 0.000870)


def test_fisheye_stereo_depth_recovery():
    rng = np.random.default_rng(0)
    N = 200
    # points in the left camera frame, spread across the fisheye FOV
    theta = rng.uniform(0, 0.9, N)          # up to ~50 deg off-axis
    phi = rng.uniform(0, 2 * np.pi, N)
    z = rng.uniform(1.0, 6.0, N)
    r = z * np.tan(theta)
    X_l = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)

    # right camera 11 cm to the left-cam's right, slight rotation
    R_rl = np.array(lie.so3_exp(jnp.asarray([0.004, -0.01, 0.002])))
    t_rl = np.array([-0.11, 0.0005, -0.001])
    X_r = X_l @ R_rl.T + t_rl

    uv_l = np.array(cam.kb8_project(K_L, jnp.asarray(X_l, jnp.float32)))
    uv_r = np.array(cam.kb8_project(K_R, jnp.asarray(X_r, jnp.float32)))
    in_l = (uv_l > 5).all(1) & (uv_l < 507).all(1)
    in_r = (uv_r > 5).all(1) & (uv_r < 507).all(1)
    keep = in_l & in_r & (X_r[:, 2] > 0.2)

    # identical descriptors for true pairs; decoys are random
    desc = rng.integers(0, 256, (N, 32), dtype=np.uint8)
    uv_l += 0.2 * rng.standard_normal((N, 2))
    uv_r += 0.2 * rng.standard_normal((N, 2))

    depth, good = stereo.match_stereo_fisheye(
        cam.KB8, K_L, K_R, jnp.asarray(R_rl, jnp.float32),
        jnp.asarray(t_rl, jnp.float32),
        jnp.asarray(uv_l, jnp.float32), jnp.asarray(desc),
        jnp.asarray(keep),
        jnp.asarray(uv_r, jnp.float32), jnp.asarray(desc),
        jnp.asarray(keep),
    )
    depth = np.array(depth)
    good = np.array(good)
    # the cos-parallax gate (0.9998, like KannalaBrandt8::TriangulateMatches)
    # correctly drops far points: with an 11 cm baseline only z < ~3.5 m has
    # enough parallax — those must nearly all triangulate
    near = keep & (X_l[:, 2] < 3.0)
    assert near.sum() > 40
    assert good[near].mean() > 0.9, good[near].mean()
    # 0.2 px noise at 190 px focal / 11 cm baseline / ~2.5 m depth gives
    # ~3% depth sigma — gate at 2x that
    rel = np.abs(depth[good] - X_l[good, 2]) / X_l[good, 2]
    assert np.median(rel) < 0.06, np.median(rel)
    assert rel.mean() < 0.15, rel.mean()
    # invalid rows must not produce depth
    assert not good[~keep].any()
