"""Native frame loader, keyframe culling, timing harness, KB8 camera."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import cv2
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.mapping import local_mapper
from orb_slam3_tpu.utils import timing
from orb_slam3_tpu.utils.frameloader import FrameLoader


def test_frameloader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    # also a jpeg (lossy - just shape check) and a pgm
    pj = str(tmp_path / "j.jpg")
    cv2.imwrite(pj, imgs[0])
    paths.append(pj)
    pp = str(tmp_path / "p.pgm")
    cv2.imwrite(pp, imgs[1])
    paths.append(pp)

    loader = FrameLoader(paths, n_threads=2, queue_depth=3)
    out = list(loader)
    assert len(out) == 8
    for i in range(6):
        np.testing.assert_array_equal(out[i].astype(np.uint8), imgs[i])
    assert out[6].shape == (48, 64)
    np.testing.assert_array_equal(out[7].astype(np.uint8), imgs[1])
    loader.close()


def test_kb8_project_unproject_roundtrip():
    K8 = cam.make_kb8(280.0, 280.0, 320.0, 240.0, 0.02, -0.01, 0.005, -0.002)
    rng = np.random.default_rng(1)
    X = np.stack(
        [rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(1, 8, 200)],
        -1,
    ).astype(np.float32)
    uv = cam.kb8_project(K8, jnp.asarray(X))
    rays = cam.kb8_unproject(K8, uv)
    # rays at z=1 must match direction of X
    np.testing.assert_allclose(
        np.array(rays[:, :2]) * X[:, 2:3], X[:, :2], rtol=1e-3, atol=1e-3
    )


def test_keyframe_culling():
    from orb_slam3_tpu.atlas import ops as atlas_ops, state as atlas_state

    s = atlas_state.empty(kmax=16, fmax=64, lmax=256)
    rng = np.random.default_rng(2)
    # 6 KFs all observing the SAME 50 landmarks -> middle ones redundant
    lm_rows = jnp.arange(50, dtype=jnp.int32)
    for k in range(6):
        feat_lm = jnp.full((64,), -1, jnp.int32).at[jnp.arange(50)].set(lm_rows)
        s, _ = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.asarray([0.1 * k, 0, 0]), float(k),
            jnp.asarray(rng.random((64, 2)) * 100, jnp.float32),
            jnp.zeros(64, jnp.int32), jnp.zeros(64),
            jnp.asarray(rng.integers(0, 256, (64, 32)), jnp.uint8),
            jnp.ones(64, bool), feat_lm=feat_lm,
        )
    s = s.__class__(**{**s.__dict__, "lm_valid": s.lm_valid.at[:50].set(True)})
    window = jnp.arange(6, dtype=jnp.int32)
    s2 = local_mapper.cull_keyframes(s, window)
    killed = ~np.array(s2.kf_valid[:6])
    assert killed.any(), "no redundant keyframe culled"
    # first two and last two protected
    assert not killed[0] and not killed[1]
    assert not killed[4] and not killed[5]
    # killed KFs have no bound features left
    for k in np.nonzero(killed)[0]:
        assert int((np.array(s2.kf_feat_lm[k]) >= 0).sum()) == 0


def test_stage_timer():
    t = timing.StageTimer()
    with t.stage("orb_extract"):
        x = sum(range(1000))
    with t.stage("orb_extract"):
        x = sum(range(1000))
    with t.stage("pose_opt"):
        pass
    rep = t.print_stats()
    assert "orb_extract" in rep and "pose_opt" in rep
    assert t.summary()["orb_extract"]["n"] == 2
