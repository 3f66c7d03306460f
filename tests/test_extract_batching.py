"""extract() hoists orientation + descriptors out of the per-level loop
(one batched pass over all levels' patches); it must stay row-for-row
identical to the fully sequential per-level formulation (extract_level)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_tpu.frontend import fast as fast_mod
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.frontend import pyramid as pyr_mod
from orb_slam3_tpu.frontend import select as select_mod


def synth_image(seed=0, h=240, w=320, n_blobs=150):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(n_blobs):
        x, y = rng.integers(10, w - 10), rng.integers(10, h - 10)
        sz = rng.integers(3, 12)
        img[y : y + sz, x : x + sz] = rng.uniform(50, 255)
    return img


def test_batched_extract_equals_sequential():
    cfg = orb_mod.OrbConfig(n_features=400, n_levels=4)
    img = jnp.asarray(synth_image())
    feats = orb_mod.extract(img, cfg)

    levels = pyr_mod.build_pyramid(
        img.astype(jnp.float32), cfg.n_levels, cfg.scale_factor
    )
    budgets = cfg.features_per_level()
    off = 0
    for lvl, (lv, n_lvl) in enumerate(zip(levels, budgets)):
        xy, score, ang, desc, valid = orb_mod.extract_level(lv, n_lvl, cfg)
        n_seq = xy.shape[0]  # sequential path may cap below n_lvl
        n_cmp = min(n_lvl, n_seq)
        sl = slice(off, off + n_cmp)
        scale = cfg.scale_factor ** lvl
        np.testing.assert_allclose(
            np.array(feats.xy[sl]), np.array(xy[:n_cmp] * scale), atol=1e-4
        )
        np.testing.assert_array_equal(
            np.array(feats.valid[sl]), np.array(valid[:n_cmp])
        )
        # descriptors/angles identical on valid rows (invalid rows hold
        # patches from clipped/bogus coords and are never consumed)
        v = np.array(valid[:n_cmp])
        np.testing.assert_array_equal(
            np.array(feats.descriptors[sl])[v], np.array(desc[:n_cmp])[v]
        )
        np.testing.assert_allclose(
            np.array(feats.angle[sl])[v], np.array(ang[:n_cmp])[v], atol=1e-5
        )
        assert bool(jnp.all(feats.octave[sl] == lvl))
        off += n_lvl
    assert off == feats.xy.shape[0]
