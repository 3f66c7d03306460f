"""Fused Pallas projection matcher vs the XLA reference formulation.

Must reproduce matching.search_by_projection exactly (same window/octave
gates, TH gate, ratio test — ORBmatcher.cc:43-222). Interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_tpu.frontend import match_kernel, matching


def test_match_kernel_matches_xla():
    rng = np.random.default_rng(7)
    N, M = 300, 250
    uv_pred = jnp.asarray(rng.uniform(0, 640, (N, 2)), jnp.float32)
    kp_xy = jnp.asarray(rng.uniform(0, 640, (M, 2)), jnp.float32)
    pred_desc = jnp.asarray(rng.integers(0, 256, (N, 32)), jnp.uint8)
    # half the keypoints share a landmark descriptor (real matches)
    kp_desc = jnp.asarray(rng.integers(0, 256, (M, 32)), jnp.uint8)
    kp_desc = kp_desc.at[: M // 2].set(pred_desc[: M // 2])
    kp_xy = kp_xy.at[: M // 2].set(
        uv_pred[: M // 2] + jnp.asarray(rng.uniform(-3, 3, (M // 2, 2)), jnp.float32)
    )
    pred_oct = jnp.asarray(rng.integers(0, 4, N), jnp.int32)
    kp_oct = jnp.asarray(rng.integers(0, 4, M), jnp.int32)
    kp_oct = kp_oct.at[: M // 2].set(pred_oct[: M // 2])
    pred_valid = jnp.asarray(rng.uniform(size=N) > 0.1)
    kp_valid = jnp.asarray(rng.uniform(size=M) > 0.1)
    scale_factors = jnp.asarray([1.2 ** i for i in range(4)])
    radius = 10.0 * scale_factors[jnp.clip(pred_oct, 0, 3)]

    m = matching.window_mask(uv_pred, kp_xy, radius, pred_valid, kp_valid)
    m = m & matching.octave_mask(pred_oct, kp_oct, -1, 1)
    dist = matching.hamming_matrix(pred_desc, kp_desc)
    idx_x, d_x, ok_x = matching.masked_best_match(
        dist, m, max_dist=matching.TH_HIGH, ratio=0.8
    )

    with pltpu.force_tpu_interpret_mode():
        idx_p, d_p, ok_p = match_kernel.search_by_projection_pallas(
            uv_pred, pred_oct, pred_desc, pred_valid,
            kp_xy, kp_oct, kp_desc, kp_valid, radius,
            max_dist=matching.TH_HIGH, ratio=0.8, level_lo=-1, level_hi=1,
        )

    assert bool(jnp.all(ok_p == ok_x))
    # idx only meaningful where a match was accepted (ties break equally:
    # both argmin over the same integer distances pick the first minimum)
    assert bool(jnp.all(jnp.where(ok_x, idx_p == idx_x, True)))
    assert bool(jnp.all(jnp.where(ok_x, d_p == d_x, True)))
    assert int(ok_x.sum()) > 50  # the planted matches are found
