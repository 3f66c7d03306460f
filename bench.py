"""Benchmark: visual tracking pipeline throughput on one chip.

Measures the per-frame hot path (SURVEY.md §3.2: ORB pyramid extraction +
local-map projection matching + motion-only pose optimization) in steady
state on synthetic 752x480 frames (EuRoC resolution) against a 2048-landmark
local map — the shapes the reference runs at 30 Hz on an i7.

Baseline: ORB-SLAM3 tracking ~30-40 ms/frame on an i7-class CPU
(BASELINE.md; TRO-2021 paper timings). vs_baseline = baseline_fps / our_fps
inverted: values > 1 mean we are faster than the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, args = ge.entry()
    step = jax.jit(fn)

    # pre-generate a few distinct synthetic frames (host side, excluded)
    rng = np.random.default_rng(1)
    frames = []
    base = np.zeros((480, 752), np.float32)
    for i in range(8):
        img = base.copy()
        xs = rng.integers(10, 740, 2500)
        ys = rng.integers(10, 470, 2500)
        w = rng.integers(3, 10, 2500)
        v = rng.uniform(40, 255, 2500)
        for x, y, ww, vv in zip(xs, ys, w, v):
            img[y : y + ww, x : x + ww] = vv
        frames.append(jnp.asarray(img))

    # warmup / compile
    out = step(frames[0], *args[1:])
    jax.block_until_ready(out)

    n_iters = 60
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(frames[i % len(frames)], *args[1:])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    fps = 1.0 / dt
    baseline_fps = 1000.0 / 35.0  # ~35 ms/frame on i7 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "tracking_frames_per_second",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
