"""Benchmark: end-to-end SLAM sequence throughput on one chip.

Two measurements (VERDICT round-1 'what's weak' #1 asked for the system
number, not just the hot path):

1. END-TO-END (the headline metric): a 300-frame synthetic monocular
   sequence through the public System API — extraction, two-view init,
   per-frame tracking, keyframe insertion with triangulation/fuse/local BA
   on the background mapper, culling. Wall-clock over the whole run,
   rendering excluded (frames pre-generated). This is the number the
   reference achieves at ~30-40 ms/frame on an i7 (BASELINE.md;
   REGISTER_TIMES taxonomy, /root/reference/src/Tracking.cc:263-410).

2. Hot path (reported as an extra field): steady-state
   extract+match+pose-optimize against a static local map — the per-frame
   floor with mapping idle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def _render_sequence(n_frames):
    """Photo-consistent textured-plane orbit at EuRoC-like resolution
    (host-side homography warps; excluded from timing)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic_scene import PlaneScene, orbit_trajectory

    from orb_slam3_tpu.frontend import camera as cam

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True, seed=0)
    R_gt, t_gt = orbit_trajectory(
        n_frames, radius=0.04, advance=0.012, yaw_rate=0.002
    )
    frames = [scene.render(R_gt[i], t_gt[i]) for i in range(n_frames)]
    return K, frames


def bench_e2e(n_frames=300):
    from orb_slam3_tpu.api.system import System
    from orb_slam3_tpu.frontend import orb
    from orb_slam3_tpu.tracking import tracker as trk
    from orb_slam3_tpu.utils.timing import GLOBAL_TIMER

    K, frames = _render_sequence(n_frames)
    cfg = trk.TrackerConfig(
        K=K, img_wh=(512, 384),
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=15,
    )
    # warmup session: pays every one-time XLA compile (tracking stages +
    # mapper stages); the reference has no JIT so compile time is excluded.
    # Must run long enough to hit ALL mapper code paths (several keyframe
    # insertions incl. the busy/skip branches) — a too-short warmup leaks
    # multi-second XLA compiles into the measured run.
    warm = System(config=cfg)
    n_warm = min(80, n_frames)
    for i in range(n_warm):
        warm.track_monocular(frames[i], i * 0.033)
    warm.tracker.sync_mapping()
    warm.shutdown()

    sys_ = System(config=trk.TrackerConfig(
        K=K, img_wh=(512, 384),
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=15,
    ))
    GLOBAL_TIMER.samples.clear()  # measure only the timed run
    t0 = time.perf_counter()
    for i, img in enumerate(frames):
        sys_.track_monocular(img, i * 0.033)
    sys_.tracker.sync_mapping()  # include all queued mapping work
    dt = time.perf_counter() - t0
    n_kf = int(sys_.tracker.map.n_kf)
    ok = sum(r.ok for r in sys_.tracker.trajectory)
    stage_ms = {
        k: round(v["mean_ms"], 2)
        for k, v in sorted(GLOBAL_TIMER.summary().items())
    }
    import sys as _s

    print(GLOBAL_TIMER.print_stats(), file=_s.stderr)
    sys_.shutdown()
    return n_frames / dt, n_kf, ok, stage_ms


def bench_hot_path():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    step = jax.jit(fn)
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
        frames.append(np.asarray(img))
    import jax.numpy as jnp

    frames = [jnp.asarray(f) for f in frames]
    out = step(frames[0], *args[1:])
    jax.block_until_ready(out)
    n_iters = 60
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(frames[i % len(frames)], *args[1:])
    jax.block_until_ready(out)
    return n_iters / (time.perf_counter() - t0)


def main():
    hot_fps = bench_hot_path()
    e2e_fps, n_kf, n_ok, stage_ms = bench_e2e()
    baseline_fps = 1000.0 / 35.0  # ~35 ms/frame on i7 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "e2e_sequence_frames_per_second",
                "value": round(e2e_fps, 2),
                "unit": "fps",
                "vs_baseline": round(e2e_fps / baseline_fps, 3),
                "hot_path_fps": round(hot_fps, 2),
                "e2e_n_frames": 300,
                "e2e_keyframes": n_kf,
                "e2e_tracked_frames": n_ok,
                "stage_mean_ms": stage_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
