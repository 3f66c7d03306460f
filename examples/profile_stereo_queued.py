"""True device throughput of each stereo per-frame program: capture the
real in-session arguments, then time each program with a queued loop
(amortizes the ~25 ms serialized completion-notification artifact)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import bench
from orb_slam3_tpu.api.system import System
from orb_slam3_tpu.tracking import tracker as trk_mod
from orb_slam3_tpu.tracking import track as track_mod
from orb_slam3_tpu.frontend import stereo as stereo_mod

CAPTURED = {}


def capture(mod, name, min_calls=30):
    fn = getattr(mod, name)

    def wrapper(*a, **k):
        # keep the LAST call's args (steady-state shapes/map fill)
        CAPTURED[name] = (fn, a, k)
        return fn(*a, **k)

    setattr(mod, name, wrapper)


def main():
    n = 80
    K, frames = bench._render_sequence(n, stereo=True)
    cfg = bench._cfg(K, sensor="stereo", bf=35.0, th_depth=20.0)

    for mod, name in [
        (trk_mod, "_extract_features_pair"),
        (trk_mod, "_close_point_census"),
        (track_mod, "track_frame_visual"),
        (stereo_mod, "match_stereo"),
    ]:
        capture(mod, name)

    s = System(config=cfg)
    for i in range(n):
        s.track_stereo(frames[i][0], frames[i][1], i * 0.033)
    s.tracker.sync_mapping()
    s.shutdown()

    total = 0.0
    for name, (fn, a, k) in CAPTURED.items():
        out = fn(*a, **k)
        jax.block_until_ready(out)
        reps = 30
        t0 = time.perf_counter()
        outs = [fn(*a, **k) for _ in range(reps)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / reps * 1000
        total += dt
        print(f"{name:28s} {dt:8.2f} ms/call (queued)")
    print(f"{'SUM':28s} {total:8.2f} ms")


if __name__ == "__main__":
    main()
