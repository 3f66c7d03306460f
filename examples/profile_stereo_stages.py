"""Serialize the stereo e2e loop: block after every device program with
the REAL in-session arguments/shapes, to find which program carries the
~50 ms/frame the pipelined run waits on."""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

import bench
from orb_slam3_tpu.api.system import System
from orb_slam3_tpu.tracking import tracker as trk_mod
from orb_slam3_tpu.tracking import track as track_mod
from orb_slam3_tpu.frontend import stereo as stereo_mod
from orb_slam3_tpu.mapping import pipeline as map_pipeline

TIMES = defaultdict(list)


def wrap(mod, name):
    fn = getattr(mod, name)

    def timed(*a, **k):
        jax.block_until_ready(
            [x for x in a if hasattr(x, "block_until_ready")][:1] or [0])
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        TIMES[name].append((time.perf_counter() - t0) * 1e3)
        return out

    setattr(mod, name, timed)


def main():
    n = 60
    K, frames = bench._render_sequence(n, stereo=True)
    cfg = bench._cfg(K, sensor="stereo", bf=35.0, th_depth=20.0)

    # warm
    s = System(config=cfg)
    for i in range(n):
        s.track_stereo(frames[i][0], frames[i][1], i * 0.033)
    s.tracker.sync_mapping()
    s.shutdown()

    for mod, name in [
        (trk_mod, "_extract_features_pair"),
        (trk_mod, "_close_point_census"),
        (track_mod, "track_frame_visual"),
        (stereo_mod, "match_stereo"),
        (map_pipeline, "map_stage_pre"),
        (map_pipeline, "map_stage_post"),
    ]:
        wrap(mod, name)

    s = System(config=cfg)
    for i in range(n):
        s.track_stereo(frames[i][0], frames[i][1], i * 0.033)
    s.tracker.sync_mapping()
    for name, v in sorted(TIMES.items()):
        a = np.array(v[5:] if len(v) > 10 else v)
        print(f"{name:28s} n={len(v):4d} p50 {np.median(a):7.2f} ms  "
              f"mean {a.mean():7.2f}  p95 {np.percentile(a, 95):7.2f}")
    s.shutdown()


if __name__ == "__main__":
    main()
