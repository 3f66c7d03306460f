"""Per-frame latency decomposition of the stereo e2e loop: where does the
63 ms/frame go when the standalone device stages sum to ~16 ms?"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from orb_slam3_tpu.api.system import System


def run_session(K, frames, cfg, record=False):
    from orb_slam3_tpu.utils.timing import GLOBAL_TIMER

    sys_ = System(config=cfg)
    t = sys_.tracker
    GLOBAL_TIMER.samples.clear()
    rows = []
    t0 = time.perf_counter()
    for i, (l, r) in enumerate(frames):
        f0 = time.perf_counter()
        plen = len(t._pipeline)
        head_ready = None
        if t._pipeline:
            try:
                head_ready = bool(t._pipeline[0]["out"]["scal"].is_ready())
            except AttributeError:
                pass
        sys_.track_stereo(l, r, i * 0.033)
        f1 = time.perf_counter()
        rows.append((i, (f1 - f0) * 1e3, plen, head_ready,
                     t.frames_since_kf == 0))
    t.sync_mapping()
    dt = time.perf_counter() - t0
    fps = len(frames) / dt
    if record:
        print(f"fps {fps:.2f}")
        arr = np.array([r[1] for r in rows[10:]])
        print(f"frame ms p50 {np.median(arr):.1f} p95 "
              f"{np.percentile(arr, 95):.1f} mean {arr.mean():.1f}")
        plens = np.array([r[2] for r in rows[10:]])
        ready = [r[3] for r in rows[10:]]
        print("pipeline len histogram:",
              dict(zip(*np.unique(plens, return_counts=True))))
        print("head_ready fraction:",
              np.mean([x for x in ready if x is not None]))
        slow = [r for r in rows[10:] if r[1] > 40]
        print(f"slow frames (>40ms): {len(slow)} "
              f"kf-frames among them: {sum(1 for r in slow if r[4])}")
        print(GLOBAL_TIMER.print_stats())
    sys_.shutdown()
    return fps


def main():
    n = 120
    K, frames = bench._render_sequence(n, stereo=True)
    cfg = bench._cfg(K, sensor="stereo", bf=35.0, th_depth=20.0)
    run_session(K, frames, cfg)           # warm every compile
    run_session(K, frames, cfg, record=True)


if __name__ == "__main__":
    main()
