"""Benchmark: end-to-end SLAM sequence throughput on one chip.

Measurements (VERDICT r3 #1: system-level fps for the flagship sensor
configs, compile-clean stage table, MFU):

1. END-TO-END mono (the headline): a 300-frame synthetic monocular
   sequence through the public System API — extraction, two-view init,
   per-frame tracking, keyframe insertion with triangulation/fuse/local BA
   on the background mapper, culling. Wall-clock over the whole run,
   rendering excluded. The reference achieves ~30-40 ms/frame on an i7
   (BASELINE.md; REGISTER_TIMES taxonomy, Tracking.cc:263-410).
2. END-TO-END stereo and mono-inertial rows (shorter sequences).
3. Hot path: steady-state extract+match+pose-optimize against a static
   local map — the per-frame floor with mapping idle.
4. MFU: XLA-reported FLOPs / measured wall time for the two busiest
   kernels (fused tracking step, local-BA iteration), against the v5e
   peak. SLAM is latency/gather-bound, not GEMM-bound — MFU is reported
   for transparency, not as the optimization target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

import jax

# persistent XLA compile cache: repeat bench runs (and the driver's rerun)
# skip the multi-minute cold compiles of the stereo/VI stages. Keyed by a
# machine fingerprint (same scheme as tests/conftest.py): artifacts cached
# by a previous round's machine can SIGILL on a different host CPU.
import hashlib
import platform

try:
    with open("/proc/cpuinfo") as _fh:
        _cpu = next((ln for ln in _fh if ln.startswith("flags")), "")
except OSError:
    _cpu = platform.processor()
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "tests", ".jax_cache",
                 hashlib.sha256(_cpu.encode()).hexdigest()[:12]),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, one v5e chip (f32 is lower)


def _render_sequence(n_frames, stereo=False, baseline=0.1):
    """Photo-consistent textured-plane orbit at EuRoC-like resolution
    (host-side homography warps; excluded from timing)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic_scene import PlaneScene, orbit_trajectory

    from orb_slam3_tpu.frontend import camera as cam

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True, seed=0)
    R_gt, t_gt = orbit_trajectory(
        n_frames, radius=0.04, advance=0.012, yaw_rate=0.002
    )
    if stereo:
        frames = [scene.render_stereo(R_gt[i], t_gt[i], baseline)
                  for i in range(n_frames)]
    else:
        frames = [scene.render(R_gt[i], t_gt[i]) for i in range(n_frames)]
    return K, frames


def _cfg(K, sensor="mono", **kw):
    from orb_slam3_tpu.frontend import orb
    from orb_slam3_tpu.tracking import tracker as trk

    base = dict(
        K=K, img_wh=(512, 384), sensor=sensor,
        orb=orb.OrbConfig(n_features=600, n_levels=4),
        kmax=64, lmax=8192, local_window=6, kf_max_frames=15,
    )
    base.update(kw)
    return trk.TrackerConfig(**base)


def bench_e2e(n_frames=300):
    from orb_slam3_tpu.api.system import System
    from orb_slam3_tpu.utils.timing import GLOBAL_TIMER

    K, frames = _render_sequence(n_frames)
    # warmup session: pays every one-time XLA compile (tracking stages +
    # mapper stages). Compiled executables are shared across sessions (all
    # hot jits are module-level, keyed by static configs), so the measured
    # session hits the caches.
    warm = System(config=_cfg(K))
    n_warm = min(80, n_frames)
    for i in range(n_warm):
        warm.track_monocular(frames[i], i * 0.033)
    # trigger the RECENTLY_LOST -> relocalization path so its programs
    # compile here, not on the measured run's first tracking loss
    blank = np.zeros_like(np.asarray(frames[0]))
    for j in range(3):
        warm.track_monocular(blank, (n_warm + j) * 0.033)
    warm.track_monocular(frames[n_warm - 1], (n_warm + 3) * 0.033)
    warm.tracker.sync_mapping()
    warm.shutdown()

    sys_ = System(config=_cfg(K))
    GLOBAL_TIMER.samples.clear()  # measure only the timed run
    per_frame = []
    t0 = time.perf_counter()
    for i, img in enumerate(frames):
        f0 = time.perf_counter()
        sys_.track_monocular(img, i * 0.033)
        per_frame.append(time.perf_counter() - f0)
    sys_.tracker.sync_mapping()  # include all queued mapping work
    dt = time.perf_counter() - t0
    n_kf = int(sys_.tracker.map.n_kf)
    ok = sum(r.ok for r in sys_.tracker.trajectory)
    stage_ms = {
        k: {kk: round(v[kk + "_ms"], 2) for kk in ("mean", "p50", "p95")}
        for k, v in sorted(GLOBAL_TIMER.summary().items())
    }
    import sys as _s

    print(GLOBAL_TIMER.print_stats(), file=_s.stderr)
    sys_.shutdown()
    pf = np.array(per_frame[12:]) * 1000.0
    return {
        "fps": n_frames / dt,
        "fps_p50": 1000.0 / float(np.median(pf)),
        "frame_ms_p50": float(np.median(pf)),
        "frame_ms_p95": float(np.percentile(pf, 95)),
        "keyframes": n_kf,
        "tracked": int(ok),
        "stages": stage_ms,
    }


def bench_e2e_stereo(n_frames=100):
    from orb_slam3_tpu.api.system import System
    from orb_slam3_tpu.utils.timing import GLOBAL_TIMER

    K, frames = _render_sequence(n_frames, stereo=True)
    bf = 35.0  # baseline 0.1 m * fx 350

    def cfg():
        return _cfg(K, sensor="stereo", bf=bf, th_depth=20.0)

    warm = System(config=cfg())
    for i in range(min(60, n_frames)):
        warm.track_stereo(frames[i][0], frames[i][1], i * 0.033)
    warm.tracker.sync_mapping()
    warm.shutdown()

    sys_ = System(config=cfg())
    GLOBAL_TIMER.samples.clear()
    t0 = time.perf_counter()
    for i, (l, r) in enumerate(frames):
        sys_.track_stereo(l, r, i * 0.033)
    sys_.tracker.sync_mapping()
    dt = time.perf_counter() - t0
    stage_ms = {
        k: {kk: round(v[kk + "_ms"], 2) for kk in ("mean", "p50", "p95")}
        for k, v in sorted(GLOBAL_TIMER.summary().items())
    }
    out = {
        "fps": n_frames / dt,
        "keyframes": int(sys_.tracker.map.n_kf),
        "tracked": sum(rec.ok for rec in sys_.tracker.trajectory),
        "stages": stage_ms,
    }
    sys_.shutdown()
    return out


def bench_e2e_vi(n_frames=60):
    """Mono-inertial e2e (VERDICT r3 weak #9: no VI throughput number
    existed). VI mapping runs synchronously (depth-1 pipeline), so this is
    the latency-bound config."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic_scene import PlaneScene
    from test_slam_vi import vi_render_trajectory

    from orb_slam3_tpu.frontend import camera as cam
    from orb_slam3_tpu.tracking import tracker as trk

    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True,
                       seed=3)
    R_gt, t_gt, imu_packets = vi_render_trajectory(n_frames)
    frames = [scene.render(R_gt[i], t_gt[i]) for i in range(n_frames)]

    def cfg():
        return _cfg(K, sensor="mono-imu", kf_max_frames=3)

    from orb_slam3_tpu.utils.timing import GLOBAL_TIMER

    def run():
        t = trk.Tracker(cfg())
        GLOBAL_TIMER.samples.clear()
        t0 = time.perf_counter()
        for i in range(n_frames):
            t.process(frames[i], (i + 1) * 0.1, imu=imu_packets[i])
        t.settle()
        t.sync_mapping()  # drain queued inertial KFs (same policy as mono:
        # all queued mapping work is inside the timed region) — init state
        # is only meaningful once the mapper has consumed the queue
        dt = time.perf_counter() - t0
        ok = sum(rec.ok for rec in t.trajectory)
        init = bool(t.imu is not None and t.imu.initialized)
        stages = {
            k: {kk: round(v[kk + "_ms"], 2) for kk in ("mean", "p50", "p95")}
            for k, v in sorted(GLOBAL_TIMER.summary().items())
        }
        out = n_frames / dt, int(t.map.n_kf), ok, init, stages
        t.shutdown()  # stop the mapper thread (clean interpreter exit)
        return out

    run()  # warmup (compiles)
    fps, n_kf, ok, init, stages = run()
    return {"fps": fps, "keyframes": n_kf, "tracked": ok,
            "imu_initialized": init, "stages": stages}


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


def bench_mfu():
    """XLA-reported FLOPs / measured time for the two busiest kernels
    (VERDICT r3 missing #5). Device time is amortized over a pipelined
    loop (dispatch overhead excluded by depth)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from orb_slam3_tpu.mapping import local_mapper
    from orb_slam3_tpu.frontend import camera as cam

    results = {}

    # fused tracking step
    fn, args = ge.entry()
    step = jax.jit(fn)
    lowered = step.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    out = step(*args)
    jax.block_until_ready(out)
    n = 40
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    results["track_step"] = {
        "flops": flops, "time_ms": round(dt * 1000, 3),
        "mfu_pct": round(100.0 * flops / max(dt, 1e-9) / V5E_PEAK_FLOPS, 3),
    }

    # local BA iteration at the bench window shape (10 KF window, 8192 lms)
    from orb_slam3_tpu.atlas import state as atlas_state
    from orb_slam3_tpu.atlas import ops as atlas_ops

    rng = np.random.default_rng(0)
    K8 = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    s = atlas_state.empty(kmax=64, fmax=600, lmax=8192)
    sf = jnp.asarray([1.2 ** i for i in range(4)], jnp.float32)
    X = np.concatenate([rng.uniform(-2, 2, (4000, 2)),
                        rng.uniform(3, 7, (4000, 1))], axis=1)
    for k in range(10):
        xy = rng.uniform(0, 380, (600, 2)).astype(np.float32)
        s, kf = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.asarray([0.05 * k, 0, 0], jnp.float32),
            float(k),
            jnp.asarray(xy), jnp.zeros(600, jnp.int32),
            jnp.zeros(600, jnp.float32),
            jnp.asarray(rng.integers(0, 255, (600, 32)), jnp.uint8),
            jnp.ones(600, bool),
            feat_lm=jnp.asarray(rng.integers(0, 4000, 600), jnp.int32),
        )
    s, _ = atlas_ops.add_landmarks(
        s, jnp.asarray(X, jnp.float32),
        jnp.asarray(rng.integers(0, 255, (4000, 32)), jnp.uint8),
        jnp.zeros(4000, jnp.int32), jnp.ones(4000, bool),
        jnp.zeros(4000, jnp.int32), jnp.arange(4000, dtype=jnp.int32),
    )
    rows = jnp.arange(10, dtype=jnp.int32)
    ba = jax.jit(lambda st: local_mapper.local_ba(
        cam.PINHOLE, K8, st, rows, n_fixed=2, window=10, iters=2,
        scale_factors=sf)[0])
    lowered = ba.lower(s)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    s2 = ba(s)
    jax.block_until_ready(s2.kf_R)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        s2 = ba(s)
    jax.block_until_ready(s2.kf_R)
    dt = (time.perf_counter() - t0) / n
    results["local_ba_2iter"] = {
        "flops": flops, "time_ms": round(dt * 1000, 3),
        "mfu_pct": round(100.0 * flops / max(dt, 1e-9) / V5E_PEAK_FLOPS, 3),
    }
    return results


def bench_vocab_1m():
    """ORBvoc-scale place recognition on the chip (VERDICT r3 missing #6):
    sparse BoW transform against a 1M-word (k=10, L=6) tree and a DB query
    over 64 stored keyframes."""
    import jax
    import jax.numpy as jnp

    from orb_slam3_tpu.place import recognition, vocab

    rng = np.random.default_rng(0)
    k, L = 10, 6
    n_total = sum(k ** (l + 1) for l in range(L))
    voc = vocab.Vocabulary(
        centers=jnp.asarray(rng.integers(0, 256, (n_total, 32)), np.uint8),
        weights=jnp.ones((k ** L,), jnp.float32),
        branching=k, depth=L,
    )
    F = 600
    descs = jnp.asarray(rng.integers(0, 256, (F, 32)), np.uint8)
    valid = jnp.ones((F,), bool)
    bow = vocab.sparse_bow(voc, descs, valid)
    jax.block_until_ready(bow.ids)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        bow = vocab.sparse_bow(voc, descs, valid)
    jax.block_until_ready(bow.ids)
    transform_ms = (time.perf_counter() - t0) / n * 1000

    db = recognition.KeyframeDB.empty(64, voc.n_words, slots=F)
    for i in range(64):
        db = db.add(i, bow)
    sc = recognition.query(db, bow)
    jax.block_until_ready(sc)
    t0 = time.perf_counter()
    for _ in range(n):
        sc = recognition.query(db, bow)
    jax.block_until_ready(sc)
    query_ms = (time.perf_counter() - t0) / n * 1000
    centers_mb = n_total * 32 / 1e6
    return {"transform_ms": round(transform_ms, 3),
            "db_query_ms": round(query_ms, 3),
            "centers_mb": round(centers_mb, 1)}


def main():
    hot_fps = bench_hot_path()
    mfu = bench_mfu()
    voc1m = bench_vocab_1m()
    e2e = bench_e2e()
    st = bench_e2e_stereo()
    vi = bench_e2e_vi()
    baseline_fps = 1000.0 / 35.0  # ~35 ms/frame on i7 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "e2e_sequence_frames_per_second",
                "value": round(e2e["fps"], 2),
                "unit": "fps",
                "vs_baseline": round(e2e["fps"] / baseline_fps, 3),
                "fps_p50": round(e2e["fps_p50"], 2),
                "frame_ms_p50": round(e2e["frame_ms_p50"], 2),
                "frame_ms_p95": round(e2e["frame_ms_p95"], 2),
                "hot_path_fps": round(hot_fps, 2),
                "e2e_n_frames": 300,
                "e2e_keyframes": e2e["keyframes"],
                "e2e_tracked_frames": e2e["tracked"],
                "stereo_fps": round(st["fps"], 2),
                "stereo_keyframes": st["keyframes"],
                "vi_fps": round(vi["fps"], 2),
                "vi_keyframes": vi["keyframes"],
                "vi_imu_initialized": vi["imu_initialized"],
                "mfu": mfu,
                "vocab_1m": voc1m,
                "stage_ms": e2e["stages"],
                "stereo_stage_ms": st["stages"],
                "vi_stage_ms": vi["stages"],
            }
        )
    )


if __name__ == "__main__":
    main()
