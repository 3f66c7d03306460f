"""Minimal reproducer for the tunneled-TPU fused-mapping-stage fault
(VERDICT r3 #8; tracker.py floors kmax/lmax on TPU because of it).

Observed: `pipeline.map_stage_pre` (the fused insert+triangulate+fuse jit)
crashes the TPU worker ("TPU worker process crashed or restarted",
kernel fault) at SOME arena shapes while each sub-stage in isolation and
other shapes run fine. Reproduced shapes as of round 3/4:

    kmax=32  lmax=4096   -> faults (original report, commit 784e56c)
    kmax=96  lmax=12288  -> faults (round 4, via test_multihost session)
    kmax=32  lmax=8192   -> ok
    kmax=64  lmax=4096   -> ok
    kmax=64  lmax=8192   -> ok (the floored default)

Usage:
    python examples/repro_tpu_miscompile.py 32 4096      # one shape
    python examples/repro_tpu_miscompile.py --sweep      # subprocess per
                                                         # shape, table out

Each shape runs in its own process because the fault kills the TPU worker.
Exit code 0 = shape ran clean.
"""

import subprocess
import sys


def run_one(kmax: int, lmax: int) -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax
    import jax.numpy as jnp

    from orb_slam3_tpu.atlas import ops as atlas_ops, state as atlas_state
    from orb_slam3_tpu.frontend import camera as cam, orb as orb_mod
    from orb_slam3_tpu.mapping import pipeline
    from orb_slam3_tpu.tracking import tracker as trk

    F = 600
    rng = np.random.default_rng(0)
    K8 = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    s = atlas_state.empty(kmax=kmax, fmax=F, lmax=lmax)
    # two keyframes with bound landmarks so triangulate/fuse do real work
    for k in range(2):
        s, kf = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.asarray([0.1 * k, 0, 0], jnp.float32),
            float(k),
            jnp.asarray(rng.uniform(0, 380, (F, 2)), jnp.float32),
            jnp.zeros(F, jnp.int32), jnp.zeros(F, jnp.float32),
            jnp.asarray(rng.integers(0, 255, (F, 32)), jnp.uint8),
            jnp.ones(F, bool),
            feat_lm=jnp.asarray(rng.integers(0, 256, F), jnp.int32),
        )
    X = np.concatenate([rng.uniform(-2, 2, (256, 2)),
                        rng.uniform(3, 7, (256, 1))], axis=1)
    s, _ = atlas_ops.add_landmarks(
        s, jnp.asarray(X, jnp.float32),
        jnp.asarray(rng.integers(0, 255, (256, 32)), jnp.uint8),
        jnp.zeros(256, jnp.int32), jnp.ones(256, bool),
        jnp.zeros(256, jnp.int32), jnp.arange(256, dtype=jnp.int32),
    )
    cfg = trk.TrackerConfig(
        K=K8, img_wh=(512, 384), sensor="mono",
        orb=orb_mod.OrbConfig(n_features=F, n_levels=4),
        kmax=kmax, lmax=lmax, local_window=6,
    )
    pkg = pipeline.KFPackage(
        R=jnp.eye(3), t=jnp.asarray([0.2, 0, 0], jnp.float32),
        timestamp=2.0,
        feat_xy=jnp.asarray(rng.uniform(0, 380, (F, 2)), jnp.float32),
        feat_octave=jnp.zeros(F, jnp.int32),
        feat_angle=jnp.zeros(F, jnp.float32),
        feat_desc=jnp.asarray(rng.integers(0, 255, (F, 32)), jnp.uint8),
        feat_valid=jnp.ones(F, bool),
        feat_lm=jnp.asarray(rng.integers(0, 256, F), jnp.int32),
        feat_ur=None, feat_depth=None, n_inliers=200,
    )
    s2, kf, ba_rows, n_fixed = pipeline.run_pre_stage(
        s, pkg, cfg, "mono", 1, jnp.asarray([1.2 ** i for i in range(4)],
                                            jnp.float32),
        kf_row_host=2,
    )
    jax.block_until_ready(s2.kf_R)
    print(f"OK kmax={kmax} lmax={lmax} backend={jax.default_backend()}")


def sweep():
    shapes = [(32, 4096), (32, 8192), (48, 4096), (48, 8192), (64, 4096),
              (64, 8192), (96, 8192), (96, 12288), (128, 8192),
              (128, 16384)]
    print("kmax, lmax, status")
    for kmax, lmax in shapes:
        p = subprocess.run(
            [sys.executable, __file__, str(kmax), str(lmax)],
            capture_output=True, text=True, timeout=600,
        )
        ok = p.returncode == 0
        status = "ok" if ok else "FAULT"
        if not ok:
            tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
            status += f" ({tail[0][:80] if tail else 'no output'})"
        print(f"{kmax}, {lmax}, {status}", flush=True)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    else:
        run_one(int(sys.argv[1]), int(sys.argv[2]))
