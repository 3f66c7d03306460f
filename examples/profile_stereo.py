"""Device-time profile of the stereo per-frame chain (VERDICT r4 #3):
times each compiled stage standalone on the chip to locate the
throughput bound that track.finalize waits on."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: F401  (sets the compile cache)
from synthetic_scene import PlaneScene, orbit_trajectory
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb, stereo
from orb_slam3_tpu.tracking import tracker as trk


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


def main():
    K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
    scene = PlaneScene(np.array(K), img_wh=(512, 384), two_planes=True,
                       seed=0)
    R_gt, t_gt = orbit_trajectory(4, radius=0.04, advance=0.012,
                                  yaw_rate=0.002)
    im_l, im_r = scene.render_stereo(R_gt[0], t_gt[0], 0.1)
    im_l = jnp.asarray(im_l)
    im_r = jnp.asarray(im_r)
    cfg_orb = orb.OrbConfig(n_features=600, n_levels=4)

    ext = jax.jit(lambda im: orb.extract(im, cfg_orb))
    f = timeit("extract (one image)", ext, im_l)

    pair = jax.jit(lambda a, b: (orb.extract(a, cfg_orb),
                                 orb.extract(b, cfg_orb)))
    fl, fr = timeit("extract pair (one jit)", pair, im_l, im_r)

    sf = jnp.asarray([cfg_orb.scale_factor ** i
                      for i in range(cfg_orb.n_levels)], jnp.float32)
    sm = jax.jit(lambda fl, fr, il, ir: stereo.match_stereo(
        fl.xy, fl.octave, fl.descriptors, fl.valid,
        fr.xy, fr.octave, fr.descriptors, fr.valid,
        il, ir, sf, 35.0, 0.05))
    try:
        timeit("stereo SAD match", sm, fl, fr, im_l, im_r)
    except Exception as e:
        print("stereo matcher direct call failed:", type(e).__name__, e)

    print("\nper-stage totals above; fused tracking step:")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    step = jax.jit(fn)
    timeit("fused track step", step, *args)


if __name__ == "__main__":
    main()
