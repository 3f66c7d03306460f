"""Multi-host distributed Atlas layer (parallel/multihost.py).

VERDICT r3 #2: (a) two-level GBA == flat GBA agreement on the 8-CPU mesh;
(b) HostedAtlas e2e — two sessions on two "hosts", cross-host ship + merge;
(c) a real jax.distributed 2-process CPU run.
"""

import os
import subprocess
import sys
import textwrap

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from orb_slam3_tpu.api import evaluate
from orb_slam3_tpu.atlas import ops as atlas_ops
from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import orb as orb_mod
from orb_slam3_tpu.parallel import map_ba, multihost
from orb_slam3_tpu.place import vocab
from orb_slam3_tpu.tracking import tracker as trk
from synthetic_scene import PlaneScene, orbit_trajectory

K = cam.make_pinhole(350.0, 350.0, 256.0, 192.0)
IMG_WH = (512, 384)


def _build_tracked_map(n=14, seed=4):
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=seed)
    R_gt, t_gt = orbit_trajectory(n)
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=500, n_levels=3),
        kmax=32, lmax=4096, local_window=5,
    )
    t = trk.Tracker(cfg)
    for i in range(n):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        t.process(img, i * 0.05, depth_map=depth)
    t.settle()
    assert t.state == trk.OK
    return t.map


def test_two_level_gba_matches_flat():
    """dist_gba_two_level on a (4 hosts x 2 devs) mesh must agree with
    map_ba.distributed_global_ba on the flat 8-device mesh (same math,
    hierarchical reduction)."""
    s = _build_tracked_map()
    devs = jax.devices()
    assert len(devs) >= 8
    flat = Mesh(np.array(devs[:8]), ("lm",))
    two = multihost.two_level_mesh(4, 2)

    s_flat = map_ba.distributed_global_ba(s, K, flat, num_iters=6)
    s_two, costs = multihost.dist_gba_two_level(s, K, two, num_iters=6)

    assert len(costs) == 6 and costs[-1] <= costs[0]
    kv = np.array(s.kf_valid)
    np.testing.assert_allclose(
        np.array(s_two.kf_R)[kv], np.array(s_flat.kf_R)[kv],
        rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        np.array(s_two.kf_t)[kv], np.array(s_flat.kf_t)[kv],
        rtol=0, atol=2e-4)
    lv = np.array(s.lm_valid)
    np.testing.assert_allclose(
        np.array(s_two.lm_pos)[lv], np.array(s_flat.lm_pos)[lv],
        rtol=0, atol=5e-4)


def _session_with_vocab(scene, kf_max_frames=2, kmax=96, lmax=12288):
    cfg = trk.TrackerConfig(
        K=K, img_wh=IMG_WH, sensor="rgbd", bf=35.0, th_depth=20.0,
        orb=orb_mod.OrbConfig(n_features=600, n_levels=4),
        kmax=kmax, lmax=lmax, local_window=6, kf_max_frames=kf_max_frames,
        deterministic_mapping=True,
    )
    t = trk.Tracker(cfg)
    descs = []
    R0, t0 = orbit_trajectory(3)
    for i in range(3):
        f = orb_mod.extract(jnp.asarray(scene.render(R0[i], t0[i])), cfg.orb)
        descs.append(np.array(f.descriptors)[np.array(f.valid)])
    voc = vocab.train(np.concatenate(descs), branching=8, depth=3)
    t.attach_loop_closer(voc)
    return t, voc


def test_hosted_atlas_cross_host_merge():
    """Two sessions ("hosts") map disjoint halves of the same trajectory;
    host 0's map ships over "DCN" into host 1's arena, and host 1 then
    revisits host 0's region -> cross-map merge unifies the atlas."""
    scene = PlaneScene(np.array(K), img_wh=IMG_WH, two_planes=True, seed=7)
    R_gt, t_gt = orbit_trajectory(40, advance=0.05)

    # host 0: frames 0..19
    tA, voc = _session_with_vocab(scene)
    for i in range(20):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        tA.process(img, i * 0.05, depth_map=depth)
    tA.settle()
    assert tA.state == trk.OK and int(tA.map.n_kf) >= 6

    # host 1: frames 22..39 (its own map, disjoint region start)
    tB, _ = _session_with_vocab(scene)
    tB.loop_closer.voc = voc
    for k, i in enumerate(range(22, 40)):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        tB.process(img, 50.0 + k * 0.05, depth_map=depth)
    tB.settle()
    assert tB.state == trk.OK and int(tB.map.n_kf) >= 6

    # relabel host 0's map to a globally distinct id, form the HostedAtlas
    sA = atlas_ops.change_map_id(tA.map, 0, 1)
    ha = multihost.HostedAtlas.create(2, [sA, tB.map])
    assert ha.host_of_map == {1: 0, 0: 1}
    kf_a = int(np.array(sA.kf_valid).sum())
    lm_a = int(np.array(sA.lm_valid).sum())
    kf_b = int(np.array(tB.map.kf_valid).sum())

    ha.ship_map(1, to_host=1)
    dst = ha.host_maps[1]
    assert ha.host_of_map[1] == 1
    # all of A's rows arrived, B's active map untouched
    kv = np.array(dst.kf_valid)
    assert int((np.array(dst.kf_map_id)[kv] == 1).sum()) == kf_a
    assert int((np.array(dst.kf_map_id)[kv] == 0).sum()) == kf_b
    lv = np.array(dst.lm_valid)
    assert int((np.array(dst.lm_map_id)[lv] == 1).sum()) == lm_a
    assert int(dst.active_map) == 0
    # source rows were invalidated
    assert int(np.array(ha.host_maps[0].kf_valid).sum()) == 0

    # host 1 resumes with the combined arena and revisits host 0's region
    tB.adopt_map(dst)
    merged = False
    for k, i in enumerate(range(18, 2, -2)):
        img, depth = scene.render_with_depth(R_gt[i], t_gt[i])
        tB.process(img, 60.0 + k * 0.05, depth_map=depth)
        tB.sync_mapping()
        if tB.loop_closer.n_merges > 0:
            merged = True
            break
    assert merged, "cross-host shipped map never merged"
    ids = np.array(tB.map.kf_map_id)[np.array(tB.map.kf_valid)]
    assert len(np.unique(ids)) == 1

    # far-segment consistency: after aligning the merged trajectory to GT
    # (B's world frame is anchored at ITS first frame, not GT's), the
    # shipped far segment must sit near its ground truth
    s = tB.map
    kv = np.array(s.kf_valid)
    kc = evaluate.camera_centers(np.array(s.kf_R)[kv], np.array(s.kf_t)[kv])
    kts = np.array(s.kf_timestamp)[kv]
    early = kts < 1.01                       # host 0's shipped keyframes
    fr_all = np.where(
        early, (kts / 0.05 + 0.5).astype(int),
        np.where(kts < 59.0, ((kts - 50.0) / 0.05 + 0.5).astype(int) + 22,
                 18 - 2 * ((kts - 60.0) / 0.05 + 0.5).astype(int)),
    )
    gtc = evaluate.camera_centers(R_gt[fr_all], t_gt[fr_all])
    Ra, ta, sa, err = evaluate.horn_align(kc.T, gtc.T, with_scale=False)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse < 0.15, rmse
    assert err[early].max() < 0.25, err[early].max()


def test_jax_distributed_two_process():
    """Real multi-process run: 2 CPU processes via jax.distributed (the DCN
    control plane), each contributing its own device to a global psum."""
    import socket

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    prog = textwrap.dedent("""
        import os, sys
        os.environ.pop("XLA_FLAGS", None)
        pid = int(sys.argv[1]); port = sys.argv[2]
        sys.path.insert(0, %r)
        # sitecustomize pins JAX_PLATFORMS to the TPU tunnel; override via
        # config BEFORE any backend initialization (same as tests/conftest).
        # distributed.initialize must run before importing the package
        # (module-level jnp constants initialize the backend), so call it
        # raw here and check init_distributed's idempotent re-entry after.
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(
            coordinator_address="127.0.0.1:" + port,
            num_processes=2, process_id=pid)
        from orb_slam3_tpu.parallel import multihost
        multihost.init_distributed(
            coordinator="127.0.0.1:" + port, num_processes=2, process_id=pid)
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        assert jax.process_count() == 2, jax.process_count()
        devs = np.array(jax.devices())  # 2 global devices, 1 per process
        mesh = Mesh(devs, ("host",))
        sh = NamedSharding(mesh, P("host"))
        x = jax.make_array_from_callback(
            (2,), sh,
            lambda idx: np.full((1,), jax.process_index() + 1.0, np.float32))
        total = jax.jit(
            lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
        )(x)
        # sum over both processes' shards: 1.0 + 2.0
        assert float(total) == 3.0, float(total)
        print("OK", pid)
    """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = {k: v for k, v in os.environ.items()}
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(pid), str(port)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"OK {pid}" in out
