"""Visual-inertial extensions of the tracker (mixin-style helpers).

Implements the IMU side of Tracking (`/root/reference/src/Tracking.cc`):
- per-frame IMU ingestion + preintegration from the last frame and from the
  last keyframe (`GrabImuData:1618`, `PreintegrateIMU:1624`)
- IMU pose prediction (`PredictStateIMU:1738`)
- the inertial initialization trigger + gauge transform
  (`LocalMapping::InitializeIMU:1173`, `Map::ApplyScaledRotation:252`)
- visual-inertial local BA dispatch after initialization
  (`LocalInertialBA` via imu/vi_ba.py)

Body/camera frames: MapState stores camera poses Tcw; the body pose is
Twb = Tcw^{-1} * Tcb with the fixed extrinsics Tbc (IMU::Calib, ImuTypes.h:92).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..atlas import ops as atlas_ops
from ..imu import factors, initialization, preintegration as pre, vi_ba
from ..ops import lie

IMU_BUF = 512  # max samples per keyframe interval

# VI-BA window/chain shape buckets: every distinct window length otherwise
# compiles its own XLA program (the inertial chain grows by one KF per
# insertion during init — measured as the dominant suite/chip cost in r4)
VI_W_BUCKETS = (10, 12, 16, 24, 32, 48, 64)


def _w_bucket(n: int) -> int:
    for b in VI_W_BUCKETS:
        if n <= b:
            return b
    return -(-n // 32) * 32


@partial(jax.jit, static_argnames=())
def _integrate_batch(acc, gyro, dts, valid, bg, ba, noise4):
    """Vmapped preintegration over [N, IMU_BUF] windows — one dispatch for
    the whole inertial chain instead of one per interval."""
    return jax.vmap(
        lambda a, g, d, v, bgi, bai: pre.integrate(
            a, g, d, v, bgi, bai,
            noise_gyro=noise4[0], noise_acc=noise4[1],
            walk_gyro=noise4[2], walk_acc=noise4[3],
        )
    )(acc, gyro, dts, valid, bg, ba)


@jax.jit
def _preint_edge_arrays(pstack):
    """Stacked Preintegrated -> (edge data pytree [N,...], info9 [N,9,9],
    rw info [N,6,6]) in one compiled program."""
    d, info = jax.vmap(lambda p: factors.preint_edge_data(p))(pstack)
    g = jax.vmap(factors.gyro_rw_info)(pstack)
    a = jax.vmap(factors.acc_rw_info)(pstack)
    rw = jnp.zeros((info.shape[0], 6, 6))
    rw = rw.at[:, :3, :3].set(g).at[:, 3:, 3:].set(a)
    return d, info, rw


def cam_to_body(R_cw, t_cw, Rbc, tbc):
    """Tcw -> Twb given body-to-camera extrinsics Tbc (X_c = Rbc... NOTE:
    reference convention: Tbc maps camera to body: X_b = Rbc X_c + tbc)."""
    R_wc, t_wc = lie.se3_inv(R_cw, t_cw)
    # Twb = Twc * Tcb ; Tcb = Tbc^{-1}
    Rcb, tcb = lie.se3_inv(Rbc, tbc)
    return lie.se3_mul(R_wc, t_wc, Rcb, tcb)


def body_to_cam(R_wb, t_wb, Rbc, tbc):
    """Twb -> Tcw."""
    R_wc, t_wc = lie.se3_mul(R_wb, t_wb, Rbc, tbc)
    return lie.se3_inv(R_wc, t_wc)


class ImuState:
    """Host-side IMU bookkeeping for the tracker."""

    def __init__(self, noise: dict, Tbc: np.ndarray):
        self.noise = noise
        self.Rbc = jnp.asarray(Tbc[:3, :3])
        self.tbc = jnp.asarray(Tbc[:3, 3])
        self.initialized = False
        self.bg = jnp.zeros(3)
        self.ba = jnp.zeros(3)
        self.vel = jnp.zeros(3)          # current body velocity (world)
        self.kf_buffers = {}             # kf_row -> (accs, gyros, dts) since PREV kf
        self._cur = ([], [], [], [])     # (acc, gyro, dts, ts) since last KF
        self._frame_meas = None          # measurements since last frame
        self.first_kf_ts = None
        # staged-refinement bookkeeping (VIBA1 @ t>5s, VIBA2 @ t>15s, mono
        # scale refinement ~every 10s until 75s — LocalMapping.cc:200-242)
        self.init_ts = None              # timestamp of successful IMU init
        self.viba_stage = 0              # 0 = init only, 1 = VIBA1, 2 = VIBA2
        self.last_scale_refine_ts = None
        self.tinit = 0.0                 # motion-gated init time (mTinit)
        self.bad = False                 # mbBadImu (LocalMapping.cc:144)

    # ------------------------------------------------------------------
    def ingest(self, imu: np.ndarray):
        """imu rows: [t, gx, gy, gz, ax, ay, az] since the previous frame
        (the reference's vImuMeas contract)."""
        if imu is None or len(imu) == 0:
            self._frame_meas = None
            return
        ts = imu[:, 0]
        dts = np.diff(ts, prepend=ts[0] - (ts[1] - ts[0] if len(ts) > 1 else 0.005))
        gyro = imu[:, 1:4]
        acc = imu[:, 4:7]
        self._frame_meas = (acc, gyro, dts)
        a, g, d, tl = self._cur
        a.append(acc)
        g.append(gyro)
        d.append(dts)
        tl.append(ts)

    def preint_frame(self):
        """Preintegration over the measurements since the last frame,
        padded to a 16-multiple bucket to bound jit recompiles."""
        if self._frame_meas is None:
            return None
        acc, gyro, dts = self._frame_meas
        n = len(dts)
        cap = min(IMU_BUF, -(-n // 16) * 16)
        return self._integrate_padded(acc, gyro, dts, cap, self.bg, self.ba)

    def preint_since_kf(self, bg=None, ba=None):
        """Preintegration over ALL measurements since the last committed
        keyframe (mpImuPreintegratedFromLastKF, Tracking.cc:1624-1735) —
        the inertial edge of PoseInertialOptimizationLastKeyFrame."""
        a, g, d, _ = self._cur
        if not a:
            return None
        acc = np.concatenate(a)
        gyro = np.concatenate(g)
        dts = np.concatenate(d)
        return self._integrate_padded(
            acc, gyro, dts, IMU_BUF,
            self.bg if bg is None else bg, self.ba if ba is None else ba,
        )

    def _integrate_padded(self, acc, gyro, dts, cap, bg, ba):
        n = len(dts)
        if n > cap:
            acc, gyro, dts = acc[-cap:], gyro[-cap:], dts[-cap:]
            n = cap
        pad = cap - n
        return pre.integrate(
            jnp.asarray(np.pad(acc, ((0, pad), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(gyro, ((0, pad), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(dts, (0, pad)), jnp.float32),
            jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]),
            bg, ba, **self.noise,
        )

    def commit_keyframe(self, kf_row: int, timestamp: float):
        """Snapshot the since-last-KF buffer for this keyframe interval."""
        a, g, d, _ = self._cur
        if a:
            self.kf_buffers[kf_row] = (
                np.concatenate(a), np.concatenate(g), np.concatenate(d)
            )
        self._cur = ([], [], [], [])
        if self.first_kf_ts is None:
            self.first_kf_ts = timestamp

    def cut_interval(self):
        """Async-mapping handoff: detach and return the since-last-KF
        buffer (acc, gyro, dts, ts) — the KFPackage ships it to the
        mapper's ImuState (store_interval). Resets the tracker-side
        accumulation exactly like commit_keyframe (the reference starts
        mpImuPreintegratedFromLastKF fresh at CreateNewKeyFrame,
        Tracking.cc:3216)."""
        a, g, d, tl = self._cur
        out = None
        if a:
            out = tuple(np.concatenate(x) for x in (a, g, d, tl))
        self._cur = ([], [], [], [])
        return out

    def restore_interval(self, interval):
        """Undo cut_interval when the mapper queue refused the package
        (the measurements still belong to the open inter-KF window)."""
        if interval is None:
            return
        a, g, d, tl = self._cur
        self._cur = ([interval[0]] + a, [interval[1]] + g,
                     [interval[2]] + d, [interval[3]] + tl)

    def store_interval(self, kf_row: int, interval, timestamp: float):
        """Mapper-side counterpart of commit_keyframe for a shipped
        interval."""
        if interval is not None:
            self.kf_buffers[kf_row] = interval[:3]
        if self.first_kf_ts is None:
            self.first_kf_ts = timestamp

    def clone_for_mapper(self) -> "ImuState":
        """Snapshot for the background mapper's context: shares no mutable
        buffers with the tracker-side state. The mapper owns kf_buffers
        and the init/refinement bookkeeping from here on; the tracker's
        copies go stale and are refreshed from commits."""
        import copy

        c = ImuState(self.noise, np.eye(4, dtype=np.float32))
        c.Rbc, c.tbc = self.Rbc, self.tbc
        c.initialized = self.initialized
        c.bg, c.ba, c.vel = self.bg, self.ba, self.vel
        c.kf_buffers = copy.deepcopy(self.kf_buffers)
        c.first_kf_ts = self.first_kf_ts
        c.init_ts = self.init_ts
        c.viba_stage = self.viba_stage
        c.last_scale_refine_ts = self.last_scale_refine_ts
        c.tinit = self.tinit
        c.bad = self.bad
        return c

    def trim_before(self, t0: float):
        """Drop accumulated measurements at or before t0. Map initialization
        commits its first keyframe at the REFERENCE frame's timestamp; the
        backlog recorded while the tracker was searching for an
        initialization pair precedes the map and must not leak into the
        first preintegration interval (the reference starts
        mpImuPreintegratedFromLastKF fresh at KF creation,
        Tracking.cc:2526-2660)."""
        a, g, d, tl = self._cur
        if not a:
            return
        acc, gyro, dts, ts = (np.concatenate(x) for x in (a, g, d, tl))
        keep = ts > t0 + 1e-9
        self._cur = (
            [acc[keep]], [gyro[keep]], [dts[keep]], [ts[keep]]
        ) if keep.any() else ([], [], [], [])

    def stacked_buffers(self, kf_rows):
        """Padded [N, IMU_BUF] measurement stack for the intervals ENDING at
        kf_rows (None/missing rows produce all-invalid windows). Returns
        (acc, gyro, dts, valid) as np arrays ready for _integrate_batch."""
        n = len(kf_rows)
        acc = np.zeros((n, IMU_BUF, 3), np.float32)
        gyro = np.zeros((n, IMU_BUF, 3), np.float32)
        dts = np.zeros((n, IMU_BUF), np.float32)
        valid = np.zeros((n, IMU_BUF), np.float32)
        for i, r in enumerate(kf_rows):
            if r is None or r not in self.kf_buffers:
                continue
            a, g, d = self.kf_buffers[r]
            m = min(len(d), IMU_BUF)
            acc[i, :m] = a[-m:]
            gyro[i, :m] = g[-m:]
            dts[i, :m] = d[-m:]
            valid[i, :m] = 1.0
        return acc, gyro, dts, valid

    def noise4(self):
        return jnp.asarray([
            self.noise["noise_gyro"], self.noise["noise_acc"],
            self.noise["walk_gyro"], self.noise["walk_acc"],
        ], jnp.float32)

    def preint_between(self, kf_row: int, bg=None, ba=None):
        """(Re-)integrate the stored interval ending at kf_row
        (Preintegrated::Reintegrate on bias updates, ImuTypes.cc:168)."""
        if kf_row not in self.kf_buffers:
            return None
        a, g, d = self.kf_buffers[kf_row]
        n = len(d)
        if n > IMU_BUF:
            a, g, d = a[-IMU_BUF:], g[-IMU_BUF:], d[-IMU_BUF:]
            n = IMU_BUF
        pad = IMU_BUF - n
        return pre.integrate(
            jnp.asarray(np.pad(a, ((0, pad), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(g, ((0, pad), (0, 0))), jnp.float32),
            jnp.asarray(np.pad(d, (0, pad)), jnp.float32),
            jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]),
            self.bg if bg is None else bg,
            self.ba if ba is None else ba,
            **self.noise,
        )


@dataclasses.dataclass
class MapperVICtx:
    """Duck-typed stand-in for the Tracker accepted by every VI mapping
    routine (run_vi_local_ba, try_initialize_imu, try_refine_imu,
    cull_keyframes_inertial, _apply_inertial_solution): the background
    mapper's own map + IMU state. `last=None` skips the tracked-pose
    re-anchoring inside _apply_inertial_solution — the TRACKER re-anchors
    when it adopts the commit (gauge_scale)."""

    map: object
    imu: ImuState
    cfg: object
    scale_factors: object
    debug_events: list
    last: dict | None = None
    velocity: object = None
    _vi_prior: object = None
    last_kf_row: int = -1


# ----------------------------------------------------------------------
# inertial initialization (LocalMapping::InitializeIMU)
# ----------------------------------------------------------------------

def _inertial_chain(tracker, bg=None, ba=None):
    """Temporal-chain preintegration intervals (buffer r covers
    kf_prev[r] -> r): (chain_rows, preint_stack, R_wb, t_wb) or None.
    preint_stack is a Preintegrated pytree with leading dim len(chain)-1 —
    ONE batched integration dispatch for the whole chain. The chain follows
    mPrevKF links so it stays connected across culled keyframes."""
    imu = tracker.imu
    s = tracker.map
    # one batched sync (three serial fetches each cost a tunnel quantum)
    n_kf_d, kf_prev, kf_valid = jax.device_get(
        (s.n_kf, s.kf_prev, s.kf_valid))
    n_kf = int(n_kf_d)
    kf_prev = np.asarray(kf_prev)
    kf_valid = np.asarray(kf_valid)
    rows = [r for r in range(1, n_kf)
            if r in imu.kf_buffers and kf_valid[r]
            and kf_prev[r] >= 0 and kf_valid[kf_prev[r]]]
    # keep only the connected suffix (each interval must start where the
    # previous one ended)
    connected = []
    for r in rows:
        if connected and kf_prev[r] != connected[-1]:
            connected = []
        connected.append(r)
    rows = connected
    if not rows:
        return None
    n_e = len(rows)
    acc, gyro, dts, valid = imu.stacked_buffers(rows)
    bg1 = jnp.reshape(imu.bg if bg is None else jnp.asarray(bg), (1, 3))
    ba1 = jnp.reshape(imu.ba if ba is None else jnp.asarray(ba), (1, 3))
    pstack = _integrate_batch(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
        jnp.asarray(valid),
        jnp.tile(bg1, (n_e, 1)), jnp.tile(ba1, (n_e, 1)), imu.noise4(),
    )
    chain = [int(kf_prev[rows[0]])] + rows
    chain_j = jnp.asarray(chain, jnp.int32)
    R_wb, t_wb = jax.vmap(
        lambda R, t: cam_to_body(R, t, imu.Rbc, imu.tbc)
    )(s.kf_R[chain_j], s.kf_t[chain_j])
    return chain, pstack, R_wb, t_wb


def _apply_inertial_solution(tracker, out, chain, update_bias=True,
                             event: str = "init"):
    """Gauge transform + state writes shared by init and the VIBA/scale
    refinements (ApplyScaledRotation + UpdateFrameIMU,
    LocalMapping.cc:1281-1295)."""
    imu = tracker.imu
    s = tracker.map
    scale = float(out["scale"])
    Ryw = out["Rwg"].T
    tracker.debug_events.append({
        "ts": float(s.kf_timestamp[int(s.n_kf) - 1]),
        "event": event,
        "scale": scale,
        "gravity": np.array(out["Rwg"] @ jnp.array([0.0, 0.0, -pre.GRAVITY])),
        "bg": np.array(out["bg"]),
        "ba": np.array(out["ba"]),
        # world gauge rotation of this event (X' = s * Ryw @ X): the async
        # mapper folds it into its cumulative gauge so stale in-flight
        # packages can be re-gauged on arrival (see AsyncMapper._gauge_tot)
        "Ryw": np.array(Ryw),
    })
    s2 = atlas_ops.apply_scaled_rotation(
        s, Ryw, jnp.asarray(scale), s.active_map
    )
    # velocities into the new frame; store on the chain KFs
    v_new = scale * jnp.einsum("ij,kj->ki", Ryw, out["velocities"])
    kf_vel = s2.kf_vel
    for i, r in enumerate(chain):
        kf_vel = kf_vel.at[r].set(v_new[i])
    s2 = dataclasses.replace(s2, kf_vel=kf_vel)
    if update_bias:
        s2 = dataclasses.replace(
            s2,
            kf_bg=jnp.tile(out["bg"][None], (s2.kmax, 1)),
            kf_ba=jnp.tile(out["ba"][None], (s2.kmax, 1)),
        )
        imu.bg = out["bg"]
        imu.ba = out["ba"]
    tracker.map = s2
    imu.vel = v_new[-1]
    # current tracked pose also transforms
    if tracker.last is not None:
        R_l, t_l = tracker.last["R"], tracker.last["t"]
        tracker.last["R"] = R_l @ Ryw.T
        tracker.last["t"] = scale * t_l
    # stored relative frame poses rescale with the gauge
    # (Tracking::UpdateFrameIMU rescales mlRelativeFramePoses,
    # Tracking.cc:3980-4010). MapperVICtx has no trajectory — the ASYNC
    # tracker rescales at commit adoption via gauge_scale instead.
    traj = getattr(tracker, "trajectory", None)
    if traj is not None:
        for f in traj:
            f.t_rel = np.asarray(f.t_rel) * scale
    tracker.velocity = None
    tracker._vi_prior = None  # gauge changed


def try_initialize_imu(tracker, min_kfs: int | None = None,
                       min_time: float | None = None,
                       n_kf_host: int | None = None,
                       ts_now_host: float | None = None):
    """Run inertial-only MAP + gauge transform when enough baseline exists.
    Mutates tracker.map and tracker.imu. Returns True on success.

    Gates follow the reference (LocalMapping::InitializeIMU,
    LocalMapping.cc:1178-1189): >=10 keyframes; 2 s of data for monocular
    (scale is free and needs excitation), 1 s otherwise. Monocular warm-
    starts the MAP from the closed-form linear alignment and rejects a MAP
    solution that ran away from it (scale collapse under visual noise —
    see initialization.linear_alignment)."""
    imu = tracker.imu
    s = tracker.map
    mono = tracker.cfg.sensor == "mono-imu"
    if min_kfs is None:
        min_kfs = 10
    if min_time is None:
        min_time = 2.0 if mono else 1.0
    # the async mapper passes its host-side mirrors so the every-keyframe
    # gate checks cost zero device syncs (each int()/float() fetch blocks
    # the mapper thread behind the whole queued device stream)
    n_kf = int(s.n_kf) if n_kf_host is None else int(n_kf_host)
    if imu.initialized or n_kf < min_kfs or imu.first_kf_ts is None:
        return False
    ts_now = (float(s.kf_timestamp[n_kf - 1]) if ts_now_host is None
              else float(ts_now_host))
    if ts_now - imu.first_kf_ts < min_time:
        return False

    chain_out = _inertial_chain(tracker)
    if chain_out is None or len(chain_out[0]) < min_kfs:
        return False
    chain, preints, R_wb, t_wb = chain_out

    fix_scale = tracker.cfg.sensor in ("stereo-imu", "rgbd-imu")
    s_lin = Rwg_lin = v_lin = None
    if not fix_scale:
        s_lin, s_q, Rwg_lin, v_lin = initialization.linear_alignment(
            R_wb, t_wb, preints
        )
        if not np.isfinite(s_lin) or s_lin <= 1e-2:
            return False
        # the two independent scale reads (gravity magnitude vs direct
        # coefficient) must agree, else the data is still too thin —
        # postpone initialization
        if not (np.isfinite(s_q) and 0.5 < s_q / s_lin < 2.0):
            return False
    out = initialization.inertial_only_optimization(
        R_wb, t_wb, preints, fix_scale=fix_scale,
        s0=s_lin, Rwg0=Rwg_lin, v0=v_lin,
    )
    scale = float(out["scale"])
    if not fix_scale and not (s_lin / 3.0 < scale < s_lin * 3.0):
        # MAP walked off the convex solution (visual-noise scale collapse);
        # keep the linear gauge, take only the well-observed biases from MAP
        out = dict(out, scale=jnp.asarray(s_lin), Rwg=Rwg_lin,
                   velocities=v_lin)
        scale = s_lin
    if scale <= 1e-2:
        return False

    _apply_inertial_solution(tracker, out, chain)
    imu.initialized = True
    imu.init_ts = ts_now
    imu.viba_stage = 0
    imu.last_scale_refine_ts = ts_now
    # joint visual+inertial BA over the young map with strong bias priors
    # (InitializeIMU -> FullInertialBA(100, priorG=1e2, priorA=1e10|1e5),
    # LocalMapping.cc:1304-1310) — the inertial-only MAP leaves
    # poses/structure unaware of the inertial chain. For monocular the
    # joint BA is alternated with scale+gravity-only re-solves: the joint
    # LM descends the scale valley slowly, while the gauge-only solve
    # jumps to the inertially-consistent scale given the refined states.
    pa = 1e10 if mono else 1e5
    run_full_inertial_ba(tracker, 1e2, pa, iters=15)
    if mono:
        for _ in range(2):
            if not scale_refine_once(tracker):
                break
            run_full_inertial_ba(tracker, 1e2, pa, iters=10)
    return True


def try_refine_imu(tracker, n_kf_host: int | None = None,
                   ts_now_host: float | None = None):
    """Staged post-init refinement (LocalMapping::Run, LocalMapping.cc:
    200-242): VIBA1 re-runs the inertial MAP with relaxed priors at
    tinit > 5 s (priorG=1, priorA=1e5), VIBA2 with no bias priors at
    tinit > 15 s; monocular-inertial additionally runs scale+gravity-only
    refinement (ScaleRefinement, LocalMapping.cc:1429) every ~10 s until
    tinit > 75 s. Returns True if the map was retransformed."""
    imu = tracker.imu
    s = tracker.map
    if not imu.initialized or imu.init_ts is None:
        return False
    n_kf = int(s.n_kf) if n_kf_host is None else int(n_kf_host)
    ts_now = (float(s.kf_timestamp[n_kf - 1]) if ts_now_host is None
              else float(ts_now_host))
    tinit = ts_now - imu.init_ts

    stage_prior = None
    if imu.viba_stage == 0 and tinit > 5.0:
        stage_prior = (1.0, 1e5)        # VIBA1 (LocalMapping.cc:207)
    elif imu.viba_stage == 1 and tinit > 15.0:
        stage_prior = (0.0, 0.0)        # VIBA2 (:221)

    mono = tracker.cfg.sensor == "mono-imu"
    want_scale_refine = (
        mono and stage_prior is None and imu.viba_stage >= 1
        and tinit < 75.0
        and ts_now - (imu.last_scale_refine_ts or ts_now) > 10.0
    )
    if stage_prior is None and not want_scale_refine:
        return False

    chain_out = _inertial_chain(tracker, bg=imu.bg, ba=imu.ba)
    if chain_out is None or len(chain_out[0]) < 4:
        return False
    chain, preints, R_wb, t_wb = chain_out
    fix_scale_sensor = tracker.cfg.sensor in ("stereo-imu", "rgbd-imu")

    if stage_prior is not None:
        pg, pa = stage_prior
        out = initialization.inertial_only_optimization(
            R_wb, t_wb, preints,
            prior_gyro=max(pg, 1e-6), prior_acc=max(pa, 1e-6),
            fix_scale=fix_scale_sensor,
            bg0=imu.bg, ba0=imu.ba,
        )
        scale = float(out["scale"])
        # the map is already metric: a refinement scale far from 1 is the
        # visual-noise collapse mode, not a correction — reject it
        if scale <= 1e-2 or not np.isfinite(scale) or not (0.5 < scale < 2.0):
            return False
        _apply_inertial_solution(tracker, out, chain,
                                 event=f"viba{imu.viba_stage + 1}")
        # VIBA1/VIBA2 are InitializeIMU re-runs ending in FullInertialBA
        # with relaxed priors (LocalMapping.cc:200-228: 1.f/1e5 then 0/0)
        run_full_inertial_ba(tracker, pg, pa, iters=10)
        imu.viba_stage += 1
        return True

    # mono scale refinement: biases AND velocities frozen at the map's
    # current estimates — only scale + gravity direction are free
    # (Optimizer::InertialOptimization(Map*, Rwg, scale),
    # Optimizer.cc:3389: every other vertex is fixed)
    out = initialization.inertial_only_optimization(
        R_wb, t_wb, preints, bg0=imu.bg, ba0=imu.ba, fix_bias=True,
        v0=tracker.map.kf_vel[jnp.asarray(chain)], fix_velocities=True,
        iters=30,
    )
    imu.last_scale_refine_ts = ts_now
    scale = float(out["scale"])
    if scale <= 1e-2 or not np.isfinite(scale) or not (0.5 < scale < 2.0):
        return False
    # apply only a meaningful correction (reference: |s-1| > 1e-5)
    if abs(scale - 1.0) < 1e-5:
        return False
    _apply_inertial_solution(tracker, out, chain, update_bias=False,
                             event="scale_refine")
    return True


def scale_refine_once(tracker) -> bool:
    """One scale+gravity-only refinement against the inertial chain
    (ScaleRefinement, LocalMapping.cc:1429): biases frozen, poses fixed —
    a well-conditioned direct solve of the gauge. FullInertialBA descends
    the scale valley slowly (it stretches the whole map through the
    reprojection terms); alternating it with this closed-ish solve jumps
    to the inertially-consistent scale in one step."""
    imu = tracker.imu
    chain_out = _inertial_chain(tracker, bg=imu.bg, ba=imu.ba)
    if chain_out is None or len(chain_out[0]) < 4:
        return False
    chain, preints, R_wb, t_wb = chain_out
    # biases and velocities fixed at the map's estimates: only the gauge
    # (scale + gravity direction) is solved (Optimizer.cc:3389)
    out = initialization.inertial_only_optimization(
        R_wb, t_wb, preints, bg0=imu.bg, ba0=imu.ba, fix_bias=True,
        v0=tracker.map.kf_vel[jnp.asarray(chain)], fix_velocities=True,
        iters=30,
    )
    scale = float(out["scale"])
    if scale <= 1e-2 or not np.isfinite(scale) or not (0.25 < scale < 4.0):
        return False
    if abs(scale - 1.0) < 1e-5:
        return False
    _apply_inertial_solution(tracker, out, chain, update_bias=False,
                             event="scale_refine")
    return True


def cull_keyframes_inertial(tracker, window_rows, min_redundancy: float = 0.9):
    """KeyFrameCulling for inertial maps (LocalMapping.cc:902-1041): the
    usual redundancy test (>=90 % of bound landmarks seen by >=3 other KFs;
    50 % for stereo-inertial per :912-918), PLUS temporal-chain rules — a
    keyframe may only be culled if the chain gap it leaves stays below
    3 s (mono-inertial) / 0.5 s (stereo/rgbd-inertial), and its IMU
    preintegration interval is merged into its successor's
    (Preintegrated::MergePrevious, ImuTypes.cc:237)."""
    s = tracker.map
    imu = tracker.imu
    if tracker.cfg.sensor == "mono-imu":
        max_gap = 3.0
    else:
        max_gap = 0.5
        min_redundancy = 0.5
    L, K = s.lmax, s.kmax
    # ONE batched device->host sync (serial np.array fetches each pay a
    # ~25 ms completion quantum on the tunnel — measured 198 ms p50 for
    # this function's old 6-fetch prologue)
    n_kf_d, lm_all, fv_all, kf_valid, kf_prev, ts = jax.device_get(
        (s.n_kf, s.kf_feat_lm, s.kf_feat_valid, s.kf_valid, s.kf_prev,
         s.kf_timestamp))
    n_kf = int(n_kf_d)
    lm_all = np.asarray(lm_all)
    fv_all = np.asarray(fv_all)
    kf_valid = np.asarray(kf_valid).copy()
    kf_prev = np.asarray(kf_prev).copy()
    ts = np.asarray(ts)
    obs_cnt = np.zeros(L, np.int64)
    bound_all = (lm_all >= 0) & fv_all
    np.add.at(obs_cnt, np.clip(lm_all, 0, L - 1)[bound_all], 1)

    # temporal successor: row r with kf_prev[r] == k
    next_of = -np.ones(K, np.int32)
    for r in range(n_kf):
        p = kf_prev[r]
        if p >= 0:
            next_of[p] = r

    rows = [int(r) for r in np.asarray(window_rows)]
    killed = []
    for k in rows:
        if k <= 1 or k >= n_kf - 2 or not kf_valid[k]:
            continue
        p, nx = kf_prev[k], next_of[k]
        if p < 0 or nx < 0 or not (kf_valid[p] and kf_valid[nx]):
            continue
        if ts[nx] - ts[p] >= max_gap:
            continue
        bound = bound_all[k]
        nb = int(bound.sum())
        if nb <= 10:
            continue
        frac = float((obs_cnt[np.clip(lm_all[k], 0, L - 1)][bound] >= 4).mean())
        if frac <= min_redundancy:
            continue
        # merge the IMU interval (prev->k) into (k->next)
        if k in imu.kf_buffers and nx in imu.kf_buffers:
            a1, g1, d1 = imu.kf_buffers.pop(k)
            a2, g2, d2 = imu.kf_buffers[nx]
            imu.kf_buffers[nx] = (
                np.concatenate([a1, a2]), np.concatenate([g1, g2]),
                np.concatenate([d1, d2]),
            )
        elif k in imu.kf_buffers:
            imu.kf_buffers[nx] = imu.kf_buffers.pop(k)
        kf_prev[nx] = p
        next_of[p] = nx
        kf_valid[k] = False
        killed.append(k)

    if not killed:
        return False
    killed_rows = jnp.asarray(killed, jnp.int32)
    killed_mask = jnp.zeros((K,), bool).at[killed_rows].set(True)
    detach = killed_mask[:, None] & (s.kf_feat_lm >= 0)
    # re-parent children transitively: walk each parent chain up to the
    # first surviving ancestor (KeyFrame::SetBadFlag re-parents children;
    # a single hop dangles when the grandparent died in the same round)
    parent0 = np.array(s.kf_parent)
    killed_set = set(killed)
    new_parent = parent0.copy()
    for r in range(n_kf):
        p = int(new_parent[r])
        while p >= 0 and p in killed_set:
            p = int(parent0[p])
        new_parent[r] = p
    tracker.map = dataclasses.replace(
        s,
        kf_valid=jnp.asarray(kf_valid),
        kf_prev=jnp.asarray(kf_prev),
        kf_feat_lm=jnp.where(detach, -1, s.kf_feat_lm),
        kf_parent=jnp.asarray(new_parent),
    )
    return True


# ----------------------------------------------------------------------
# VI local BA dispatch
# ----------------------------------------------------------------------

def run_vi_local_ba(tracker, window_rows: np.ndarray, n_fixed: int,
                    iters: int = 6, bias_prior=None):
    """LocalInertialBA over the window (consecutive KF rows required for the
    inertial chain). With bias_prior and a full-map window this is
    FullInertialBA (Optimizer.cc:392-811): the joint visual+inertial BA
    the staged initialization runs after the inertial-only MAP + gauge
    transform (LocalMapping.cc:1304-1310)."""
    from ..atlas.state import NO_LM

    cfg = tracker.cfg
    imu = tracker.imu
    s = tracker.map
    rows = [int(r) for r in window_rows]
    W0 = len(rows)
    # bucket the window length: pads repeat the LAST row (their visual
    # edges masked, their camera vertices fixed, their chain edges invalid)
    # so each bucket is ONE compiled program regardless of chain growth
    W = _w_bucket(W0)
    rows = rows + [rows[-1]] * (W - W0)
    real = np.arange(W) < W0
    L = s.lmax
    Fc = s.fmax

    rows_j = jnp.asarray(rows, jnp.int32)
    Rwb, twb = jax.vmap(
        lambda R, t: cam_to_body(R, t, imu.Rbc, imu.tbc)
    )(s.kf_R[rows_j], s.kf_t[rows_j])

    # inertial intervals between temporally-chained window rows (buffer r
    # covers kf_prev[r] -> r; culling merges intervals, so adjacency is by
    # mPrevKF link, not arena row) — batched into ONE preintegration
    # dispatch over the whole chain
    kf_prev_np = np.array(s.kf_prev)
    interval_rows = []
    ok_chain = []
    for i in range(W - 1):
        ok = (real[i + 1] and kf_prev_np[rows[i + 1]] == rows[i]
              and rows[i + 1] in imu.kf_buffers)
        interval_rows.append(rows[i + 1] if ok else None)
        ok_chain.append(bool(ok))
    if not any(ok_chain):
        return False
    acc, gyro, dts, valid = imu.stacked_buffers(interval_rows)
    pstack = _integrate_batch(
        jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
        jnp.asarray(valid),
        s.kf_bg[rows_j[:-1]], s.kf_ba[rows_j[:-1]], imu.noise4(),
    )
    preint_data, preint_info, rw_info = _preint_edge_arrays(pstack)

    # visual edges from the window (pad rows contribute none)
    lm_idx0 = s.kf_feat_lm[rows_j]
    feat_ok = (s.kf_feat_valid[rows_j] & (lm_idx0 >= 0)
               & jnp.asarray(real)[:, None])
    lm_safe = jnp.clip(lm_idx0, 0, L - 1)
    obs_ok = (feat_ok & s.lm_valid[lm_safe]).reshape(-1)
    cam_idx = jnp.broadcast_to(jnp.arange(W)[:, None], (W, Fc)).reshape(-1)
    lm_edge = lm_safe.reshape(-1)
    uv = s.kf_feat_xy[rows_j].reshape(-1, 2)
    oct_ = s.kf_feat_octave[rows_j].reshape(-1)
    inv_sig2 = 1.0 / (
        tracker.scale_factors[jnp.clip(oct_, 0, cfg.orb.n_levels - 1)] ** 2
    )
    observed = jnp.zeros((L,), bool).at[lm_edge].max(obs_ok)

    cam_fixed = (jnp.arange(W) < n_fixed) | ~jnp.asarray(real)
    src = jnp.arange(W - 1, dtype=jnp.int32)
    chain_valid = jnp.asarray(ok_chain)

    if bias_prior is not None:
        bias_prior = jnp.asarray(bias_prior, jnp.float32)
    Ro, to, vo, bgo, bao, Xo, stats = vi_ba.local_inertial_ba(
        cfg.kind, cfg.K, imu.Rbc, imu.tbc,
        Rwb, twb, s.kf_vel[rows_j], s.kf_bg[rows_j], s.kf_ba[rows_j],
        cam_fixed,
        s.lm_pos, ~observed,
        cam_idx, lm_edge, uv, inv_sig2, obs_ok,
        preint_data, preint_info, rw_info,
        src, src + 1, chain_valid,
        iters=iters, bias_prior=bias_prior,
    )
    R_cw, t_cw = jax.vmap(
        lambda R, t: body_to_cam(R, t, imu.Rbc, imu.tbc)
    )(Ro, to)
    rows_w = jnp.where(jnp.asarray(real), rows_j, s.kmax)  # drop pad writes
    tracker.map = dataclasses.replace(
        s,
        kf_R=s.kf_R.at[rows_w].set(R_cw, mode="drop"),
        kf_t=s.kf_t.at[rows_w].set(t_cw, mode="drop"),
        kf_vel=s.kf_vel.at[rows_w].set(vo, mode="drop"),
        kf_bg=s.kf_bg.at[rows_w].set(bgo, mode="drop"),
        kf_ba=s.kf_ba.at[rows_w].set(bao, mode="drop"),
        lm_pos=Xo,
    )
    tracker.imu.bg = bgo[W0 - 1]
    tracker.imu.ba = bao[W0 - 1]
    tracker.imu.vel = vo[W0 - 1]
    return True


def run_full_inertial_ba(tracker, prior_g: float, prior_a: float,
                         iters: int = 15):
    """FullInertialBA over the active map's whole temporal chain
    (Optimizer::FullInertialBA, /root/reference/src/Optimizer.cc:392-811;
    callers LocalMapping.cc:1304-1310 with priors 1e2/1e10 at init,
    1/1e5 at VIBA1, 0/0 at VIBA2): joint visual+inertial BA with
    zero-mean bias priors on the first keyframe. Without this the VIBA
    stages only re-solve the inertial subproblem and the map's scale
    never converges past the closed-form alignment (~VERDICT r2 #2)."""
    imu = tracker.imu
    chain_out = _inertial_chain(tracker, bg=imu.bg, ba=imu.ba)
    if chain_out is None:
        return False
    chain = chain_out[0]
    if len(chain) < 4:
        return False
    prior = None
    if prior_g > 0 or prior_a > 0:
        prior = (max(prior_g, 1e-6), max(prior_a, 1e-6))
    return run_vi_local_ba(tracker, np.asarray(chain), n_fixed=1,
                           iters=iters, bias_prior=prior)
