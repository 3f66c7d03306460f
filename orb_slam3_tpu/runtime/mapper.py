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
    def start(self, initial_state: atlas_state.MapState, last_kf_row: int):
        self._state = initial_state
        self._last_kf_row = last_kf_row
        # host mirror of the keyframe bump allocator: each processed
        # package appends exactly one row, so the append position is known
        # without the per-package device fetch (one RTT each, mapper-side)
        self._host_n_kf = int(initial_state.n_kf)
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

    def enqueue(self, pkg: pipeline.KFPackage) -> bool:
        """InsertKeyFrame. Returns False if the queue is full (the tracker's
        NeedNewKeyFrame checks idleness first, so this is a backstop —
        Tracking.cc:3196-3214 interrupts BA and drops KFs when mapping is
        saturated)."""
        if self.error is not None:
            raise RuntimeError("mapper thread died") from self.error
        with self._cond:
            if len(self._queue) >= self.max_queue:
                return False
            self._queue.append(pkg)
            self._cond.notify_all()
        return True

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

    def set_state(self, s: atlas_state.MapState, last_kf_row: int | None = None):
        """Replace the canonical state. Only legal when idle (callers flush
        first) — used for map lifecycle ops decided by tracking (new map on
        timestamp jump / LOST, relocalization map switch)."""
        with self._cond:
            assert not self._queue and not self._busy, "set_state while busy"
            self._state = s
            self._version += 1
            self._host_n_kf = int(s.n_kf)
            if last_kf_row is not None:
                self._last_kf_row = last_kf_row

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
                s = pipeline.run_visual_ba(
                    s, cfg, self.scale_factors, ba_rows, n_fixed,
                    self.base_sensor,
                    abort_check=(
                        self._queue_nonempty
                        if self._skipped_ba < self.max_ba_skips else None
                    ),
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
        with self._cond:
            self._version += 1
            self._latest = MapCommit(
                state=s, version=self._version, kf_row=kf,
                pkg_R=np.array(pkg.R), pkg_t=np.array(pkg.t),
                big_change=big,
                n_loops=self.loop_closer.n_loops if self.loop_closer else 0,
                n_merges=self.loop_closer.n_merges if self.loop_closer else 0,
                stats_arr=stats,
                pkg_ts=float(pkg.timestamp),
            )
            self._cond.notify_all()
