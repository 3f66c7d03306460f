"""Background global bundle adjustment with abort + catch-up reconciliation.

The reference runs global BA in a transient side thread after a loop
closure (`LoopClosing::CorrectLoop` spawns `RunGlobalBundleAdjustment`,
`/root/reference/src/LoopClosing.cc:1199-1207,2268`), abortable via the
`mbStopGBA` flag (`:979-993`), and on completion reconciles the (since
moved-on) live map: keyframes created during GBA inherit their spanning-tree
parent's correction (`:2334-2449`) and map points created during GBA are
corrected through their reference keyframe (`:2453-2486`).

TPU-native shape: the GBA thread works on an immutable MapState snapshot
(no locks — SURVEY.md §7.1), runs the landmark-sharded Schur engine in
abortable iteration chunks, and `reconcile()` merges the result into the
tracker's current state with exactly the reference's two catch-up rules.
"""

from __future__ import annotations

import dataclasses
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..atlas.state import MapState
from ..ops import lie
from ..parallel import map_ba


def _make_mesh():
    """Single-device mesh by default: the background GBA thread shares the
    chip with tracking dispatch. A multi-device mesh here would issue
    collectives (all_reduce) whose in-process rendezvous can starve against
    the main thread's concurrent XLA work and hard-abort the process (seen
    on the 8-virtual-device CPU backend: `Termination timeout for all
    reduce ... Exiting`). Callers that dedicate devices to GBA pass an
    explicit mesh."""
    devs = np.array(jax.devices()[:1])
    return Mesh(devs.reshape(-1), ("lm",))


class GlobalBARunner:
    """One GBA campaign: launch() on a snapshot, poll finished, reconcile().

    Synchronous use: run(snapshot) -> optimized snapshot (tests/driver).
    """

    def __init__(self, K8, kind: int, num_iters: int = 10, chunk: int = 5,
                 mesh: Mesh | None = None):
        self.K8 = K8
        self.kind = kind
        self.num_iters = num_iters
        self.chunk = chunk
        self.mesh = mesh
        self._thread: threading.Thread | None = None
        self._abort = threading.Event()
        self.snapshot: MapState | None = None   # state at launch
        self.result: MapState | None = None     # optimized snapshot
        self.failed = False

    # ------------------------------------------------------------------
    def run(self, s: MapState) -> MapState:
        """Synchronous full BA on the active map (GlobalBundleAdjustemnt,
        Optimizer.cc:52: 10 iterations), abortable between chunks."""
        mesh = self.mesh if self.mesh is not None else _make_mesh()
        done = 0
        while done < self.num_iters and not self._abort.is_set():
            it = min(self.chunk, self.num_iters - done)
            s = map_ba.distributed_global_ba(
                s, self.K8, mesh, kind=self.kind, num_iters=it
            )
            done += it
        return s

    # ------------------------------------------------------------------
    def launch(self, s: MapState):
        """Start the side-thread GBA on a snapshot of s (the reference's
        `new thread(&LoopClosing::RunGlobalBundleAdjustment, ...)`)."""
        if self.running:
            return
        self.snapshot = s
        self.result = None
        self.failed = False
        self._abort.clear()

        def _target():
            try:
                self.result = self.run(self.snapshot)
            except Exception:  # noqa: BLE001 — GBA failure must not kill tracking
                self.failed = True

        self._thread = threading.Thread(target=_target, daemon=True)
        self._thread.start()

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    @property
    def finished(self) -> bool:
        return (self._thread is not None and not self._thread.is_alive()
                and self.result is not None and not self.failed)

    def request_abort(self):
        """mbStopGBA: a new loop/merge invalidates the running GBA."""
        self._abort.set()

    def join(self, timeout=None):
        if self._thread is not None:
            self._thread.join(timeout)

    # ------------------------------------------------------------------
    def reconcile(self, cur: MapState) -> MapState:
        """Merge the finished GBA result into the live state.

        - keyframes that existed at launch take their GBA pose;
        - keyframes created during GBA are corrected via their spanning-tree
          parent: T_child_new = (T_child_cur T_parent_cur^-1) T_parent_new
          (LoopClosing.cc:2334-2449);
        - landmarks that existed at launch take their GBA position;
        - landmarks created during GBA are corrected through their reference
          keyframe: X_new = T_ref_new^-1 T_ref_cur X_cur (:2453-2486).
        """
        snap, res = self.snapshot, self.result
        if res is None:
            return cur
        in_gba_kf = np.array(snap.kf_valid)
        in_gba_lm = np.array(snap.lm_valid)
        n_kf = int(cur.n_kf)

        kf_R = np.array(cur.kf_R)
        kf_t = np.array(cur.kf_t)
        kf_R_cur = kf_R.copy()
        kf_t_cur = kf_t.copy()
        res_R = np.array(res.kf_R)
        res_t = np.array(res.kf_t)
        parent = np.array(cur.kf_parent)
        valid = np.array(cur.kf_valid)

        kf_R[in_gba_kf] = res_R[in_gba_kf]
        kf_t[in_gba_kf] = res_t[in_gba_kf]
        # new keyframes: walk forward (children always have higher rows)
        for k in range(n_kf):
            if in_gba_kf[k] or not valid[k]:
                continue
            p = parent[k]
            if p < 0 or p >= n_kf:
                continue
            # T_rel = T_child_cur ∘ T_parent_cur^-1 (old relative pose)
            Rp_i, tp_i = lie.se3_inv(jnp.asarray(kf_R_cur[p]),
                                     jnp.asarray(kf_t_cur[p]))
            R_rel, t_rel = lie.se3_mul(jnp.asarray(kf_R_cur[k]),
                                       jnp.asarray(kf_t_cur[k]), Rp_i, tp_i)
            Rn, tn = lie.se3_mul(R_rel, t_rel, jnp.asarray(kf_R[p]),
                                 jnp.asarray(kf_t[p]))
            kf_R[k] = np.array(Rn)
            kf_t[k] = np.array(tn)

        lm_pos = np.array(cur.lm_pos)
        res_pos = np.array(res.lm_pos)
        lm_valid = np.array(cur.lm_valid)
        lm_pos[in_gba_lm] = res_pos[in_gba_lm]
        new_lm = lm_valid & ~in_gba_lm
        if new_lm.any():
            ref = np.clip(np.array(cur.lm_first_kf), 0, cur.kmax - 1)
            rows = np.nonzero(new_lm)[0]
            k = ref[rows]
            Xc = np.einsum("nij,nj->ni", kf_R_cur[k], lm_pos[rows]) + kf_t_cur[k]
            # X_new = R_new^T (Xc - t_new)
            lm_pos[rows] = np.einsum(
                "nji,nj->ni", kf_R[k], Xc - kf_t[k]
            )

        out = dataclasses.replace(
            cur,
            kf_R=jnp.asarray(kf_R),
            kf_t=jnp.asarray(kf_t),
            lm_pos=jnp.asarray(lm_pos),
        )
        self._thread = None
        self.result = None
        self.snapshot = None
        return out
