"""Loop closing and map merging orchestrator.

Role of the LoopClosing thread (`/root/reference/src/LoopClosing.cc`):
per new keyframe — place-recognition query (`NewDetectCommonRegions:324`),
then the full verification cascade of `DetectCommonRegionsFromBoW`
(`LoopClosing.cc:578-885`):

  1. BoW matches against the candidate + its best covisibles' pooled map
     points (numBoWMatches >= 20),
  2. Sim3 RANSAC (>= 15 geometric inliers, `:699`),
  3. guided SearchByProjection expansion through the coarse Sim3
     (numProjMatches >= 50, `:758`),
  4. OptimizeSim3 LM refinement (numOptMatches >= 20, `:769`),
  5. re-projection at the refined Sim3 with a tighter window
     (numProjOptMatches >= 80, `:779`),
  6. 3-covisible-keyframe verification: the current KF's covisibles must
     independently re-find the region through the propagated Sim3
     (`:819-843`); short of 3, detection stays PENDING and must be
     re-confirmed on successive keyframes (`DetectAndReffineSim3FromLastKF`,
     temporal consistency `mnLoopNumCoincidences >= 3`, `:396,880`; two
     consecutive misses reset, `:409-416`).

On confirmation: loop correction (`CorrectLoop:969`: corrected Sim3
propagated through the covisible window, landmark transport, essential-graph
optimization, SearchAndFuse welding) or cross-map merge (`MergeLocal:1215`).

Host orchestrator over jitted stages; invoked after keyframe insertion by
the background mapper thread (runtime.AsyncMapper) or synchronously
(SURVEY.md §7.1: snapshots instead of locks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..atlas import ops as atlas_ops
from ..atlas import state as atlas_state
from ..frontend import camera as cam_mod
from ..frontend import matching
from ..ops import lie
from ..place import recognition, vocab as vocab_mod
from . import essential, sim3_solver


@dataclasses.dataclass
class LoopCloserConfig:
    # verification-cascade gates (DetectCommonRegionsFromBoW,
    # /root/reference/src/LoopClosing.cc:581-585)
    n_bow_matches: int = 20        # nBoWMatches
    n_bow_inliers: int = 15        # nBoWInliers (Sim3 RANSAC)
    n_sim3_inliers: int = 20       # nSim3Inliers (after OptimizeSim3)
    n_proj_matches: int = 50       # nProjMatches (coarse guided projection)
    n_proj_opt_matches: int = 80   # nProjOptMatches (refined projection)
    # temporal / covisible consistency (LoopClosing.cc:396,541-543,822-843)
    n_consistency: int = 3         # coincidences needed to confirm
    n_refine_matches: int = 30     # DetectAndReffineSim3FromLastKF nProjMatches
    n_refine_opt_matches: int = 50 # ... nProjOptMatches
    max_not_found: int = 2         # misses before the pending loop resets
    n_covisibles_pool: int = 10    # nNumCovisibles
    # projection windows (SearchByProjection th args, LoopClosing.cc:756,777)
    proj_radius_coarse: float = 12.0
    proj_radius_fine: float = 6.0
    min_kfs_in_map: int = 12       # skip young maps (LoopClosing.cc:356)
    min_temporal_gap: int = 10     # don't match very recent KFs
    covis_threshold: int = 15
    run_pgo: bool = True


def _pool_rows(W_row, self_row, n, valid):
    """self + best-n covisible keyframe rows (GetBestCovisibilityKeyFrames)."""
    W_row = np.array(W_row).copy()
    W_row[self_row] = 0
    order = np.argsort(-W_row)
    rows = [self_row] + [int(r) for r in order[:n]
                         if W_row[r] > 0 and valid[r]]
    return rows


def _landmark_pool(s: atlas_state.MapState, rows):
    """[lmax] bool union of the landmarks observed by `rows`."""
    pool = jnp.zeros((s.lmax,), bool)
    for r in rows:
        lm = s.kf_feat_lm[r]
        ok = (lm >= 0) & s.kf_feat_valid[r]
        pool = pool.at[jnp.where(ok, lm, s.lmax - 1)].max(ok)
    return pool & s.lm_valid


def project_match_sim3(kind, K8, Rs, ts, ss, lm_pos, lm_desc, pool,
                       feat_xy, feat_desc, feat_valid, radius_px,
                       max_dist=matching.TH_LOW,
                       lm_normal=None, lm_min_dist=None, lm_max_dist=None):
    """SearchByProjection through a Sim3 world->camera transform
    (`ORBmatcher::SearchByProjection(KeyFrame*, Scw, ...)`,
    `/root/reference/src/ORBmatcher.cc:43-150`): project the pooled
    landmarks, window-gate against the keyframe's features, best descriptor
    match per landmark. Returns (feat_idx [L], dist [L], ok [L]).

    When the landmark normal / scale-invariance envelope are given, applies
    the reference's viewing-direction and distance gates
    (`ORBmatcher.cc:92-105`: dist in [minD, maxD], PO.dot(Pn) >= 0.5*dist).
    These matter for loop verification: a mirrored-texture alias can be
    realized as a PROPER 180-degree rotation about an in-plane axis — the
    matched surface is then viewed from BEHIND, which only the normal
    check rejects."""
    Xc = ss * jnp.einsum("ij,lj->li", Rs, lm_pos) + ts
    uvp = cam_mod.project(kind, K8, Xc)
    front = (Xc[:, 2] > 0.05) & pool
    if lm_normal is not None:
        # camera center in world: S_cw^{-1} origin = -(1/s) R^T t
        O = -jnp.einsum("ji,j->i", Rs, ts) / jnp.maximum(ss, 1e-9)
        PO = lm_pos - O[None, :]
        d3 = jnp.linalg.norm(PO, axis=-1)
        view_ok = jnp.sum(PO * lm_normal, axis=-1) >= 0.5 * d3
        dist_ok = (d3 >= 0.8 * lm_min_dist) & (d3 <= 1.2 * lm_max_dist)
        front = front & view_ok & dist_ok
    win = matching.window_mask(uvp, feat_xy, radius_px, front, feat_valid)
    dist = matching.hamming_matrix(lm_desc, feat_desc)
    return matching.masked_best_match(dist, win, max_dist=max_dist)


@dataclasses.dataclass
class PendingLoop:
    """A detection that passed the cascade but not yet the consistency
    gate — the mnLoopNumCoincidences / mg2oLoopSlw state."""

    cand: int                  # matched keyframe row
    last_kf: int               # most recent KF that re-found the region
    Rsw: jnp.ndarray           # current refined S_cw (world -> cam of last_kf)
    tsw: jnp.ndarray
    ssw: float
    pool: jnp.ndarray          # [lmax] matched-side landmark pool
    n_coincidences: int
    n_not_found: int = 0


class LoopCloser:
    def __init__(self, voc: vocab_mod.Vocabulary, kmax: int,
                 cfg: LoopCloserConfig = LoopCloserConfig(),
                 scale_factors=None):
        self.voc = voc
        self.cfg = cfg
        self.db = recognition.KeyframeDB.empty(kmax, voc.n_words)
        self.scale_factors = scale_factors
        self.n_loops = 0
        self.n_merges = 0
        self.pending: PendingLoop | None = None
        # inertial context, set by the mapper/tracker before on_keyframe:
        # None for visual sensors, else (imu_initialized, viba_stage).
        # Drives the reference's inertial fidelity rules: no detection
        # until inertial BA2 (LoopClosing.cc:341-346), pitch/roll gate +
        # yaw-only forcing on loop corrections (:240-252), merge scale
        # sanity + yaw forcing (:144-163), and 4-DoF essential graph
        # (:1176-1184).
        self.inertial: tuple | None = None

    def _trace(self, msg):
        verbose_on = getattr(self, "trace", False)
        if verbose_on:
            print(f"[loop] {msg}", flush=True)

    # ------------------------------------------------------------------
    def rebuild_db(self, s: atlas_state.MapState):
        """Repopulate the keyframe database from a loaded MapState — every
        valid keyframe's BoW vector is re-added, exactly the reference's
        PostLoad path (`/root/reference/src/System.cc:1445-1506` ->
        `Atlas::PostLoad`, `Atlas.cc:335`: `mpKeyFrameDB->add(pKF)` per KF).
        Without this, relocalization/loop/merge against a resumed map can
        never fire."""
        self.db = recognition.KeyframeDB.empty(s.kmax, self.voc.n_words)
        valid = np.array(s.kf_valid)
        for k in range(int(s.n_kf)):
            if not valid[k]:
                continue
            bow = vocab_mod.sparse_bow(
                self.voc, s.kf_feat_desc[k], s.kf_feat_valid[k]
            )
            self.db = self.db.add(k, bow)

    # ------------------------------------------------------------------
    def on_keyframe(self, s: atlas_state.MapState, kf_row: int, kind: int, K8):
        """NewDetectCommonRegions + correction. Returns (state, closed)."""
        cfg = self.cfg
        bow = vocab_mod.sparse_bow(
            self.voc, s.kf_feat_desc[kf_row], s.kf_feat_valid[kf_row]
        )
        # inertial maps: no loop/merge detection until inertial BA2 has
        # refined the gauge (LoopClosing.cc:341-346 — a pre-VIBA2 scale/
        # gravity estimate would weld a mis-scaled correction into the map)
        if self.inertial is not None:
            initialized, viba_stage = self.inertial
            if not initialized or viba_stage < 2:
                self.db = self.db.add(kf_row, bow)
                return s, False
        W = atlas_state.covisibility_weights(s)
        # candidate EXCLUSION uses any-shared-observation connectivity:
        # the reference's spConnectedKeyFrames comes from the FULL
        # KFcounter (`mConnectedKeyFrameWeights = KFcounter`,
        # KeyFrame.cc:461 — weight>=1), not the >=15 strong-edge set.
        # Weakly-overlapping consecutive views (shared panels at a large
        # viewpoint change) must not become loop candidates.
        connected = W[kf_row] >= 1
        covis = W[kf_row] >= cfg.covis_threshold

        confirmed = None  # (cand, Rsw, tsw, ssw, pool)

        # 1) temporal-consistency track of a pending detection
        # (DetectAndReffineSim3FromLastKF, LoopClosing.cc:374-420)
        if self.pending is not None:
            confirmed = self._refine_pending(s, kf_row, kind, K8)

        # 2) fresh BoW candidates when nothing is pending
        n_kf = int(s.n_kf)
        if (self.pending is None and confirmed is None
                and n_kf >= cfg.min_kfs_in_map):
            covis_scores = recognition.query(self.db, bow)
            cs = np.array(jnp.where(covis & self.db.valid, covis_scores, jnp.nan))
            min_score = float(np.nanmin(cs)) if np.any(~np.isnan(cs)) else 0.0

            # row index stands in for recency only WITHIN a map: rows of a
            # different map (e.g. shipped across hosts and appended at high
            # row numbers, multihost.HostedAtlas.ship_map) are never
            # "recent" — the reference's gate is connectivity, not time
            # (KeyFrameDatabase.cc:604 excludes spConnectedKeyFrames only)
            recent = (jnp.arange(s.kmax) > (kf_row - cfg.min_temporal_gap)) \
                & (s.kf_map_id == s.kf_map_id[kf_row])
            idx, vals, ok = recognition.loop_candidates(
                self.db, bow, kf_row, connected | recent, min_score,
                covis_W=W,
            )
            for cand, okc in zip(np.array(idx), np.array(ok)):
                if not okc:
                    continue
                confirmed = self._cascade(s, kf_row, int(cand), kind, K8, W)
                if confirmed is not None or self.pending is not None:
                    break

        closed = False
        if confirmed is not None:
            cand, Rsw, tsw, ssw, pool = confirmed
            same_map = int(s.kf_map_id[kf_row]) == int(s.kf_map_id[cand])
            if same_map:
                ok_inertial, Rsw, tsw, ssw = self._inertial_loop_gate(
                    s, kf_row, Rsw, tsw, ssw
                )
                if not ok_inertial:
                    self._trace("BAD LOOP (inertial pitch/roll/yaw gate)")
                    self.pending = None
                    self.db = self.db.add(kf_row, bow)
                    return s, False
                s = self._correct_loop(s, kf_row, cand, Rsw, tsw, ssw,
                                       pool, kind, K8)
                self.n_loops += 1
            else:
                if not self._inertial_merge_gate(ssw):
                    self._trace("merge scale out of [0.9,1.1] (inertial)")
                    self.pending = None
                    self.db = self.db.add(kf_row, bow)
                    return s, False
                s = self._merge_maps_scw(s, kf_row, cand, Rsw, tsw, ssw,
                                         kind, K8)
                self.n_merges += 1
            self.pending = None
            closed = True

        self.db = self.db.add(kf_row, bow)
        return s, closed

    # ------------------------------------------------------------------
    def _inertial_loop_gate(self, s, kf_row, Rsw, tsw, ssw):
        """Inertial loop sanity + yaw-only forcing (LoopClosing.cc:228-258):
        the world-to-world correction Sww = Twc o Scw must be nearly pure
        yaw (|pitch|,|roll| < 0.008 rad, |yaw| < 0.349) — gravity is
        observable, so a correction that bends it is a bad loop. With
        VIBA2 done the residual pitch/roll is zeroed exactly (the 4-DoF
        gauge). Returns (ok, Rsw, tsw, ssw) with the possibly-forced Scw."""
        if self.inertial is None:
            return True, Rsw, tsw, ssw
        _, viba_stage = self.inertial
        Rwc, twc = lie.se3_inv(s.kf_R[kf_row], s.kf_t[kf_row])
        Rww, tww, sww = lie.sim3_mul(
            Rwc, twc, jnp.asarray(1.0), Rsw, tsw, jnp.asarray(ssw)
        )
        phi = np.array(lie.so3_log(Rww))
        if not (abs(phi[0]) < 0.008 and abs(phi[1]) < 0.008
                and abs(phi[2]) < 0.349):
            return False, Rsw, tsw, ssw
        if viba_stage >= 2:
            # force only yaw; scale snapped to 1 (metric map)
            phi[0] = 0.0
            phi[1] = 0.0
            Rww_f = lie.so3_exp(jnp.asarray(phi))
            Rcw, tcw = lie.se3_inv(Rwc, twc)
            Rsw, tsw, ssw_j = lie.sim3_mul(
                Rcw, tcw, jnp.asarray(1.0), Rww_f, tww, jnp.asarray(1.0)
            )
            ssw = float(ssw_j)
        return True, Rsw, tsw, ssw

    def _inertial_merge_gate(self, ssw):
        """Merge scale sanity for inertial maps (LoopClosing.cc:140-155):
        both maps are metric, so the measured map-to-map scale must be in
        [0.9, 1.1]."""
        if self.inertial is None:
            return True
        return 0.9 < float(ssw) < 1.1

    # ------------------------------------------------------------------
    def _match_pairs(self, s, kf_row, feat_idx, pool_dist, ok_lm):
        """Build Sim3-optimization pairs from a landmark->feature match.

        Returns per-feature arrays over the current KF's feature axis:
        (matched_lm [F], fwd [F], own_lm [F], inv [F]) — fwd marks features
        matched by some pool landmark (conflicts resolved best-distance);
        inv additionally requires the feature's own map point."""
        F = s.kf_feat_xy.shape[1]
        L = s.lmax
        lm_rows = jnp.arange(L, dtype=jnp.int32)
        big = jnp.int32(2 ** 30)
        key = pool_dist.astype(jnp.int32) * L + lm_rows
        best = jnp.full((F,), big, jnp.int32).at[
            jnp.where(ok_lm, feat_idx, F)
        ].min(jnp.where(ok_lm, key, big), mode="drop")
        matched_lm = jnp.where(best < big, best % L, 0)
        fwd = best < big
        own = s.kf_feat_lm[kf_row]
        own_ok = fwd & (own >= 0) & s.lm_valid[jnp.clip(own, 0, L - 1)]
        return matched_lm, fwd, jnp.clip(own, 0, L - 1), own_ok

    def _optimize_scm(self, s, kf_row, cand, Rsw, tsw, ssw, pool,
                      kind, K8, radius, fix_scale):
        """Guided projection + OptimizeSim3 against the pool; returns
        (n_proj, n_opt, refined Scw) — stages 3+4 of the cascade."""
        feat_idx, pdist, ok_lm = project_match_sim3(
            kind, K8, Rsw, tsw, ssw, s.lm_pos, s.lm_desc, pool,
            s.kf_feat_xy[kf_row], s.kf_feat_desc[kf_row],
            s.kf_feat_valid[kf_row], radius,
            lm_normal=s.lm_normal, lm_min_dist=s.lm_min_dist,
            lm_max_dist=s.lm_max_dist,
        )
        n_proj = int(ok_lm.sum())
        matched_lm, fwd, own_lm, inv = self._match_pairs(
            s, kf_row, feat_idx, pdist, ok_lm
        )
        # S_cm relative to the matched KF: Scm = Scw o T_wm
        Rm, tm = s.kf_R[cand], s.kf_t[cand]
        Rwm, twm = lie.se3_inv(Rm, tm)
        Rcm, tcm, scm = lie.sim3_mul(Rsw, tsw, jnp.asarray(ssw),
                                     Rwm, twm, jnp.asarray(1.0))
        # camera-frame fixed points (Optimizer.cc:2146-2175)
        P2 = lie.se3_apply(Rm, tm, s.lm_pos[matched_lm])   # matched, cam2
        P1 = lie.se3_apply(s.kf_R[kf_row], s.kf_t[kf_row],
                           s.lm_pos[own_lm])               # own, cam1
        uv1 = s.kf_feat_xy[kf_row]
        uv2 = cam_mod.project(kind, K8, P2)  # virtual obs in cam2
        Ro, to, so, inl, n_opt = sim3_solver.optimize_sim3(
            kind, K8, P1, P2, uv1, uv2, fwd, Rcm, tcm, scm,
            valid_inv=inv, fix_scale=fix_scale,
        )
        Rsw2, tsw2, ssw2 = lie.sim3_mul(Ro, to, so, Rm, tm, jnp.asarray(1.0))
        return n_proj, int(n_opt), (Rsw2, tsw2, float(ssw2))

    def _count_proj(self, s, row, Rsw, tsw, ssw, pool, kind, K8, radius):
        _, _, ok_lm = project_match_sim3(
            kind, K8, Rsw, tsw, jnp.asarray(ssw), s.lm_pos, s.lm_desc, pool,
            s.kf_feat_xy[row], s.kf_feat_desc[row],
            s.kf_feat_valid[row], radius,
            lm_normal=s.lm_normal, lm_min_dist=s.lm_min_dist,
            lm_max_dist=s.lm_max_dist,
        )
        return int(ok_lm.sum())

    def _fix_scale(self, s, kf_row):
        """Metric maps (stereo/RGBD/inertial) fix the Sim3 scale
        (mbFixScale, LoopClosing.cc:701-704)."""
        return bool(jnp.any(s.kf_feat_ur[kf_row] >= 0)) or bool(
            jnp.linalg.norm(s.kf_vel[kf_row]) > 0
        )

    # ------------------------------------------------------------------
    def _cascade(self, s, kf_row, cand, kind, K8, W):
        """Stages 1-6 for one BoW candidate. Returns confirmed tuple, or
        None (setting self.pending when stages 1-5 pass but consistency
        is short — LoopClosing.cc:846-876)."""
        cfg = self.cfg
        L = s.lmax
        kf_valid = np.array(s.kf_valid)

        # stage 1: BoW matches against the candidate-side landmark pool
        pool_rows = _pool_rows(W[cand], cand, cfg.n_covisibles_pool, kf_valid)
        pool = _landmark_pool(s, pool_rows)

        own = s.kf_feat_lm[kf_row]
        has_own = (own >= 0) & s.kf_feat_valid[kf_row]
        dist = matching.hamming_matrix(
            s.kf_feat_desc[kf_row], s.lm_desc
        )
        win = has_own[:, None] & pool[None, :]
        idx_lm, d_lm, ok_f = matching.masked_best_match(
            dist, win, max_dist=matching.TH_LOW, ratio=0.9
        )
        n_bow = int(ok_f.sum())
        self._trace(f"cand {cand}: stage1 bow={n_bow}")
        if n_bow < cfg.n_bow_matches:
            return None

        # stage 2: Sim3 RANSAC on the 3D-3D pairs
        own_c = jnp.clip(own, 0, L - 1)
        lmc = jnp.clip(idx_lm, 0, L - 1)
        X1 = s.lm_pos[own_c]
        X2 = s.lm_pos[lmc]
        valid = ok_f & s.lm_valid[own_c] & s.lm_valid[lmc]
        uv1 = s.kf_feat_xy[kf_row]
        P2c = lie.se3_apply(s.kf_R[cand], s.kf_t[cand], X2)
        uv2 = cam_mod.project(kind, K8, P2c)
        fix_scale = self._fix_scale(s, kf_row)
        R_s, t_s, s_s, inl, n_inl = sim3_solver.sim3_ransac(
            jax.random.PRNGKey(kf_row), kind, K8, X1, X2, valid,
            s.kf_R[kf_row], s.kf_t[kf_row], s.kf_R[cand], s.kf_t[cand],
            uv1, uv2, fix_scale=fix_scale,
        )
        self._trace(f"cand {cand}: stage2 ransac inliers={int(n_inl)}")
        if int(n_inl) < cfg.n_bow_inliers:
            return None

        # coarse Scw = S12 o T_2w (LoopClosing.cc:748-750)
        Rsw, tsw, ssw = lie.sim3_mul(
            R_s, t_s, s_s, s.kf_R[cand], s.kf_t[cand], jnp.asarray(1.0)
        )

        # stages 3+4: guided projection expansion + OptimizeSim3
        n_proj, n_opt, (Rsw, tsw, ssw) = self._optimize_scm(
            s, kf_row, cand, Rsw, tsw, float(ssw), pool, kind, K8,
            cfg.proj_radius_coarse, fix_scale,
        )
        self._trace(f"cand {cand}: stage3 proj={n_proj} stage4 opt={n_opt}")
        if n_proj < cfg.n_proj_matches or n_opt < cfg.n_sim3_inliers:
            return None

        # stage 5: re-projection at the refined Sim3, tighter window
        n_fine = self._count_proj(
            s, kf_row, Rsw, tsw, ssw, pool, kind, K8, cfg.proj_radius_fine
        )
        self._trace(f"cand {cand}: stage5 fine={n_fine}")
        if n_fine < cfg.n_proj_opt_matches:
            return None

        # stage 6: covisible-keyframe verification (LoopClosing.cc:819-843)
        n_kfs = 0
        cur_covis = _pool_rows(W[kf_row], kf_row, cfg.n_covisibles_pool,
                               kf_valid)[1:]
        for j in cur_covis:
            if n_kfs >= cfg.n_consistency:
                break
            # S_jw = T_jc o S_cw
            Rj, tj = s.kf_R[j], s.kf_t[j]
            Rci, tci = lie.se3_inv(s.kf_R[kf_row], s.kf_t[kf_row])
            Rjc, tjc = lie.se3_mul(Rj, tj, Rci, tci)
            Rjw, tjw, sjw = lie.sim3_mul(
                Rjc, tjc, jnp.asarray(1.0), Rsw, tsw, jnp.asarray(ssw)
            )
            nj = self._count_proj(s, j, Rjw, tjw, float(sjw), pool,
                                  kind, K8, cfg.proj_radius_coarse)
            if nj >= cfg.n_refine_matches:
                n_kfs += 1

        self._trace(f"cand {cand}: stage6 covis kfs={n_kfs}")
        if n_kfs >= cfg.n_consistency:
            return (cand, Rsw, tsw, ssw, pool)

        # pending: confirm over the next keyframes (temporal consistency)
        self.pending = PendingLoop(
            cand=cand, last_kf=kf_row, Rsw=Rsw, tsw=tsw, ssw=ssw,
            pool=pool, n_coincidences=n_kfs,
        )
        return None

    # ------------------------------------------------------------------
    def _refine_pending(self, s, kf_row, kind, K8):
        """DetectAndReffineSim3FromLastKF (LoopClosing.cc:535-576): predict
        Scw for the new KF through the tracked relative pose, re-find the
        region by projection, refine, count a coincidence."""
        cfg = self.cfg
        p = self.pending
        # S_cw(new) = T_new,last o S_last,w
        Rl, tl = s.kf_R[p.last_kf], s.kf_t[p.last_kf]
        Rli, tli = lie.se3_inv(Rl, tl)
        Rcl, tcl = lie.se3_mul(s.kf_R[kf_row], s.kf_t[kf_row], Rli, tli)
        Rsw, tsw, ssw = lie.sim3_mul(
            Rcl, tcl, jnp.asarray(1.0), p.Rsw, p.tsw, jnp.asarray(p.ssw)
        )
        n_proj = self._count_proj(
            s, kf_row, Rsw, tsw, float(ssw), p.pool, kind, K8,
            cfg.proj_radius_coarse,
        )
        self._trace(f"pending cand {p.cand}: refine proj={n_proj} coin={p.n_coincidences}")
        if n_proj >= cfg.n_refine_matches:
            fix_scale = self._fix_scale(s, kf_row)
            _, n_opt, (Rsw, tsw, ssw2) = self._optimize_scm(
                s, kf_row, p.cand, Rsw, tsw, float(ssw), p.pool, kind, K8,
                cfg.proj_radius_coarse, fix_scale,
            )
            if n_opt > cfg.n_refine_opt_matches:
                p.n_coincidences += 1
                p.last_kf = kf_row
                p.Rsw, p.tsw, p.ssw = Rsw, tsw, ssw2
                p.n_not_found = 0
                if p.n_coincidences >= cfg.n_consistency:
                    return (p.cand, Rsw, tsw, ssw2, p.pool)
                return None
        p.n_not_found += 1
        if p.n_not_found >= cfg.max_not_found:
            self.pending = None
        return None

    # ------------------------------------------------------------------
    def _correct_loop(self, s, kf_row, cand, Rsw, tsw, ssw, pool, kind, K8):
        """CorrectLoop (LoopClosing.cc:969-1160): propagate the corrected
        Sim3 through the current KF's covisible window and transport their
        landmarks BEFORE the pose-graph step, then essential-graph PGO with
        the loop edge, then SearchAndFuse welding of the matched-side
        landmarks into the corrected window."""
        if not self.cfg.run_pgo:
            return s
        K = s.kmax
        W = atlas_state.covisibility_weights(s)
        kf_valid = np.array(s.kf_valid)

        # corrected Sim3 for the covisible window: S_iw' = T_ic o S_cw
        # (LoopClosing.cc:1045-1076)
        window = _pool_rows(W[kf_row], kf_row,
                            self.cfg.n_covisibles_pool, kf_valid)
        Rci, tci = lie.se3_inv(s.kf_R[kf_row], s.kf_t[kf_row])
        kf_R = s.kf_R
        kf_t = s.kf_t
        kf_s = jnp.ones((K,))
        corr_R, corr_t, corr_s = {}, {}, {}
        for i in window:
            Ric, tic = lie.se3_mul(s.kf_R[i], s.kf_t[i], Rci, tci)
            Riw, tiw, siw = lie.sim3_mul(
                Ric, tic, jnp.asarray(1.0), Rsw, tsw, jnp.asarray(ssw)
            )
            corr_R[i], corr_t[i], corr_s[i] = Riw, tiw, siw
            kf_R = kf_R.at[i].set(Riw)
            kf_t = kf_t.at[i].set(tiw)
            kf_s = kf_s.at[i].set(siw)

        # transport the window's landmarks with their host correction:
        # X' = S_iw'^{-1} ( T_iw X )  (LoopClosing.cc:1092-1107)
        host = s.lm_first_kf
        in_window = jnp.zeros((s.lmax,), bool)
        for i in window:
            in_window = in_window | (host == i)
        in_window = in_window & s.lm_valid
        hostc = jnp.clip(host, 0, K - 1)
        Xc = jnp.einsum("lij,lj->li", s.kf_R[hostc], s.lm_pos) + s.kf_t[hostc]
        Rn, tn, sn = kf_R[hostc], kf_t[hostc], kf_s[hostc]
        Rn_inv = jnp.swapaxes(Rn, -1, -2)
        Xw = jnp.einsum("lij,lj->li", Rn_inv, Xc - tn) / \
            jnp.maximum(sn, 1e-9)[:, None]
        lm_pos = jnp.where(in_window[:, None], Xw, s.lm_pos)
        # window keyframes adopt corrected SE3 poses [R, t/s]
        se3_t = kf_t / jnp.maximum(kf_s, 1e-9)[:, None]
        s = dataclasses.replace(
            s, lm_pos=lm_pos,
            kf_R=kf_R,
            kf_t=jnp.where(
                jnp.isin(jnp.arange(K), jnp.asarray(window))[:, None],
                se3_t, s.kf_t,
            ),
        )

        # essential-graph PGO seeded at the corrected poses; loop edge
        # S_cand<-cur from the measured Scw: S_cand,cur = T_cand,w o S_cw^{-1}
        # (Optimizer::OptimizeEssentialGraph loop-edge construction)
        Rsi, tsi, ssi = lie.sim3_inv(Rsw, tsw, jnp.asarray(ssw))
        Rrel, trel, srel = lie.sim3_mul(
            s.kf_R[cand], s.kf_t[cand], jnp.asarray(1.0), Rsi, tsi, ssi
        )
        loop_edge = (
            np.array([kf_row]), np.array([cand]),
            np.array(Rrel)[None], np.array(trel)[None],
            np.array([float(srel)], np.float32),
        )
        src, dst, R_rel, t_rel, s_rel, ev = essential.build_essential_edges(
            s, W, min_weight=100, extra_edges=loop_edge
        )
        fixed = jnp.zeros((K,), bool).at[cand].set(True)
        fixed = fixed.at[0].set(True)

        if self.inertial is not None and self.inertial[0]:
            # inertial map with IMU initialized: 4-DoF (yaw+translation)
            # essential graph — gravity pins roll/pitch and the map is
            # metric, so the Sim3 graph's extra DoF could only rotate
            # gravity out of alignment (OptimizeEssentialGraph4DoF
            # selection, LoopClosing.cc:1176-1184, Optimizer.cc:5292)
            se3_t = kf_t / jnp.maximum(kf_s, 1e-9)[:, None]
            Ro, to, _ = essential.optimize_essential_graph_4dof(
                kf_R, se3_t, fixed, src, dst, R_rel, t_rel, ev,
            )
            so = jnp.ones((K,))
        else:
            Ro, to, so, _ = essential.optimize_essential_graph(
                kf_R, kf_t, kf_s, fixed, src, dst, R_rel, t_rel, s_rel, ev,
            )
        s = essential.correct_map_after_pgo(s, s.kf_R, s.kf_t, Ro, to, so)

        # SearchAndFuse (LoopClosing.cc:1118-1140): weld the matched-side
        # landmarks into the corrected window keyframes
        s = self._fuse_window(s, window, kind, K8)
        return s

    def _fuse_window(self, s, window, kind, K8):
        if self.scale_factors is None:
            return s
        from ..mapping import fuse as fuse_mod

        for row in window:
            s, _ = fuse_mod.merge_duplicates_at_keyframe(
                kind, K8, s, jnp.asarray(row, jnp.int32), self.scale_factors
            )
            s = fuse_mod.fuse_into_keyframe(
                kind, K8, s, jnp.asarray(row, jnp.int32), self.scale_factors
            )
        return atlas_state.update_landmark_stats(s)

    # ------------------------------------------------------------------
    def _merge_maps_scw(self, s, kf_row, cand, Rsw, tsw, ssw, kind, K8):
        """MergeLocal/MergeLocal2 core from the refined Scw: transform the
        ACTIVE map into the candidate's map frame, relabel, weld."""
        # Scw maps (candidate-map) world -> current camera. The active
        # map's world must move so kf_row's pose becomes Scw:
        # X_cam = T_kw X_old = S_cw X_new  =>  X_new = S_cw^{-1} T_kw X_old
        Rk, tk = s.kf_R[kf_row], s.kf_t[kf_row]
        Ri, ti, si = lie.sim3_inv(Rsw, tsw, jnp.asarray(ssw))
        Rm, tm, sm = lie.sim3_mul(Ri, ti, si, Rk, tk, jnp.asarray(1.0))
        # inertial merge with VIBA1 done: force the map-to-map rotation to
        # yaw only — both maps' gravity is aligned with -z, and a merge
        # must not bend it (LoopClosing.cc:156-163)
        if self.inertial is not None and self.inertial[1] >= 1:
            phi = np.array(lie.so3_log(Rm))
            phi[0] = 0.0
            phi[1] = 0.0
            Rm = lie.so3_exp(jnp.asarray(phi))

        active = int(s.active_map)
        target = int(s.kf_map_id[cand])

        kf_in = s.kf_valid & (s.kf_map_id == active)
        lm_in = s.lm_valid & (s.lm_map_id == active)

        new_lm = jnp.where(
            lm_in[:, None],
            sm * jnp.einsum("ij,lj->li", Rm, s.lm_pos) + tm,
            s.lm_pos,
        )
        # new camera map: T_jw o S_m^{-1} -> SE3 as [R, t/s]
        # (Optimizer.cc:1745-1752)
        Rmi, tmi, smi = lie.sim3_inv(Rm, tm, sm)
        newR = jnp.einsum("kij,jl->kil", s.kf_R, Rmi)
        newt = jnp.einsum("kij,j->ki", s.kf_R, tmi) + s.kf_t
        newt = newt / jnp.maximum(smi, 1e-9)
        kf_Rn = jnp.where(kf_in[:, None, None], newR, s.kf_R)
        kf_tn = jnp.where(kf_in[:, None], newt, s.kf_t)

        s2 = dataclasses.replace(s, kf_R=kf_Rn, kf_t=kf_tn, lm_pos=new_lm)
        s2 = atlas_ops.change_map_id(s2, active, target)
        s2 = dataclasses.replace(s2, active_map=jnp.asarray(target, jnp.int32))
        if self.scale_factors is None:
            return s2
        s2, cur_side, cand_side = self._weld(s2, kf_row, cand, kind, K8)
        return self._merge_remainder_pgo(s2, kf_in, cur_side, cand_side)

    def _merge_remainder_pgo(self, s2, was_active_kf, cur_side, cand_side):
        """Essential-graph optimization of the merge REMAINDER
        (`/root/reference/src/LoopClosing.cc:1717`): after the welding BA,
        the transformed-but-unwelded keyframes of the former active map
        still carry their pre-merge drift relative to the welded seam.
        Pose-graph-optimize the merged map with the welding window and the
        entire candidate-side map held fixed; only the remainder moves."""
        K = s2.kmax
        free = np.array(was_active_kf) & np.array(s2.kf_valid)
        for r in cur_side:
            free[int(r)] = False
        n_free = int(free.sum())
        if n_free == 0:
            return s2
        W = atlas_state.covisibility_weights(s2)
        src, dst, R_rel, t_rel, s_rel, ev = essential.build_essential_edges(
            s2, W, min_weight=100
        )
        fixed = jnp.asarray(~free)
        ones = jnp.ones((K,))
        Ro, to, so, _ = essential.optimize_essential_graph(
            s2.kf_R, s2.kf_t, ones, fixed, src, dst, R_rel, t_rel, s_rel, ev,
        )
        return essential.correct_map_after_pgo(
            s2, s2.kf_R, s2.kf_t, Ro, to, so
        )

    def _weld(self, s2, kf_row, cand, kind, K8):
        """Welding window after a merge (MergeLocal's SearchAndFuse +
        welding LocalBundleAdjustment, LoopClosing.cc:1307-1331 +
        Optimizer.cc:3498): fuse duplicated landmarks through the window
        keyframes, then a local BA with the matched map's side held fixed."""
        from ..atlas.state import covisibility_weights, update_landmark_stats
        from ..mapping import fuse as fuse_mod
        from ..mapping import local_mapper

        W = covisibility_weights(s2)
        Wn = np.array(W)

        def top_covis(row, n):
            order = np.argsort(-Wn[row])
            rows = [row] + [int(r) for r in order[:n] if Wn[row, r] > 0]
            return rows

        cur_side = top_covis(kf_row, 5)
        cand_side = [r for r in top_covis(cand, 5) if r not in cur_side]
        if not cand_side:
            cand_side = [cand]

        # fuse duplicates through both sides of the weld
        for row in cur_side + cand_side:
            s2, _ = fuse_mod.merge_duplicates_at_keyframe(
                kind, K8, s2, jnp.asarray(row, jnp.int32), self.scale_factors
            )
            s2 = fuse_mod.fuse_into_keyframe(
                kind, K8, s2, jnp.asarray(row, jnp.int32), self.scale_factors
            )

        # welding BA: candidate (matched-map) side fixed, current side free
        rows = cand_side + cur_side
        n_fixed = len(cand_side)
        window = len(rows)
        s2, _ = local_mapper.local_ba(
            kind, K8, s2, jnp.asarray(rows, jnp.int32),
            n_fixed=n_fixed, window=window, iters=8,
            scale_factors=self.scale_factors,
        )
        return update_landmark_stats(s2), cur_side, cand_side
