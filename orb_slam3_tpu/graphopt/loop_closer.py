"""Loop closing and map merging orchestrator.

Role of the LoopClosing thread (`/root/reference/src/LoopClosing.cc`):
per new keyframe — place-recognition query (`NewDetectCommonRegions:324`),
Sim3 geometric verification (`DetectCommonRegionsFromBoW:578`: SearchByBoW
-> Sim3Solver RANSAC -> projection gates), then either loop correction
(`CorrectLoop:969`: propagate the correction through the covisible window,
essential-graph optimization) or cross-map merge (`MergeLocal:1215` /
`MergeLocal2`: transform the active map into the matched map's frame and
relabel).

Host orchestrator over jitted stages; invoked synchronously after keyframe
insertion (the reference's queue/thread structure collapses to a stage call
— SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..atlas import ops as atlas_ops
from ..atlas import state as atlas_state
from ..frontend import matching
from ..ops import lie
from ..place import recognition, vocab as vocab_mod
from . import essential, sim3_solver


@dataclasses.dataclass
class LoopCloserConfig:
    min_sim3_inliers: int = 20     # nSim3Inliers gate (LoopClosing.cc:583)
    min_kfs_in_map: int = 12       # skip young maps (LoopClosing.cc:356)
    min_temporal_gap: int = 10     # don't match very recent KFs
    covis_threshold: int = 15
    run_pgo: bool = True


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
            bow = vocab_mod.bow_vector(
                self.voc, s.kf_feat_desc[k], s.kf_feat_valid[k]
            )
            self.db = self.db.add(k, bow)

    # ------------------------------------------------------------------
    def on_keyframe(self, s: atlas_state.MapState, kf_row: int, kind: int, K8):
        """Detect + correct. Returns (possibly corrected) MapState."""
        cfg = self.cfg
        bow = vocab_mod.bow_vector(
            self.voc, s.kf_feat_desc[kf_row], s.kf_feat_valid[kf_row]
        )
        W = atlas_state.covisibility_weights(s)
        covis = W[kf_row] >= cfg.covis_threshold

        n_kf = int(s.n_kf)
        result = None
        if n_kf >= cfg.min_kfs_in_map:
            # min covisible score (LoopClosing loop detection uses the worst
            # covisible score as the retrieval floor)
            covis_scores = recognition.query(self.db, bow)
            cs = np.array(jnp.where(covis & self.db.valid, covis_scores, jnp.nan))
            min_score = float(np.nanmin(cs)) if np.any(~np.isnan(cs)) else 0.0

            # temporal exclusion in addition to covisibility
            recent = jnp.arange(s.kmax) > (kf_row - cfg.min_temporal_gap)
            idx, vals, ok = recognition.loop_candidates(
                self.db, bow, kf_row, covis | recent, min_score, covis_W=W
            )
            for cand, okc in zip(np.array(idx), np.array(ok)):
                if not okc:
                    continue
                result = self._verify_and_correct(s, kf_row, int(cand), kind, K8)
                if result is not None:
                    s = result
                    break
        self.db = self.db.add(kf_row, bow)
        return s, result is not None

    # ------------------------------------------------------------------
    def _verify_and_correct(self, s, kf_row, cand, kind, K8):
        """Sim3 verification between kf_row and cand; on success apply loop
        correction or map merge. Returns corrected MapState or None."""
        cfg = self.cfg
        L = s.lmax

        # landmark-bound features of both KFs
        lm_k = s.kf_feat_lm[kf_row]
        lm_c = s.kf_feat_lm[cand]
        has_k = (lm_k >= 0) & s.kf_feat_valid[kf_row]
        has_c = (lm_c >= 0) & s.kf_feat_valid[cand]

        idx, dist, ok = matching.search_by_brute_force(
            s.kf_feat_desc[kf_row], has_k, s.kf_feat_desc[cand], has_c,
            ratio=0.85, max_dist=matching.TH_LOW,
        )
        n_matches = int(ok.sum())
        if n_matches < cfg.min_sim3_inliers:
            return None

        lmk = jnp.clip(lm_k, 0, L - 1)
        lmc = jnp.clip(lm_c[idx], 0, L - 1)
        X1 = s.lm_pos[lmk]            # seen from current KF's map frame
        X2 = s.lm_pos[lmc]            # matched landmark in candidate's frame
        valid = ok & s.lm_valid[lmk] & s.lm_valid[lmc]

        uv1 = s.kf_feat_xy[kf_row]
        uv2 = s.kf_feat_xy[cand][idx]
        # stereo/RGBD/inertial maps are metric: fix the Sim3 scale
        # (Sim3Solver bFixScale, LoopClosing.cc mbFixScale)
        fix_scale = bool(jnp.any(s.kf_feat_ur[kf_row] >= 0)) or bool(
            jnp.linalg.norm(s.kf_vel[kf_row]) > 0
        )
        R_s, t_s, s_s, inl, n_inl = sim3_solver.sim3_ransac(
            jax.random.PRNGKey(kf_row), kind, K8,
            X1, X2, valid,
            s.kf_R[kf_row], s.kf_t[kf_row], s.kf_R[cand], s.kf_t[cand],
            uv1, uv2, fix_scale=fix_scale,
        )
        if int(n_inl) < cfg.min_sim3_inliers:
            return None

        same_map = int(s.kf_map_id[kf_row]) == int(s.kf_map_id[cand])
        if same_map:
            s2 = self._correct_loop(s, kf_row, cand, R_s, t_s, s_s, kind, K8)
            self.n_loops += 1
        else:
            s2 = self._merge_maps(s, kf_row, cand, R_s, t_s, s_s, kind, K8)
            self.n_merges += 1
        return s2

    # ------------------------------------------------------------------
    def _correct_loop(self, s, kf_row, cand, R_s, t_s, s_s, kind, K8):
        """CorrectLoop: corrected Sim3 of the current KF from the loop
        constraint, propagate through every LATER keyframe (the drifted
        side), then essential-graph PGO with the loop edge."""
        K = s.kmax
        # S_k<-c (cam c -> cam k) composed with T_cw(c): corrected S_kw
        Rc, tc = s.kf_R[cand], s.kf_t[cand]
        R_corr = R_s @ Rc
        t_corr = s_s * (R_s @ tc) + t_s
        s_corr = s_s

        if not self.cfg.run_pgo:
            return s

        # init vertices at current poses; current KF at its corrected pose
        kf_R = s.kf_R
        kf_t = s.kf_t
        kf_s = jnp.ones((K,))
        kf_R = kf_R.at[kf_row].set(R_corr)
        kf_t = kf_t.at[kf_row].set(t_corr)
        kf_s = kf_s.at[kf_row].set(s_corr)

        W = atlas_state.covisibility_weights(s)
        loop_edge = (
            np.array([cand]), np.array([kf_row]),
            np.array(R_s)[None], np.array(t_s)[None],
            np.array([float(s_s)], np.float32),
        )
        src, dst, R_rel, t_rel, s_rel, ev = essential.build_essential_edges(
            s, W, min_weight=100, extra_edges=loop_edge
        )
        # fix the loop keyframe and everything before it that is covisible
        # with it (the stable side; Optimizer.cc:1544 fixes the loop KF)
        fixed = jnp.zeros((K,), bool).at[cand].set(True)
        fixed = fixed.at[0].set(True)

        Ro, to, so, _ = essential.optimize_essential_graph(
            kf_R, kf_t, kf_s, fixed, src, dst, R_rel, t_rel, s_rel, ev,
        )
        return essential.correct_map_after_pgo(s, s.kf_R, s.kf_t, Ro, to, so)

    # ------------------------------------------------------------------
    def _merge_maps(self, s, kf_row, cand, R_s, t_s, s_s, kind=None, K8=None):
        """MergeLocal/MergeLocal2 core: transform the ACTIVE map into the
        candidate's map frame using the measured Sim3, then relabel.

        The active map's world must map so that kf_row's corrected pose
        equals S_k<-c composed into the candidate map's frame:
        for every active-map entity, X' = S_w' <- w (X) with
        S_w'<-w = T_kw'^{-1} ∘ S_k<-c... derived below via the two KF poses.
        """
        # corrected current-KF Sim3 pose in the candidate map's world
        Rc, tc = s.kf_R[cand], s.kf_t[cand]
        R_kw = R_s @ Rc
        t_kw = s_s * (R_s @ tc) + t_s     # S_kw' = S_kc * T_cw
        s_kw = s_s
        # current (drifted) pose of kf in its own map: T_kw
        Rk, tk = s.kf_R[kf_row], s.kf_t[kf_row]
        # world transform: S = T_kw^{-1} ∘ S_kw' maps old-world -> new-world
        # X_new = (1/s_kw won't do)... we need S_w_new<-w_old =
        # S_kw'^{-1}... careful: X_cam = T_kw X_old = S_kw' X_new
        # => X_new = S_kw'^{-1} T_kw X_old
        Ri, ti, si = lie.sim3_inv(R_kw, t_kw, jnp.asarray(s_kw))
        Rm, tm, sm = lie.sim3_mul(Ri, ti, si, Rk, tk, jnp.asarray(1.0))

        active = int(s.active_map)
        target = int(s.kf_map_id[cand])

        kf_in = s.kf_valid & (s.kf_map_id == active)
        lm_in = s.lm_valid & (s.lm_map_id == active)

        # transform landmarks: X' = sm * Rm X + tm
        new_lm = jnp.where(
            lm_in[:, None],
            sm * jnp.einsum("ij,lj->li", Rm, s.lm_pos) + tm,
            s.lm_pos,
        )
        # transform keyframe poses: the new camera map is T_jw ∘ S_m^{-1},
        # a Sim3 (R_j Rmi, R_j tmi + t_j, smi); converted to SE3 as
        # [R, t/s] like the reference (Optimizer.cc:1745-1752)
        Rmi, tmi, smi = lie.sim3_inv(Rm, tm, sm)
        newR = jnp.einsum("kij,jl->kil", s.kf_R, Rmi)
        newt = jnp.einsum("kij,j->ki", s.kf_R, tmi) + s.kf_t
        newt = newt / jnp.maximum(smi, 1e-9)
        kf_Rn = jnp.where(kf_in[:, None, None], newR, s.kf_R)
        kf_tn = jnp.where(kf_in[:, None], newt, s.kf_t)

        s2 = dataclasses.replace(s, kf_R=kf_Rn, kf_t=kf_tn, lm_pos=new_lm)
        s2 = atlas_ops.change_map_id(s2, active, target)
        s2 = dataclasses.replace(s2, active_map=jnp.asarray(target, jnp.int32))
        if kind is None or self.scale_factors is None:
            return s2
        return self._weld(s2, kf_row, cand, kind, K8)

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
        return update_landmark_stats(s2)
