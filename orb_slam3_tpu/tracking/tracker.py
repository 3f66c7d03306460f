"""Monocular tracking state machine (host orchestrator).

The role of `Tracking::Track()`'s state machine plus the LocalMapping
pipeline driver (`/root/reference/src/Tracking.cc:1794-2332`,
`LocalMapping.cc:64-282`) — but as an explicit single-host loop calling
fixed-shape jitted stages (SURVEY.md §7.1: snapshots instead of threads +
locks; the bounded-staleness mapping/tracking dataflow collapses to
sequential stage calls in round 1).

States mirror `Tracking.h:121-129`: NOT_INITIALIZED -> OK -> RECENTLY_LOST
-> LOST (new map in the Atlas).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..atlas import ops as atlas_ops
from ..atlas import state as atlas_state
from ..frontend import camera as cam
from ..frontend import matching, orb, two_view
from ..mapping import fuse, local_mapper
from ..ops import lie
from ..utils.timing import GLOBAL_TIMER
from ..utils import verbose
from . import track as track_mod

NOT_INITIALIZED = 0
OK = 1
RECENTLY_LOST = 2
LOST = 3


@dataclasses.dataclass
class TrackerConfig:
    K: jnp.ndarray = None  # camera params [8]
    kind: int = cam.PINHOLE
    img_wh: tuple = (640, 480)
    sensor: str = "mono"            # mono|stereo|rgbd[-imu]
    bf: float = 0.0                 # baseline * fx (stereo/rgbd)
    imu_noise: dict = dataclasses.field(default_factory=lambda: dict(
        noise_gyro=1.7e-3, noise_acc=2e-2, walk_gyro=1.9e-4, walk_acc=3e-2))
    Tbc: np.ndarray = None          # body-from-camera extrinsics [4,4]
    min_depth: float = 0.1
    th_depth: float = 40.0          # close-point threshold (Settings thDepth)
    depth_factor: float = 1.0       # RGBD depth map scaling
    orb: orb.OrbConfig = dataclasses.field(default_factory=lambda: orb.OrbConfig())
    init_min_matches: int = 80      # Tracking.cc:2492 (100 in ref)
    min_inliers: int = 15           # accept thresholds Tracking.cc:3030-3061
    kf_min_frames: int = 0
    kf_max_frames: int = 5          # c1a (fps-dependent in ref)
    kf_tracked_ratio: float = 0.8   # c2 thRefRatio (0.9 mono, Tracking.cc:3155)
    local_window: int = 8
    kmax: int = 128
    lmax: int = 8192
    match_radius_coarse: float = 15.0  # TrackWithMotionModel th (Tracking.cc:2879)
    match_radius_fine: float = 4.0
    # non-rectified (fisheye) stereo: right-camera intrinsics + T_rl
    # (X_r = R_rl X_l + t_rl); depth comes from direct two-view
    # triangulation instead of the rectified row matcher
    # (Frame::ComputeStereoFishEyeMatches, Frame.cc:1126)
    stereo_fisheye: bool = False
    K_right: jnp.ndarray = None
    R_rl: np.ndarray = None
    t_rl: np.ndarray = None
    # pinhole rad-tan distortion (k1 k2 p1 p2 k3): keypoints are undistorted
    # right after extraction (Frame::UndistortKeyPoints, Frame.cc:747-780);
    # None = already-rectified/distortion-free input
    dist_coeffs: np.ndarray = None


@dataclasses.dataclass
class FrameRecord:
    """Per-frame pose stored RELATIVE to its reference keyframe
    (T_cur<-refkf), like the reference's trajectory bookkeeping
    (mlRelativeFramePoses + mlpReferences, Tracking.cc:2300-2320), so the
    exported trajectory picks up later BA/loop corrections of the KF poses
    (System::SaveTrajectoryEuRoC, System.cc:662)."""

    timestamp: float
    ref_kf: int
    R_rel: np.ndarray
    t_rel: np.ndarray
    ok: bool


class Tracker:
    def __init__(self, cfg: TrackerConfig):
        self.cfg = cfg
        self.map = atlas_state.empty(
            kmax=cfg.kmax, fmax=cfg.orb.n_features, lmax=cfg.lmax
        )
        self.state = NOT_INITIALIZED
        self.scale_factors = jnp.asarray(
            [cfg.orb.scale_factor ** i for i in range(cfg.orb.n_levels)], jnp.float32
        )
        self.init_ref = None          # (features, timestamp)
        self.last = None              # dict: R, t, feats, ts
        self.velocity = None          # (Rv, tv): T_cur<-last
        self.last_kf_row = -1
        self.last_kf_inliers = 0
        self.last_inliers = 0
        self.frames_since_kf = 0
        self.trajectory: list[FrameRecord] = []
        self.debug_events: list[dict] = []  # IMU init/refine history (SaveDebugData)
        self.lost_count = 0
        self.mapping_paused = False   # localization-only mode (System.cc:409)
        self._frame_ur = None
        self._frame_depth = None
        self._tracked_lms = None
        self._vi_prior = None         # ConstraintPoseImu chain (Optimizer.cc:4875)
        self._map_version = 0         # bumps on structural map updates
        self.loop_closer = None       # optional LoopCloser (attach_loop_closer)
        self.gba = None               # background GlobalBARunner (lazy)
        self.background_gba = True    # spawn GBA in a side thread after loops
        self.base_sensor = cfg.sensor.split("-")[0]
        self.use_imu = cfg.sensor.endswith("-imu")
        self.imu = None
        if self.use_imu:
            from . import vi_tracker

            Tbc = cfg.Tbc if cfg.Tbc is not None else np.eye(4, dtype=np.float32)
            self.imu = vi_tracker.ImuState(cfg.imu_noise, Tbc)
        dist = (jnp.asarray(cfg.dist_coeffs, jnp.float32)
                if cfg.dist_coeffs is not None
                and cfg.kind == cam.PINHOLE
                and float(np.abs(np.asarray(cfg.dist_coeffs)).max()) > 0
                else None)

        def _ext(im):
            f = orb.extract(im, cfg.orb)
            if dist is not None:
                # geometry uses undistorted coordinates
                # (Frame::UndistortKeyPoints, Frame.cc:747-780); descriptors
                # were already sampled from the raw image, like the reference
                f = dataclasses.replace(
                    f, xy=cam.undistort_points_radtan(cfg.K, dist, f.xy)
                )
            return f

        self._extract = jax.jit(_ext)
        # stereo: both extractions inside ONE jit (sequential — measured
        # faster than vmap on v5e, whose batched gathers relayout badly;
        # also saves a dispatch). Role of the reference's two extraction
        # threads (Frame.cc:116-121).
        self._extract_pair = jax.jit(lambda l, r: (_ext(l), _ext(r)))

    def attach_loop_closer(self, voc):
        """Enable place recognition: loop closing, map merging, and
        relocalization (the reference's LoopClosing thread + KFDB roles)."""
        from ..graphopt import loop_closer as lc

        self.loop_closer = lc.LoopCloser(
            voc, self.cfg.kmax, scale_factors=self.scale_factors
        )

    # ------------------------------------------------------------------
    # relocalization (Tracking::Relocalization, Tracking.cc:3609-3761)
    # ------------------------------------------------------------------
    def _try_relocalize(self, feats) -> bool:
        from ..place import recognition, vocab as vocab_mod

        if self.loop_closer is None:
            return False
        cfg = self.cfg
        s = self.map
        voc = self.loop_closer.voc
        bow = vocab_mod.bow_vector(voc, feats.descriptors, feats.valid)
        idx, vals, ok = recognition.reloc_candidates(self.loop_closer.db, bow)
        L = s.lmax
        for cand, okc in zip(np.array(idx), np.array(ok)):
            if not okc:
                continue
            cand = int(cand)
            lm_c = s.kf_feat_lm[cand]
            has_c = (lm_c >= 0) & s.kf_feat_valid[cand]
            midx, mdist, mok = matching.search_by_brute_force(
                feats.descriptors, feats.valid,
                s.kf_feat_desc[cand], has_c,
                ratio=0.85, max_dist=matching.TH_LOW,
            )
            if int(mok.sum()) < 15:
                continue
            lm_rows = jnp.clip(lm_c[midx], 0, L - 1)
            Xw = s.lm_pos[lm_rows]
            valid = mok & s.lm_valid[lm_rows]
            R, t, inl, n_inl = recognition.pnp_ransac(
                jax.random.PRNGKey(len(self.trajectory)), cfg.kind, cfg.K,
                feats.xy, Xw, valid,
            )
            if int(n_inl) < 20:
                continue
            # refine with motion-only BA against the matched landmarks
            inv_sig2 = 1.0 / (
                self.scale_factors[
                    jnp.clip(feats.octave, 0, cfg.orb.n_levels - 1)
                ]
                ** 2
            )
            R, t, inl2, n2 = track_mod.pose_optimize(
                cfg.kind, cfg.K, R, t, feats.xy, Xw, inv_sig2, inl
            )
            if int(n2) < 20:
                continue
            self.last = {"R": R, "t": t, "feats": feats,
                         "ts": self.last["ts"] if self.last else 0.0}
            self.state = OK
            self.lost_count = 0
            self.velocity = None
            self._tracked_lms = None
            # adopt the candidate's map as active if different
            if int(s.kf_map_id[cand]) != int(s.active_map):
                self.map = dataclasses.replace(
                    s, active_map=s.kf_map_id[cand]
                )
            return True
        return False

    # ------------------------------------------------------------------
    def process(self, img, timestamp: float, img_right=None, depth_map=None,
                imu=None):
        """Track one frame. For stereo pass img_right; for rgbd pass
        depth_map; for *-imu sensors pass imu=[M,7] rows (t,gx,gy,gz,ax,ay,az)
        measured since the previous frame (System::TrackX routing,
        System.cc:244/328/399; GrabImuData, Tracking.cc:1618)."""
        from ..frontend import stereo as stereo_mod

        if self.imu is not None:
            self.imu.ingest(np.asarray(imu) if imu is not None else None)
        # timestamp sanity (Tracking.cc:1818-1855): a backwards step, or a
        # >1 s gap on an inertial sensor, breaks preintegration continuity —
        # store the active map and restart in a fresh one (CreateMapInAtlas)
        if self.last is not None and self.state != NOT_INITIALIZED:
            gap = timestamp - float(self.last["ts"])
            if gap < -1e-9 or (self.imu is not None and gap > 1.0):
                self._timestamp_jump()
            elif gap > 1.0:
                self.velocity = None  # stale motion model (visual-only)
        img = jnp.asarray(img, jnp.float32)
        with GLOBAL_TIMER.stage("orb_extraction"):
            if self.base_sensor == "stereo":
                feats, feats_r = self._extract_pair(
                    img, jnp.asarray(img_right, jnp.float32)
                )
            else:
                feats = self._extract(img)
        ur = depth = None
        if self.base_sensor == "stereo" and self.cfg.stereo_fisheye:
            depth, _ = stereo_mod.match_stereo_fisheye(
                self.cfg.kind, self.cfg.K, self.cfg.K_right,
                jnp.asarray(self.cfg.R_rl, jnp.float32),
                jnp.asarray(self.cfg.t_rl, jnp.float32),
                feats.xy, feats.descriptors, feats.valid,
                feats_r.xy, feats_r.descriptors, feats_r.valid,
            )
            # bind the triangulated depth as an inverse-depth measurement
            # through the standard stereo edge (ur = u - bf/z, exactly how
            # the reference binds RGB-D, Frame::ComputeStereoFromRGBD,
            # Frame.cc:984): the stereo residual then constrains metric
            # depth in pose optimization and BA. The reference instead uses
            # a right-camera reprojection edge (EdgeSE3ProjectXYZToBody) —
            # equivalent constraint, different noise weighting.
            if self.cfg.bf > 0:
                ur = jnp.where(
                    depth > self.cfg.min_depth,
                    feats.xy[:, 0] - self.cfg.bf / jnp.maximum(depth, 1e-6),
                    -1.0,
                )
        elif self.base_sensor == "stereo":
            ur, depth, _ = stereo_mod.match_stereo(
                feats.xy, feats.octave, feats.descriptors, feats.valid,
                feats_r.xy, feats_r.octave, feats_r.descriptors, feats_r.valid,
                img, jnp.asarray(img_right, jnp.float32),
                self.scale_factors, self.cfg.bf, self.cfg.min_depth,
            )
        elif self.base_sensor == "rgbd":
            ur, depth, _ = stereo_mod.depth_from_rgbd(
                feats.xy, jnp.asarray(depth_map, jnp.float32),
                self.cfg.bf, self.cfg.depth_factor,
            )
        self._frame_ur = ur
        self._frame_depth = depth

        if self.state == NOT_INITIALIZED:
            if self.base_sensor == "mono":
                ok = self._try_initialize(feats, timestamp)
            else:
                ok = self._initialize_with_depth(feats, ur, depth, timestamp)
        else:
            ok = self._track_frame(feats, timestamp)
        self._record_frame(timestamp, ok)

    def _timestamp_jump(self):
        """Timestamp discontinuity: store the active map and continue in a
        fresh one (Tracking.cc:1818-1855 -> CreateMapInAtlas,
        Tracking.cc:2662). Biases survive as priors for the next inertial
        initialization (the reference keeps mLastBias); everything else
        restarts."""
        verbose.print_mess(
            "Timestamp discontinuity: creating new map in Atlas",
            verbose.VERBOSITY_NORMAL,
        )
        self.map = atlas_ops.create_map(self.map)
        self.state = NOT_INITIALIZED
        self.init_ref = None
        self.last = None
        self.velocity = None
        self.last_kf_row = -1
        self.frames_since_kf = 0
        self.lost_count = 0
        self._vi_prior = None
        self._tracked_lms = None
        if self.imu is not None:
            self.imu.initialized = False
            self.imu.first_kf_ts = None
            self.imu.init_ts = None
            self.imu.viba_stage = 0
            self.imu._cur = ([], [], [], [])

    def _record_frame(self, timestamp, ok):
        if self.last is None or self.last_kf_row < 0:
            self.trajectory.append(
                FrameRecord(timestamp, -1, np.eye(3), np.zeros(3), False)
            )
            return
        s = self.map
        kf = self.last_kf_row
        R_kf_inv, t_kf_inv = lie.se3_inv(s.kf_R[kf], s.kf_t[kf])
        R_rel, t_rel = lie.se3_mul(self.last["R"], self.last["t"], R_kf_inv, t_kf_inv)
        self.trajectory.append(
            FrameRecord(timestamp, kf, np.array(R_rel), np.array(t_rel), bool(ok))
        )

    # ------------------------------------------------------------------
    # initialization (MonocularInitialization, Tracking.cc:2448-2525)
    # ------------------------------------------------------------------
    def _try_initialize(self, feats, timestamp) -> bool:
        cfg = self.cfg
        n_kp = int(feats.valid.sum())
        if self.init_ref is None:
            if n_kp > 100:
                self.init_ref = (feats, timestamp)
            return False
        ref_feats, ref_ts = self.init_ref
        idx, ok = matching.search_for_initialization(
            ref_feats.xy, ref_feats.descriptors, ref_feats.valid,
            feats.xy, feats.descriptors, feats.valid,
            window=100.0, ratio=0.9,
        )
        n_match = int(ok.sum())
        if n_match < cfg.init_min_matches:
            self.init_ref = (feats, timestamp) if n_kp > 100 else None
            return False

        res = two_view.reconstruct(
            jax.random.PRNGKey(len(self.trajectory)),
            ref_feats.xy, feats.xy[idx], ok, cfg.K,
            min_triangulated=50,
        )
        if not bool(res["success"]):
            return False

        good = np.array(res["good"])
        X = np.array(res["X"])
        R, t = np.array(res["R"]), np.array(res["t"])

        # median-depth normalization (CreateInitialMapMonocular:2582-2599)
        med = float(np.median(X[good][:, 2]))
        if med <= 0:
            return False
        X = X / med
        t = t / med

        s = self.map
        s, kf0 = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.zeros(3), ref_ts,
            ref_feats.xy, ref_feats.octave, ref_feats.angle,
            ref_feats.descriptors, ref_feats.valid,
        )
        s, kf1 = atlas_ops.add_keyframe(
            s, jnp.asarray(R), jnp.asarray(t), timestamp,
            feats.xy, feats.octave, feats.angle, feats.descriptors, feats.valid,
            parent=kf0, prev=kf0,
        )
        # the IMU interval for kf1 is exactly (ref_ts, timestamp]; the
        # backlog recorded before the reference frame precedes the map
        if self.imu is not None:
            self.imu.trim_before(ref_ts)
            self.imu.first_kf_ts = ref_ts
            self.imu.commit_keyframe(int(kf1), timestamp)
        # new landmarks bound to ref-frame features; then observe from kf1
        accept = jnp.asarray(good) & ok
        s, rows = atlas_ops.add_landmarks(
            s, jnp.asarray(X), ref_feats.descriptors,
            jnp.full((X.shape[0],), int(kf0), jnp.int32), accept,
            jnp.full((X.shape[0],), int(kf0), jnp.int32),
            jnp.arange(X.shape[0], dtype=jnp.int32),
        )
        s = atlas_ops.add_observations(s, kf1, idx, rows, accept & (rows >= 0))

        # initial global BA (20 iters, Tracking.cc:2580), then median-depth
        # renormalization (the reference normalizes after GBA, :2582-2599)
        window_rows = jnp.asarray(
            [int(kf0), int(kf1)] + [int(kf1)] * (cfg.local_window - 2), jnp.int32
        )
        s, _ = local_mapper.local_ba(
            cfg.kind, cfg.K, s, window_rows, n_fixed=1,
            window=cfg.local_window, iters=20,
            scale_factors=self.scale_factors,
        )
        active_lm = np.array(s.lm_valid)
        z0 = np.array(s.lm_pos)[active_lm][:, 2]
        med2 = float(np.median(z0[z0 > 0])) if (z0 > 0).any() else 1.0
        if med2 > 0:
            inv = 1.0 / med2
            s = dataclasses.replace(
                s,
                lm_pos=jnp.where(s.lm_valid[:, None], s.lm_pos * inv, s.lm_pos),
                kf_t=jnp.where(s.kf_valid[:, None], s.kf_t * inv, s.kf_t),
            )
        s = atlas_state.update_landmark_stats(s)
        self.map = s
        self.state = OK
        self.last = {
            "R": s.kf_R[kf1], "t": s.kf_t[kf1], "feats": feats, "ts": timestamp,
        }
        self.velocity = None
        self.last_kf_row = int(kf1)
        self.last_kf_inliers = int(accept.sum())
        self.frames_since_kf = 0
        self.init_ref = None
        return True

    # ------------------------------------------------------------------
    # stereo / RGB-D initialization (StereoInitialization, Tracking.cc:2335)
    # ------------------------------------------------------------------
    def _initialize_with_depth(self, feats, ur, depth, timestamp) -> bool:
        cfg = self.cfg
        n_kp = int(feats.valid.sum())
        if n_kp < 100:  # reference requires >500 at full budget (:2337)
            return False
        has_depth = (depth > cfg.min_depth) & feats.valid
        if int(has_depth.sum()) < 50:
            return False

        s = self.map
        s, kf0 = atlas_ops.add_keyframe(
            s, jnp.eye(3), jnp.zeros(3), timestamp,
            feats.xy, feats.octave, feats.angle, feats.descriptors, feats.valid,
            feat_ur=ur, feat_depth=depth,
        )
        # unproject every keypoint with depth (Tracking.cc:2365-2395)
        rays = cam.unproject(cfg.kind, cfg.K, feats.xy)
        X = rays * depth[:, None]
        s, rows = atlas_ops.add_landmarks(
            s, X, feats.descriptors,
            jnp.full((X.shape[0],), int(kf0), jnp.int32), has_depth,
            jnp.full((X.shape[0],), int(kf0), jnp.int32),
            jnp.arange(X.shape[0], dtype=jnp.int32),
        )
        s = atlas_state.update_landmark_stats(s)
        # IMU intervals start at this keyframe; the pre-map backlog is dropped
        if self.imu is not None:
            self.imu.trim_before(timestamp)
            self.imu.first_kf_ts = timestamp
        self.map = s
        self.state = OK
        self.last = {"R": jnp.eye(3), "t": jnp.zeros(3), "feats": feats,
                     "ts": timestamp}
        self.velocity = None
        self.last_kf_row = int(kf0)
        self.last_kf_inliers = int(has_depth.sum())
        self.frames_since_kf = 0
        return True

    # ------------------------------------------------------------------
    # per-frame tracking (TrackWithMotionModel + TrackLocalMap)
    # ------------------------------------------------------------------
    def _track_frame(self, feats, timestamp) -> bool:
        cfg = self.cfg
        s = self.map

        # pose prediction: IMU if initialized (PredictStateIMU,
        # Tracking.cc:1738), else constant-velocity motion model (:2862-2877)
        R_last, t_last = self.last["R"], self.last["t"]
        R_pred, t_pred = R_last, t_last
        predicted = False
        if self.imu is not None and self.imu.initialized:
            from . import vi_tracker
            from ..imu import preintegration as pre_mod

            pint = self.imu.preint_frame()
            if pint is not None:
                Rb, tb = vi_tracker.cam_to_body(
                    R_last, t_last, self.imu.Rbc, self.imu.tbc
                )
                Rb2, tb2, v2 = pre_mod.predict_state(
                    pint, Rb, tb, self.imu.vel, self.imu.bg, self.imu.ba
                )
                R_pred, t_pred = vi_tracker.body_to_cam(
                    Rb2, tb2, self.imu.Rbc, self.imu.tbc
                )
                self.imu.vel = v2
                predicted = True
        if not predicted and self.velocity is not None:
            Rv, tv = self.velocity
            R_pred, t_pred = lie.se3_mul(Rv, tv, R_last, t_last)

        in_map = s.lm_valid & (s.lm_map_id == s.active_map)

        # stage 1: match only the landmarks tracked in the LAST frame at the
        # predicted pose (TrackWithMotionModel matches the last frame's map
        # points, Tracking.cc:2854-2947 — re-associating the whole map at a
        # wide radius invites aliasing jumps); fall back to the full map when
        # continuity is lost
        stage1_mask = in_map
        if getattr(self, "_tracked_lms", None) is not None:
            cont = in_map & self._tracked_lms
            if int(cont.sum()) > cfg.min_inliers * 2:
                stage1_mask = cont
        R1, t1, inl1, n1 = self._match_and_optimize(
            s, feats, R_pred, t_pred, stage1_mask, cfg.match_radius_coarse
        )
        # fallback: a poisoned motion model (e.g. planar-ambiguity pose flip)
        # makes the prediction much worse than the last pose — retry from the
        # last pose with a doubled window (the reference's widen-x2 retry,
        # Tracking.cc:2892-2897, plus its TrackReferenceKeyFrame fallback)
        if self.velocity is not None and int(n1) < max(
            cfg.min_inliers * 2, 0.5 * self.last_inliers
        ):
            R1b, t1b, inl1b, n1b = self._match_and_optimize(
                s, feats, R_last, t_last, in_map, 2.0 * cfg.match_radius_coarse
            )
            if int(n1b) > int(n1):
                R1, t1, n1 = R1b, t1b, n1b
                self.velocity = None
        # stage 2: fine matching at refined pose
        R2, t2, inl2, n2 = self._match_and_optimize(
            s, feats, R1, t1, in_map, cfg.match_radius_fine,
            update_stats=True,
        )
        n_inliers = int(n2)
        self.last_inliers = n_inliers

        if n_inliers < cfg.min_inliers:
            self.lost_count += 1
            self.state = RECENTLY_LOST if self.lost_count < 5 else LOST
            # keep prediction as pose estimate
            self.last = {"R": R_pred, "t": t_pred, "feats": feats, "ts": timestamp}
            self.velocity = None
            self._tracked_lms = None
            self._vi_prior = None
            # relocalize against the keyframe database (Tracking.cc:1981-2012)
            if self._try_relocalize(feats):
                return True
            # mature map + persistent loss -> new map in the Atlas
            # (Tracking::CreateMapInAtlas, Tracking.cc:2014-2032)
            if self.state == LOST and int(self.map.n_kf) >= 10:
                self.map = atlas_ops.create_map(self.map)
                self.state = NOT_INITIALIZED
                self.init_ref = None
                self.last_kf_row = -1
            return False
        self.lost_count = 0
        self.state = OK

        # motion model: velocity = T_cur * T_last^{-1} (Tracking.cc:2207)
        Rl_inv, tl_inv = lie.se3_inv(R_last, t_last)
        self.velocity = lie.se3_mul(R2, t2, Rl_inv, tl_inv)
        self.last = {"R": R2, "t": t2, "feats": feats, "ts": timestamp}
        self.frames_since_kf += 1
        self._feat_lm = self._last_feat_lm  # per-feature landmark rows

        # keyframe decision (NeedNewKeyFrame, Tracking.cc:3064-3187)
        need_kf = (
            self.frames_since_kf >= cfg.kf_max_frames
            or (
                n_inliers < cfg.kf_tracked_ratio * max(self.last_kf_inliers, 1)
                and self.frames_since_kf >= cfg.kf_min_frames
                and n_inliers > cfg.min_inliers
            )
        )
        if need_kf and not self.mapping_paused:
            self._insert_keyframe(feats, timestamp, n_inliers)
        return True

    def _match_and_optimize(self, s, feats, R0, t0, lm_mask, radius,
                            update_stats=False):
        cfg = self.cfg
        idx, ok, visible, uv_pred, mdist = track_mod.match_local_map(
            cfg.kind, cfg.K, R0, t0,
            s.lm_pos, s.lm_desc, lm_mask,
            s.lm_max_dist, s.lm_min_dist, s.lm_normal,
            feats.xy, feats.descriptors, feats.octave, feats.valid,
            radius, self.scale_factors,
            img_wh=(float(cfg.img_wh[0]), float(cfg.img_wh[1])),
        )
        uv = feats.xy[idx]
        inv_sig2 = 1.0 / (
            self.scale_factors[jnp.clip(feats.octave[idx], 0, cfg.orb.n_levels - 1)]
            ** 2
        )
        # pose-inertial optimization once the IMU is initialized
        # (TrackLocalMap chooses PoseInertialOptimizationLast{Frame,KeyFrame}
        # over visual-only PoseOptimization, Tracking.cc:2970-2992); the
        # coarse stage-1 refinement stays visual-only like the reference's
        # motion-model stage
        vi_out = None
        if (update_stats and self.imu is not None and self.imu.initialized):
            vi_out = self._vi_pose_optimize(s, feats, idx, ok, R0, t0,
                                            inv_sig2)
        if vi_out is not None:
            R, t, inlier, n = vi_out
        elif self.base_sensor == "mono" or self._frame_ur is None:
            R, t, inlier, n = track_mod.pose_optimize(
                cfg.kind, cfg.K, R0, t0, uv, s.lm_pos, inv_sig2, ok
            )
        else:
            ur_edge = jnp.where(ok, self._frame_ur[idx], -1.0)
            R, t, inlier, n = track_mod.pose_optimize_stereo(
                cfg.kind, cfg.K, cfg.bf, R0, t0, uv, ur_edge, s.lm_pos,
                inv_sig2, ok,
            )
        if update_stats:
            # lm bookkeeping (mnVisible/mnFound, SearchLocalPoints:3343)
            self.map = dataclasses.replace(
                s,
                lm_visible=s.lm_visible + visible.astype(jnp.int32),
                lm_found=s.lm_found + inlier.astype(jnp.int32),
            )
            self._tracked_lms = inlier  # continuity set for next frame
            # per-feature landmark assignment for KF creation
            self._last_feat_lm = self._assign_features(
                idx, inlier, mdist, s.lmax, feats.xy.shape[0]
            )
        return R, t, inlier, n

    def _vi_pose_optimize(self, s, feats, idx, ok, R0, t0, inv_sig2):
        """PoseInertialOptimizationLast{KeyFrame,Frame} dispatch
        (Tracking.cc:2970-2992): after a map update, optimize against the
        last keyframe's (fixed) state; otherwise chain against the previous
        frame through the marginalized ConstraintPoseImu prior.
        Returns (R_cw, t_cw, inlier, n) or None to fall back to visual."""
        from ..imu import factors
        from . import vi_pose_opt, vi_tracker

        imu = self.imu
        cfg = self.cfg
        prior = self._vi_prior
        use_prior = prior is not None and prior["version"] == self._map_version
        if use_prior:
            pint = imu.preint_frame()
            prev = prior["state"]
        else:
            if self.last_kf_row < 0:
                return None
            kf = self.last_kf_row
            bg_kf, ba_kf = s.kf_bg[kf], s.kf_ba[kf]
            pint = imu.preint_since_kf(bg=bg_kf, ba=ba_kf)
            Rb, tb = vi_tracker.cam_to_body(
                s.kf_R[kf], s.kf_t[kf], imu.Rbc, imu.tbc
            )
            prev = {"R": Rb, "t": tb, "v": s.kf_vel[kf],
                    "bg": bg_kf, "ba": ba_kf}
        if pint is None or float(pint.dT) <= 0.0:
            return None

        d, info = factors.preint_edge_data(pint)
        rw = jnp.zeros((6, 6))
        rw = rw.at[:3, :3].set(factors.gyro_rw_info(pint))
        rw = rw.at[3:, 3:].set(factors.acc_rw_info(pint))

        Rb0, tb0 = vi_tracker.cam_to_body(R0, t0, imu.Rbc, imu.tbc)
        cur0 = {"R": Rb0, "t": tb0, "v": imu.vel,
                "bg": imu.bg, "ba": imu.ba}
        uv = feats.xy[idx]
        if self._frame_ur is not None:
            ur = jnp.where(ok, self._frame_ur[idx], -1.0)
        else:
            ur = -jnp.ones(uv.shape[0])

        kwargs = {}
        if use_prior:
            kwargs = dict(
                prior_data={"R0": prev["R"], "t0": prev["t"], "v0": prev["v"],
                            "bg0p": prev["bg"], "ba0p": prev["ba"]},
                prior_H=prior["H"], free_prev=True,
            )
        cur, inlier, n, H15 = vi_pose_opt.pose_inertial_optimize(
            cfg.kind, cfg.K, cfg.bf, imu.Rbc, imu.tbc,
            prev, cur0, d, info, rw,
            uv, ur, s.lm_pos, inv_sig2, ok, **kwargs,
        )
        if not bool(jnp.all(jnp.isfinite(cur["t"]))):
            return None
        imu.vel = cur["v"]
        imu.bg = cur["bg"]
        imu.ba = cur["ba"]
        self._vi_prior = {"state": cur, "H": H15,
                          "version": self._map_version}
        R, t = vi_tracker.body_to_cam(cur["R"], cur["t"], imu.Rbc, imu.tbc)
        return R, t, inlier, n

    @staticmethod
    def _assign_features(idx, ok, dist, lmax, n_feat):
        """Invert the per-landmark match (landmark -> feature) into a
        per-feature landmark row array (feature -> landmark, NO_LM if none).
        Two landmarks matching the same feature resolve by best descriptor
        distance (the reference keeps the best match per keypoint,
        ORBmatcher::SearchByProjection bestDist bookkeeping) — scatter-min on
        a packed (distance, row) key so the smallest distance wins."""
        lm_rows = jnp.arange(lmax, dtype=jnp.int32)
        big = jnp.int32(2**30)
        key = dist.astype(jnp.int32) * lmax + lm_rows  # dist major, row minor
        best = jnp.full((n_feat,), big, jnp.int32).at[
            jnp.where(ok, idx, n_feat)
        ].min(jnp.where(ok, key, big), mode="drop")
        return jnp.where(best < big, best % lmax, atlas_state.NO_LM)

    # ------------------------------------------------------------------
    def _insert_keyframe(self, feats, timestamp, n_inliers):
        cfg = self.cfg
        s = self.map
        if int(s.n_kf) >= cfg.kmax - 1:
            return
        s, kf = atlas_ops.add_keyframe(
            s, self.last["R"], self.last["t"], timestamp,
            feats.xy, feats.octave, feats.angle, feats.descriptors, feats.valid,
            feat_lm=self._feat_lm,
            feat_ur=self._frame_ur, feat_depth=self._frame_depth,
            parent=jnp.asarray(self.last_kf_row, jnp.int32),
            prev=jnp.asarray(self.last_kf_row, jnp.int32),
        )
        kf = int(kf)
        if self.imu is not None:
            self.imu.commit_keyframe(kf, timestamp)

        # stereo/RGBD: create landmarks directly from depth for unbound close
        # points (CreateNewKeyFrame, Tracking.cc:3247-3331). "Close" uses the
        # reference's METRIC threshold mThDepth = bf * thDepth / fx
        # (Tracking.cc:628-633); beyond it, only the ~100 nearest points are
        # created (the nPoints < 100 rule, Tracking.cc:3303-3331) — far
        # single-view depth is the least reliable and must not flood the map.
        if self.base_sensor != "mono" and self._frame_depth is not None:
            depth = self._frame_depth
            unbound = feats.valid & (self._feat_lm < 0)
            has_depth = (depth > cfg.min_depth) & unbound
            th_depth_m = cfg.bf * cfg.th_depth / float(np.asarray(cfg.K)[0])
            d_rank = jnp.where(has_depth, depth, jnp.inf)
            rank = jnp.argsort(jnp.argsort(d_rank))  # depth order per feature
            close = has_depth & ((depth < th_depth_m) | (rank < 100))
            rays = cam.unproject(cfg.kind, cfg.K, feats.xy)
            Xc = rays * depth[:, None]
            Rw, tw = lie.se3_inv(self.last["R"], self.last["t"])
            Xw = lie.se3_apply(Rw, tw, Xc)
            s, _ = atlas_ops.add_landmarks(
                s, Xw, feats.descriptors,
                jnp.full((Xw.shape[0],), kf, jnp.int32), close,
                jnp.full((Xw.shape[0],), kf, jnp.int32),
                jnp.arange(Xw.shape[0], dtype=jnp.int32),
            )

        # triangulate new points against the best covisible neighbor
        # keyframes (CreateNewMapPoints, LocalMapping.cc:391-408 uses the
        # nn=10 best covisibles; 3 here — wider baselines than pure temporal
        # neighbors constrain landmark scale better). Depth sensors already
        # created close points above; triangulating the depth-rejected
        # leftovers (mostly occlusion boundaries) poisons the map, so only
        # mono triangulates here.
        prev_rows = []
        if self.base_sensor == "mono":
            W = np.array(atlas_state.covisibility_weights(s)[kf])
            W[kf] = 0
            order = np.argsort(-W)
            prev_rows = [int(r) for r in order[:3] if W[r] >= 15]
            if not prev_rows and self.last_kf_row >= 0:
                prev_rows = [self.last_kf_row]
        for prev in prev_rows:
            Xw, f1, f2, accept = local_mapper.triangulate_pair(
                cfg.kind, cfg.K, s, kf, prev, self.scale_factors
            )
            s = local_mapper.insert_triangulated(
                s, kf, jnp.asarray(prev), Xw, f1, f2, accept
            )

        # densify observations: fuse landmarks into the recent keyframes
        # (SearchInNeighbors role) so landmarks carry more than 2 edges
        n_kf = int(s.n_kf)
        for krow in range(max(0, n_kf - 4), n_kf):
            s = fuse.fuse_into_keyframe(
                cfg.kind, cfg.K, s, jnp.asarray(krow, jnp.int32),
                self.scale_factors,
            )

        # local BA: free window = last `local_window` valid KFs of the
        # active map; fixed frontier = up to 4 earlier KFs kept as anchored
        # cameras WITH their edges (Optimizer::LocalBundleAdjustment's
        # lFixedCameras, Optimizer.cc:1118-1186) — dropping them caused
        # scale drift. Valid-row selection skips culled keyframes.
        w = cfg.local_window
        valid_rows = np.nonzero(
            np.array(s.kf_valid)
            & (np.array(s.kf_map_id) == int(s.active_map))
        )[0]
        n_rows = min(len(valid_rows), w + 4)
        rows = valid_rows[-n_rows:]
        n_fixed = max(2, n_rows - w) if n_rows > 2 else 1
        rows = np.concatenate([rows, np.full((w + 4) - len(rows), rows[-1])])
        ran_vi_ba = False
        if self.imu is not None and self.imu.initialized:
            from . import vi_tracker

            self.map = s
            ran_vi_ba = vi_tracker.run_vi_local_ba(self, rows, n_fixed)
            s = self.map
        if not ran_vi_ba:
            s, _ = local_mapper.local_ba(
                cfg.kind, cfg.K, s, jnp.asarray(rows, jnp.int32),
                n_fixed=n_fixed, window=w + 4, iters=8,
                scale_factors=self.scale_factors,
                stereo=(self.base_sensor != "mono"), bf=cfg.bf,
            )
        s = local_mapper.cull_landmarks(s)
        # keyframe culling over the recent window (LocalMapping::KeyFrameCulling)
        if self.imu is None and int(s.n_kf) > w + 4:
            s = local_mapper.cull_keyframes(
                s, jnp.asarray(rows[: w + 4], jnp.int32)
            )
        s = atlas_state.update_landmark_stats(s)
        self.map = s
        # inertial culling preserves the temporal chain and merges the
        # culled KF's preintegration interval into its successor
        # (LocalMapping.cc:1020-1041)
        if (self.imu is not None and self.imu.initialized
                and int(s.n_kf) > w + 4):
            from . import vi_tracker

            if vi_tracker.cull_keyframes_inertial(self, rows[: w + 4]):
                s = self.map

        # inertial initialization once enough baseline exists
        # (LocalMapping::InitializeIMU trigger, LocalMapping.cc:181-187)
        if self.imu is not None and not self.imu.initialized:
            from . import vi_tracker

            if vi_tracker.try_initialize_imu(self):
                s = self.map
                self.last["R"] = s.kf_R[kf]
                self.last["t"] = s.kf_t[kf]
                self._vi_prior = None  # gauge changed
        elif self.imu is not None:
            # staged refinement: VIBA1 (>5 s), VIBA2 (>15 s), mono scale
            # refinement (~10 s cadence; LocalMapping.cc:200-242)
            from . import vi_tracker

            if vi_tracker.try_refine_imu(self):
                s = self.map
                self.last["R"] = s.kf_R[kf]
                self.last["t"] = s.kf_t[kf]

        # a previously launched background GBA that finished: merge its
        # result into the live map (RunGlobalBundleAdjustment catch-up,
        # LoopClosing.cc:2320-2494)
        if self.gba is not None and self.gba.finished:
            # correct the current pose through the last KF's correction
            R_kf_old = np.array(s.kf_R[self.last_kf_row])
            t_kf_old = np.array(s.kf_t[self.last_kf_row])
            s = self.gba.reconcile(s)
            R_old_i, t_old_i = lie.se3_inv(jnp.asarray(R_kf_old),
                                           jnp.asarray(t_kf_old))
            R_rel, t_rel = lie.se3_mul(self.last["R"], self.last["t"],
                                       R_old_i, t_old_i)
            self.last["R"], self.last["t"] = lie.se3_mul(
                R_rel, t_rel, s.kf_R[self.last_kf_row],
                s.kf_t[self.last_kf_row],
            )
            self.map = s
            self.velocity = None
            self._tracked_lms = None
            self._vi_prior = None
            self._map_version += 1

        # loop / merge detection on the fresh keyframe
        if self.loop_closer is not None:
            merges_before = self.loop_closer.n_merges
            loops_before = self.loop_closer.n_loops
            self.map, closed = self.loop_closer.on_keyframe(
                self.map, kf, cfg.kind, cfg.K
            )
            if closed:
                s = self.map
                # pose may have been corrected; refresh tracking state
                self.last["R"] = s.kf_R[kf]
                self.last["t"] = s.kf_t[kf]
                self.velocity = None
                self._tracked_lms = None
                self._vi_prior = None
                # inertial merge: VI welding BA over the temporal window
                # (MergeLocal2 -> MergeInertialBA, LoopClosing.cc:1783,
                # Optimizer.cc:3948) — the visual weld already ran inside
                # the loop closer; this re-solves the window with the
                # inertial chain so velocities/biases stay consistent
                # with the new (merged) gauge
                if (self.loop_closer.n_merges > merges_before
                        and self.imu is not None and self.imu.initialized):
                    from . import vi_tracker

                    n_kf = int(s.n_kf)
                    wsz = min(n_kf, 10)
                    rows = np.arange(n_kf - wsz, n_kf)
                    vi_tracker.run_vi_local_ba(self, rows, n_fixed=1)
                # after a loop correction: global BA in a side thread if the
                # map is small enough (CorrectLoop spawns RunGlobalBundle-
                # Adjustment when <200 KF & 1 map, LoopClosing.cc:1199-1207);
                # a new correction aborts a still-running campaign (mbStopGBA)
                if self.loop_closer.n_loops > loops_before:
                    if self.gba is not None and self.gba.running:
                        self.gba.request_abort()
                    elif (self.background_gba and self.imu is None
                          and int(self.map.n_kf) < 200):
                        from ..mapping.global_ba import GlobalBARunner

                        self.gba = GlobalBARunner(cfg.K, cfg.kind)
                        self.gba.launch(self.map)
        s = self.map
        # refresh current pose from the optimized KF
        self.last["R"] = s.kf_R[kf]
        self.last["t"] = s.kf_t[kf]
        self.velocity = None
        self.last_kf_row = kf
        self.last_kf_inliers = n_inliers
        self.frames_since_kf = 0
        # map structurally updated -> next frame optimizes against the KF
        # (the reference's mbMapUpdated -> LastKeyFrame dispatch)
        self._map_version += 1

    # ------------------------------------------------------------------
    def poses(self):
        """Trajectory as (timestamps, Tcw rotations, translations, ok) —
        composed against the CURRENT (post-BA) keyframe poses, matching
        System::SaveTrajectoryEuRoC semantics."""
        s = self.map
        kf_R = np.array(s.kf_R)
        kf_t = np.array(s.kf_t)
        ts, Rs, tts, oks = [], [], [], []
        for f in self.trajectory:
            ts.append(f.timestamp)
            if f.ref_kf < 0:
                Rs.append(np.eye(3))
                tts.append(np.zeros(3))
                oks.append(False)
                continue
            Rk, tk = kf_R[f.ref_kf], kf_t[f.ref_kf]
            R = f.R_rel @ Rk
            t = f.R_rel @ tk + f.t_rel
            Rs.append(R)
            tts.append(t)
            oks.append(f.ok)
        return np.array(ts), np.stack(Rs), np.stack(tts), np.array(oks)
