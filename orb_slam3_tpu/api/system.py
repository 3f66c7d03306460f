"""The public session facade — the `System` class equivalent.

Mirrors the reference's top-level API (`/root/reference/include/System.h:
105-198` / `src/System.cc`): construct with settings + sensor, feed frames
via track_monocular/track_stereo/track_rgbd, toggle localization-only mode,
reset, save/load the Atlas, export trajectories, query tracking state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..place import vocab as vocab_mod
from ..tracking import tracker as trk
from . import checkpoint, settings as settings_mod, trajectory


class System:
    MONOCULAR = "mono"
    STEREO = "stereo"
    RGBD = "rgbd"

    def __init__(self, settings_path: Optional[str] = None,
                 sensor: str = "mono",
                 vocabulary: Optional[vocab_mod.Vocabulary] = None,
                 config: Optional[trk.TrackerConfig] = None,
                 atlas_path: Optional[str] = None):
        """settings_path: a reference-format YAML (System ctor reads the
        settings file, System.cc:70-85); or pass a TrackerConfig directly.
        vocabulary enables place recognition (loop closing, relocalization,
        map merging). atlas_path loads a previous session's Atlas
        (System::LoadAtlas, System.cc:1445)."""
        self.rectifier = None
        self._resize = None
        if config is None:
            if settings_path is None:
                raise ValueError("need settings_path or config")
            s = settings_mod.load_settings(settings_path, sensor)
            config = settings_mod.to_tracker_config(s)
            if s.rect_left is not None and sensor.startswith("stereo"):
                # legacy EuRoC-style rectification: remap both images before
                # tracking (System::TrackStereo, System.cc:253-265)
                from ..frontend.rectify import StereoRectifier

                self.rectifier = StereoRectifier(
                    s.rect_left, s.rect_right, s.width, s.height
                )
            if s.resize_wh is not None:
                # Camera.newWidth/newHeight (System.cc:253-265 resize path)
                import jax
                import jax.numpy as jnp

                w, h = s.resize_wh
                self._resize = jax.jit(lambda im: jax.image.resize(
                    jnp.asarray(im, jnp.float32), (h, w), "bilinear",
                    antialias=False))
        self.tracker = trk.Tracker(config)
        self.vocabulary = vocabulary
        if vocabulary is not None:
            self.tracker.attach_loop_closer(vocabulary)
        self.localization_only = False
        if atlas_path is not None:
            state, extra = checkpoint.load_atlas(atlas_path, vocabulary)
            self.tracker.map = state
            # resume = localize + extend against the loaded maps
            # (System.cc:171: fresh active map on load)
            from ..atlas import ops as atlas_ops

            self.tracker.map = atlas_ops.create_map(self.tracker.map)
            # rebuild the place-recognition DB from the loaded keyframes
            # (Atlas::PostLoad re-adds every KF to the KFDB, System.cc:1497);
            # without it relocalization/merge against the loaded maps is dead
            if self.tracker.loop_closer is not None:
                self.tracker.loop_closer.rebuild_db(self.tracker.map)

    # ------------------------------------------------------------------
    def track_monocular(self, img, timestamp: float, imu=None):
        """System::TrackMonocular (System.cc:399). imu: [M,7] rows
        (t, gx, gy, gz, ax, ay, az) since the previous frame (vImuMeas)."""
        from ..utils.timing import GLOBAL_TIMER

        if self._resize is not None:
            img = self._resize(img)
        self._last_img = img  # for the live viewer's frame drawer
        with GLOBAL_TIMER.stage("track.process_total"):
            self.tracker.process(img, timestamp, imu=imu)
        with GLOBAL_TIMER.stage("track.pose_return"):
            return self.current_pose(settle=False)

    def track_stereo(self, img_left, img_right, timestamp: float, imu=None):
        """System::TrackStereo (System.cc:244): rectifies first when the
        settings shipped LEFT./RIGHT. rectification blocks (System.cc:253)."""
        if self.rectifier is not None:
            img_left, img_right = self.rectifier(img_left, img_right)
        if self._resize is not None:
            img_left, img_right = self._resize(img_left), self._resize(img_right)
        self._last_img = img_left
        self.tracker.process(img_left, timestamp, img_right=img_right,
                             imu=imu)
        return self.current_pose(settle=False)

    def track_rgbd(self, img, depth, timestamp: float, imu=None):
        """System::TrackRGBD (System.cc:328)."""
        if self._resize is not None:
            img, depth = self._resize(img), self._resize(depth)
        self._last_img = img
        self.tracker.process(img, timestamp, depth_map=depth, imu=imu)
        return self.current_pose(settle=False)

    # ------------------------------------------------------------------
    def current_pose(self, settle: bool = True):
        """Latest Tcw estimate (R, t) or None before initialization.

        settle=False returns the freshest pose WITHOUT blocking: the
        arrays come back as device arrays (numpy-compatible; np.asarray
        them to force a host copy) so the per-frame track_* returns never
        wait on the in-flight pipelined step — fetching the just-dispatched
        pose was measured at 65 ms/frame through the device tunnel."""
        if settle:
            self.tracker._finalize_pending()
            if self.tracker.last is None:
                return None
            return (np.asarray(self.tracker.last["R"]),
                    np.asarray(self.tracker.last["t"]))
        p = getattr(self.tracker, "_pending", None)
        if p is not None:
            return p["out"]["R"], p["out"]["t"]
        if self.tracker.last is None:
            return None
        return self.tracker.last["R"], self.tracker.last["t"]

    def tracking_state(self) -> int:
        """System::GetTrackingState (System.h:160)."""
        self.tracker._finalize_pending()
        return self.tracker.state

    def is_lost(self) -> bool:
        self.tracker._finalize_pending()
        return self.tracker.state in (trk.RECENTLY_LOST, trk.LOST)

    def activate_localization_mode(self):
        """System::ActivateLocalizationMode (System.cc:409): tracking
        continues, mapping stops (no new keyframes, no map mutation)."""
        self.localization_only = True
        self.tracker.mapping_paused = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.mapping_paused = False

    def reset(self):
        """System::Reset: drop everything and start a fresh Atlas."""
        cfg = self.tracker.cfg
        if self.tracker.async_mapper is not None:
            self.tracker.async_mapper.stop()
        self.tracker = trk.Tracker(cfg)
        if self.vocabulary is not None:
            self.tracker.attach_loop_closer(self.vocabulary)

    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        ts, R, t, ok = self.tracker.poses()
        trajectory.save_tum(path, ts, R, t, ok)

    def save_trajectory_euroc(self, path: str):
        """SaveTrajectoryEuRoC (System.cc:662-882): inertial sensors export
        the IMU BODY frame Twb via the Tbc extrinsics — EuRoC's IMU-frame
        ground truth (evaluation/Ground_truth/EuRoC_imu) only aligns
        against body poses, camera-frame export would be silently off by
        the extrinsics."""
        ts, R, t, ok = self.tracker.poses()
        trajectory.save_euroc(path, ts, R, t, ok, Tbc=self._tbc())

    def _tbc(self):
        """4x4 camera-to-body extrinsics for inertial sensors, else None."""
        imu = self.tracker.imu
        if imu is None:
            return None
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(imu.Rbc)
        T[:3, 3] = np.asarray(imu.tbc)
        return T

    def save_trajectory_kitti(self, path: str):
        ts, R, t, ok = self.tracker.poses()
        trajectory.save_kitti(path, ts, R, t, ok)

    def save_keyframe_trajectory_tum(self, path: str):
        """System::SaveKeyFrameTrajectoryTUM (System.cc:884)."""
        s = self.tracker.map
        kv = np.array(s.kf_valid)
        trajectory.save_tum(
            path,
            np.array(s.kf_timestamp)[kv],
            np.array(s.kf_R)[kv],
            np.array(s.kf_t)[kv],
        )

    def run_global_ba(self, num_iters: int = 10):
        """Synchronous full bundle adjustment of the active map
        (Optimizer::GlobalBundleAdjustemnt, Optimizer.cc:52). The tracker
        also spawns this in a background thread after loop closures
        (LoopClosing.cc:1199-1207)."""
        from ..mapping.global_ba import GlobalBARunner

        self.tracker.sync_mapping()
        runner = GlobalBARunner(self.tracker.cfg.K, self.tracker.cfg.kind,
                                num_iters=num_iters)
        self.tracker.map = runner.run(self.tracker.map)
        self.tracker._mapper_stale = self.tracker.async_mapper is not None

    def save_atlas(self, path: str):
        self.tracker.sync_mapping()
        checkpoint.save_atlas(path, self.tracker.map, self.vocabulary)

    def save_map_3d(self, path: str):
        """Interactive 3D map viewer (MapDrawer/Viewer role,
        /root/reference/src/MapDrawer.cc:135-447): landmarks, keyframe
        frusta, spanning tree, and trajectory in one self-contained HTML
        file with orbit/pan/zoom controls."""
        from . import evaluate, viz

        self.tracker.sync_mapping()
        ts, R, t, ok = self.tracker.poses()
        traj = (evaluate.camera_centers(R[ok], t[ok])
                if ok.any() else None)
        viz.save_map_html(path, self.tracker.map, traj)

    def change_dataset(self):
        """System::ChangeDataset (multi-sequence runs, e.g.
        Examples/Stereo-Inertial/stereo_inertial_euroc.cc:42-117): force a
        map discontinuity before the next frame — the active map is stored
        and tracking restarts in a fresh Atlas map."""
        t = self.tracker
        if t.state != trk.NOT_INITIALIZED:
            t._timestamp_jump()

    def save_debug_data(self, path: str):
        """System::SaveDebugData (System.cc:1265-1318): dump the inertial
        initialization/refinement history (per event: timestamp, scale
        applied, gravity direction, biases) for offline inspection."""
        t = self.tracker
        with open(path, "w") as f:
            f.write("# ts event scale gx gy gz bgx bgy bgz bax bay baz\n")
            for e in getattr(t, "debug_events", []):
                g = e["gravity"]
                bg = e["bg"]
                ba = e["ba"]
                f.write(
                    f"{e['ts']:.6f} {e['event']} {e['scale']:.6f} "
                    f"{g[0]:.4f} {g[1]:.4f} {g[2]:.4f} "
                    f"{bg[0]:.6f} {bg[1]:.6f} {bg[2]:.6f} "
                    f"{ba[0]:.6f} {ba[1]:.6f} {ba[2]:.6f}\n"
                )

    def shutdown(self):
        """System::Shutdown (System.cc:515): drain the background mapper,
        join the background global-BA campaign if one is running and fold
        its result into the map (and stop the live viewer if attached)."""
        v = getattr(self, "_viewer", None)
        if v is not None:
            v.stop()
            self._viewer = None
        t = self.tracker
        t.sync_mapping()
        m = t.async_mapper
        gba = m.gba if m is not None and m.gba is not None else t.gba
        if gba is not None and gba.running:
            gba.request_abort()
            gba.join(timeout=60.0)
        if gba is not None and gba.finished:
            t.map = gba.reconcile(t.map)
            t._mapper_stale = m is not None
        if m is not None:
            m.stop()
            t.async_mapper = None
        t.gba = None

    def start_viewer(self, port: int = 8090, refresh_s: float = 1.0):
        """Start the live HTTP viewer (the Viewer-thread role,
        /root/reference/src/Viewer.cc:162 — see api/viewer.py). Returns the
        LiveViewer; stop() it or let shutdown() do so."""
        from .viewer import LiveViewer

        self._viewer = LiveViewer(self, port=port, refresh_s=refresh_s)
        self._viewer.start()
        return self._viewer
