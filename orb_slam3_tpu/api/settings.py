"""Settings ingestion: reads the reference's YAML configuration files.

Role of the `Settings` class (`/root/reference/src/Settings.cc`,
`include/Settings.h`): typed parsing of the "File.version 1.0" YAML schema
(camera calibration + distortion, stereo bf/thDepth, IMU noise/Tbc, ORB
extractor params, RGBD depth factor) AND the legacy flat-key schema read by
`Tracking::ParseCamParamFile` (`Tracking.cc:619-1426`) — the same keys, so
the reference's shipped dataset YAMLs (EuRoC.yaml, TUM*.yaml, KITTI*.yaml)
can be ingested directly.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

from ..frontend import camera as cam


@dataclasses.dataclass
class SlamSettings:
    sensor: str = "mono"
    kind: int = cam.PINHOLE
    K: np.ndarray = None                  # [8] fx fy cx cy (k0..k3 for KB8)
    dist_coeffs: np.ndarray = None        # [5] radtan k1 k2 p1 p2 k3
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 0.0
    th_depth: float = 40.0
    depth_factor: float = 1.0
    # ORB
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # IMU
    imu_freq: float = 200.0
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3e-3
    Tbc: np.ndarray = None                # [4, 4]
    # non-rectified stereo (fisheye): right camera + T_c1_c2 (left-from-right,
    # `Stereo.T_c1_c2` in the 1.0 schema, Settings.cc readCamera2)
    K_right: np.ndarray = None            # [8]
    T_lr: np.ndarray = None               # [4, 4]
    # legacy rectified-stereo blocks (LEFT./RIGHT. K, D, R, P — the old
    # EuRoC.yaml schema consumed by cv::initUndistortRectifyMap,
    # Examples_old/Stereo/EuRoC.yaml:50-81): when present, images must be
    # remapped before tracking (System.cc:253-265)
    rect_left: dict = None                # {K [3,3], D, R [3,3], P [3,4]}
    rect_right: dict = None
    # input resize (Camera.newWidth/newHeight, Settings.cc:384-409): images
    # are resized before tracking and the calibration is scaled accordingly
    resize_wh: tuple = None               # (new_w, new_h) or None


def _load_yaml(path: str) -> dict:
    """Parse the OpenCV-flavored YAML the reference ships (contains the
    %YAML directive and !!opencv-mat tags that strict loaders reject)."""
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML.*$", "", text, flags=re.M)
    text = text.replace("!!opencv-matrix", "")
    # the old-format YAMLs write "data:[..." without a space (valid for
    # cv::FileStorage, rejected by strict YAML parsers)
    text = re.sub(r"^(\s*\w+):(\[)", r"\1: \2", text, flags=re.M)
    return yaml.safe_load(text) or {}


def load_settings(path: str, sensor: str = "mono") -> SlamSettings:
    d = _load_yaml(path)

    def get(*keys, default=None):
        for k in keys:
            if k in d and d[k] is not None:
                return d[k]
        return default

    s = SlamSettings(sensor=sensor)
    cam_type = str(get("Camera.type", "Camera1.type", default="PinHole"))
    s.kind = cam.KB8 if "Kannala" in cam_type else cam.PINHOLE

    fx = float(get("Camera1.fx", "Camera.fx", default=450.0))
    fy = float(get("Camera1.fy", "Camera.fy", default=450.0))
    cx = float(get("Camera1.cx", "Camera.cx", default=320.0))
    cy = float(get("Camera1.cy", "Camera.cy", default=240.0))
    if s.kind == cam.KB8:
        k = [float(get(f"Camera1.k{i+1}", f"Camera.k{i+1}", default=0.0)) for i in range(4)]
        s.K = np.array(cam.make_kb8(fx, fy, cx, cy, *k))
        s.dist_coeffs = np.zeros(5, np.float32)
    else:
        s.K = np.array(cam.make_pinhole(fx, fy, cx, cy))
        s.dist_coeffs = np.array(
            [
                float(get("Camera1.k1", "Camera.k1", default=0.0)),
                float(get("Camera1.k2", "Camera.k2", default=0.0)),
                float(get("Camera1.p1", "Camera.p1", default=0.0)),
                float(get("Camera1.p2", "Camera.p2", default=0.0)),
                float(get("Camera1.k3", "Camera.k3", default=0.0)),
            ],
            np.float32,
        )

    s.width = int(get("Camera.width", default=640))
    s.height = int(get("Camera.height", default=480))
    s.fps = float(get("Camera.fps", default=30.0))
    s.bf = float(get("Camera.bf", "Stereo.b", default=0.0))
    if get("Stereo.b") is not None and get("Camera.bf") is None:
        s.bf = float(get("Stereo.b")) * fx
    s.th_depth = float(get("Stereo.ThDepth", "ThDepth", default=40.0))
    s.depth_factor = 1.0 / float(get("RGBD.DepthMapFactor", "DepthMapFactor", default=1.0))

    s.n_features = int(get("ORBextractor.nFeatures", default=1000))
    s.scale_factor = float(get("ORBextractor.scaleFactor", default=1.2))
    s.n_levels = int(get("ORBextractor.nLevels", default=8))
    s.ini_th_fast = int(get("ORBextractor.iniThFAST", default=20))
    s.min_th_fast = int(get("ORBextractor.minThFAST", default=7))

    s.imu_freq = float(get("IMU.Frequency", default=200.0))
    s.noise_gyro = float(get("IMU.NoiseGyro", default=1.7e-4))
    s.noise_acc = float(get("IMU.NoiseAcc", default=2e-3))
    s.walk_gyro = float(get("IMU.GyroWalk", default=1.9e-5))
    s.walk_acc = float(get("IMU.AccWalk", default=3e-3))

    # second (right) camera for non-rectified stereo
    if get("Camera2.fx") is not None:
        fx2 = float(get("Camera2.fx"))
        fy2 = float(get("Camera2.fy"))
        cx2 = float(get("Camera2.cx"))
        cy2 = float(get("Camera2.cy"))
        if s.kind == cam.KB8:
            k2s = [float(get(f"Camera2.k{i+1}", default=0.0)) for i in range(4)]
            s.K_right = np.array(cam.make_kb8(fx2, fy2, cx2, cy2, *k2s))
        else:
            s.K_right = np.array(cam.make_pinhole(fx2, fy2, cx2, cy2))
        tlr = get("Stereo.T_c1_c2", "Tlr")
        if isinstance(tlr, dict) and "data" in tlr:
            rows = 4 if len(tlr["data"]) == 16 else 3
            s.T_lr = np.eye(4, dtype=np.float32)
            s.T_lr[:rows] = np.array(tlr["data"], np.float32).reshape(rows, 4)
        elif tlr is not None:
            s.T_lr = np.array(tlr, np.float32).reshape(4, 4)

    # legacy rectification blocks (opencv-matrix dicts with rows/cols/data)
    def mat(key):
        m = get(key)
        if isinstance(m, dict) and "data" in m:
            return np.array(m["data"], np.float64).reshape(
                int(m.get("rows", 3)), int(m.get("cols", 3))
            )
        return np.asarray(m, np.float64) if m is not None else None

    if get("LEFT.K") is not None:
        s.rect_left = {k: mat(f"LEFT.{k}") for k in ("K", "D", "R", "P")}
        s.rect_right = {k: mat(f"RIGHT.{k}") for k in ("K", "D", "R", "P")}
        # after rectification the working intrinsics are LEFT.P and the
        # distortion is zero; bf comes from RIGHT.P[0,3] = -fx*baseline
        P = s.rect_left["P"]
        s.K = np.array(cam.make_pinhole(P[0, 0], P[1, 1], P[0, 2], P[1, 2]))
        s.dist_coeffs = np.zeros(5, np.float32)
        if s.bf == 0.0 and s.rect_right["P"] is not None:
            s.bf = float(abs(s.rect_right["P"][0, 3]))
        s.width = int(get("LEFT.width", default=s.width))
        s.height = int(get("LEFT.height", default=s.height))

    tbc = get("IMU.T_b_c1", "Tbc")
    if isinstance(tbc, dict) and "data" in tbc:
        s.Tbc = np.array(tbc["data"], np.float32).reshape(4, 4)
    elif tbc is not None:
        s.Tbc = np.array(tbc, np.float32).reshape(4, 4)
    else:
        s.Tbc = np.eye(4, dtype=np.float32)

    # Camera.newWidth/newHeight (Settings.cc:384-409): resize input images
    # and scale the calibrations + bf by the per-axis factors (applied last
    # so every parsed quantity is at the original resolution). Not combined
    # with the legacy rectification blocks (the reference rectifies at the
    # original size in that schema too).
    nw, nh = get("Camera.newWidth"), get("Camera.newHeight")
    if (nw is not None or nh is not None) and s.rect_left is None:
        nw = int(nw) if nw is not None else s.width
        nh = int(nh) if nh is not None else s.height
        sx, sy = nw / s.width, nh / s.height
        for Karr in (s.K, s.K_right):
            if Karr is not None:
                Karr[0] *= sx   # fx
                Karr[2] *= sx   # cx
                Karr[1] *= sy   # fy
                Karr[3] *= sy   # cy
        s.bf *= sx
        s.resize_wh = (nw, nh)
        s.width, s.height = nw, nh
    return s


def to_tracker_config(s: SlamSettings, **overrides):
    from ..frontend import orb as orb_mod
    from ..tracking import tracker as trk
    import jax.numpy as jnp

    cfg = trk.TrackerConfig(
        K=jnp.asarray(s.K),
        kind=s.kind,
        img_wh=(s.width, s.height),
        sensor=s.sensor,
        bf=s.bf,
        th_depth=s.th_depth,
        depth_factor=s.depth_factor,
        orb=orb_mod.OrbConfig(
            n_features=s.n_features,
            n_levels=s.n_levels,
            scale_factor=s.scale_factor,
            ini_th_fast=float(s.ini_th_fast),
            min_th_fast=float(s.min_th_fast),
        ),
        imu_noise=dict(
            noise_gyro=s.noise_gyro, noise_acc=s.noise_acc,
            walk_gyro=s.walk_gyro, walk_acc=s.walk_acc,
        ),
        Tbc=s.Tbc,
    )
    if (s.kind == cam.PINHOLE and s.dist_coeffs is not None
            and float(np.abs(s.dist_coeffs).max()) > 0):
        cfg.dist_coeffs = s.dist_coeffs
    # non-rectified stereo: KB8 pair with explicit T_lr (X_l = T_lr X_r)
    if (s.sensor.startswith("stereo") and s.kind == cam.KB8
            and s.K_right is not None and s.T_lr is not None):
        R_lr = s.T_lr[:3, :3]
        t_lr = s.T_lr[:3, 3]
        cfg.stereo_fisheye = True
        cfg.K_right = jnp.asarray(s.K_right)
        cfg.R_rl = R_lr.T
        cfg.t_rl = -R_lr.T @ t_lr
        if cfg.bf <= 0:
            # virtual bf for the inverse-depth binding of triangulated
            # fisheye depth (Settings::readCamera2 computes bf from the
            # stereo extrinsics baseline, Settings.cc)
            cfg.bf = float(np.linalg.norm(t_lr)) * float(s.K[0])
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
