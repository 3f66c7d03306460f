"""Dataset drivers: EuRoC ASL, TUM RGB-D, TUM-VI, KITTI odometry.

Role of the example mains (`/root/reference/Examples/Monocular/mono_euroc.cc`
`LoadImages`, `Examples/RGB-D/rgbd_tum.cc` + `associate.py`,
`Examples/Stereo/stereo_kitti.cc`, `Examples/Monocular-Inertial/
mono_inertial_euroc.cc` `LoadIMU`): enumerate (timestamp, image path[, imu])
streams from the on-disk dataset layouts. Images are decoded lazily.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Iterator, Optional

import numpy as np


@dataclasses.dataclass
class FrameData:
    timestamp: float
    img_path: str
    img_right_path: Optional[str] = None
    depth_path: Optional[str] = None
    imu: Optional[np.ndarray] = None  # [M, 7]: t, gx, gy, gz, ax, ay, az


def read_image(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float32)


def load_euroc(root: str, with_imu: bool = False, stereo: bool = False):
    """EuRoC ASL layout: mav0/cam0/data.csv + data/<ts>.png, mav0/imu0/data.csv.
    Returns list[FrameData] with per-frame IMU batches (measurements since
    the previous frame, the reference's vImuMeas contract, System.cc:311)."""
    cam0 = os.path.join(root, "mav0", "cam0")
    frames = []
    with open(os.path.join(cam0, "data.csv")) as f:
        for row in csv.reader(f):
            if row[0].startswith("#"):
                continue
            ts = int(row[0]) * 1e-9
            frames.append(
                FrameData(
                    timestamp=ts,
                    img_path=os.path.join(cam0, "data", row[1].strip()),
                    img_right_path=os.path.join(
                        root, "mav0", "cam1", "data", row[1].strip()
                    )
                    if stereo
                    else None,
                )
            )
    if with_imu:
        imu_rows = []
        with open(os.path.join(root, "mav0", "imu0", "data.csv")) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                imu_rows.append([int(row[0]) * 1e-9] + [float(x) for x in row[1:7]])
        imu = np.array(imu_rows)
        j = 0
        for i, fr in enumerate(frames):
            lo = j
            while j < len(imu) and imu[j, 0] <= fr.timestamp:
                j += 1
            fr.imu = imu[lo:j]
    return frames


def load_tum_rgbd(root: str, max_dt: float = 0.02):
    """TUM RGB-D layout: rgb.txt + depth.txt associated by timestamp
    (role of evaluation/associate.py)."""

    def read_list(name):
        entries = []
        with open(os.path.join(root, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, path = line.split()[:2]
                entries.append((float(ts), os.path.join(root, path)))
        return entries

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    dts = np.array([d[0] for d in depth])
    frames = []
    for ts, path in rgb:
        j = int(np.argmin(np.abs(dts - ts)))
        if abs(dts[j] - ts) <= max_dt:
            frames.append(
                FrameData(timestamp=ts, img_path=path, depth_path=depth[j][1])
            )
    return frames


def load_kitti(root: str, sequence: str = "00", stereo: bool = True):
    """KITTI odometry layout: sequences/<seq>/image_0, image_1, times.txt."""
    seq = os.path.join(root, "sequences", sequence)
    with open(os.path.join(seq, "times.txt")) as f:
        times = [float(x) for x in f.read().split()]
    frames = []
    for i, ts in enumerate(times):
        name = f"{i:06d}.png"
        frames.append(
            FrameData(
                timestamp=ts,
                img_path=os.path.join(seq, "image_0", name),
                img_right_path=os.path.join(seq, "image_1", name) if stereo else None,
            )
        )
    return frames


def load_tum_vi(root: str, with_imu: bool = False, stereo: bool = False):
    """TUM-VI (512x512 fisheye). The official "Euroc / DSO 512x512" release
    ships the same mav0/ ASL folder layout as EuRoC, so enumeration
    delegates to load_euroc (role of Examples/Monocular-Inertial/
    mono_inertial_tum_vi.cc and Examples/Stereo-Inertial/
    stereo_inertial_tum_vi.cc LoadImages/LoadIMU). Use with the reference's
    TUM-VI.yaml (KannalaBrandt8 camera; `Settings.h:44-48`)."""
    return load_euroc(root, with_imu=with_imu, stereo=stereo)
