#!/usr/bin/env python
"""TUM-VI driver (role of Examples/Monocular-Inertial/mono_inertial_tum_vi.cc
and Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc in the reference).
The KB8 fisheye camera model and the stereo extrinsics come straight from
the reference's TUM-VI.yaml.

Usage:
  python examples/run_tum_vi.py /path/to/dataset-room1_512_16 TUM-VI.yaml \
      --sensor stereo-imu --out traj_tum.txt
"""

import argparse
import sys
import time

import numpy as np

from orb_slam3_tpu.api import datasets, settings as settings_mod, system
from orb_slam3_tpu.utils.frameloader import FrameLoader
from orb_slam3_tpu.utils.timing import GLOBAL_TIMER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_root")
    ap.add_argument("settings_yaml")
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "stereo", "mono-imu", "stereo-imu"])
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--kf-out", default=None)
    ap.add_argument("--atlas-out", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    use_imu = args.sensor.endswith("-imu")
    stereo = args.sensor.startswith("stereo")
    frames = datasets.load_tum_vi(args.dataset_root, with_imu=use_imu,
                                 stereo=stereo)
    if args.max_frames:
        frames = frames[: args.max_frames]
    print(f"{len(frames)} frames")

    s = settings_mod.load_settings(args.settings_yaml, sensor=args.sensor)
    cfg = settings_mod.to_tracker_config(s)
    if use_imu and s.Tbc is not None:
        cfg.Tbc = s.Tbc  # body-from-camera
        cfg.imu_noise = dict(
            noise_gyro=s.noise_gyro, noise_acc=s.noise_acc,
            walk_gyro=s.walk_gyro, walk_acc=s.walk_acc,
        )
    slam = system.System(config=cfg)

    loader = FrameLoader([f.img_path for f in frames])
    loader_r = (
        FrameLoader([f.img_right_path for f in frames]) if stereo else None
    )
    t0 = time.time()
    for i, (fr, img) in enumerate(zip(frames, loader)):
        with GLOBAL_TIMER.stage("frame_total"):
            if stereo:
                slam.track_stereo(img, next(loader_r), fr.timestamp,
                                  imu=fr.imu if use_imu else None)
            else:
                slam.track_monocular(img, fr.timestamp,
                                     imu=fr.imu if use_imu else None)
        if i % 50 == 0:
            print(f"frame {i}  state={slam.tracking_state()}  "
                  f"kf={int(slam.tracker.map.n_kf)}")
    wall = time.time() - t0
    print(f"{len(frames)/wall:.1f} fps wall-clock")

    slam.save_trajectory_tum(args.out)
    if args.kf_out:
        slam.save_keyframe_trajectory_tum(args.kf_out)
    if args.atlas_out:
        slam.save_atlas(args.atlas_out)
    print(GLOBAL_TIMER.print_stats())


if __name__ == "__main__":
    main()
