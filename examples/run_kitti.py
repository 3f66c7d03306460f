#!/usr/bin/env python
"""KITTI odometry driver (role of Examples/Stereo/stereo_kitti.cc)."""

import argparse

from orb_slam3_tpu.api import datasets, settings as settings_mod, system
from orb_slam3_tpu.utils.frameloader import FrameLoader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_root")
    ap.add_argument("settings_yaml")
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--sensor", default="stereo", choices=["mono", "stereo"])
    ap.add_argument("--out", default="trajectory_kitti.txt")
    args = ap.parse_args()

    stereo = args.sensor == "stereo"
    frames = datasets.load_kitti(args.dataset_root, args.sequence, stereo)
    s = settings_mod.load_settings(args.settings_yaml, sensor=args.sensor)
    cfg = settings_mod.to_tracker_config(s)
    slam = system.System(config=cfg)
    loader = FrameLoader([f.img_path for f in frames])
    loader_r = FrameLoader([f.img_right_path for f in frames]) if stereo else None
    for i, (fr, img) in enumerate(zip(frames, loader)):
        if stereo:
            slam.track_stereo(img, next(loader_r), fr.timestamp)
        else:
            slam.track_monocular(img, fr.timestamp)
        if i % 100 == 0:
            print(f"frame {i}  state={slam.tracking_state()}")
    slam.save_trajectory_kitti(args.out)


if __name__ == "__main__":
    main()
