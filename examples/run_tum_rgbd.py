#!/usr/bin/env python
"""TUM RGB-D driver (role of Examples/RGB-D/rgbd_tum.cc)."""

import argparse

import cv2
import numpy as np

from orb_slam3_tpu.api import datasets, settings as settings_mod, system


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_root")
    ap.add_argument("settings_yaml")
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    frames = datasets.load_tum_rgbd(args.dataset_root)
    if args.max_frames:
        frames = frames[: args.max_frames]
    s = settings_mod.load_settings(args.settings_yaml, sensor="rgbd")
    cfg = settings_mod.to_tracker_config(s)
    slam = system.System(config=cfg)
    for i, fr in enumerate(frames):
        img = datasets.read_image(fr.img_path)
        depth = cv2.imread(fr.depth_path, cv2.IMREAD_UNCHANGED).astype(np.float32)
        slam.track_rgbd(img, depth * s.depth_factor, fr.timestamp)
        if i % 50 == 0:
            print(f"frame {i}  state={slam.tracking_state()}")
    slam.save_trajectory_tum(args.out)


if __name__ == "__main__":
    main()
