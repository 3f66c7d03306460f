#!/usr/bin/env python
"""RMS ATE evaluation (role of evaluation/evaluate_ate_scale.py):
compare an estimated TUM-format trajectory against ground truth with Horn
alignment and (for monocular) optimal scale."""

import argparse

import numpy as np

from orb_slam3_tpu.api import evaluate, trajectory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("groundtruth")
    ap.add_argument("estimate")
    ap.add_argument("--no-scale", action="store_true")
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args()

    gt_ts, gt_pos, _ = trajectory.load_tum(args.groundtruth)
    est_ts, est_pos, _ = trajectory.load_tum(args.estimate)
    rmse, n, s = evaluate.ate_rmse(
        est_ts, est_pos, gt_ts, gt_pos,
        with_scale=not args.no_scale, max_dt=args.max_dt,
    )
    print(f"absolute_translational_error.rmse {rmse:.6f} m")
    print(f"matched_pairs {n}")
    print(f"scale {s:.6f}")


if __name__ == "__main__":
    main()
