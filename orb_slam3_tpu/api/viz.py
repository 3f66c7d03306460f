"""Offline map/trajectory visualization exports — the viewer substitute.

Role of the Pangolin viewer stack (`/root/reference/src/{Viewer,MapDrawer,
FrameDrawer}.cc`) re-imagined for a headless TPU pod: instead of a live GL
window, export the Atlas as standard artifacts any point-cloud viewer or
notebook can open:

- `save_map_ply`: landmarks (colored by map id) + keyframe positions as a
  PLY point cloud (MapDrawer::DrawMapPoints/DrawKeyFrames role)
- `save_topdown_png`: orthographic top-down rendering of landmarks,
  keyframes, covisibility edges, and the frame trajectory (the map view)
- `save_tracking_overlay`: current-frame keypoints/matches drawn on the
  image (FrameDrawer::DrawFrame role)
"""

from __future__ import annotations

import numpy as np

from ..atlas import state as atlas_state


_MAP_COLORS = np.array(
    [[66, 135, 245], [240, 101, 67], [60, 180, 75], [255, 195, 0],
     [145, 30, 180], [70, 240, 240]], np.uint8
)


def save_map_ply(path: str, s: atlas_state.MapState) -> None:
    lm = np.array(s.lm_valid)
    X = np.array(s.lm_pos)[lm]
    mid = np.array(s.lm_map_id)[lm] % len(_MAP_COLORS)
    kv = np.array(s.kf_valid)
    kR = np.array(s.kf_R)[kv]
    kt = np.array(s.kf_t)[kv]
    centers = -np.einsum("nij,ni->nj", kR, kt)

    n = len(X) + len(centers)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for x, m in zip(X, mid):
            c = _MAP_COLORS[m]
            f.write(f"{x[0]:.4f} {x[1]:.4f} {x[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
        for c_ in centers:
            f.write(f"{c_[0]:.4f} {c_[1]:.4f} {c_[2]:.4f} 255 0 0\n")


def save_topdown_png(path: str, s: atlas_state.MapState,
                     trajectory=None, size: int = 900,
                     axes=(0, 2)) -> None:
    """Orthographic projection onto the (axes) plane (default x-z, the
    'top view' of a forward-z camera world)."""
    import cv2

    img = np.full((size, size, 3), 20, np.uint8)
    lm = np.array(s.lm_valid)
    X = np.array(s.lm_pos)[lm][:, axes]
    kv = np.array(s.kf_valid)
    centers = -np.einsum(
        "nij,ni->nj", np.array(s.kf_R)[kv], np.array(s.kf_t)[kv]
    )[:, axes]
    pts = [X] if len(X) else []
    if len(centers):
        pts.append(centers)
    if trajectory is not None and len(trajectory):
        pts.append(np.asarray(trajectory)[:, axes])
    if not pts:
        cv2.imwrite(path, img)
        return
    allp = np.concatenate(pts)
    lo = allp.min(axis=0) - 0.2
    hi = allp.max(axis=0) + 0.2
    scale = (size - 40) / max(float((hi - lo).max()), 1e-6)

    def to_px(p):
        q = ((p - lo) * scale + 20).astype(int)
        return np.clip(q, 0, size - 1)

    mid = np.array(s.lm_map_id)[lm] % len(_MAP_COLORS)
    for p, m in zip(to_px(X), mid):
        img[p[1], p[0]] = _MAP_COLORS[m][::-1]
    if trajectory is not None and len(trajectory) > 1:
        t = to_px(np.asarray(trajectory)[:, axes])
        for a, b in zip(t[:-1], t[1:]):
            cv2.line(img, tuple(a), tuple(b), (80, 220, 80), 1)
    for p in to_px(centers):
        cv2.circle(img, tuple(p), 3, (0, 0, 255), -1)
    cv2.imwrite(path, img)


def save_tracking_overlay(path: str, img_gray, feats, matched_mask=None) -> None:
    """Draw keypoints on the frame (green = matched to a landmark)."""
    import cv2

    img = cv2.cvtColor(
        np.clip(np.asarray(img_gray), 0, 255).astype(np.uint8),
        cv2.COLOR_GRAY2BGR,
    )
    xy = np.array(feats.xy)
    valid = np.array(feats.valid)
    matched = (
        np.array(matched_mask) if matched_mask is not None
        else np.zeros(len(xy), bool)
    )
    for i in range(len(xy)):
        if not valid[i]:
            continue
        p = tuple(xy[i].astype(int))
        color = (0, 255, 0) if matched[i] else (120, 120, 120)
        cv2.circle(img, p, 2, color, -1)
    cv2.imwrite(path, img)
