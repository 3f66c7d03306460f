"""Trajectory export in TUM / EuRoC / KITTI formats.

Role of `System::SaveTrajectoryTUM/EuRoC/KITTI` and the KeyFrame variants
(`/root/reference/src/System.cc:569-1262`): per-frame poses composed from
the relative-to-keyframe records against the CURRENT keyframe poses (so BA
and loop corrections retroactively improve the whole trajectory), written
as:
- TUM:   `timestamp tx ty tz qx qy qz qw` (camera-to-world)
- EuRoC: same fields, timestamp in nanoseconds, comma-free
- KITTI: 12 numbers per line (3x4 camera-to-world matrix row-major)
"""

from __future__ import annotations

import numpy as np

from ..ops import lie
import jax.numpy as jnp


def _twc(R_cw, t_cw, Tbc=None):
    """Tcw -> (R_wc, t_wc = camera center). With Tbc (the camera-to-body
    extrinsics, X_b = Rbc X_c + tbc), returns BODY poses instead:
    Twb = Twc o Tcb — inertial trajectories are exported in the IMU body
    frame like the reference (System::SaveTrajectoryEuRoC computes
    Twb = (Tbc * Tcw)^-1 for IMU sensors, System.cc:662-882); EuRoC's
    IMU-frame ground truth only aligns against Twb."""
    if Tbc is not None:
        Tbc = np.asarray(Tbc)
        Rbc, tbc = Tbc[:3, :3], Tbc[:3, 3]
        # T_bw = Tbc o Tcw
        R_bw = np.einsum("ij,njk->nik", Rbc, R_cw)
        t_bw = np.einsum("ij,nj->ni", Rbc, t_cw) + tbc
        R_cw, t_cw = R_bw, t_bw
    R_wc = np.swapaxes(R_cw, -1, -2)
    t_wc = -np.einsum("nij,ni->nj", R_cw, t_cw)
    return R_wc, t_wc


def save_tum(path: str, ts, R_cw, t_cw, ok=None, Tbc=None) -> None:
    """TUM RGB-D format (SaveTrajectoryTUM, System.cc:569-660)."""
    R_wc, c = _twc(R_cw, t_cw, Tbc)
    q = np.array(lie.rot_to_quat(jnp.asarray(R_wc)))
    with open(path, "w") as f:
        for i in range(len(ts)):
            if ok is not None and not ok[i]:
                continue
            f.write(
                f"{ts[i]:.6f} {c[i,0]:.7f} {c[i,1]:.7f} {c[i,2]:.7f} "
                f"{q[i,0]:.7f} {q[i,1]:.7f} {q[i,2]:.7f} {q[i,3]:.7f}\n"
            )


def save_euroc(path: str, ts, R_cw, t_cw, ok=None, Tbc=None) -> None:
    """EuRoC format: nanosecond timestamps (SaveTrajectoryEuRoC,
    System.cc:662-882). Pass Tbc for inertial sensors — the reference
    exports the IMU BODY frame (Twb) there, not the camera frame."""
    R_wc, c = _twc(R_cw, t_cw, Tbc)
    q = np.array(lie.rot_to_quat(jnp.asarray(R_wc)))
    with open(path, "w") as f:
        for i in range(len(ts)):
            if ok is not None and not ok[i]:
                continue
            f.write(
                f"{int(ts[i]*1e9)} {c[i,0]:.7f} {c[i,1]:.7f} {c[i,2]:.7f} "
                f"{q[i,0]:.7f} {q[i,1]:.7f} {q[i,2]:.7f} {q[i,3]:.7f}\n"
            )


def save_kitti(path: str, ts, R_cw, t_cw, ok=None) -> None:
    """KITTI format: row-major 3x4 Twc per line (SaveTrajectoryKITTI,
    System.cc:1190-1262)."""
    R_wc, c = _twc(R_cw, t_cw)
    with open(path, "w") as f:
        for i in range(len(ts)):
            if ok is not None and not ok[i]:
                continue
            T = np.concatenate([R_wc[i], c[i][:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{x:.9e}" for x in T) + "\n")


def load_tum(path: str):
    """Read a TUM trajectory/groundtruth file -> (ts, positions, quats)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            rows.append([float(x) for x in parts[:8]])
    arr = np.array(rows)
    return arr[:, 0], arr[:, 1:4], arr[:, 4:8]
