"""Synthetic photo-consistent image sequence renderer for end-to-end SLAM
tests (no datasets ship with this environment — SURVEY.md §4 calls for
synthetic golden scenes).

Renders two textured planes (near + far) by homography warping, which gives
perspective-correct, photo-consistent frames with trackable corners and
non-planar scene structure (so monocular init exercises the F path; a
single-plane variant exercises H).
"""

from __future__ import annotations

import cv2
import numpy as np

from orb_slam3_tpu.ops import lie
import jax.numpy as jnp


def make_texture(seed, size=1024, blobs=4000):
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float32)
    xs = rng.integers(0, size - 14, blobs)
    ys = rng.integers(0, size - 14, blobs)
    for x, y in zip(xs, ys):
        w, h = rng.integers(4, 14, 2)
        tex[y : y + h, x : x + w] = rng.uniform(40, 255)
    return cv2.GaussianBlur(tex, (3, 3), 0.8)


class PlaneScene:
    """Planes z = depth_i spanning [x0,x1]x[y0,y1] in world coords, textured."""

    def __init__(self, K, img_wh=(512, 384), two_planes=True, seed=0):
        self.K = np.array(
            [[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]], np.float64
        )
        self.img_wh = img_wh
        self.planes = []
        # far plane covers everything
        self.planes.append(
            dict(z=6.0, x0=-6.0, x1=8.0, y0=-4.5, y1=4.5, tex=make_texture(seed))
        )
        if two_planes:
            # several near patches at different depths spread across the
            # travel direction: non-planar structure everywhere (avoids the
            # planar pose twofold ambiguity), never occluding the whole view
            rng = np.random.default_rng(seed + 7)
            for j, (x0, x1, y0, y1) in enumerate(
                [(-1.5, 0.2, -0.8, 0.6), (1.2, 2.8, 0.2, 1.6),
                 (3.0, 4.6, -1.6, -0.3), (5.0, 6.6, -0.5, 0.9)]
            ):
                self.planes.append(
                    dict(z=float(rng.uniform(4.2, 5.2)), x0=x0, x1=x1,
                         y0=y0, y1=y1, tex=make_texture(seed + 1 + j))
                )

    def render_with_depth(self, R_cw, t_cw):
        """Render image + metric depth map (for RGB-D tests)."""
        img = self.render(R_cw, t_cw)
        w, h = self.img_wh
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        us, vs = np.meshgrid(np.arange(w), np.arange(h))
        rays = np.stack(
            [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float64)], -1
        )  # camera-frame rays
        R_wc = R_cw.T
        c = -R_wc @ t_cw
        rays_w = rays @ R_wc.T  # [h, w, 3]
        depth = np.zeros((h, w), np.float32)
        for pl in self.planes:  # far to near: nearer planes overwrite
            rz = rays_w[..., 2]
            lam = (pl["z"] - c[2]) / np.where(np.abs(rz) < 1e-9, 1e-9, rz)
            Xw = c[None, None, :] + lam[..., None] * rays_w
            inside = (
                (lam > 0)
                & (Xw[..., 0] >= pl["x0"]) & (Xw[..., 0] <= pl["x1"])
                & (Xw[..., 1] >= pl["y0"]) & (Xw[..., 1] <= pl["y1"])
            )
            z_cam = lam * rays[..., 2]  # = lam since rays z=1
            depth = np.where(inside, z_cam.astype(np.float32), depth)
        return img, depth

    def render_stereo(self, R_cw, t_cw, baseline):
        """Left + right images for a rectified stereo pair (right camera
        displaced +baseline along the left camera's x-axis)."""
        left = self.render(R_cw, t_cw)
        t_right = t_cw - np.array([baseline, 0.0, 0.0])
        right = self.render(R_cw, t_right)
        return left, right

    def render(self, R_cw, t_cw):
        w, h = self.img_wh
        img = np.zeros((h, w), np.float32)
        for pl in self.planes:
            size = pl["tex"].shape[0]
            corners_world = np.array(
                [
                    [pl["x0"], pl["y0"], pl["z"]],
                    [pl["x1"], pl["y0"], pl["z"]],
                    [pl["x1"], pl["y1"], pl["z"]],
                    [pl["x0"], pl["y1"], pl["z"]],
                ]
            )
            cam = (R_cw @ corners_world.T).T + t_cw
            if np.any(cam[:, 2] < 0.1):
                continue
            uv = (self.K @ cam.T).T
            uv = uv[:, :2] / uv[:, 2:3]
            src = np.array(
                [[0, 0], [size - 1, 0], [size - 1, size - 1], [0, size - 1]],
                np.float32,
            )
            H = cv2.getPerspectiveTransform(src, uv.astype(np.float32))
            warped = cv2.warpPerspective(
                pl["tex"], H, (w, h), flags=cv2.INTER_LINEAR
            )
            mask = cv2.warpPerspective(
                np.ones_like(pl["tex"]), H, (w, h), flags=cv2.INTER_NEAREST
            )
            img = np.where(mask > 0, warped, img)
        return img


def orbit_trajectory(n_frames=50, radius=0.04, advance=0.035, yaw_rate=0.004):
    """Smooth sideways translation with slight yaw; returns [N] (R_cw, t_cw).
    Camera starts at origin looking +z; world-frame motion along +x."""
    Rs, ts = [], []
    for i in range(n_frames):
        yaw = yaw_rate * i
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0])))
        c = np.array(
            [advance * i, radius * np.sin(0.15 * i), 0.1 * np.sin(0.05 * i)]
        )
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        Rs.append(R_cw)
        ts.append(t_cw)
    return np.stack(Rs), np.stack(ts)


def render_kb8(scene, K8_params, img_wh, R_cw, t_cw, unproject_fn):
    """Backward-map fisheye (KB8) render of a PlaneScene: unproject every
    pixel, intersect the textured planes far-to-near, sample bilinearly."""
    import cv2 as _cv2
    import numpy as _np

    w, h = img_wh
    us, vs = _np.meshgrid(_np.arange(w), _np.arange(h))
    uv = _np.stack([us, vs], -1).reshape(-1, 2).astype(_np.float32)
    rays = _np.asarray(unproject_fn(K8_params, uv)).reshape(h, w, 3)
    R_wc = R_cw.T
    c = -R_wc @ t_cw
    rays_w = rays @ R_wc.T
    img = _np.zeros((h, w), _np.float32)
    for pl in scene.planes:
        rz = rays_w[..., 2]
        lam = (pl["z"] - c[2]) / _np.where(_np.abs(rz) < 1e-9, 1e-9, rz)
        Xw = c[None, None, :] + lam[..., None] * rays_w
        inside = (
            (lam > 0)
            & (Xw[..., 0] >= pl["x0"]) & (Xw[..., 0] <= pl["x1"])
            & (Xw[..., 1] >= pl["y0"]) & (Xw[..., 1] <= pl["y1"])
        )
        size = pl["tex"].shape[0]
        tx = (Xw[..., 0] - pl["x0"]) / (pl["x1"] - pl["x0"]) * (size - 1)
        ty = (Xw[..., 1] - pl["y0"]) / (pl["y1"] - pl["y0"]) * (size - 1)
        samp = _cv2.remap(pl["tex"], tx.astype(_np.float32),
                          ty.astype(_np.float32), _cv2.INTER_LINEAR)
        img = _np.where(inside, samp, img)
    return img
