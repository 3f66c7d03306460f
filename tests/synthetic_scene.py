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


class QuadScene:
    """Arbitrary oriented textured quads rendered by backward ray casting
    (perspective-correct, handles occlusion by nearest-hit). Richer than
    PlaneScene: walls at any orientation, per-frame exposure jitter, and
    anti-aliased texture sampling — the round-1 aliased planar renders
    misled a subpixel-accuracy decision (VERDICT 'what's weak' #5)."""

    def __init__(self, K, img_wh=(512, 384), quads=(), exposure_jitter=0.0,
                 noise=0.0, seed=0):
        self.K = np.array(
            [[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1.0]], np.float64
        )
        self.img_wh = img_wh
        self.quads = list(quads)
        self.exposure_jitter = exposure_jitter
        self.noise = noise
        self._rng = np.random.default_rng(seed + 991)
        w, h = img_wh
        us, vs = np.meshgrid(np.arange(w), np.arange(h))
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        self._rays = np.stack(
            [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float64)], -1
        )

    def _cast(self, R_cw, t_cw):
        """Returns (img, depth) by nearest-hit over all quads."""
        w, h = self.img_wh
        R_wc = R_cw.T
        c = -R_wc @ t_cw
        rays_w = self._rays @ R_wc.T
        img = np.zeros((h, w), np.float32)
        depth = np.full((h, w), np.inf, np.float32)
        for q in self.quads:
            n = np.cross(q["ex"], q["ey"])
            n = n / np.linalg.norm(n)
            denom = rays_w @ n
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            lam = ((q["p0"] - c) @ n) / denom
            Xw = c[None, None, :] + lam[..., None] * rays_w
            d = Xw - q["p0"]
            tx = d @ q["ex"] / (q["ex"] @ q["ex"])
            ty = d @ q["ey"] / (q["ey"] @ q["ey"])
            z_cam = lam * self._rays[..., 2]  # = lam (rays have z=1)
            inside = (
                (lam > 0.05) & (tx >= 0) & (tx <= 1) & (ty >= 0) & (ty <= 1)
                & (z_cam < depth)
            )
            size = q["tex"].shape[0]
            mx = (tx * (size - 1)).astype(np.float32)
            my = (ty * (size - 1)).astype(np.float32)
            samp = cv2.remap(q["tex"], mx, my, cv2.INTER_LINEAR)
            img = np.where(inside, samp, img)
            depth = np.where(inside, z_cam.astype(np.float32), depth)
        depth = np.where(np.isfinite(depth), depth, 0.0)
        return img, depth

    def render(self, R_cw, t_cw):
        img, _ = self._cast(R_cw, t_cw)
        return self._photometric(img)

    def render_with_depth(self, R_cw, t_cw):
        img, depth = self._cast(R_cw, t_cw)
        return self._photometric(img), depth

    def render_stereo(self, R_cw, t_cw, baseline):
        left = self.render(R_cw, t_cw)
        right = self.render(R_cw, t_cw - np.array([baseline, 0.0, 0.0]))
        return left, right

    def _photometric(self, img):
        if self.exposure_jitter > 0:
            img = img * (1.0 + self._rng.uniform(
                -self.exposure_jitter, self.exposure_jitter))
        if self.noise > 0:
            img = img + self._rng.normal(0.0, self.noise, img.shape)
        return np.clip(img, 0, 255).astype(np.float32)


def room_scene(K, img_wh=(512, 384), half=6.0, wall_h=2.2, seed=0,
               exposure_jitter=0.0, noise=0.0, smooth_texture=True,
               n_panels=10):
    """Square-room interior: 4 textured walls + floor + ceiling + a ring of
    free-standing textured panels between the camera circle and the walls
    (near structure -> parallax + occlusion boundaries; frames are never
    planar). A camera circling inside and looking outward revisits the
    first wall at loop end — ground-truth closed loop for loop-closing
    tests."""

    def tex(s):
        t = make_texture(seed + s)
        if smooth_texture:  # stronger blur: less aliasing under motion
            t = cv2.GaussianBlur(t, (5, 5), 1.2)
        return t

    S, H = half, wall_h
    quads = [
        # walls: p0 = bottom-left corner seen from inside, ex horizontal
        dict(p0=np.array([-S, -H, S]), ex=np.array([2 * S, 0, 0]),
             ey=np.array([0, 2 * H, 0]), tex=tex(1)),       # +z wall
        dict(p0=np.array([S, -H, -S]), ex=np.array([-2 * S, 0, 0]),
             ey=np.array([0, 2 * H, 0]), tex=tex(2)),       # -z wall
        dict(p0=np.array([S, -H, S]), ex=np.array([0, 0, -2 * S]),
             ey=np.array([0, 2 * H, 0]), tex=tex(3)),       # +x wall
        dict(p0=np.array([-S, -H, -S]), ex=np.array([0, 0, 2 * S]),
             ey=np.array([0, 2 * H, 0]), tex=tex(4)),       # -x wall
        # floor (y = +H, camera y points down) and ceiling
        dict(p0=np.array([-S, H, -S]), ex=np.array([2 * S, 0, 0]),
             ey=np.array([0, 0, 2 * S]), tex=tex(5)),
        dict(p0=np.array([-S, -H, -S]), ex=np.array([2 * S, 0, 0]),
             ey=np.array([0, 0, 2 * S]), tex=tex(6)),
    ]
    # free-standing panels facing the room center
    rng = np.random.default_rng(seed + 37)
    for j in range(n_panels):
        a = 2 * np.pi * (j + rng.uniform(-0.2, 0.2)) / max(n_panels, 1)
        r = rng.uniform(0.55, 0.8) * S
        cx, cz = r * np.sin(a), r * np.cos(a)
        pw = rng.uniform(1.0, 1.8)
        ph = rng.uniform(0.8, 1.4)
        y0 = rng.uniform(-0.9, 0.2)
        # ex tangential (perpendicular to the radial direction), ey down
        ex = np.array([np.cos(a), 0.0, -np.sin(a)]) * pw
        ey = np.array([0.0, 1.0, 0.0]) * ph
        p0 = np.array([cx, y0, cz]) - 0.5 * ex
        quads.append(dict(p0=p0, ex=ex, ey=ey, tex=tex(20 + j)))
    return QuadScene(K, img_wh, quads, exposure_jitter=exposure_jitter,
                     noise=noise, seed=seed)


def loop_trajectory(n_frames=160, radius=1.6, bob=0.05, start_angle=0.0,
                    loops=1.0):
    """Camera on a circle of `radius` in the x-z plane looking radially
    outward; after `loops` revolutions it re-observes the starting wall with
    the starting viewpoint — a ground-truth closed loop. Returns (R_cw,
    t_cw) stacks."""
    Rs, ts = [], []
    for i in range(n_frames):
        a = start_angle + 2 * np.pi * loops * i / n_frames
        c = np.array([radius * np.sin(a), bob * np.sin(0.21 * i),
                      radius * np.cos(a)])
        # camera z-axis (view dir) points radially outward: world dir
        # (sin a, 0, cos a); build R_wc with y down-ish
        zc = np.array([np.sin(a), 0.0, np.cos(a)])
        yc = np.array([0.0, 1.0, 0.0])
        xc = np.cross(yc, zc)
        xc /= np.linalg.norm(xc)
        R_wc = np.stack([xc, yc, zc], axis=1)
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
