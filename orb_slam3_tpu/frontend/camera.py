"""Camera models: pinhole and Kannala-Brandt8 fisheye.

Functional equivalents of the reference's polymorphic GeometricCamera
hierarchy (`/root/reference/include/CameraModels/GeometricCamera.h:61-89`,
`Pinhole.cpp`, `KannalaBrandt8.cpp`), as pure functions over a parameter
vector so they vmap/jit and autodiff (the reference hand-codes projectJac;
here Jacobians come from jacfwd of these functions).

Parameter layout (padded to 8 for uniform batching):
  pinhole: [fx, fy, cx, cy, 0, 0, 0, 0]
  kb8:     [fx, fy, cx, cy, k0, k1, k2, k3]

Projection maps camera-frame points (z forward) to pixels. Radial-tangential
distortion of the pinhole model is handled by undistorting keypoints at
frame construction (like `Frame::UndistortKeyPoints`,
`/root/reference/src/Frame.cc:747`), so pinhole projection here is
distortion-free, matching how the reference's optimizers see it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PINHOLE = 0
KB8 = 1


def pinhole_project(params, Xc):
    """[..., 3] camera-frame -> [..., 2] pixels. Xc z must be > 0 for validity."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[..., 0] / zs + cx
    v = fy * Xc[..., 1] / zs + cy
    return jnp.stack([u, v], axis=-1)


def pinhole_unproject(params, uv):
    """Pixels -> unit-depth ray [..., 3] (z = 1)."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def kb8_project(params, Xc):
    """Kannala-Brandt equidistant model with 4 radial terms
    (KannalaBrandt8::project, `/root/reference/src/CameraModels/KannalaBrandt8.cpp:43-61`)."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k0, k1, k2, k3 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2 + 1e-18)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3))))
    scale = d / r
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def kb8_unproject(params, uv, iters: int = 10):
    """Invert the theta polynomial by Newton iteration (reference uses
    precision 1e-6, `KannalaBrandt8.h:42` / `.cpp:270-305`); fixed iteration
    count keeps it jit-static."""
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k0, k1, k2, k3 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r_d = jnp.sqrt(mx * mx + my * my + 1e-18)
    theta = jnp.minimum(r_d, jnp.pi / 2)  # init like reference (theta_d clipped)

    def newton(_, th):
        t2 = th * th
        f = th * (1.0 + t2 * (k0 + t2 * (k1 + t2 * (k2 + t2 * k3)))) - r_d
        df = 1.0 + t2 * (3 * k0 + t2 * (5 * k1 + t2 * (7 * k2 + t2 * 9 * k3)))
        return th - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)

    theta = jax.lax.fori_loop(0, iters, newton, theta)
    scale = jnp.tan(theta) / r_d
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def project(kind: int, params, Xc):
    """Static dispatch on camera kind (kind must be a python int at trace)."""
    if kind == PINHOLE:
        return pinhole_project(params, Xc)
    return kb8_project(params, Xc)


def unproject(kind: int, params, uv):
    if kind == PINHOLE:
        return pinhole_unproject(params, uv)
    return kb8_unproject(params, uv)


def make_pinhole(fx, fy, cx, cy):
    return jnp.array([fx, fy, cx, cy, 0, 0, 0, 0], dtype=jnp.float32)


def make_kb8(fx, fy, cx, cy, k0, k1, k2, k3):
    return jnp.array([fx, fy, cx, cy, k0, k1, k2, k3], dtype=jnp.float32)


def undistort_points_radtan(K_params, dist, uv, iters: int = 5):
    """Iteratively undistort pixel keypoints under the OpenCV rad-tan model
    (k1, k2, p1, p2[, k3]) — role of cv::undistortPoints in
    `Frame::UndistortKeyPoints` (`/root/reference/src/Frame.cc:747-780`).
    Returns undistorted pixel coordinates under the same K.
    """
    fx, fy, cx, cy = K_params[..., 0], K_params[..., 1], K_params[..., 2], K_params[..., 3]
    k1, k2, p1, p2, k3 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3], dist[..., 4]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def distort(x, y):
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return x * rad + dx, y * rad + dy

    def body(_, xy):
        x, y = xy
        xdist, ydist = distort(x, y)
        return (x + (xd - xdist), y + (yd - ydist))

    x, y = jax.lax.fori_loop(0, iters, body, (xd, yd))
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)
