"""Lie groups for SLAM: SO(3), SE(3), Sim(3) — batched, jit/vmap-friendly.

Replaces the role of Sophus (`/root/reference/Thirdparty/Sophus/sophus/{so3,se3,
sim3}.hpp`) as the pose algebra used throughout the reference, but as pure
jax.numpy functions over trailing-dimension arrays so every call site can be
vmapped/jitted. Rotations are stored as 3x3 matrices (`[..., 3, 3]`);
translations as `[..., 3]` vectors. All small-angle branches use the
"double-where" pattern so gradients are NaN-free.

Conventions match the reference:
- `se3_exp`/`se3_log` use the twist ordering (rho, phi) = (translation, rotation)
  like Sophus; the inertial optimizer's right-multiplicative pose update
  (`/root/reference/include/G2oTypes.h:74-110`) is provided via `se3_rplus`.
- Sim(3) is (R, t, s) with action X -> s*R@X + t, as in
  `/root/reference/Thirdparty/g2o/g2o/types/sim3.h`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe(x, cutoff=_EPS):
    """Return (is_small, x_safe): x replaced by 1 where |x| < cutoff.

    Use to guard divisions whose small-|x| branch is replaced via jnp.where;
    keeps reverse-mode gradients finite (the classic double-where trick).
    """
    is_small = jnp.abs(x) < cutoff
    return is_small, jnp.where(is_small, jnp.ones_like(x), x)


def hat(w):
    """so(3) hat: [..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w):
    """Rotation angle and guarded values. Returns (theta, theta2, small, th_s, th2_s)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS) - _EPS  # smooth-ish sqrt at 0
    small, th2_s = _safe(theta2, 1e-12)
    _, th_s = _safe(theta, 1e-6)
    return theta, theta2, small, th_s, th2_s


def so3_exp(w):
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    theta, theta2, small, th_s, th2_s = _theta(w)
    W = hat(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th_s) / th_s)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th_s)) / th2_s)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Two well-conditioned regimes split at cos(theta) = -0.9:
    - generic (sin(theta) >= 0.43): theta/(2 sin theta) * vee(R - R^T)
    - near pi: axis^2 from the exact identity (R+R^T)/2 - cos*I =
      (1-cos) * a a^T, angle from pi - arcsin(|vee|/2), sign from the skew.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    skew = vee(R - jnp.swapaxes(R, -1, -2))
    # angle via atan2(sin, cos): smooth gradients everywhere, unlike arccos
    # whose derivative blows up at cos=1 (f32 lands there for tiny rotations,
    # which NaN'd the autodiff Jacobians of near-zero rotation residuals)
    ss = jnp.sum(skew * skew, axis=-1)
    sin_t = 0.5 * jnp.sqrt(ss + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)

    # generic branch (also covers theta ~ 0 via taylor)
    small_s, sin_s = _safe(sin_t, 1e-6)
    w_generic = skew * (
        jnp.where(small_s, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_s))[..., None]
    )

    # near-pi branch: M = (R+R^T)/2 - cos_t*I = (1-cos_t) a a^T exactly
    S = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    M = S - cos_t[..., None, None] * jnp.broadcast_to(
        jnp.eye(3, dtype=R.dtype), R.shape
    )
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    row_idx = k[..., None, None] * jnp.ones_like(M[..., :1, :], dtype=k.dtype)
    axis_unnorm = jnp.take_along_axis(M, row_idx, axis=-2)[..., 0, :]
    norm = jnp.linalg.norm(axis_unnorm, axis=-1, keepdims=True)
    axis = axis_unnorm / jnp.where(norm < 1e-20, 1.0, norm)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_t, 0.0, 1.0))
    dot = jnp.sum(skew * axis, axis=-1, keepdims=True)
    sign = jnp.where(dot < 0.0, -1.0, 1.0)
    w_pi = axis * sign * theta_pi[..., None]

    near_pi = cos_t < -0.9
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp(w + dw) ~ exp(J_l dw) exp(w)."""
    theta, theta2, small, th_s, th2_s = _theta(w)
    W = hat(w)
    W2 = W @ W
    th3_s = th2_s * th_s
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th_s)) / th2_s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (th_s - jnp.sin(th_s)) / th3_s)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_right_jacobian(w):
    """Right Jacobian J_r(w) = J_l(-w). Matches IMU::RightJacobianSO3
    (`/root/reference/src/ImuTypes.cc:79-94`)."""
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w):
    """Inverse right Jacobian (`/root/reference/src/ImuTypes.cc:96-110`)."""
    theta, theta2, small, th_s, th2_s = _theta(w)
    W = hat(-w)  # J_r^{-1}(w) = J_l^{-1}(-w)
    W2 = W @ W
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / th2_s) - (1.0 + jnp.cos(th_s)) / (2.0 * th_s * jnp.sin(th_s)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def normalize_rotation(R):
    """Project to the nearest rotation matrix via SVD (g2o NormalizeRotation
    analogue, `/root/reference/src/G2oTypes.cc` / ImuTypes.cc:139)."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(R[..., :2, 0]), det[..., None]], axis=-1
    )
    return (U * D[..., None, :]) @ Vt


# ---------------------------------------------------------------------------
# SE(3): dict-free representation as (R [...,3,3], t [...,3])
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """Twist [..., 6] (rho, phi) -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """(R, t) -> twist [..., 6] (rho, phi)."""
    phi = so3_log(R)
    Vinv = _left_jacobian_inv(phi)
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _left_jacobian_inv(w):
    theta, theta2, small, th_s, th2_s = _theta(w)
    W = hat(w)
    W2 = W @ W
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / th2_s) - (1.0 + jnp.cos(th_s)) / (2.0 * th_s * jnp.sin(th_s)),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, X):
    """Transform points X [..., 3]."""
    return (R @ X[..., None])[..., 0] + t


def se3_rplus(R, t, dxi):
    """Right-multiplicative update used by the inertial vertices: the update
    (dt, dphi) acts as T <- T * exp(dxi) in the body frame, matching
    ImuCamPose::Update (`/root/reference/include/G2oTypes.h:74-110`):
        Rwb <- Rwb ExpSO3(dphi);  twb <- twb + Rwb dt
    """
    dt, dphi = dxi[..., :3], dxi[..., 3:]
    t_new = t + (R @ dt[..., None])[..., 0]
    R_new = R @ so3_exp(dphi)
    return R_new, t_new


def se3_lplus(R, t, dxi):
    """Left-multiplicative update T <- exp(dxi) * T with dxi=(rho,phi),
    the g2o SE3Quat::update convention used by the visual-only edges
    (`/root/reference/Thirdparty/g2o/g2o/types/se3quat.h`)."""
    dR, dt = se3_exp(dxi)
    return se3_mul(dR, dt, R, t)


# ---------------------------------------------------------------------------
# Sim(3): (R, t, s) acting as X -> s R X + t
# ---------------------------------------------------------------------------

def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    return R, t, sa * sb


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0], s_inv


def sim3_apply(R, t, s, X):
    return s[..., None] * (R @ X[..., None])[..., 0] + t


def _sim3_V_closed(phi, sigma):
    """V(phi, sigma) = int_0^1 exp(s*sigma) exp(s*hat(phi)) ds, closed form.

    With theta = |phi|, Om = hat(phi):
      exp(s*Om) = I + sin(s*theta)/theta * Om + (1 - cos(s*theta))/theta^2 * Om^2
    so V = A*I + B*Om + C*Om^2 with
      A = (e^sigma - 1)/sigma
      B = I_sin/theta,        I_sin = (e^s(sg*sin th - th*cos th) + th)/(sg^2+th^2)
      C = (A - I_cos)/theta^2, I_cos = (e^s(sg*cos th + th*sin th) - sg)/(sg^2+th^2)
    Small-angle/scale limits via Taylor series. This is the translation part of
    Sim(3) exp (role of `/root/reference/Thirdparty/Sophus/sophus/sim3.hpp`).
    """
    theta, theta2, small_t, th_s, th2_s = _theta(phi)
    small_s, sg_s = _safe(sigma, 1e-6)
    es = jnp.exp(sigma)
    Om = hat(phi)
    Om2 = Om @ Om

    A = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (es - 1.0) / sg_s)

    denom = sg_s * sg_s + th2_s  # only used when theta not small -> >= th2_s
    I_sin = (es * (sg_s * jnp.sin(th_s) - th_s * jnp.cos(th_s)) + th_s) / denom
    I_cos = (es * (sg_s * jnp.cos(th_s) + th_s * jnp.sin(th_s)) - sg_s) / denom
    # sigma-small branches use first-order Taylor in sigma
    B_gen = jnp.where(
        small_s,
        (1.0 - jnp.cos(th_s)) / th2_s
        + sigma * (jnp.sin(th_s) - th_s * jnp.cos(th_s)) / (th2_s * th_s),
        I_sin / th_s,
    )
    C_gen = jnp.where(
        small_s,
        (th_s - jnp.sin(th_s)) / (th2_s * th_s) + sigma * _C_sigma_deriv(th_s, th2_s),
        (A - I_cos) / th2_s,
    )
    # theta-small limits (any sigma): B -> int s e^{s sg} = (e^s(sg-1)+1)/sg^2
    #                                 C -> int s^2/2 e^{s sg} = (e^s(sg^2-2sg+2)-2)/(2 sg^3)
    B_small = jnp.where(
        small_s,
        0.5 + sigma / 3.0,
        (es * (sg_s - 1.0) + 1.0) / (sg_s * sg_s),
    )
    C_small = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (es * (sg_s * sg_s - 2.0 * sg_s + 2.0) - 2.0) / (2.0 * sg_s ** 3),
    )
    B = jnp.where(small_t, B_small, B_gen)
    C = jnp.where(small_t, C_small, C_gen)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Om.shape)
    return A[..., None, None] * eye + B[..., None, None] * Om + C[..., None, None] * Om2


def _C_sigma_deriv(th_s, th2_s):
    """d/dsigma at sigma=0 of C(theta, sigma) = (A - I_cos)/theta^2:
    = [1/2 - (cos th + th sin th - 1)/th^2 ... ] — first-order term of
    int_0^1 s^2/... For simplicity use: int_0^1 s*(1-cos(s th))/th^2 ds
    = (1/2 - (cos th + th sin th - 1)/th^2)/th^2.
    """
    num = 0.5 * th2_s - (jnp.cos(th_s) + th_s * jnp.sin(th_s) - 1.0)
    return num / (th2_s * th2_s)


def sim3_exp(xi):
    """[..., 7] (rho, phi, sigma) -> (R, t, s)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    V = _sim3_V_closed(phi, sigma)
    t = (V @ rho[..., None])[..., 0]
    return R, t, jnp.exp(sigma)


def sim3_log(R, t, s):
    """(R, t, s) -> [..., 7] via a 3x3 solve against the closed-form V."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    V = _sim3_V_closed(phi, sigma)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w) — used for trajectory export (TUM format)
# ---------------------------------------------------------------------------

def rot_to_quat(R):
    """[..., 3, 3] -> quaternion [..., 4] (x, y, z, w), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 0.5
    q0 = jnp.stack(
        [(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 0.5
    q1 = jnp.stack(
        [qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)],
        axis=-1,
    )
    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    k = jnp.argmax(cand, axis=-1)
    q = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(q, k[..., None, None] * jnp.ones_like(q[..., :1, :], dtype=k.dtype), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quat_to_rot(q):
    """Quaternion [..., 4] (x, y, z, w) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
