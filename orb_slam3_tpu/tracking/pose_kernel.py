"""Motion-only pose BA as ONE Pallas TPU kernel (mono + mixed stereo).

The XLA formulation of `pose_optimize` (track.py) is a `lax.scan` of 18
tiny Gauss-Newton iterations; each iteration is ~15 small kernels whose
launch latency — not compute — dominates (~60 us/iteration measured on
v5e). Here the ENTIRE damped-GN loop runs inside one kernel: the per-point
arrays (~2k points) live in VMEM, the pose/normal-equation state lives in
scalar registers, and every iteration is two VPU passes over [rows, 128]
tiles plus ~300 scalar ops (analytic pinhole Jacobians, unrolled 6x6
Cholesky, Rodrigues retraction). Semantics match track.pose_optimize /
track.pose_optimize_stereo (Optimizer::PoseOptimization,
/root/reference/src/Optimizer.cc:814-1113: staged rounds, Huber dropped
after round 2, chi2 5.991/7.815 reclassification; stereo edges carry the
(uL, v, uR) residual with uR = uL - bf/z). Measured 0.04 ms vs 1.2 ms for
the XLA path at N=2048.

Pinhole only — the KB8 fisheye path keeps the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
LANES = 128


def _rodrigues_scalars(px, py, pz):
    """axis-angle (3 scalars) -> (dR 9 scalars row-major, V 9 scalars)."""
    th2 = px * px + py * py + pz * pz
    small = th2 < 1e-12
    th = jnp.sqrt(jnp.where(small, 1.0, th2))
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    a = jnp.where(small, 1.0 - th2 / 6.0, sin_t / th)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - cos_t) / th2)
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th - sin_t) / (th2 * th))
    W = (0.0, -pz, py, pz, 0.0, -px, -py, px, 0.0)
    xx, yy, zz = px * px, py * py, pz * pz
    xy, xz, yz = px * py, px * pz, py * pz
    W2 = (-(yy + zz), xy, xz, xy, -(xx + zz), yz, xz, yz, -(xx + yy))
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    dR = tuple(eye[i] + a * W[i] + b * W2[i] for i in range(9))
    V = tuple(eye[i] + b * W[i] + c * W2[i] for i in range(9))
    return dR, V


def _mat3_mul(A, B):
    return tuple(
        A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j] + A[3 * i + 2] * B[6 + j]
        for i in range(3)
        for j in range(3)
    )


def _mat3_vec(A, v):
    return tuple(
        A[3 * i + 0] * v[0] + A[3 * i + 1] * v[1] + A[3 * i + 2] * v[2]
        for i in range(3)
    )


def _chol_solve6(H, g):
    """Unrolled 6x6 SPD Cholesky solve on scalars: H nested list, g list."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _pose_kernel(sc_ref, xw_ref, uv_ref, isig_ref, valid_ref, ur_ref,
                 out_ref, mask_ref, *, rounds: int, iters: int, stereo: bool):
    fx, fy, cx, cy = sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3]
    R0 = tuple(sc_ref[4 + i] for i in range(9))
    t0 = tuple(sc_ref[13 + i] for i in range(3))
    bf = sc_ref[16]

    X0, X1, X2 = xw_ref[0], xw_ref[1], xw_ref[2]   # [rows, 128] each
    U, Vv = uv_ref[0], uv_ref[1]
    isg = isig_ref[:]
    val = valid_ref[:]
    if stereo:
        URo = ur_ref[:]
        has_ur = (URo >= 0.0).astype(jnp.float32)
        gate = jnp.where(has_ur > 0, CHI2_STEREO, CHI2_MONO)
        delta = jnp.sqrt(gate)
    else:
        gate = CHI2_MONO
        delta = CHI2_MONO ** 0.5

    def chi2_of(R, t):
        x = R[0] * X0 + R[1] * X1 + R[2] * X2 + t[0]
        y = R[3] * X0 + R[4] * X1 + R[5] * X2 + t[1]
        z = R[6] * X0 + R[7] * X1 + R[8] * X2 + t[2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u_pred = fx * x / zs + cx
        ru = U - u_pred
        rv = Vv - (fy * y / zs + cy)
        c2 = ru * ru + rv * rv
        if stereo:
            rw = (URo - (u_pred - bf / zs)) * has_ur
            c2 = c2 + rw * rw
        else:
            rw = None
        c2 = c2 * isg
        return jnp.where(z > 0, c2, 1e9), (x, y, z, ru, rv, rw)

    def gated_cost(R, t, mask):
        c2, _ = chi2_of(R, t)
        return jnp.sum(jnp.minimum(c2, gate) * mask)

    mask = val
    pose = R0 + t0
    for round_i in range(rounds):
        use_huber = round_i < 2  # kernel dropped rounds 3/4 (Optimizer.cc:999)

        def gn_iter(_, carry, use_huber=use_huber):
            (*pose_l, lam, c_cur), mask = carry[:-1], carry[-1]
            R = tuple(pose_l[:9])
            t = tuple(pose_l[9:12])
            c2, (x, y, z, ru, rv, rw) = chi2_of(R, t)
            zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            zi = 1.0 / zs
            if use_huber:
                e = jnp.sqrt(jnp.maximum(c2, 1e-18))
                w_rob = jnp.where(e <= delta, 1.0, delta / e)
            else:
                w_rob = 1.0
            w = w_rob * isg * mask

            # analytic d(pred)/d(rho,phi) for the left-multiplicative update
            xz, yz = x * zi, y * zi
            Ju = (fx * zi, None, -fx * xz * zi,
                  -fx * xz * yz, fx * (1.0 + xz * xz), -fx * yz)
            Jv = (None, fy * zi, -fy * yz * zi,
                  -fy * (1.0 + yz * yz), fy * xz * yz, fy * xz)
            if stereo:
                # uR = u - bf/z: d uR/dXc = [fx zi, 0, (bf - fx x) zi^2]
                q = (bf - fx * x) * zi * zi
                Jw = (fx * zi * has_ur, None, q * has_ur,
                      q * y * has_ur, (fx - q * x) * has_ur,
                      -fx * yz * has_ur)
            else:
                Jw = (None,) * 6

            H = [[None] * 6 for _ in range(6)]
            g = [None] * 6
            for i in range(6):
                for j in range(i + 1):
                    acc = None
                    for Jr in (Ju, Jv, Jw):
                        if Jr[i] is not None and Jr[j] is not None:
                            term = Jr[i] * Jr[j]
                            acc = term if acc is None else acc + term
                    s = jnp.sum(acc * w) if acc is not None else jnp.float32(0.0)
                    H[i][j] = s
                    H[j][i] = s
                acc = None
                for Jr, rr in ((Ju, ru), (Jv, rv), (Jw, rw)):
                    if Jr[i] is not None:
                        term = Jr[i] * rr
                        acc = term if acc is None else acc + term
                g[i] = jnp.sum(acc * w)

            for i in range(6):
                H[i][i] = H[i][i] + lam

            dxi = _chol_solve6(H, g)
            ok = jnp.isfinite(dxi[0])
            for k in range(1, 6):
                ok = jnp.logical_and(ok, jnp.isfinite(dxi[k]))
            dxi = [jnp.where(ok, d, 0.0) for d in dxi]

            dRm, Vm = _rodrigues_scalars(dxi[3], dxi[4], dxi[5])
            dt = _mat3_vec(Vm, dxi[:3])
            Rn = _mat3_mul(dRm, R)
            tn_ = _mat3_vec(dRm, t)
            tn = tuple(tn_[i] + dt[i] for i in range(3))

            c_new = gated_cost(Rn, tn, mask)
            acc_step = c_new < c_cur
            pose_new = tuple(
                jnp.where(acc_step, n, o) for n, o in zip(Rn + tn, R + t)
            )
            lam2 = jnp.where(acc_step, lam * 0.5, lam * 4.0)
            c2_ = jnp.where(acc_step, c_new, c_cur)
            return pose_new + (lam2, c2_, mask)

        init = pose + (jnp.float32(1e-3), gated_cost(pose[:9], pose[9:12], mask), mask)
        out = jax.lax.fori_loop(0, iters, gn_iter, init)
        pose = tuple(out[:12])
        # reclassify inliers for the next round (chi2 gate vs `valid`)
        c2, _ = chi2_of(pose[:9], pose[9:12])
        mask = jnp.where(c2 < gate, val, 0.0)

    n_inl = jnp.sum(mask)
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    outv = jnp.zeros((8, LANES), jnp.float32)
    for k, s in enumerate(pose + (n_inl,)):
        outv = outv + jnp.where((rows == 0) & (lanes == k), s, 0.0)
    out_ref[:] = outv
    mask_ref[:] = mask


def _run(K, R0, t0, uv, Xw, inv_sigma2, valid, ur, bf,
         rounds: int, iters: int, stereo: bool):
    n = uv.shape[0]
    rows = -(-n // LANES)
    pad = rows * LANES - n

    def pad_to(a, fill=0.0):
        if a.ndim == 1:
            return jnp.pad(a.astype(jnp.float32), (0, pad), constant_values=fill)
        return jnp.pad(a.astype(jnp.float32), ((0, pad), (0, 0)))

    Xw_p = pad_to(Xw)
    # padded landmarks get z=1 to dodge the z<=0 branch cheaply (masked out)
    if pad:
        Xw_p = Xw_p.at[n:, 2].set(1.0)
    xw = Xw_p.T.reshape(3, rows, LANES)
    uv_p = pad_to(uv).T.reshape(2, rows, LANES)
    isig = pad_to(inv_sigma2).reshape(rows, LANES)
    val = pad_to(valid.astype(jnp.float32)).reshape(rows, LANES)
    ur_p = pad_to(ur, fill=-1.0).reshape(rows, LANES)

    sc = jnp.concatenate([
        K.astype(jnp.float32).reshape(-1)[:4],
        R0.astype(jnp.float32).reshape(-1),
        t0.astype(jnp.float32).reshape(-1),
        jnp.asarray(bf, jnp.float32).reshape(1),
    ])

    out, mask = pl.pallas_call(
        functools.partial(_pose_kernel, rounds=rounds, iters=iters, stereo=stereo),
        out_shape=(
            jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(sc, xw, uv_p, isig, val, ur_p)

    R = out[0, :9].reshape(3, 3)
    t = out[0, 9:12]
    inl = mask.reshape(-1)[:n] > 0
    return R, t, inl, out[0, 12].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimize_pallas(K, R0, t0, uv, Xw, inv_sigma2, valid,
                         rounds: int = 3, iters: int = 6):
    """Drop-in pinhole replacement for track.pose_optimize's core."""
    ur = jnp.full((uv.shape[0],), -1.0, jnp.float32)
    return _run(K, R0, t0, uv, Xw, inv_sigma2, valid, ur, 0.0,
                rounds, iters, stereo=False)


@functools.partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimize_stereo_pallas(K, bf, R0, t0, uv, ur, Xw, inv_sigma2, valid,
                                rounds: int = 3, iters: int = 6):
    """Drop-in pinhole replacement for track.pose_optimize_stereo's core."""
    return _run(K, R0, t0, uv, Xw, inv_sigma2, valid, ur, bf,
                rounds, iters, stereo=True)
