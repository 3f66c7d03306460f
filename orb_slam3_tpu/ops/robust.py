"""Robust loss kernels and chi-square gates.

The reference uses g2o's RobustKernelHuber with per-edge-type deltas
(sqrt(5.991) for mono 2-DoF, sqrt(7.815) for stereo 3-DoF reprojection —
e.g. `/root/reference/src/Optimizer.cc:877-895`, `:1280-1325`) and hard chi2
gates at the same thresholds for outlier classification
(`/root/reference/src/Optimizer.cc:999-1046`).

In an IRLS / LM setting the Huber kernel becomes a per-edge weight
w = rho'(e2) applied to the normal equations; we expose exactly that.
"""

import jax.numpy as jnp

# chi-square 95% quantiles used by the reference as gates
CHI2_2DOF = 5.991   # mono reprojection (Optimizer.cc:871)
CHI2_3DOF = 7.815   # stereo reprojection (Optimizer.cc:872)
CHI2_6DOF = 12.592
CHI2_9DOF = 16.919  # inertial residual gate (Optimizer.cc LocalInertialBA)

HUBER_MONO = jnp.sqrt(CHI2_2DOF)
HUBER_STEREO = jnp.sqrt(CHI2_3DOF)


def huber_weight(e2, delta):
    """IRLS weight for the Huber kernel given squared error e2 = r^T Omega r.

    rho(e2) has rho'(e2) = 1 for e <= delta, delta/e for e > delta; the
    Gauss-Newton IRLS weight multiplies both J^T W J and J^T W r.
    """
    e = jnp.sqrt(jnp.maximum(e2, 1e-18))
    return jnp.where(e <= delta, jnp.ones_like(e), delta / e)


def huber_rho(e2, delta):
    """Huber cost rho(e2) as used in g2o: e2 if e<=delta else 2*delta*e - delta^2."""
    e = jnp.sqrt(jnp.maximum(e2, 1e-18))
    return jnp.where(e <= delta, e2, 2.0 * delta * e - delta * delta)


def cauchy_weight(e2, delta):
    return 1.0 / (1.0 + e2 / (delta * delta))
