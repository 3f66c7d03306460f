"""Matcher + two-view reconstruction tests on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_tpu.frontend import camera as cam
from orb_slam3_tpu.frontend import matching, two_view
from orb_slam3_tpu.ops import lie

K = cam.make_pinhole(450.0, 450.0, 320.0, 240.0)


class TestHamming:
    def test_hamming_matrix(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (10, 32), dtype=np.uint8)
        b = rng.integers(0, 256, (12, 32), dtype=np.uint8)
        d = np.array(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = np.array(
            [[np.unpackbits(x ^ y).sum() for y in b] for x in a]
        )
        np.testing.assert_array_equal(d, ref)

    def test_best_match_with_window(self):
        rng = np.random.default_rng(1)
        desc = rng.integers(0, 256, (50, 32), dtype=np.uint8)
        # b = shuffled a with small corruption
        perm = rng.permutation(50)
        descb = desc[perm].copy()
        flip = rng.integers(0, 256, descb.shape, dtype=np.uint8)
        descb ^= (flip < 8).astype(np.uint8)  # flip ~3% of bits
        xy = rng.uniform(0, 300, (50, 2)).astype(np.float32)
        xyb = xy[perm]
        idx, dist, ok = matching.search_by_projection(
            jnp.asarray(xy), jnp.zeros(50, jnp.int32), jnp.asarray(desc),
            jnp.ones(50, bool),
            jnp.asarray(xyb), jnp.zeros(50, jnp.int32), jnp.asarray(descb),
            jnp.ones(50, bool),
            radius_px=5.0, scale_factors=jnp.ones(8),
        )
        idx, ok = np.array(idx), np.array(ok)
        assert ok.sum() >= 45
        correct = (idx[ok] == np.argsort(perm)[np.arange(50)][ok])
        # idx maps a-row -> b-row; b-row of a-item i is perm^{-1}[i]
        inv = np.empty(50, int)
        inv[perm] = np.arange(50)
        assert (idx[ok] == inv[ok]).mean() > 0.95


class TestTwoView:
    def _scene(self, planar: bool, seed=0, n=200, noise=0.4):
        rng = np.random.default_rng(seed)
        if planar:
            X = np.stack(
                [
                    rng.uniform(-2, 2, n),
                    rng.uniform(-1.5, 1.5, n),
                    np.full(n, 5.0) + 0.2 * rng.uniform(-1, 1, n) * 0,
                ],
                axis=-1,
            )
        else:
            X = np.stack(
                [
                    rng.uniform(-2, 2, n),
                    rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 9, n),
                ],
                axis=-1,
            )
        X = jnp.asarray(X, jnp.float32)
        xi = jnp.array([0.3, 0.02, 0.05, -0.02, 0.08, 0.01])
        R, t = lie.se3_exp(xi)
        p0 = cam.pinhole_project(K, X)
        p1 = cam.pinhole_project(K, lie.se3_apply(R, t, X))
        key = jax.random.PRNGKey(seed)
        p0 = p0 + noise * jax.random.normal(key, p0.shape)
        p1 = p1 + noise * jax.random.normal(jax.random.PRNGKey(seed + 1), p1.shape)
        return X, R, t, p0, p1

    def _check(self, res, R, t):
        assert bool(res["success"])
        R_est, t_est = np.array(res["R"]), np.array(res["t"])
        np.testing.assert_allclose(R_est, np.array(R), atol=0.02)
        tn = np.array(t) / np.linalg.norm(np.array(t))
        assert np.dot(t_est, tn) > 0.99

    def test_general_scene_uses_f(self):
        X, R, t, p0, p1 = self._scene(planar=False)
        res = jax.jit(
            lambda k, a, b, v: two_view.reconstruct(k, a, b, v, K)
        )(jax.random.PRNGKey(7), p0, p1, jnp.ones(p0.shape[0], bool))
        assert not bool(res["used_h"])
        self._check(res, R, t)
        assert int(res["n_good"]) > 150

    def test_planar_scene_uses_h(self):
        X, R, t, p0, p1 = self._scene(planar=True)
        res = two_view.reconstruct(
            jax.random.PRNGKey(8), p0, p1, jnp.ones(p0.shape[0], bool), K
        )
        assert bool(res["used_h"])
        self._check(res, R, t)

    def test_outliers_tolerated(self):
        X, R, t, p0, p1 = self._scene(planar=False, seed=3)
        n = p0.shape[0]
        p1 = p1.at[:40].set(
            jax.random.uniform(jax.random.PRNGKey(9), (40, 2), minval=0, maxval=600)
        )
        res = two_view.reconstruct(
            jax.random.PRNGKey(10), p0, p1, jnp.ones(n, bool), K
        )
        assert bool(res["success"])
        good = np.array(res["good"])
        assert good[:40].sum() <= 3  # outliers rejected
        self._check(res, R, t)

    def test_pure_rotation_fails(self):
        """No parallax -> must refuse to initialize."""
        rng = np.random.default_rng(4)
        X = jnp.asarray(
            np.stack(
                [rng.uniform(-2, 2, 150), rng.uniform(-1.5, 1.5, 150), rng.uniform(4, 9, 150)],
                axis=-1,
            ),
            jnp.float32,
        )
        Rrot = lie.so3_exp(jnp.array([0.0, 0.05, 0.01]))
        p0 = cam.pinhole_project(K, X)
        p1 = cam.pinhole_project(K, (Rrot @ X.T).T)
        res = two_view.reconstruct(
            jax.random.PRNGKey(11), p0, p1, jnp.ones(150, bool), K
        )
        assert not bool(res["success"])
