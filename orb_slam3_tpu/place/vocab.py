"""Bag-of-binary-words vocabulary as dense tensors.

Role of DBoW2's `TemplatedVocabulary<FORB>` (`/root/reference/Thirdparty/
DBoW2/DBoW2/TemplatedVocabulary.h`, used as ORBVocabulary): a hierarchical
k-means (k-majority for binary descriptors) tree; `transform` descends the
tree per descriptor by Hamming distance to produce word ids + tf-idf
weights; scoring is L1 on normalized BoW vectors (`ScoringObject.cc`).

TPU formulation: the tree levels are dense center tensors
[n_nodes_level, 32] uint8; descent is a per-level masked argmin of
popcount(XOR) — a few small batched reductions. A whole frame transforms in
one shot: [F, 32] -> word ids [F]. BoW vectors are dense [W] floats (W =
leaf count, typically 1e3-1e4 here), so database scoring against all
keyframes is ONE matmul on the MXU instead of an inverted-file walk.

The reference ships a 1M-word offline vocabulary (not available in this
environment); `train` builds one from any descriptor sample (e.g. the first
minutes of operation, or a dataset pass) — quality scales with the sample.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Vocabulary:
    """centers[l]: [k^(l+1), 32] uint8 — level l node centers (root level 0).
    Flattened into one array with static per-level offsets for jit."""

    centers: jnp.ndarray          # [n_total, 32] uint8, level-major
    weights: jnp.ndarray          # [n_words] idf weights
    branching: int = dataclasses.field(metadata=dict(static=True))
    depth: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_words(self) -> int:
        return self.branching ** self.depth


def _hamming_np(a, b):
    return np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=2).sum(axis=2)


def _kmajority(desc, k, rng, iters=8):
    """Binary k-means: centers are per-bit majorities of their cluster."""
    n = desc.shape[0]
    if n <= k:
        centers = np.zeros((k, 32), np.uint8)
        centers[:n] = desc
        if n > 0:
            centers[n:] = desc[rng.integers(0, n, k - n)]
        return centers
    centers = desc[rng.choice(n, k, replace=False)]
    for _ in range(iters):
        d = _hamming_np(desc, centers)
        assign = d.argmin(axis=1)
        new = []
        for c in range(k):
            sel = desc[assign == c]
            if len(sel) == 0:
                new.append(desc[rng.integers(0, n)])
                continue
            bits = np.unpackbits(sel, axis=1)
            maj = (bits.mean(axis=0) >= 0.5).astype(np.uint8)
            new.append(np.packbits(maj))
        centers = np.stack(new)
    return centers


def train(descriptors: np.ndarray, branching: int = 8, depth: int = 3,
          seed: int = 0) -> Vocabulary:
    """Hierarchical k-majority training (TemplatedVocabulary::create
    analogue). descriptors: [N, 32] uint8."""
    rng = np.random.default_rng(seed)
    k, L = branching, depth
    levels = []
    # recursive clustering, materialized level-major. Each node at level l
    # has exactly k children; clusters follow the descent assignment.
    groups = [descriptors]
    for lvl in range(L):
        centers_lvl = []
        next_groups = []
        for g in groups:
            c = _kmajority(g, k, rng)
            centers_lvl.append(c)
            if lvl + 1 < L:
                if len(g) == 0:
                    next_groups.extend([g] * k)
                else:
                    d = _hamming_np(g, c)
                    a = d.argmin(axis=1)
                    next_groups.extend([g[a == i] for i in range(k)])
        levels.append(np.concatenate(centers_lvl, axis=0))  # [k^(l+1), 32]
        groups = next_groups

    centers = np.concatenate(levels, axis=0)
    # idf weights from the training sample (TemplatedVocabulary::setNodeWeights)
    voc = Vocabulary(
        centers=jnp.asarray(centers),
        weights=jnp.ones((k ** L,), jnp.float32),
        branching=k,
        depth=L,
    )
    words = np.array(transform_words(voc, jnp.asarray(descriptors),
                                     jnp.ones(len(descriptors), bool)))
    counts = np.bincount(words, minlength=k ** L).astype(np.float64)
    n_docs = max(len(descriptors), 1)
    idf = np.log(n_docs / np.maximum(counts, 1.0))
    return dataclasses.replace(voc, weights=jnp.asarray(idf, jnp.float32))


def _popcount_dist(desc, centers):
    """[F, 32] x [C, 32] -> [F, C] int32 Hamming."""
    x = jnp.bitwise_xor(desc[:, None, :], centers[None, :, :])
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


def transform_words(voc: Vocabulary, desc, valid):
    """[F, 32] descriptors -> [F] leaf word ids (tree descent, batched)."""
    k, L = voc.branching, voc.depth
    off = 0
    node = jnp.zeros(desc.shape[0], jnp.int32)  # node index within level
    for lvl in range(L):
        n_lvl = k ** (lvl + 1)
        centers = jax.lax.dynamic_slice_in_dim(voc.centers, off, n_lvl, 0)
        d = _popcount_dist(desc, centers)  # [F, n_lvl]
        # only the k children of `node` are candidates
        child_base = node * k
        cand = child_base[:, None] + jnp.arange(k)[None, :]
        dc = jnp.take_along_axis(d, cand, axis=1)
        best = jnp.argmin(dc, axis=1)
        node = child_base + best.astype(jnp.int32)
        off += n_lvl
    return jnp.where(valid, node, 0)


def bow_vector(voc: Vocabulary, desc, valid):
    """Normalized tf-idf BoW vector [n_words] (transform + L1 normalize)."""
    words = transform_words(voc, desc, valid)
    W = voc.n_words
    tf = jnp.zeros((W,), jnp.float32).at[words].add(valid.astype(jnp.float32))
    v = tf * voc.weights
    n = jnp.sum(jnp.abs(v))
    return v / jnp.where(n < 1e-12, 1.0, n)


def l1_score(a, b):
    """DBoW2 L1 score in [0, 1] (ScoringObject.cc L1Scoring):
    s = 1 - 0.5 * |a/|a| - b/|b||_1 — inputs already normalized."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


def score_matrix(query_bow, db_bows):
    """[W] vs [K, W] -> [K] L1 scores; one broadcasted reduction."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(query_bow[None, :] - db_bows), axis=-1)
