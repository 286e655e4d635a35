"""Device-resident feature retrieval (the faiss replacement).

The reference trains a faiss ``IVF{n},Flat`` index over training-set
HuBERT features and at inference searches k=1 neighbors per frame,
blending them into the query features (reference rvc_nodes.py:500-554,
vc_infer_pipeline.py:60-75, weight ∝ 1/d²). IVF with nprobe=1 is an
*approximation* whose only purpose is CPU speed; on TPU the exact
brute-force top-k is a single (T, D)x(D, N) matmul on the MXU — faster
*and* more accurate, so that is the native design. K-means clustering
(reference uses MiniBatchKMeans to 10k centroids for >2e5 rows) is kept
as an optional compaction step, implemented with jit-compiled Lloyd
iterations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_blend(feats: jax.Array, bank: jax.Array, bank_sq: jax.Array, k: int) -> jax.Array:
    """feats (B, T, D) queries vs bank (N, D): return the 1/d²-weighted
    blend of the k nearest bank rows for every frame."""
    # squared L2 distance via the matmul identity (MXU): |q|² - 2q·b + |b|²
    dots = jnp.einsum("btd,nd->btn", feats, bank,
                      precision=jax.lax.Precision.HIGHEST)  # argmin needs fp32
    q_sq = jnp.sum(feats * feats, axis=-1, keepdims=True)
    d2 = q_sq - 2.0 * dots + bank_sq[None, None, :]
    neg_d2, idx = jax.lax.top_k(-d2, k)  # (B, T, k)
    d2_k = jnp.maximum(-neg_d2, 1e-9)
    w = 1.0 / jnp.square(d2_k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbors = bank[idx]  # (B, T, k, D)
    return jnp.sum(neighbors * w[..., None], axis=-2)


class FeatureIndex:
    """Exact top-k retrieval over a device-resident feature bank."""

    def __init__(self, bank: np.ndarray | jax.Array):
        self.bank = jnp.asarray(bank, jnp.float32)
        self._bank_sq = jnp.sum(self.bank * self.bank, axis=-1)

    @property
    def ntotal(self) -> int:
        return int(self.bank.shape[0])

    def search_blend(self, feats: jax.Array, k: int = 1) -> jax.Array:
        """Weighted-neighbor blend (reference vc_infer_pipeline.py:65-68).
        With the reference's k=1 this reduces to nearest-row substitution."""
        return _topk_blend(feats.astype(jnp.float32), self.bank, self._bank_sq, k)

    def blend_into(self, feats: jax.Array, index_rate: float, k: int = 1) -> jax.Array:
        """feats ← rate·retrieved + (1-rate)·feats (reference :72-75)."""
        if index_rate <= 0:
            return feats
        retrieved = self.search_blend(feats, k)
        return (index_rate * retrieved + (1.0 - index_rate) * feats).astype(feats.dtype)

    def save(self, path: str) -> None:
        np.save(path, np.asarray(self.bank))

    @classmethod
    def load(cls, path: str) -> "FeatureIndex":
        return cls(np.load(path))


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans(data: jax.Array, init: jax.Array, n_clusters: int, iters: int) -> jax.Array:
    data_sq = jnp.sum(data * data, axis=-1)

    def step(centroids, _):
        d2 = (
            data_sq[:, None]
            - 2.0 * jnp.matmul(data, centroids.T)
            + jnp.sum(centroids * centroids, -1)[None, :]
        )
        assign = jnp.argmin(d2, axis=-1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=data.dtype)
        sums = jnp.matmul(onehot.T, data)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centroids)
        return new, None

    out, _ = jax.lax.scan(step, init, None, length=iters)
    return out


def train_index(
    features: np.ndarray,
    max_rows: int = 200_000,
    n_clusters: int = 10_000,
    iters: int = 20,
    seed: int = 0,
) -> FeatureIndex:
    """Build a retrieval bank; large datasets are compacted to k-means
    centroids (reference rvc_nodes.py:509-549 uses MiniBatchKMeans the same
    way before faiss training)."""
    feats = np.asarray(features, np.float32)
    if feats.shape[0] > max_rows:
        rng = np.random.default_rng(seed)
        init_idx = rng.choice(feats.shape[0], n_clusters, replace=False)
        centroids = _kmeans(jnp.asarray(feats), jnp.asarray(feats[init_idx]), n_clusters, iters)
        return FeatureIndex(np.asarray(centroids))
    return FeatureIndex(feats)
