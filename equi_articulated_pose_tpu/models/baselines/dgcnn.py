"""DGCNN segmentation backbone (baseline).

Re-implementation of the reference's ``DGCNN.py`` PrimitiveNet (edge-conv
segmentation backbone, SURVEY.md S20): dynamic kNN graph, EdgeConv blocks
(MLP over [x_i, x_j - x_i] + neighbour max), concatenated multi-scale
features, per-point head.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sampling import pairwise_sqdist


def knn_idx(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x [B, N, C] -> [B, N, k] nearest-neighbour indices (excl. nothing)."""
    d2 = pairwise_sqdist(x, x)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C] x [B, N, k] -> [B, N, k, 2C] = concat(x_i, x_j - x_i)."""
    B, N, C = x.shape
    k = idx.shape[-1]
    nbr = jnp.take_along_axis(x, idx.reshape(B, N * k)[..., None], axis=1)
    nbr = nbr.reshape(B, N, k, C)
    ctr = jnp.broadcast_to(x[:, :, None, :], (B, N, k, C))
    return jnp.concatenate([ctr, nbr - ctr], axis=-1)


class EdgeConv(nn.Module):
    dim_out: int
    k: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        idx = knn_idx(x, self.k)
        h = edge_features(x, idx)
        h = nn.Dense(self.dim_out)(h)
        h = nn.LayerNorm()(h)
        h = jax.nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)


class DGCNNSeg(nn.Module):
    """Per-point segmentation network.  xyz [B, N, 3] -> logits [B, N, S]."""

    num_classes: int
    k: int = 20
    dims: Sequence[int] = (64, 64, 128, 256)
    emb_dim: int = 512

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        feats = []
        h = xyz
        for d in self.dims:
            h = EdgeConv(dim_out=d, k=self.k)(h)
            feats.append(h)
        cat = jnp.concatenate(feats, axis=-1)
        glb = nn.Dense(self.emb_dim)(cat)
        glb = jax.nn.leaky_relu(nn.LayerNorm()(glb), 0.2)
        glb = jnp.max(glb, axis=1, keepdims=True)
        h = jnp.concatenate(
            [cat, jnp.broadcast_to(glb, cat.shape[:-1] + (self.emb_dim,))], -1
        )
        h = jax.nn.leaky_relu(nn.Dense(256)(h), 0.2)
        h = jax.nn.leaky_relu(nn.Dense(128)(h), 0.2)
        return nn.Dense(self.num_classes)(h)
