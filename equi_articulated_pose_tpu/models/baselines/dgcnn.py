"""DGCNN baseline — faithful re-design of the reference's
``SPConvNets/models/DGCNN.py`` (the PrimitiveNet the main models import,
``unsup_..._40:25``) in TPU-idiomatic flax:

* ``DGCNNEncoder`` — n_layers edge-convs (k-NN graph in feature space,
  edge feature ``[x_i, x_j - x_i]``, 1x1 conv + GroupNorm + LeakyReLU(0.2),
  max over neighbours; ref ``DGCNN.py:157-268``) + 1024-d global MLP/max;
* ``PrimitivesEmbeddingDGCNN`` — global|point feature fusion (512 -> 256)
  with three heads: per-point embedding, 8-way primitive-type log-softmax,
  unit normals (ref ``DGCNN.py:270-360``);
* ``PrimitiveNet`` — the wrapper with the reference call signature
  (ref ``DGCNN.py:362-389``);
* ``segment_from_embedding`` — fixed-iteration cosine k-means over the
  embedding to produce hard part labels for IoU comparisons.

The k-NN graph is built with one [N, N] matmul (MXU) instead of the CUDA
two-stage knn; all loops are unrolled convs over static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def knn_idx(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [B, N, C] -> [B, N, k] nearest-neighbour indices (self included),
    matching the reference's feature-space graph (``DGCNN.py:14-33``)."""
    d2 = (
        jnp.sum(x**2, -1)[:, :, None]
        - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x)
        + jnp.sum(x**2, -1)[:, None, :]
    )
    _, idx = jax.lax.top_k(-d2, k)
    return idx


def edge_features(x: jnp.ndarray, k: int, idx: Optional[jnp.ndarray] = None):
    """[B, N, C] -> [B, N, k, 2C] edge features [x_i, x_j - x_i]
    (ref ``get_graph_feature``, ``DGCNN.py:85-117``)."""
    if idx is None:
        idx = knn_idx(x, k)
    B, N, C = x.shape
    # gather neighbours x[b, idx[b, n, j]] -> [B, N, k, C] without
    # materialising an [N, N, C] broadcast
    nbr = jax.vmap(lambda xb, ib: xb[ib])(x, idx)
    ctr = jnp.broadcast_to(x[:, :, None, :], (B, N, k, C))
    return jnp.concatenate([ctr, nbr - ctr], axis=-1)


class _EdgeConv(nn.Module):
    out_ch: int
    groups: int
    k: int

    @nn.compact
    def __call__(self, x):                       # [B, N, C]
        e = edge_features(x, self.k)             # [B, N, k, 2C]
        h = nn.Dense(self.out_ch, use_bias=False)(e)
        h = nn.GroupNorm(num_groups=self.groups)(h)
        h = jax.nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)                # [B, N, out_ch]


class DGCNNEncoder(nn.Module):
    """ref DGCNNEncoderGn (mode 0): returns (global [B, 1024],
    point feats [B, N, 64+64+128])."""

    n_layers: int = 3
    k: int = 80

    @nn.compact
    def __call__(self, xyz):                     # [B, N, 3]
        k = min(self.k, xyz.shape[1])
        feats = []
        x = _EdgeConv(64, 2, k, name="conv1")(xyz)
        feats.append(x)
        if self.n_layers >= 2:
            x = _EdgeConv(64, 2, k, name="conv2")(x)
            feats.append(x)
        if self.n_layers >= 3:
            x = _EdgeConv(128, 2, k, name="conv3")(x)
            feats.append(x)
        point_feats = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(1024, name="mlp1")(point_feats)
        h = nn.GroupNorm(num_groups=8, name="bnmlp1")(h)
        h = jax.nn.relu(h)
        return jnp.max(h, axis=1), point_feats


class PrimitivesEmbeddingDGCNN(nn.Module):
    """ref PrimitivesEmbeddingDGCNGn: embedding + primitive type + normals."""

    emb_size: int = 50
    n_layers: int = 3
    k: int = 80
    num_primitives: int = 8

    @nn.compact
    def __call__(self, xyz):                     # [B, N, 3]
        B, N, _ = xyz.shape
        glb, pf = DGCNNEncoder(self.n_layers, self.k, name="encoder")(xyz)
        h = jnp.concatenate(
            [jnp.broadcast_to(glb[:, None], (B, N, glb.shape[-1])), pf], -1
        )
        h = jax.nn.relu(nn.GroupNorm(8)(nn.Dense(512, name="conv1")(h)))
        h_all = jax.nn.relu(nn.GroupNorm(4)(nn.Dense(256, name="conv2")(h)))

        e = jax.nn.relu(nn.GroupNorm(4)(nn.Dense(256, name="seg1")(h_all)))
        embedding = nn.Dense(self.emb_size, name="seg2")(e)

        t = jax.nn.relu(nn.GroupNorm(4)(nn.Dense(256, name="prim1")(h_all)))
        type_per_point = jax.nn.log_softmax(
            nn.Dense(self.num_primitives, name="prim2")(t), axis=-1
        )

        nrm = jax.nn.relu(nn.GroupNorm(4)(nn.Dense(256, name="nrm1")(h_all)))
        normal = nn.Dense(3, name="nrm2")(nrm)
        normal = normal / (
            jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-12
        )
        return embedding, type_per_point, normal


class PrimitiveNet(nn.Module):
    """ref PrimitiveNet wrapper (DGCNN backbone)."""

    emb_size: int = 50
    n_layers: int = 3
    k: int = 80

    @nn.compact
    def __call__(self, xyz, normals=None):
        return PrimitivesEmbeddingDGCNN(
            self.emb_size, self.n_layers, self.k, name="affinitynet"
        )(xyz)


def segment_from_embedding(
    embedding: jnp.ndarray, n_parts: int, iters: int = 10, rng=None
) -> jnp.ndarray:
    """Hard labels from the per-point embedding via fixed-iteration k-means
    (the reference clusters embeddings externally; jittable analog).
    embedding [B, N, E] -> labels [B, N]."""
    B, N, E = embedding.shape
    emb = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
    # deterministic farthest-first init in embedding space
    first = emb[:, :1]
    centers = [first[:, 0]]
    for _ in range(n_parts - 1):
        c = jnp.stack(centers, 1)                       # [B, m, E]
        d = 1.0 - jnp.einsum("bne,bme->bnm", emb, c).max(-1)
        centers.append(
            jnp.take_along_axis(emb, jnp.argmax(d, 1)[:, None, None], 1)[:, 0]
        )
    C = jnp.stack(centers, 1)                            # [B, P, E]

    def step(C, _):
        sim = jnp.einsum("bne,bpe->bnp", emb, C)
        lbl = jnp.argmax(sim, -1)
        oh = jax.nn.one_hot(lbl, n_parts)                # [B, N, P]
        newC = jnp.einsum("bnp,bne->bpe", oh, emb) / jnp.clip(
            oh.sum(1)[..., None], 1e-6
        )
        newC = newC / (jnp.linalg.norm(newC, axis=-1, keepdims=True) + 1e-12)
        return newC, None

    C, _ = jax.lax.scan(step, C, None, length=iters)
    return jnp.argmax(jnp.einsum("bne,bpe->bnp", emb, C), -1)


class DGCNNSeg(nn.Module):
    """Per-point segmentation head over the faithful DGCNN trunk (the
    PrimitivesEmbedding fusion path with a class head instead of the
    embedding head)."""

    num_classes: int
    n_layers: int = 3
    k: int = 80

    @nn.compact
    def __call__(self, xyz):
        B, N, _ = xyz.shape
        glb, pf = DGCNNEncoder(self.n_layers, self.k, name="encoder")(xyz)
        h = jnp.concatenate(
            [jnp.broadcast_to(glb[:, None], (B, N, glb.shape[-1])), pf], -1
        )
        h = jax.nn.relu(nn.GroupNorm(8)(nn.Dense(512, name="conv1")(h)))
        h = jax.nn.relu(nn.GroupNorm(4)(nn.Dense(256, name="conv2")(h)))
        return nn.Dense(self.num_classes, name="seg_head")(h)
