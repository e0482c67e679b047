"""PointNet++ segmentation baseline (ref ``SPConvNets/models/PointNet2.py``,
SURVEY.md S20): set-abstraction (FPS + ball query + mini-PointNet) encoder,
feature-propagation (3-NN inverse-distance interpolation) decoder, seg head.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sampling import (
    ball_query,
    furthest_point_sampling,
    gather_points,
    group_points,
    pairwise_sqdist,
)


class SetAbstraction(nn.Module):
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats):
        idx = furthest_point_sampling(xyz, self.npoint)
        new_xyz = gather_points(xyz, idx)
        nidx = ball_query(new_xyz, xyz, self.radius, self.nsample)
        g_xyz = group_points(xyz, nidx) - new_xyz[:, :, None, :]
        h = g_xyz if feats is None else jnp.concatenate(
            [g_xyz, group_points(feats, nidx)], -1
        )
        for d in self.mlp:
            h = jax.nn.relu(nn.LayerNorm()(nn.Dense(d)(h)))
        return new_xyz, jnp.max(h, axis=2)


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_dst, xyz_src, feats_dst, feats_src):
        """Interpolate feats_src (at xyz_src) onto xyz_dst, concat feats_dst."""
        d2 = pairwise_sqdist(xyz_dst, xyz_src)
        neg, idx = jax.lax.top_k(-d2, 3)
        w = 1.0 / jnp.clip(-neg, 1e-8)
        w = w / jnp.sum(w, -1, keepdims=True)
        nbr = group_points(feats_src, idx)
        interp = jnp.sum(nbr * w[..., None], axis=2)
        h = interp if feats_dst is None else jnp.concatenate([interp, feats_dst], -1)
        for d in self.mlp:
            h = jax.nn.relu(nn.LayerNorm()(nn.Dense(d)(h)))
        return h


class PointNet2Seg(nn.Module):
    """xyz [B, N, 3] -> per-point logits [B, N, S]."""

    num_classes: int

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        l1_xyz, l1 = SetAbstraction(xyz.shape[1] // 4, 0.2, 32, (64, 64, 128))(xyz, None)
        l2_xyz, l2 = SetAbstraction(xyz.shape[1] // 16, 0.4, 32, (128, 128, 256))(l1_xyz, l1)
        u1 = FeaturePropagation((256, 128))(l1_xyz, l2_xyz, l1, l2)
        u0 = FeaturePropagation((128, 128))(xyz, l1_xyz, None, u1)
        h = jax.nn.relu(nn.Dense(128)(u0))
        return nn.Dense(self.num_classes)(h)
