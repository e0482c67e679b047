"""PointNet++ baseline — faithful re-design of the reference's
``SPConvNets/models/PointNet2.py`` (PointnetPP) in flax:

* 3 set-abstraction levels: FPS to [512, 128, 1] centres, k-NN grouping
  (k=64) with radius-masked max-pooling (radii [0.2, 0.4, None]), per-level
  MLPs [[64,64,128],[128,128,256],[256,512,1024]] on [rel_pos | feat]
  (ref ``PointNet2.py:18-30,80-120``);
* 3 feature-propagation levels with 3-NN inverse-distance interpolation and
  skip concatenation, up-MLPs [[256,256],[256,128],[128,128,128]]
  (ref ``PointNet2.py:24-26``);
* returns per-point features [B, N, 128] plus an optional seg head.

FPS and grouping use the shared TPU ops (``ops/sampling``); everything is
static-shape and vmap/scan-free convs on the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.sampling import furthest_point_sampling, pairwise_sqdist


class _MLP(nn.Module):
    dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for d in self.dims:
            x = nn.Dense(d)(x)
            x = nn.GroupNorm(num_groups=min(8, d))(x)
            x = jax.nn.relu(x)
        return x


def _gather(x, idx):
    """x [B, N, C], idx [B, M] -> [B, M, C]"""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _knn_group(pos, centers, k):
    """-> (idx [B, M, k], dist [B, M, k]) nearest input points per centre."""
    d2 = pairwise_sqdist(centers, pos)          # [B, M, N]
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, jnp.sqrt(jnp.maximum(-neg, 0.0))


class SetAbstraction(nn.Module):
    npoint: int
    mlp: Sequence[int]
    k: int = 64
    radius: Optional[float] = None

    @nn.compact
    def __call__(self, pos, feat):
        B, N, _ = pos.shape
        if self.npoint == 1:
            centers = jnp.mean(pos, axis=1, keepdims=True)     # global level
        else:
            fps = furthest_point_sampling(pos, self.npoint)
            centers = _gather(pos, fps)
        idx, dist = _knn_group(pos, centers, min(self.k, N))
        grouped_pos = jax.vmap(lambda p, i: p[i])(pos, idx) - centers[:, :, None]
        if feat is not None:
            grouped = jnp.concatenate(
                [grouped_pos, jax.vmap(lambda f, i: f[i])(feat, idx)], -1
            )
        else:
            grouped = grouped_pos
        h = _MLP(self.mlp)(grouped)                            # [B, M, k, C]
        if self.radius is not None:
            # radius-masked max (ref max_pooling_with_r, PointNet2.py:160-165)
            mask = (dist <= self.radius)[..., None]
            h = jnp.where(mask, h, -jnp.inf)
            h = jnp.max(h, axis=2)
            h = jnp.where(jnp.isfinite(h), h, 0.0)
        else:
            h = jnp.max(h, axis=2)
        return centers, h


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, pos_dst, feat_dst, pos_src, feat_src):
        """Interpolate src (coarse) features onto dst (fine) points, concat
        skip features, MLP."""
        if pos_src.shape[1] == 1:
            interp = jnp.broadcast_to(
                feat_src, (pos_dst.shape[0], pos_dst.shape[1], feat_src.shape[-1])
            )
        else:
            d2 = pairwise_sqdist(pos_dst, pos_src)             # [B, Nd, Ns]
            neg, idx = jax.lax.top_k(-d2, 3)
            w = 1.0 / jnp.maximum(-neg, 1e-8)
            w = w / jnp.sum(w, -1, keepdims=True)
            nbr = jax.vmap(lambda f, i: f[i])(feat_src, idx)   # [B, Nd, 3, C]
            interp = jnp.sum(nbr * w[..., None], axis=2)
        h = interp if feat_dst is None else jnp.concatenate([interp, feat_dst], -1)
        return _MLP(self.mlp)(h)


class PointnetPP(nn.Module):
    """ref PointnetPP: per-point 128-d features (+ optional seg logits)."""

    n_layers: int = 3
    num_seg: int = 0     # 0: features only

    @nn.compact
    def __call__(self, xyz, feat=None):
        n_samples = [512, 128, 1][: self.n_layers]
        mlps = [[64, 64, 128], [128, 128, 256], [256, 512, 1024]][: self.n_layers]
        radii = [0.2, 0.4, None][: self.n_layers]
        up_mlps = [[256, 256], [256, 128], [128, 128, 128]][-self.n_layers:]

        n_samples = [min(n, xyz.shape[1]) for n in n_samples]
        positions, feats = [xyz], [feat]
        p, f = xyz, feat
        for i in range(self.n_layers):
            p, f = SetAbstraction(
                n_samples[i], mlps[i], radius=radii[i], name=f"sa{i}"
            )(p, f)
            positions.append(p)
            feats.append(f)

        f_up = feats[-1]
        for i in range(self.n_layers):
            lvl = self.n_layers - 1 - i
            f_up = FeaturePropagation(up_mlps[i], name=f"fp{i}")(
                positions[lvl], feats[lvl], positions[lvl + 1], f_up
            )
        if self.num_seg > 0:
            return nn.Dense(self.num_seg, name="seg_head")(f_up)
        return f_up


class PointNet2Seg(nn.Module):
    """Segmentation wrapper: PointnetPP trunk + per-point class logits."""

    num_classes: int
    n_layers: int = 3

    @nn.compact
    def __call__(self, xyz):
        return PointnetPP(
            n_layers=self.n_layers, num_seg=self.num_classes, name="trunk"
        )(xyz)
