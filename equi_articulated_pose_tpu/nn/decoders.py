"""Shape decoders (reconstruction priors).

Re-implementations of the reference decoder zoo
(``SPConvNets/models/model_util.py``): DecoderFC (:288), DecoderFCWithPVP
(:330, recon_prior=6), Atlas (:659 / :436), ConstantCommon (:884 / :707,
recon_prior 2/9), Cuboid variants (:966+, recon_prior 5/7), DecoderFCAxis.
Outputs are channels-last [B, M, 3] in [0, 1] (callers subtract 0.5, matching
the reference convention).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = nn.Dense(f)(x)
            x = jax.nn.leaky_relu(x, 0.01)
        return x


class DecoderFC(nn.Module):
    """inv feature [B, C] -> canonical points [B, M, 3] in [0, 1]."""

    n_features: Sequence[int]
    output_pts: int
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        h = MLP(self.n_features)(x)
        h = nn.Dense(self.output_pts * 3)(h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        return h.reshape(x.shape[0], self.output_pts, 3)


class DecoderFCWithPVP(nn.Module):
    """DecoderFC + pivot-point & central-point branches (recon_prior=6).

    Returns (points [B, M, 3], pivot [B, 3], central [B, 3]) — all sigmoided
    to [0, 1]; the model subtracts 0.5 (ref ``unsup_..._40:2005-2006``).
    """

    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x, pv_feat=None, central_feat=None):
        pts = DecoderFC(self.n_features, self.output_pts, name="shape")(x)
        pv_in = x if pv_feat is None else pv_feat
        cp_in = x if central_feat is None else central_feat
        pv = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="pv_mlp")(pv_in)))
        cp = jax.nn.sigmoid(
            nn.Dense(3)(MLP(self.n_features, name="cp_mlp")(cp_in))
        )
        return pts, pv, cp


class DecoderFCAtlas(nn.Module):
    """Atlas-style decoder: learned per-point prior grid concatenated to the
    latent (recon_prior 4/8)."""

    n_features: Sequence[int]
    output_pts: int
    prior_dim: int = 3

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        grid = self.param(
            "prior_grid", nn.initializers.uniform(1.0), (self.output_pts, self.prior_dim)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(x[:, None], (B, self.output_pts, x.shape[-1])),
             jnp.broadcast_to(grid[None], (B, self.output_pts, self.prior_dim))],
            axis=-1,
        )
        h = MLP(self.n_features)(h)
        return jax.nn.sigmoid(nn.Dense(3)(h))


class DecoderConstantCommon(nn.Module):
    """Category-common learned point cloud plus a per-shape deformation
    (recon_prior 2/9)."""

    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        common = self.param(
            "common_pts", nn.initializers.uniform(1.0), (self.output_pts, 3)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(x[:, None], (B, self.output_pts, x.shape[-1])),
             jnp.broadcast_to(common[None], (B, self.output_pts, 3))],
            axis=-1,
        )
        delta = nn.Dense(3)(MLP(self.n_features)(h))
        return jnp.clip(
            jax.nn.sigmoid(jnp.broadcast_to(common[None], (B, self.output_pts, 3)))
            + 0.1 * jnp.tanh(delta),
            0.0,
            1.0,
        )


class DecoderFCWithPVPAtlas(nn.Module):
    n_features: Sequence[int]
    output_pts: int
    prior_dim: int = 3

    @nn.compact
    def __call__(self, x, pv_feat=None, central_feat=None):
        pts = DecoderFCAtlas(self.n_features, self.output_pts, self.prior_dim, name="shape")(x)
        pv_in = x if pv_feat is None else pv_feat
        cp_in = x if central_feat is None else central_feat
        pv = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="pv_mlp")(pv_in)))
        cp = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="cp_mlp")(cp_in)))
        return pts, pv, cp


class DecoderFCWithPVPConstantCommon(nn.Module):
    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x, pv_feat=None, central_feat=None):
        pts = DecoderConstantCommon(self.n_features, self.output_pts, name="shape")(x)
        pv_in = x if pv_feat is None else pv_feat
        cp_in = x if central_feat is None else central_feat
        pv = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="pv_mlp")(pv_in)))
        cp = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="cp_mlp")(cp_in)))
        return pts, pv, cp


class DecoderFCAxis(nn.Module):
    """Latent -> unit axis [B, 3] (ref DecoderFCAxis :245-286)."""

    n_features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        from ..geom.so3 import safe_normalize

        return safe_normalize(nn.Dense(3)(MLP(self.n_features)(x)))


def cuboid_fit_loss(
    pred_R: jnp.ndarray,     # [B, S, 3, 3] selected slot rotations
    pred_T: jnp.ndarray,     # [B, S, 3]
    xyz: jnp.ndarray,        # [B, N, 3] input cloud
    cub_x: jnp.ndarray,      # [B, S, 3]  cuboid extents
    cub_R: jnp.ndarray,      # [B, S, 3, 3] cuboid orientation
    one_hot: jnp.ndarray,    # [B, N, S] hard labels
    attn: jnp.ndarray,       # [B, S, N]
) -> jnp.ndarray:
    """The reference cuboid-containment loss (``model_util.py:1252-1334``):
    inverse-transform each slot's input points into the cuboid frame; inlier
    points pay the mean of their two smallest squared face distances, outlier
    points the largest violating-axis face distance; attention-weighted mean
    over points, averaged over non-empty slots.  Returns [B]."""
    # local = cub_R^T (pred_R^T (x - T))
    diff = xyz[:, None, :, :] - pred_T[:, :, None, :]            # [B,S,N,3]
    inv = jnp.einsum("bsji,bsnj->bsni", pred_R, diff)
    local = jnp.einsum("bsji,bsnj->bsni", cub_R, inv)            # [B,S,N,3]
    half = cub_x[:, :, None, :] / 2.0
    d_min_face = (local + half) ** 2                              # to -x face
    d_max_face = (half - local) ** 2                              # to +x face
    d_face = jnp.minimum(d_min_face, d_max_face)                  # [B,S,N,3]
    inlier_xyz = (local <= half) & (local >= -half)               # per-axis
    inlier_pts = inlier_xyz.sum(-1) > 2.5                         # [B,S,N]
    outlier_dist = jnp.max(jnp.where(inlier_xyz, 0.0, d_face), axis=-1)
    sorted_d = jnp.sort(d_face, axis=-1)
    inlier_dist = sorted_d[..., :2].mean(-1)
    d = jnp.where(inlier_pts, inlier_dist, outlier_dist)          # [B,S,N]
    soft_w = one_hot.transpose(0, 2, 1) * attn                    # [B,S,N]
    per_slot = jnp.sum(d * soft_w, -1) / jnp.clip(jnp.sum(soft_w, -1), 1e-8)
    ind = (one_hot.sum(1) > 0.5).astype(d.dtype)                  # [B,S]
    return jnp.sum(per_slot * ind, -1) / jnp.clip(jnp.sum(ind, -1), 1e-8)


def cuboid_axis_normal_loss(
    pv_points: jnp.ndarray,       # [B, S, 3]
    central_points: jnp.ndarray,  # [B, S, 3]
    cub_x: jnp.ndarray,           # [B, S, 3]
    cub_R: jnp.ndarray,           # [B, S, 3, 3]
    axis: jnp.ndarray,            # [B, 3] shared joint axis
) -> jnp.ndarray:
    """dot(axis, nearest-cuboid-face normal) coupling (ref
    ``model_util.py:1553-1592``): the joint axis should be orthogonal to the
    face of each slot's cuboid nearest the shared pivot.  Returns [B]."""
    B, S, _ = central_points.shape
    pv0 = jnp.broadcast_to(pv_points[:, :1, :], (B, S, 3))
    local = jnp.einsum(
        "bsji,bsj->bsi", cub_R, pv0 - central_points
    )                                                             # [B,S,3]
    half = cub_x / 2.0
    d_min = jnp.abs(local + half)
    d_max = jnp.abs(local - half)
    d_pair = jnp.stack([d_min, d_max], axis=-1)                   # [B,S,3,2]
    face_idx = jnp.argmin(d_pair, axis=-1)                        # [B,S,3]
    d_axis = jnp.min(d_pair, axis=-1)                             # [B,S,3]
    axis_idx = jnp.argmin(d_axis, axis=-1)                        # [B,S]
    sel_face = jnp.take_along_axis(face_idx, axis_idx[..., None], -1)[..., 0]
    sign = jnp.where(sel_face == 0, -1.0, 1.0)                    # min face: -n
    normal_local = jax.nn.one_hot(axis_idx, 3) * sign[..., None]  # [B,S,3]
    world_n = jnp.einsum("bsij,bsj->bsi", cub_R, normal_local)
    dot = jnp.sum(
        axis[:, None, :] * jax.lax.stop_gradient(world_n), -1
    ).mean(-1)
    return jnp.abs(dot)


class _CuboidBranch(nn.Module):
    """Learned cuboid extents + orientation from the slot latent."""

    n_features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        ext = (
            jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="ext_mlp")(x)))
            * 0.5
            + 1e-3
        )
        from ..geom.so3 import ortho6d_to_matrix

        R = ortho6d_to_matrix(nn.Dense(6)(MLP(self.n_features, name="rot_mlp")(x)))
        return ext, R


class DecoderFCWithCuboid(nn.Module):
    """DecoderFC + learned cuboid (extent + rotation) (recon_prior=5).
    Returns (points, extents, cuboid_R); the containment loss is computed by
    the model against the slot's input points (ref unsup_..._38:1764-1800)."""

    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x):
        pts = DecoderFC(self.n_features, self.output_pts, name="shape")(x)
        ext, R = _CuboidBranch(self.n_features, name="cuboid")(x)
        return pts, ext, R


class DecoderFCWithPVPCuboid(nn.Module):
    """PVP decoder + cuboid branch (recon_prior=7)."""

    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x, pv_feat=None, central_feat=None):
        pts, pv, cp = DecoderFCWithPVP(
            self.n_features, self.output_pts, name="pvp"
        )(x, pv_feat, central_feat)
        ext, R = _CuboidBranch(self.n_features, name="cuboid")(x)
        return pts, pv, cp, ext, R
