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


def cuboid_constraint_loss(points: jnp.ndarray, extents: jnp.ndarray, R: jnp.ndarray):
    """Penalty keeping decoded points inside a learned cuboid (ref
    cuboid-constraint losses, ``model_util.py:966-1593``, simplified):
    points [B, M, 3] (centred), extents [B, 3] (>0), R [B, 3, 3]."""
    local = jnp.einsum("bij,bmj->bmi", jnp.swapaxes(R, -1, -2), points)
    excess = jnp.abs(local) - extents[:, None, :]
    return jnp.mean(jnp.sum(jax.nn.relu(excess) ** 2, axis=-1))


class DecoderFCWithCuboid(nn.Module):
    """DecoderFC + learned cuboid (extent + rotation) with containment loss
    (recon_prior=5)."""

    n_features: Sequence[int]
    output_pts: int

    @nn.compact
    def __call__(self, x):
        pts = DecoderFC(self.n_features, self.output_pts, name="shape")(x)
        ext = jax.nn.sigmoid(nn.Dense(3)(MLP(self.n_features, name="ext_mlp")(x))) * 0.5 + 1e-3
        from ..geom.so3 import ortho6d_to_matrix

        R = ortho6d_to_matrix(nn.Dense(6)(MLP(self.n_features, name="rot_mlp")(x)))
        loss = cuboid_constraint_loss(pts - 0.5, ext, R)
        return pts, loss, ext, R
