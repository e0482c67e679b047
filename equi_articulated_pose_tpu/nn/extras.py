"""Secondary equivariant components completing the reference conv zoo.

* KernelPropagation — initial anchor features from a raw dense fragment
  (ref ``so3conv/modules.py:57-119`` + CUDA ``initial_anchor_query`` N5);
* inter blurring / pooling — neighbour-mean low-pass (ref
  ``spconv/functional.py:409-423``);
* anchor interpolation — kNN feature propagation between anchor sets (ref
  ``compute_anchor_weights``/``anchor_prop``, ``spconv/functional.py:610-655``);
* IntraSO3Conv2D — azimuthal (C4 about +y) product-anchor intra conv used by
  the 2D/drawer variants (ref ``intra_so3conv_grouping_2D``,
  ``so3conv/functional.py:2606-2627``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geom import so3 as so3g
from ..geom.kernels import KERNEL_CONDENSE_RATIO, spherical_kernel_points
from ..ops.sampling import ball_query, furthest_point_sampling, gather_points, group_points, pairwise_sqdist
from .containers import SpherePoints
from .so3conv import _so3conv_kernel_init


class KernelPropagation(nn.Module):
    """Raw fragment [B, M, 3] + centres -> SpherePoints with learned features.

    Accumulates, for every (kernel point, anchor), the clipped-linear
    occupancy weight of fragment points around each centre, normalises by
    count, then applies the SO3 linear map.
    """

    dim_out: int
    n_center: int
    kernel_size: int
    radius: float
    sigma: float
    kanchor: int = 60

    @nn.compact
    def __call__(self, frag: jnp.ndarray, clouds: jnp.ndarray) -> SpherePoints:
        anchors = jnp.asarray(so3g.get_anchors(self.kanchor))
        kernels = jnp.asarray(
            spherical_kernel_points(KERNEL_CONDENSE_RATIO * self.radius, self.kernel_size)
        )
        ks = kernels.shape[0]
        A = anchors.shape[0]
        if clouds.shape[1] == self.n_center:
            centers = clouds
        else:
            idx = furthest_point_sampling(clouds, self.n_center)
            centers = gather_points(clouds, idx)

        rk = jnp.einsum("aij,kj->kai", anchors, kernels)  # [ks, A, 3]
        # d2[b, c, k, a, m] between (centre + rotated kernel point) and frag
        kp = centers[:, :, None, None, :] + rk[None, None]        # [B,C,ks,A,3]
        diff = kp[:, :, :, :, None, :] - frag[:, None, None, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)                        # [B,C,ks,A,M]
        in_r = (d2 < self.radius * self.radius).astype(jnp.float32)
        w = jax.nn.relu(1.0 - d2 / self.sigma) * in_r
        cnt = jnp.sum(in_r, axis=-1)
        feats = jnp.sum(w, axis=-1) / (cnt + 1.0)                 # [B,nc,ks,A]
        feats = jnp.transpose(feats, (0, 1, 3, 2))                # [B,nc,A,ks]
        W = self.param("W", _so3conv_kernel_init, (ks, 1, self.dim_out))
        out = jnp.einsum("bnak,kd->bnad", feats, W[:, 0, :])
        return SpherePoints(centers, out, None)


def inter_blurring(xyz: jnp.ndarray, feats: jnp.ndarray, radius: float,
                   n_neighbor: int, alpha: float = 0.5) -> jnp.ndarray:
    """Low-pass: alpha * f + (1-alpha) * neighbour-mean (ref :418-423)."""
    idx = ball_query(xyz, xyz, radius, n_neighbor)
    nbr = group_points(feats, idx)                  # [B, N, nn, A, C]
    return alpha * feats + (1.0 - alpha) * nbr.mean(2)


def inter_pooling(xyz: jnp.ndarray, feats: jnp.ndarray, stride: int,
                  radius: float, n_neighbor: int, alpha: float = 0.5):
    """Strided pooling with neighbour-mean mixing (ref :409-415).
    Returns (new_xyz, new_feats)."""
    m = -(-xyz.shape[1] // stride)
    idx = furthest_point_sampling(xyz, m)
    new_xyz = gather_points(xyz, idx)
    centre_feats = jnp.take_along_axis(feats, idx[..., None, None], axis=1)
    nidx = ball_query(new_xyz, xyz, radius, n_neighbor)
    nbr = group_points(feats, nidx)
    return new_xyz, alpha * centre_feats + (1.0 - alpha) * nbr.mean(2)


def anchor_interp_weights(anchor_in: jnp.ndarray, anchor_out: jnp.ndarray,
                          k: int = 3, sigma: float = 1e-1):
    """kNN inverse-distance weights between anchor sets (ref :610-641).
    Returns (idx [A_out, k], w [A_out, k])."""
    d2 = pairwise_sqdist(anchor_out[None], anchor_in[None])[0]
    neg, idx = jax.lax.top_k(-d2, k)
    inv = 1.0 / (sigma * (-neg) + 1e-6)
    w = inv / jnp.sum(inv, axis=-1, keepdims=True)
    return idx.astype(jnp.int32), w


def anchor_prop(feats: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray):
    """Propagate anchor-axis features to a new anchor set
    (ref :644-655): feats [..., A_in, C] -> [..., A_out, C]."""
    gathered = feats[..., idx, :]                   # [..., A_out, k, C]
    return jnp.sum(gathered * w[..., None], axis=-2)


class IntraSO3Conv2D(nn.Module):
    """Intra conv over product anchors (60 spatial x 4 azimuthal): gathers
    spatial-group neighbours while carrying the azimuthal axis along
    (ref IntraSO3Conv2D + intra_so3conv_grouping_2D)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: SpherePoints) -> SpherePoints:
        B, N, At, C = x.feats.shape
        A2 = 4
        A = At // A2
        trace_idx = so3g.TRACE_IDX
        K = trace_idx.shape[1]
        f = x.feats.reshape(B, N, A, A2, C)
        W = self.param("W", _so3conv_kernel_init, (K, C, self.dim_out))
        out = None
        for k in range(K):
            gk = f[:, :, trace_idx[:, k]]           # [B, N, A, A2, C]
            term = jnp.einsum("bnazc,cd->bnazd", gk, W[k])
            out = term if out is None else out + term
        return SpherePoints(x.xyz, out.reshape(B, N, At, self.dim_out), x.pose)
