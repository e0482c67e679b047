"""Invariant-feature output blocks (mask-aware, fixed-shape).

TPU re-design of the reference's out-blocks
(``SPConvNets/utils/base_so3conv.py:842-1205``): the reference gathers a
variable-size point subset per slot then pools; we keep full fixed shapes and
use the mask semantics the reference itself defines in its ``WithMask``
variants (zeroed features + mean/max with mask).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geom import so3 as so3g
from .containers import SpherePoints
from .norm import EquivNorm

NEG_INF = -1e9


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int):
    """Weighted mean over ``axis``; mask broadcast against x (or None)."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.clip(jnp.sum(mask, axis=axis), 1e-8)
    return num / den


class _SplitConcatDense(nn.Module):
    """``nn.Dense(d)(concat([a, b], -1))`` computed as two matmuls over
    slices of one kernel — avoids materialising the concat (and, for a
    trailing-dim-3 ``b``, its 128-lane padding).  Parameter names, shapes and
    initialisation match nn.Dense on the concatenated input exactly."""

    features: int

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        Ca, Cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (Ca + Cb, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        k = kernel.astype(a.dtype)
        return (
            jnp.einsum("...c,cd->...d", a, k[:Ca])
            + jnp.einsum("...c,cd->...d", b, k[Ca:])
            + bias.astype(a.dtype)
        )


class PointnetSO3Conv(nn.Module):
    """Anchor-wise PointNet embed: concat features with per-anchor rotated
    (relative) coordinates, then a 1x1 conv
    (ref ``so3conv/modules.py:376-413`` and ``PointnetSO3ConvOurs``,
    ``base_so3conv.py:1153+``)."""

    dim_out: int
    kanchor: int = 60
    use_abs_pos: bool = False

    @nn.compact
    def __call__(
        self, x: SpherePoints, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        feats, xyz = x.feats, x.xyz  # [B,N,A,C], [B,N,3]
        A = feats.shape[2]
        if not self.use_abs_pos:
            centroid = masked_mean(
                xyz, None if mask is None else mask[..., None], axis=1
            )
            xyz = xyz - centroid[:, None]
        anchors = jnp.asarray(so3g.get_anchors(self.kanchor))
        if A == 1:
            xyzr = xyz[:, :, None, :]
        else:
            # R_a^T x  per anchor (ref einsum 'aji,bjn->bina')
            xyzr = jnp.einsum("aji,bnj->bnai", anchors, xyz)
        # Dense over concat(feats, xyzr) WITHOUT materialising the concat:
        # the [.., A, 3] xyzr tensor tiles terribly on TPU (trailing dim 3
        # pads to the 128-lane register, a 42x HBM expansion observed at
        # A=240) — so split the kernel and sum the two matmuls instead.
        # Same parameters (name path Dense_0/{kernel,bias}, same shapes and
        # init) and same math as nn.Dense(dim_out)(concat(feats, xyzr)).
        return _SplitConcatDense(self.dim_out, name="Dense_0")(
            feats, xyzr.astype(feats.dtype)
        )


class InvOutBlock(nn.Module):
    """Mask-aware invariant feature (ref ``InvOutBlockOursWithMask``,
    ``base_so3conv.py:1013-1152``).

    Returns (inv_feat [B, C], anchor_logits [B, A]) — plus the per-anchor
    pooled feature [B, A, C] when ``return_point_pooling_feature``.
    """

    mlp: Sequence[int]
    temperature: float = 3.0
    pooling: str = "attention"   # 'attention' | 'max' | 'mean'
    use_pointnet: bool = True
    use_abs_pos: bool = False
    return_point_pooling_feature: bool = False
    norm: str = "batch"
    axis_name: Optional[str] = None
    # take anchor ``sel_mode``'s pooled equivariant feature as the "invariant"
    # output instead of pooling over anchors (ref --sel-mode, the eyeglasses
    # recipe passes 29; ``unsup_..._35:571-575,673-675``)
    sel_mode: Optional[int] = None

    @nn.compact
    def __call__(self, x: SpherePoints, mask: Optional[jnp.ndarray] = None):
        h = x.feats
        if mask is not None:
            h = h * mask[:, :, None, None]
        for i, c in enumerate(self.mlp):
            h = nn.Dense(c)(h)
            h = EquivNorm(kind=self.norm, axis_name=self.axis_name)(h)
            h = jax.nn.relu(h)
        if mask is not None:
            h = h * mask[:, :, None, None]

        if self.use_pointnet:
            pn = PointnetSO3Conv(
                dim_out=self.mlp[-1],
                kanchor=h.shape[2],
                use_abs_pos=self.use_abs_pos,
            )(SpherePoints(x.xyz, h, None), mask)
            # ref divides by N (plain mean of zeroed feats), keep that
            pooled = jnp.mean(pn, axis=1)  # [B, A, C]
            pooled = EquivNorm(kind=self.norm, axis_name=self.axis_name)(pooled)
            pooled = jax.nn.relu(pooled)
        else:
            pooled = jnp.mean(h, axis=1)

        if self.sel_mode is not None:
            inv = pooled[:, self.sel_mode]
            logits = jnp.zeros(pooled.shape[:2], pooled.dtype)
        elif self.pooling == "attention":
            logits = nn.Dense(1)(pooled)[..., 0]  # [B, A]
            conf = jax.nn.softmax(logits * self.temperature, axis=-1)
            inv = jnp.sum(pooled * conf[..., None], axis=1)  # [B, C]
        elif self.pooling == "max":
            inv = jnp.max(pooled, axis=1)
            logits = jnp.zeros(pooled.shape[:2], pooled.dtype)
        else:
            inv = jnp.mean(pooled, axis=1)
            logits = jnp.zeros(pooled.shape[:2], pooled.dtype)

        if self.return_point_pooling_feature:
            return pooled, inv, logits
        return inv, logits


class InvPPOutBlock(nn.Module):
    """Per-point invariant feature via attention pooling over anchors
    (ref ``InvPPOutBlockOurs``, ``base_so3conv.py:842-917``).

    Returns (ppinv [B, N, C], confidence [B, N, A]).
    """

    mlp: Sequence[int]
    temperature: float = 3.0
    pooling: str = "attention"
    sel_mode: Optional[int] = None
    norm: str = "batch"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SpherePoints, sel_mode_new: Optional[jnp.ndarray] = None):
        h = x.feats
        for c in self.mlp:
            h = nn.Dense(c)(h)
            h = EquivNorm(kind=self.norm, axis_name=self.axis_name)(h)
            h = jax.nn.relu(h)
        if sel_mode_new is not None:
            # sel_mode_new: [B] anchor index per sample
            out = jnp.take_along_axis(
                h, sel_mode_new[:, None, None, None], axis=2
            )[:, :, 0]
            return out, jnp.zeros(h.shape[:3], h.dtype)
        if self.sel_mode is not None:
            return h[:, :, self.sel_mode], jnp.zeros(h.shape[:3], h.dtype)
        if self.pooling == "attention":
            logits = nn.Dense(1)(h)[..., 0]  # [B, N, A]
            conf = jax.nn.softmax(logits * self.temperature, axis=-1)
            out = jnp.sum(h * conf[..., None], axis=2)  # [B, N, C]
            return out, conf
        if self.pooling == "max":
            return jnp.max(h, axis=2), jnp.zeros(h.shape[:3], h.dtype)
        return jnp.mean(h, axis=2), jnp.zeros(h.shape[:3], h.dtype)
