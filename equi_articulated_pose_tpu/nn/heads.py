"""SO(3) pose-regression heads over the anchor orbit.

Re-design of the reference's RT out-blocks
(``SPConvNets/models/model_utils.py``: SO3OutBlockRTWithMask :208,
SO3OutBlockRTWithMaskSep :340-680, SO3OutBlockRTWithAxisWithMask :682 for
prismatic joints): per-anchor quaternion (or angle / axis-distance) regression
plus a dense per-point translation with a global scalar norm, aggregated with
the slot mask.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .containers import SpherePoints
from .norm import EquivNorm
from .outblocks import masked_mean

NEG_INF = -1e9


class _Tower(nn.Module):
    """Head MLP tower.  Leaky ReLU instead of the reference's ReLU: with a
    masked input (empty/small slots) the all-ReLU tower was observed to die
    completely during training (pooled features exactly 0 => residual quats
    collapse to identity and the axis head to zero); the leak keeps gradients
    alive."""

    mlp: Sequence[int]
    norm: str = "batch"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, h):
        for c in self.mlp:
            h = nn.Dense(c)(h)
            h = EquivNorm(kind=self.norm, axis_name=self.axis_name)(h)
            h = jax.nn.leaky_relu(h, 0.01)
        return h


def _masked_max_points(h: jnp.ndarray, mask: Optional[jnp.ndarray]):
    """max over the point axis.  The reference zero-fills masked entries and
    relies on ReLU non-negativity (model_utils.py:494-500); with leaky
    activations we mask with -inf and fall back to 0 for empty slots."""
    if mask is None:
        return jnp.max(h, axis=1)  # [B, A, C]
    m = mask[:, :, None, None] > 0.5
    out = jnp.max(jnp.where(m, h, NEG_INF), axis=1)
    nonempty = jnp.any(m, axis=1)
    return jnp.where(nonempty, out, 0.0)


class SO3PoseHead(nn.Module):
    """Separate rotation/translation towers (ref SO3OutBlockRTWithMaskSep).

    Inputs:
      x           — SpherePoints with backbone feats [B, N, A, C]
      mask        — [B, N] hard slot mask (or None for global heads)
      trans_feats — features for the translation tower (default: x.feats)
    Returns dict with:
      'R'    — [B, A, rot_dim]  (quat: 4, angle: 1, trans_axis: 1)
      'T'    — [B, A, 3]        (already offset by masked point centroid)
      'axis' — [B, A, 3]        (unit axis per anchor) when pred_axis
      'pv'   — [B, A, 3], 'central' — [B, A, 3] when pred_pv_points
    """

    mlp: Sequence[int]
    representation: str = "quat"      # 'quat' | 'angle'
    pred_t: bool = True
    pred_axis: bool = False
    pred_pv_points: bool = False
    pooling: str = "max"
    norm: str = "batch"
    axis_name: Optional[str] = None
    global_scalar: bool = True
    use_offset: bool = True
    # spherical-cap axis parameterisation (--mtx-based-axis-regression, the
    # eyeglasses recipe): azimuth alpha in [0, 2pi), elevation within
    # max_axis_angle of +y (ref model_utils.py:593-630)
    mtx_axis: bool = False
    max_axis_angle_deg: float = 45.0

    @nn.compact
    def __call__(
        self,
        x: SpherePoints,
        mask: Optional[jnp.ndarray] = None,
        trans_feats: Optional[jnp.ndarray] = None,
        anchors: Optional[jnp.ndarray] = None,
    ):
        feats = x.feats
        if mask is not None:
            feats = feats * mask[:, :, None, None]
        shared = _Tower(self.mlp, self.norm, self.axis_name, name="rot_tower")(feats)
        pooled = _masked_max_points(shared, mask)  # [B, A, C]

        out = {}
        rot_dim = {"quat": 4, "angle": 1}[self.representation]
        out["R"] = nn.Dense(rot_dim, name="rot_reg")(pooled)  # [B, A, rot_dim]

        if self.pred_axis:
            from ..geom.so3 import safe_normalize

            if self.mtx_axis:
                ab = jax.nn.sigmoid(nn.Dense(2, name="axis_reg")(pooled))
                alpha, beta = ab[..., 0], ab[..., 1]
                mx = self.max_axis_angle_deg
                elev = (mx / 180.0) * beta * jnp.pi + (
                    (90.0 - mx) / 180.0
                ) * jnp.pi
                xz = jnp.cos(elev)
                out["axis"] = jnp.stack(
                    [
                        jnp.cos(alpha * 2.0 * jnp.pi) * xz,
                        jnp.sin(elev),
                        jnp.sin(alpha * 2.0 * jnp.pi) * xz,
                    ],
                    axis=-1,
                )
            else:
                out["axis"] = safe_normalize(nn.Dense(3, name="axis_reg")(pooled))

        if self.pred_pv_points:
            pv = jax.nn.sigmoid(nn.Dense(3, name="pv_reg")(pooled)) - 0.5
            cp = jax.nn.sigmoid(nn.Dense(3, name="central_reg")(pooled)) - 0.5
            out["pv"], out["central"] = pv, cp

        if self.pred_t:
            tf = x.feats if trans_feats is None else trans_feats
            if mask is not None:
                tf = tf * mask[:, :, None, None]
            tsh = _Tower(self.mlp, self.norm, self.axis_name, name="trans_tower")(tf)
            tpool = _masked_max_points(tsh, mask)  # [B, A, C]
            # dense per-point direction (ref regressor_dense_layer :459-462)
            h = jnp.concatenate(
                [jnp.broadcast_to(tpool[:, None], tsh.shape), tsh], axis=-1
            )
            h = nn.Dense(self.mlp[-1], name="tdense0")(h)
            h = EquivNorm(kind=self.norm, axis_name=self.axis_name)(h)
            h = jax.nn.leaky_relu(h, 0.01)
            tdir = nn.Dense(3, name="tdense1")(h)  # [B, N, A, 3]
            if self.global_scalar:
                from ..geom.so3 import safe_normalize

                # scalar per point from anchor-max features (ref :539-541)
                scal = nn.Dense(1, name="tscalar")(jnp.max(tsh, axis=2))  # [B,N,1]
                tdir = safe_normalize(tdir) * scal[:, :, None, :]
            y_t = tdir
            if self.use_offset:
                y_t = y_t + x.xyz[:, :, None, :]
            m = None if mask is None else mask[:, :, None, None]
            out["T"] = masked_mean(y_t, m, axis=1)  # [B, A, 3]
        return out


class SO3PrismaticHead(nn.Module):
    """Translation-only head for prismatic joints (drawer): per-anchor signed
    distance along a predicted (or defined) axis
    (ref SO3OutBlockRTWithAxisWithMask, ``model_utils.py:682+``)."""

    mlp: Sequence[int]
    norm: str = "batch"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: SpherePoints,
        mask: Optional[jnp.ndarray] = None,
        proj_axis: Optional[jnp.ndarray] = None,
    ):
        feats = x.feats
        if mask is not None:
            feats = feats * mask[:, :, None, None]
        shared = _Tower(self.mlp, self.norm, self.axis_name)(feats)
        pooled = _masked_max_points(shared, mask)  # [B, A, C]
        from ..geom.so3 import safe_normalize

        ax = safe_normalize(nn.Dense(3, name="axis_reg")(pooled))
        if proj_axis is not None:
            ax = jnp.broadcast_to(proj_axis[None, None], ax.shape)
        dist = nn.Dense(1, name="dist_reg")(pooled)  # [B, A, 1]
        return {
            "axis": ax,
            "T": ax * dist,
            "R": jnp.zeros(pooled.shape[:2] + (4,), pooled.dtype)
            .at[..., 0]
            .set(1.0),
        }
