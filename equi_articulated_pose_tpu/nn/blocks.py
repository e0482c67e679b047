"""Composite equivariant conv blocks + backbone builder.

Mirrors the reference's block zoo (``SPConvNets/utils/base_so3poseconv.py``):
InterSO3ConvBlock (conv+norm+act), SeparableSO3ConvBlock (inter + intra with a
1x1-conv skip), and the backbone constructed from a nested param list
(``build_model``, ``unsup_..._40:3387-3650``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .containers import SpherePoints
from .norm import EquivNorm
from .so3conv import InterSO3Conv, IntraSO3Conv
from ..ops.sampling import ball_query, gather_points, group_points


def _act(name: str):
    return {
        "relu": jax.nn.relu,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "gelu": jax.nn.gelu,
        None: lambda x: x,
    }[name]


@dataclasses.dataclass(frozen=True)
class ConvBlockSpec:
    """One conv layer spec (analog of the reference's conv_param dict)."""

    block_type: str            # 'inter_block' | 'separable_block'
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    kanchor: int = 60
    activation: str = "leaky_relu"
    norm: str = "batch"
    use_pose: bool = True
    permute_modes: int = 1
    chunk_a: int = 0
    compute_dtype: str = "float32"
    fused: bool = False         # fused Pallas inter-conv (identity-perm path)
    fused_bwd: bool = False     # fully-fused Pallas backward for the inter conv
    use_2d: bool = False        # product anchors (60x4 azimuthal) variant
    remat_chunks: bool = True   # remat the anchor-chunk loop in backward


class InterSO3ConvBlock(nn.Module):
    spec: ConvBlockSpec
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SpherePoints, seg=None, grouping=None) -> SpherePoints:
        s = self.spec
        y = InterSO3Conv(
            dim_out=s.dim_out,
            kernel_size=s.kernel_size,
            stride=s.stride,
            radius=s.radius,
            sigma=s.sigma,
            n_neighbor=s.n_neighbor,
            kanchor=s.kanchor,
            use_pose=s.use_pose,
            permute_modes=s.permute_modes,
            chunk_a=s.chunk_a,
            compute_dtype=s.compute_dtype,
            fused=s.fused,
            fused_bwd=s.fused_bwd,
            remat_chunks=s.remat_chunks,
        )(x, seg, grouping)
        f = EquivNorm(kind=s.norm, axis_name=self.axis_name)(y.feats)
        f = _act(s.activation)(f)
        return SpherePoints(y.xyz, f, y.pose)


class SeparableSO3ConvBlock(nn.Module):
    """inter conv -> intra conv, plus 1x1 skip (ref
    ``base_so3poseconv.py:270-331``)."""

    spec: ConvBlockSpec
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SpherePoints, seg=None, grouping=None) -> SpherePoints:
        s = self.spec
        skip_in = x.feats
        y = InterSO3ConvBlock(spec=s, axis_name=self.axis_name)(x, seg, grouping)
        if s.use_2d:
            from .extras import IntraSO3Conv2D

            z = IntraSO3Conv2D(dim_out=s.dim_out)(y)
            f = EquivNorm(kind=s.norm, axis_name=self.axis_name)(z.feats)
            f = _act(s.activation)(f)
        elif s.kanchor > 1 and s.kanchor != 240:
            z = IntraSO3Conv(dim_out=s.dim_out, compute_dtype=s.compute_dtype)(y)
            f = EquivNorm(kind=s.norm, axis_name=self.axis_name)(z.feats)
            f = _act(s.activation)(f)
        else:
            f = y.feats
        if s.stride > 1:
            # skip features at the sampled centres: recompute sampling is
            # avoided by matching count via nearest original indices — the
            # strided InterSO3Conv already carries sampled xyz; for skip we
            # simply subsample deterministically with the same FPS.
            from ..ops.sampling import furthest_point_sampling

            m = int(math.ceil(x.xyz.shape[1] / s.stride))
            idx = furthest_point_sampling(x.xyz, m)
            skip_in = jnp.take_along_axis(skip_in, idx[..., None, None], axis=1)
        skip = nn.Dense(s.dim_out, name="skip")(skip_in)
        skip = EquivNorm(kind=s.norm, axis_name=self.axis_name, name="skip_norm")(skip)
        skip = _act(s.activation)(skip)
        return SpherePoints(y.xyz, f + skip, y.pose)


class SO3Backbone(nn.Module):
    """Sequence of conv blocks (the reference's BasicSO3PoseConvBlock list)."""

    specs: Sequence[ConvBlockSpec]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: SpherePoints, seg=None, groupings=None) -> SpherePoints:
        for i, s in enumerate(self.specs):
            cls = SeparableSO3ConvBlock if s.block_type == "separable_block" else InterSO3ConvBlock
            g = groupings[i] if groupings is not None else None
            x = cls(spec=s, axis_name=self.axis_name, name=f"block{i}")(x, seg, g)
        return x


def precompute_groupings(xyz: jnp.ndarray, specs: Sequence[ConvBlockSpec]):
    """Feature-independent neighbourhood work for a stride-1 backbone, shared
    across towers (OPTIMIZATION.md roadmap #3): both the slot tower and the
    segmentation tower ball-query the SAME cloud at the SAME radii, so the
    (ball_idx, grouped_xyz) pair per layer can be computed once and fed to
    both ``SO3Backbone`` calls.  Layers with identical (radius, n_neighbor)
    also share with each other.  Returns one entry per spec."""
    cache: dict = {}
    out = []
    for s in specs:
        if s.stride != 1:
            out.append(None)
            continue
        key = (float(s.radius), int(s.n_neighbor))
        if key not in cache:
            bi = ball_query(xyz, xyz, s.radius, s.n_neighbor)
            gx = group_points(xyz, bi) - xyz[:, :, None, :]
            cache[key] = (bi, gx)
        out.append(cache[key])
    return tuple(out)


def make_backbone_specs(
    mlps: Sequence[Sequence[int]],
    *,
    kanchor: int = 60,
    input_num: int = 512,
    initial_radius_ratio: float = 0.2,
    input_radius: float = 0.4,
    sigma_ratio: float = 0.5,
    strides: Sequence[int] = (2, 2, 2, 2),
    n_neighbor: int = 32,
    use_pose: bool = True,
    permute_modes: int = 1,
    norm: str = "batch",
    chunk_a: int = 0,
    compute_dtype: str = "float32",
    fused: bool = False,
    fused_bwd: bool = False,
    use_2d: bool = False,
    remat_chunks: bool = True,
) -> list[ConvBlockSpec]:
    """Reproduce the radius/sigma ladder of ``build_model``
    (ref ``unsup_..._40:3387-3582``).  Note the reference force-overrides
    inter_stride to 1 (line 3518), so point count is constant through the
    backbone; we keep that behaviour.
    """
    stride_current = 1
    multipliers = [stride_current]
    for s in strides[: len(mlps)]:
        stride_current *= s
        multipliers.append(stride_current)
    radius_ratio = [initial_radius_ratio * m ** 0.5 for m in multipliers]
    radii = [r * input_radius for r in radius_ratio]
    sigmas = [sigma_ratio * radii[0] ** 2]
    for s in strides[: len(mlps)]:
        sigmas.append(sigmas[-1] * s)

    if use_2d:
        kanchor = 240
        use_pose = False
    block_type = "separable_block" if kanchor >= 60 else "inter_block"
    specs = []
    for i, block in enumerate(mlps):
        for j, dim_out in enumerate(block):
            nidx = i if (j == 0 and i == 0) else (i + 1 if j == 0 else i + 1)
            neighbor = n_neighbor * 2 if j == 0 else n_neighbor
            specs.append(
                ConvBlockSpec(
                    block_type=block_type,
                    dim_out=dim_out,
                    kernel_size=1,
                    stride=1,  # ref hard-codes inter_stride = 1
                    radius=radii[nidx],
                    sigma=sigmas[nidx],
                    n_neighbor=neighbor,
                    kanchor=kanchor,
                    use_pose=use_pose,
                    permute_modes=permute_modes,
                    norm=norm,
                    chunk_a=chunk_a,
                    compute_dtype=compute_dtype,
                    fused=fused,
                    fused_bwd=fused_bwd,
                    use_2d=use_2d,
                    remat_chunks=remat_chunks,
                )
            )
    return specs
