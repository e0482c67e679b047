"""SO(3)-equivariant point convolutions over the 60-anchor icosahedral orbit.

TPU-first re-design of the reference's EPN/ZPConv stack:

* the CUDA gather/accumulate kernels (N7/N8 in SURVEY.md) and their einsum
  fallbacks (``spconv/functional.py:375-406``, ``so3conv/functional.py``)
  become two MXU matmuls — a neighbourhood contraction and a kernel-point
  contraction — with optional anchor chunking to bound HBM footprint;
* the relative-pose "rotated anchor argmax-trace" permutation
  (``so3conv/functional.py:1193-1244``) is done by snapping the relative
  rotation to the nearest group element and using the precomputed group
  multiplication table — O(A) instead of O(A^2) per neighbour, and exactly
  equal to the reference's argmax whenever the relative rotation lies in the
  snapped element's Voronoi cell (always true in the shipped configs where
  pose == identity);
* intra (rotation-group) convolution is a static gather through TRACE_IDX
  followed by one matmul.

Feature layout is channels-last: feats [B, N, A, C].
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geom import so3 as so3g
from ..geom.kernels import KERNEL_CONDENSE_RATIO, spherical_kernel_points
from ..ops.sampling import ball_query, furthest_point_sampling, gather_points, group_points
from .containers import SpherePoints
from .norm import EquivNorm


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------

def inter_kernel_weights(
    grouped_xyz: jnp.ndarray,   # [B, M, nn, 3] relative offsets
    anchors: jnp.ndarray,       # [A, 3, 3]
    kernels: jnp.ndarray,       # [ks, 3]
    sigma: float,
) -> jnp.ndarray:
    """Linear kernel-point weights w[b, m, a, k, n] = relu(1 - d^2/sigma)
    where d = || gx[b,m,n] - R_a kappa_k ||  (ref
    ``so3conv/functional.py:2508-2549``)."""
    gx = grouped_xyz.astype(jnp.float32)
    rk = jnp.einsum("aij,kj->aki", anchors, kernels)  # [A, ks, 3]
    gx2 = jnp.sum(gx * gx, axis=-1)[:, :, None, None, :]        # [B,M,1,1,nn]
    rk2 = jnp.sum(rk * rk, axis=-1)[None, None, :, :, None]     # [1,1,A,ks,1]
    cross = jnp.einsum(
        "bmnc,akc->bmakn", gx, rk, preferred_element_type=jnp.float32
    )
    d2 = gx2 + rk2 - 2.0 * cross
    return jax.nn.relu(1.0 - d2 / sigma)


def intra_group_gather(feats: jnp.ndarray, trace_idx: jnp.ndarray) -> jnp.ndarray:
    """feats [B, N, A, C], trace_idx [A, K] -> grouped [B, N, A, K, C]
    (ref ``so3conv/functional.py:2553-2602``)."""
    B, N, A, C = feats.shape
    K = trace_idx.shape[1]
    flat = feats[:, :, trace_idx.reshape(-1), :]  # [B, N, A*K, C]
    return flat.reshape(B, N, A, K, C)


def intra_conv_accumulate(
    feats: jnp.ndarray, trace_idx: jnp.ndarray, W: jnp.ndarray, cdt=jnp.float32
) -> jnp.ndarray:
    """Intra conv without materialising the [B, N, A, K, C] gather: accumulate
    over the K=12 group-adjacent anchors — per step one static anchor
    permutation + one MXU matmul.  Peak memory [B, N, A, max(C, D)]."""
    out = None
    fc = feats  # gather in native dtype (bf16 gathers measured slower on v5e)
    for k in range(trace_idx.shape[1]):
        gk = fc[:, :, trace_idx[:, k], :].astype(cdt)  # [B, N, A, C]
        term = jnp.einsum(
            "bnac,cd->bnad", gk, W[k].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out


def gather_neighbors_anchors(
    feats: jnp.ndarray,       # [B, N, A, C]
    ball_idx: jnp.ndarray,    # [B, M, nn]
    anchor_idx: jnp.ndarray,  # [B, M, nn, Ac] source anchor per output anchor
) -> jnp.ndarray:
    """Fused (neighbour, anchor) gather -> [B, M, nn, Ac, C] via one flat
    take_along_axis over the combined (N*A) axis — lets callers chunk the
    anchor axis WITHOUT ever materialising the full [B, M, nn, A, C]."""
    B, N, A, C = feats.shape
    _, M, nn = ball_idx.shape
    Ac = anchor_idx.shape[-1]
    flat_src = feats.reshape(B, N * A, C)
    flat_idx = (ball_idx[..., None] * A + anchor_idx).reshape(B, M * nn * Ac)
    out = jnp.take_along_axis(flat_src, flat_idx[..., None], axis=1)
    return out.reshape(B, M, nn, Ac, C)


def snap_rel_rotation_perm(
    rel_rots: jnp.ndarray,      # [..., 3, 3] relative rotations
    anchors: jnp.ndarray,       # [A, 3, 3] (must be the full group for table use)
    prod_idx: jnp.ndarray,      # [A, A] group multiplication table
    inv_idx: jnp.ndarray,       # [A]
) -> jnp.ndarray:
    """Anchor permutation induced by a relative rotation.

    perm[..., a] = idx( rel^T @ R_a ) computed by snapping rel to its nearest
    group element g and reading PROD_IDX[INV(g), a].  Equivalent to the
    reference's per-(neighbour, anchor) argmax over all 60 anchors
    (``so3conv/functional.py:1199-1204``) at O(A) instead of O(A^2).
    """
    g = so3g.nearest_anchor_idx(rel_rots, anchors)          # [...]
    return prod_idx[inv_idx[g]]                              # [..., A]


def inter_conv_contract(
    grouped_feats: jnp.ndarray,  # [B, M, nn, A, C]
    weights: jnp.ndarray,        # [B, M, A, ks, nn]
    W: jnp.ndarray,              # [ks, C, D]
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Two-matmul contraction: neighbours then kernel points -> [B, M, A, D]."""
    gf = grouped_feats.astype(compute_dtype)
    w = weights.astype(compute_dtype)
    # [B, M, A, ks, C] — batched matmul over (B, M, A): [ks, nn] @ [nn, C]
    acc = jnp.einsum("bmakn,bmnac->bmakc", w, gf, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "bmakc,kcd->bmad", acc, W.astype(compute_dtype), preferred_element_type=jnp.float32
    )
    return out


def inter_conv_apply(
    feats: jnp.ndarray,          # [B, N, A, C] support features
    ball_idx: jnp.ndarray,       # [B, M, nn]
    weights: jnp.ndarray,        # [B, M, A, ks, nn]
    W: jnp.ndarray,              # [ks, C, D]
    anchor_perm: Optional[jnp.ndarray] = None,  # [B, M, nn, A] or None
    chunk_a: int = 0,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Gather + contract.  ``chunk_a`` > 0 processes the anchor axis in chunks
    (checkpointed lax.map) to bound the [B, M, nn, A, C] intermediate."""
    B, N, A, C = feats.shape
    grouped = group_points(feats, ball_idx)  # [B, M, nn, A, C]
    if anchor_perm is not None:
        grouped = jnp.take_along_axis(
            grouped, anchor_perm[..., None], axis=3
        )
    if chunk_a and A > chunk_a and A % chunk_a == 0:
        n_chunks = A // chunk_a
        gf = grouped.reshape(*grouped.shape[:3], n_chunks, chunk_a, C)
        gf = jnp.moveaxis(gf, 3, 0)                     # [nc, B, M, nn, ca, C]
        wts = weights.reshape(B, weights.shape[1], n_chunks, chunk_a, *weights.shape[3:])
        wts = jnp.moveaxis(wts, 2, 0)                   # [nc, B, M, ca, ks, nn]
        f = jax.checkpoint(lambda g, w: inter_conv_contract(g, w, W, compute_dtype))
        out = jax.lax.map(lambda gw: f(gw[0], gw[1]), (gf, wts))
        return jnp.moveaxis(out, 0, 2).reshape(B, weights.shape[1], A, W.shape[-1])
    return inter_conv_contract(grouped, weights, W, compute_dtype)


# ---------------------------------------------------------------------------
# Flax modules
# ---------------------------------------------------------------------------

def _so3conv_kernel_init(key, shape, dtype=jnp.float32):
    """Xavier-normal over (fan_in = ks*C, fan_out = D), relu gain — matches
    BasicSO3Conv init (ref ``so3conv/modules.py:35-39``)."""
    ks, c, d = shape
    gain = math.sqrt(2.0)
    std = gain * math.sqrt(2.0 / (ks * c + d))
    return jax.random.normal(key, shape, dtype) * std


class SO3Linear(nn.Module):
    """The learned conv weight: [B, N, A, K, C] -> [B, N, A, D]
    (ref BasicSO3Conv, ``so3conv/modules.py:21-55``)."""

    dim_out: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K, C = x.shape[-2], x.shape[-1]
        assert K == self.kernel_size
        W = self.param("W", _so3conv_kernel_init, (K, C, self.dim_out))
        return jnp.einsum("...kc,kcd->...d", x, W, preferred_element_type=jnp.float32)


class InterSO3Conv(nn.Module):
    """Inter-point SO(3) conv (ref InterSO3Conv / InterSO3PoseConv,
    ``so3conv/modules.py:125-322``).

    stride > 1 subsamples centers by FPS.  With ``use_pose`` the neighbour
    features are permuted along the anchor axis by the relative pose rotation
    (part-level equivariance; ref ``inter_so3poseconv_grouping_strided``).
    """

    dim_out: int
    kernel_size: int            # 1|2|3 -> 24|30|66 kernel points
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    kanchor: int = 60
    use_pose: bool = False
    permute_modes: int = 1
    chunk_a: int = 0
    compute_dtype: str = "float32"
    fused: bool = False        # fused Pallas kernel (identity-perm path only)
    fused_bwd: bool = False    # fully-fused Pallas backward kernels
    # rematerialise chunk bodies in the backward pass; False keeps the chunk
    # activations resident instead (fewer executed ops, more HBM) — the right
    # trade when per-op overhead dominates (OPTIMIZATION.md degraded mode)
    remat_chunks: bool = True

    @nn.compact
    def __call__(
        self,
        x: SpherePoints,
        seg: Optional[jnp.ndarray] = None,
        grouping: Optional[tuple] = None,
    ) -> SpherePoints:
        """``seg`` [B, N] enables art-mode grouping: neighbours from OTHER
        parts contribute their neighbourhood max-pooled feature instead of
        their own (ref ``inter_so3poseconv_grouping_strided_arti_mode``,
        ``so3conv/functional.py:2434-2442``).

        ``grouping`` = (ball_idx [B,M,nn], grouped_xyz [B,M,nn,3]) precomputed
        for this layer's (radius, n_neighbor) on the SAME cloud — lets callers
        share the feature-independent neighbourhood work across towers
        (OPTIMIZATION.md roadmap #3).  Stride-1 only."""
        xyz, feats, pose = x.xyz, x.feats, x.pose
        B, N, A, C = feats.shape
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        kernels = jnp.asarray(
            spherical_kernel_points(KERNEL_CONDENSE_RATIO * self.radius, self.kernel_size)
        )
        anchors = jnp.asarray(so3g.get_anchors(self.kanchor))
        ks = kernels.shape[0]
        # the conv weight, captured as a VALUE so the checkpointed chunk loop
        # below never creates params inside a remat trace
        W = self.param("W", _so3conv_kernel_init, (ks, C, self.dim_out))

        if self.stride > 1:
            m = int(math.ceil(N / self.stride))
            samp_idx = furthest_point_sampling(xyz, m)
            new_xyz = gather_points(xyz, samp_idx)
            new_pose = (
                jnp.take_along_axis(pose, samp_idx[..., None, None], axis=1)
                if pose is not None
                else None
            )
        else:
            new_xyz, new_pose = xyz, pose

        if grouping is not None and self.stride == 1:
            ball_idx, grouped_xyz = grouping
        else:
            ball_idx = ball_query(new_xyz, xyz, self.radius, self.n_neighbor)
            grouped_xyz = group_points(xyz, ball_idx) - new_xyz[:, :, None, :]

        anchor_perm = None
        if self.use_pose and pose is not None and self.permute_modes > 0 and self.kanchor == 60:
            # relative rotation from neighbour frame to centre frame
            rot = pose[..., :3, :3]
            g_rot = group_points(rot, ball_idx)                      # [B,M,nn,3,3]
            c_rot = rot if self.stride == 1 else new_pose[..., :3, :3]
            rel = jnp.einsum("bmij,bmnkj->bmnik", c_rot, g_rot)      # R_c R_n^T
            # rotate the relative offsets into the centre frame (ref :942-944)
            grouped_xyz = jnp.einsum("bmnij,bmnj->bmni", rel, grouped_xyz)
            anchor_perm = snap_rel_rotation_perm(
                rel,
                anchors,
                jnp.asarray(so3g.PROD_IDX),
                jnp.asarray(so3g.INV_IDX),
            )

        M = ball_idx.shape[1]

        def contract(g, ww):
            # g [B,M,nn,Ac,C], ww [B,M,Ac,ks,nn] -> [B,M,Ac,D]
            acc = jnp.einsum(
                "bmakn,bmnac->bmakc",
                ww.astype(cdt),
                g.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            return jnp.einsum(
                "bmakc,kcd->bmad", acc, W.astype(cdt),
                preferred_element_type=jnp.float32,
            )

        # NOTE: gathering at bf16 was measured SLOWER on v5e than fp32
        # gathers + post-cast (sublane packing makes 2-byte gathers worse),
        # so features are gathered in their native dtype and cast in contract.
        feats_c = feats

        cross_part = None
        if seg is not None:
            # art-mode indicator: neighbour belongs to a different part.
            # centre seg = seg of the first ball-query hit (the centre itself
            # when query == support, which holds on the stride-1 active path)
            M_ = ball_idx.shape[1]
            nbr_seg = jnp.take_along_axis(
                seg, ball_idx.reshape(B, -1), axis=1
            ).reshape(B, M_, -1)
            centre_seg = nbr_seg[..., 0]
            cross_part = (nbr_seg != centre_seg[..., None])[..., None, None]

        def _artmode(gc):
            if cross_part is None:
                return gc
            pooled = jnp.max(gc, axis=2, keepdims=True)  # over neighbours
            return jnp.where(cross_part, pooled, gc)

        if (
            self.fused
            and anchor_perm is None
            and seg is None
            and jax.default_backend() == "tpu"
        ):
            # fused Pallas path: VMEM-resident anchor-chunked features,
            # on-the-fly kernel weights, one-hot MXU gather
            from ..ops.pallas.interconv import inter_conv_fused

            new_feats = inter_conv_fused(
                feats_c, ball_idx, grouped_xyz, anchors, kernels,
                self.sigma, W,
                chunk_a=self.chunk_a or 12,
                compute_dtype=cdt,
                fused_bwd=self.fused_bwd,
            )
        elif self.chunk_a and A > self.chunk_a and A % self.chunk_a == 0:
            # end-to-end anchor chunking: kernel weights, the fused
            # (neighbour, anchor) gather, and the contraction all live per
            # chunk, so nothing of size [B, M, nn, A, C] is ever resident.
            # The chunks run under a sequential ``lax.map`` (scan), NOT a
            # Python loop: an unrolled loop lets XLA's scheduler keep every
            # chunk's rematted buffers alive simultaneously in the backward
            # pass, defeating the chunking (observed: 240-anchor model OOM
            # with ~20 live [B,M,nn,chunk_a,C] temps).  scan bounds live
            # memory to one chunk body.
            def chunk_fn(sl_anchors, sl_perm):
                if sl_perm.ndim == 1:
                    sl_perm = jnp.broadcast_to(
                        sl_perm, (B, M, self.n_neighbor, self.chunk_a)
                    )
                wc = inter_kernel_weights(grouped_xyz, sl_anchors, kernels, self.sigma)
                gc = _artmode(gather_neighbors_anchors(feats_c, ball_idx, sl_perm))
                return contract(gc, wc)

            if self.remat_chunks:
                chunk_fn = jax.checkpoint(chunk_fn)
            n_chunks = A // self.chunk_a
            anchors_st = anchors.reshape(n_chunks, self.chunk_a, 3, 3)
            if anchor_perm is not None:
                perm_st = jnp.moveaxis(
                    anchor_perm.reshape(B, M, self.n_neighbor, n_chunks, self.chunk_a),
                    3, 0,
                )  # [n_chunks, B, M, nn, chunk_a]
            else:
                perm_st = jnp.arange(A, dtype=jnp.int32).reshape(
                    n_chunks, self.chunk_a
                )
            outs = jax.lax.map(
                lambda t: chunk_fn(*t), (anchors_st, perm_st)
            )  # [n_chunks, B, M, chunk_a, D]
            new_feats = jnp.moveaxis(outs, 0, 2).reshape(B, M, A, self.dim_out)
        else:
            w = inter_kernel_weights(grouped_xyz, anchors, kernels, self.sigma)
            if anchor_perm is not None:
                grouped = gather_neighbors_anchors(feats_c, ball_idx, anchor_perm)
            else:
                grouped = group_points(feats_c, ball_idx)
            new_feats = contract(_artmode(grouped), w)
        return SpherePoints(new_xyz, new_feats, new_pose)


class IntraSO3Conv(nn.Module):
    """Rotation-group conv over the 12 SO(3)-adjacent anchors
    (ref IntraSO3Conv, ``so3conv/modules.py:325-347``).

    Implemented as a K-step accumulation (static anchor permutation + MXU
    matmul per step) — never materialises the [B, N, A, 12, C] gather."""

    dim_out: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: SpherePoints) -> SpherePoints:
        trace_idx = so3g.TRACE_IDX
        C = x.feats.shape[-1]
        K = trace_idx.shape[1]
        W = self.param("W", _so3conv_kernel_init, (K, C, self.dim_out))
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        out = intra_conv_accumulate(x.feats, trace_idx, W, cdt)
        return SpherePoints(x.xyz, out, x.pose)
