"""Fused Pallas inter-SO(3)-conv kernel (OPTIMIZATION.md roadmap #1).

The XLA path materialises two HBM giants per layer — the (neighbour, anchor)
feature gather [B, M, nn, A, C] and the kernel-weight tensor
[B, M, A, ks, nn] — making the conv HBM-bandwidth bound (round-1 profile).
This kernel keeps an anchor-chunked feature slab [N, Ac, C] resident in VMEM,
computes the kernel weights on the fly from the relative offsets, performs
the neighbour gather as a one-hot MXU matmul in VMEM, and contracts straight
to the [M, Ac, D] output — nothing of size (nn x A x C) ever touches HBM.

Scope (v1): the identity anchor-permutation path — exactly the active
configuration of the shipped recipes, where pose == identity so the
relative-pose anchor permutation is the identity (see ``nn/so3conv.py``).
Falls back to the XLA composition otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_TM = 32  # output centres per grid step


def _kernel(
    idx_ref,      # [1, TM, nn]           int32 (VMEM)
    gx_ref,       # [1, TM, nn, 4]        f32 relative offsets (xyz, 0)
    feats_ref,    # [1, N, 1, Ac, C]      features (native dtype)
    rk_ref,       # [1, Ac, ks, 4]        rotated kernel points
    w_ref,        # [ks, C, D]            conv weight
    out_ref,      # [1, TM, Ac, D]
    *,
    sigma: float,
    cdt,
):
    TM, nn = idx_ref.shape[1], idx_ref.shape[2]
    N, Ac, C = feats_ref.shape[1], feats_ref.shape[3], feats_ref.shape[4]
    ks = rk_ref.shape[2]
    D = w_ref.shape[2]

    # --- kernel weights on the fly: w[m, n, a, k] = relu(1 - d2/sigma) ----
    gx = gx_ref[0].astype(jnp.float32)                       # [TM, nn, 4]
    rk = rk_ref[0].astype(jnp.float32)                       # [Ac, ks, 4]
    gx2 = jnp.sum(gx * gx, axis=-1)                          # [TM, nn]
    rk2 = jnp.sum(rk * rk, axis=-1)                          # [Ac, ks]
    cross = jnp.dot(
        gx.reshape(TM * nn, 4),
        rk.reshape(Ac * ks, 4).T,
        preferred_element_type=jnp.float32,
    )                                                        # [TM*nn, Ac*ks]
    d2 = (
        gx2.reshape(TM * nn, 1)
        + rk2.reshape(1, Ac * ks)
        - 2.0 * cross
    )
    w = jax.nn.relu(1.0 - d2 / sigma)                        # [TM*nn, Ac*ks]
    w = w.reshape(TM, nn, Ac, ks).astype(cdt)

    # --- neighbour gather as a one-hot MXU matmul -------------------------
    idx = idx_ref[0]                                         # [TM, nn]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TM * nn, N), 1)
    onehot = (idx.reshape(TM * nn, 1) == iota).astype(cdt)
    flat_feats = feats_ref[0].reshape(N, Ac * C).astype(cdt)
    gathered = jnp.dot(
        onehot, flat_feats, preferred_element_type=jnp.float32
    ).astype(cdt)                                            # [TM*nn, Ac*C]
    g = gathered.reshape(TM, nn, Ac, C)

    # --- contractions: neighbours, then kernel points ---------------------
    acc = jax.lax.dot_general(
        w, g,
        dimension_numbers=(((1,), (1,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32,
    )                                                        # [TM, Ac, ks, C]
    Wf = w_ref[:].astype(cdt).reshape(ks * C, D)
    out = jnp.dot(
        acc.reshape(TM * Ac, ks * C).astype(cdt),
        Wf,
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(TM, Ac, D).astype(out_ref.dtype)


def inter_conv_fused(
    feats: jnp.ndarray,        # [B, N, A, C]
    ball_idx: jnp.ndarray,     # [B, M, nn] int32
    grouped_xyz: jnp.ndarray,  # [B, M, nn, 3] relative offsets
    anchors: jnp.ndarray,      # [A, 3, 3]
    kernels: jnp.ndarray,      # [ks, 3]
    sigma: float,
    W: jnp.ndarray,            # [ks, C, D]
    chunk_a: int = 12,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> [B, M, A, D].  Identity anchor permutation only (active path)."""
    B, N, A, C = feats.shape
    M, nn = ball_idx.shape[1], ball_idx.shape[2]
    ks = kernels.shape[0]
    D = W.shape[2]
    assert A % chunk_a == 0
    Mp = -(-M // _TM) * _TM

    rk = jnp.einsum("aij,kj->aki", anchors, kernels)          # [A, ks, 3]
    rk4 = jnp.pad(rk, ((0, 0), (0, 0), (0, 1)))
    gx4 = jnp.pad(grouped_xyz.astype(jnp.float32), ((0, 0), (0, Mp - M), (0, 0), (0, 1)))
    # pad ball_idx rows with an out-of-range index -> one-hot row of zeros
    idx_p = jnp.pad(
        ball_idx.astype(jnp.int32), ((0, 0), (0, Mp - M), (0, 0)),
        constant_values=N + 1,
    )
    feats_c = feats.reshape(B, N, A // chunk_a, chunk_a, C)
    rk_c = rk4.reshape(A // chunk_a, chunk_a, ks, 4)

    grid = (B, Mp // _TM, A // chunk_a)
    out = pl.pallas_call(
        functools.partial(_kernel, sigma=float(sigma), cdt=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TM, nn), lambda b, m, a: (b, m, 0)),
            pl.BlockSpec((1, _TM, nn, 4), lambda b, m, a: (b, m, 0, 0)),
            pl.BlockSpec(
                (1, N, 1, chunk_a, C), lambda b, m, a: (b, 0, a, 0, 0)
            ),
            pl.BlockSpec((1, chunk_a, ks, 4), lambda b, m, a: (a, 0, 0, 0)),
            pl.BlockSpec((ks, C, D), lambda b, m, a: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _TM, chunk_a, D), lambda b, m, a: (b, m, a, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, Mp, A, D), jnp.float32),
        interpret=interpret,
    )(idx_p, gx4, feats_c, rk_c, W)
    return out[:, :M]


def inter_conv_fused_reference(
    feats, ball_idx, grouped_xyz, anchors, kernels, sigma, W
):
    """XLA reference for numerics tests (same math, materialised)."""
    from ...nn.so3conv import inter_kernel_weights
    from ..sampling import group_points

    w = inter_kernel_weights(grouped_xyz, anchors, kernels, sigma)
    g = group_points(feats, ball_idx)
    acc = jnp.einsum("bmakn,bmnac->bmakc", w, g)
    return jnp.einsum("bmakc,kcd->bmad", acc, W)
