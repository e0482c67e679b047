"""Fused Pallas inter-SO(3)-conv kernel (OPTIMIZATION.md roadmap #1).

The XLA path materialises two HBM giants per layer — the (neighbour, anchor)
feature gather [B, M, nn, A, C] and the kernel-weight tensor
[B, M, A, ks, nn] — making the conv HBM-bandwidth bound (round-1 profile).
This kernel keeps the per-anchor feature slab [N, C] resident in VMEM,
computes the kernel weights on the fly from the relative offsets, performs
the neighbour gather as a one-hot MXU matmul in VMEM, and contracts straight
to the [TM, D] output tile — nothing of size (nn x A x C) ever touches HBM.

Mosaic constraints shaped v2 (v1 failed real-TPU lowering; tests only ran
interpret mode):
* trailing block dims must divide (8, 128) or equal the array dims — the
  output is laid out 5-D [B, M, A, 1, D] so every block is full-dim;
* tpu.matmul supports at most ONE batch dimension — the anchor axis lives in
  the GRID (one anchor per cell), so the only batched contraction is over
  the TM output-centre tile;
* vector reshapes may only split/merge SUBLANE dims (lane dim preserved) —
  all reshapes here are [TM*nn, X] <-> [TM, nn, X].

Scope: the identity anchor-permutation path — exactly the active
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

_TM = 32   # output centres per grid step (forward)
# Backward kernels carry ~4x the live temporaries of the forward (recomputed
# w/onehot/g PLUS dout-side products), and at TM=32/N=380 their scoped-vmem
# stack overflows the 16M v5e limit (25.6M observed for the C=64 layer,
# 28.9M for the f32 C=1 layer).  A smaller centre tile halves every
# [TM*nn, *] temporary; grid overhead is amortised by the MXU dots.
_TMB = 8   # output centres per grid step (backward)


def _kernel(
    idx_ref,      # [1, TM, nn]           int32 (VMEM)
    gx_ref,       # [1, TM, nn, 4]        f32 relative offsets (xyz, 0)
    feats_ref,    # [1, N, 1, 1, C]       features for THIS anchor
    rk_ref,       # [1, ks, 4]            kernel points rotated by THIS anchor
    w_ref,        # [ks, C, D]            conv weight
    out_ref,      # [1, TM, 1, 1, D]
    *,
    sigma: float,
    cdt,
):
    TM, nn = idx_ref.shape[1], idx_ref.shape[2]
    N, C = feats_ref.shape[1], feats_ref.shape[4]
    ks = rk_ref.shape[1]
    D = w_ref.shape[2]

    # --- kernel weights on the fly: w[(m,n), k] = relu(1 - d2/sigma) ------
    gx = gx_ref[0].astype(jnp.float32).reshape(TM * nn, 4)
    rk = rk_ref[0].astype(jnp.float32)                       # [ks, 4]
    gx2 = jnp.sum(gx * gx, axis=-1, keepdims=True)           # [TM*nn, 1]
    rk2 = jnp.sum(rk * rk, axis=-1)[None, :]                 # [1, ks]
    cross = jnp.dot(gx, rk.T, preferred_element_type=jnp.float32)
    w = jax.nn.relu(1.0 - (gx2 + rk2 - 2.0 * cross) / sigma)  # [TM*nn, ks]

    # --- neighbour gather as a one-hot MXU matmul -------------------------
    # [TM, nn] -> [TM, nn, N] broadcast-compare, then a sublane-merge
    # reshape (lane dim N preserved — the only reshape Mosaic allows)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (TM, nn, N), 2)
    onehot = (idx_ref[0][:, :, None] == iota3).astype(cdt).reshape(TM * nn, N)
    g = jnp.dot(
        onehot, feats_ref[0, :, 0, 0].astype(cdt),
        preferred_element_type=jnp.float32,
    )                                                        # [TM*nn, C]

    # --- neighbour contraction, batched over the TM tile ------------------
    w3 = w.reshape(TM, nn, ks).astype(cdt)                   # sublane split
    g3 = g.reshape(TM, nn, C).astype(cdt)
    acc = jax.lax.dot_general(
        w3, g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                        # [TM, ks, C]

    # --- kernel-point contraction: unrolled over ks (static, <= 30) -------
    out = jnp.zeros((TM, D), dtype=jnp.float32)
    for k in range(ks):
        out = out + jnp.dot(
            acc[:, k, :].astype(cdt),
            w_ref[k].astype(cdt),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, :, 0, 0] = out.astype(out_ref.dtype)


def _fused_forward(
    feats, ball_idx, grouped_xyz, anchors, kernels, sigma, W,
    compute_dtype, interpret,
):
    B, N, A, C = feats.shape
    M, nn = ball_idx.shape[1], ball_idx.shape[2]
    ks = kernels.shape[0]
    D = W.shape[2]
    Mp = -(-M // _TM) * _TM

    rk = jnp.einsum("aij,kj->aki", anchors, kernels)          # [A, ks, 3]
    rk4 = jnp.pad(rk, ((0, 0), (0, 0), (0, 1)))
    gx4 = jnp.pad(
        grouped_xyz.astype(jnp.float32),
        ((0, 0), (0, Mp - M), (0, 0), (0, 1)),
    )
    # pad ball_idx rows with an out-of-range index -> one-hot row of zeros
    idx_p = jnp.pad(
        ball_idx.astype(jnp.int32), ((0, 0), (0, Mp - M), (0, 0)),
        constant_values=N + 1,
    )
    # 5-D so the feature block's trailing dims equal full array dims
    feats_a = feats[:, :, :, None, :]                        # [B, N, A, 1, C]

    grid = (B, Mp // _TM, A)
    out = pl.pallas_call(
        functools.partial(_kernel, sigma=float(sigma), cdt=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TM, nn), lambda b, m, a: (b, m, 0)),
            pl.BlockSpec((1, _TM, nn, 4), lambda b, m, a: (b, m, 0, 0)),
            pl.BlockSpec((1, N, 1, 1, C), lambda b, m, a: (b, 0, a, 0, 0)),
            pl.BlockSpec((1, ks, 4), lambda b, m, a: (a, 0, 0)),
            pl.BlockSpec((ks, C, D), lambda b, m, a: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _TM, 1, 1, D), lambda b, m, a: (b, m, a, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, Mp, A, 1, D), jnp.float32),
        interpret=interpret,
    )(idx_p, gx4, feats_a, rk4, W)
    return out[:, :M, :, 0]


def _recompute_wg(idx_ref, gx_ref, feats_ref, rk_ref, *, sigma, cdt):
    """Shared backward prologue: rebuild the on-the-fly kernel weights and the
    one-hot-gathered neighbour features for THIS anchor (all VMEM)."""
    TM, nn = idx_ref.shape[1], idx_ref.shape[2]
    N = feats_ref.shape[1]
    gx = gx_ref[0].astype(jnp.float32).reshape(TM * nn, 4)
    rk = rk_ref[0].astype(jnp.float32)                        # [ks, 4]
    gx2 = jnp.sum(gx * gx, axis=-1, keepdims=True)
    rk2 = jnp.sum(rk * rk, axis=-1)[None, :]
    cross = jnp.dot(gx, rk.T, preferred_element_type=jnp.float32)
    w = jax.nn.relu(1.0 - (gx2 + rk2 - 2.0 * cross) / sigma)  # [TM*nn, ks]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (TM, nn, N), 2)
    onehot = (idx_ref[0][:, :, None] == iota3).astype(cdt).reshape(TM * nn, N)
    g = jnp.dot(
        onehot, feats_ref[0, :, 0, 0].astype(cdt),
        preferred_element_type=jnp.float32,
    )                                                         # [TM*nn, C]
    return gx, rk, w, onehot, g


def _bwd_kernel_dgx_dw(
    idx_ref,      # [1, TM, nn]     int32
    gx_ref,       # [1, TM, nn, 4]  f32
    feats_ref,    # [1, N, 1, 1, C]
    rk_ref,       # [1, ks, 4]
    w_ref,        # [ks, C, D]
    dout_ref,     # [1, TM, 1, 1, D] f32 cotangent
    dgx_ref,      # [1, TM, nn, 4]  f32 out (accumulated over anchors)
    dW_ref,       # [ks, C, D]      f32 out (accumulated over everything)
    *,
    sigma: float,
    cdt,
):
    """Grid (B, M/TM, A), anchor innermost: dgx block fixed across the
    trailing anchor axis, dW block fixed across the whole grid — both are
    the standard Pallas revisited-block accumulations."""
    TM, nn = idx_ref.shape[1], idx_ref.shape[2]
    ks = rk_ref.shape[1]
    C, D = w_ref.shape[1], w_ref.shape[2]

    @pl.when(pl.program_id(2) == 0)
    def _():
        dgx_ref[...] = jnp.zeros_like(dgx_ref)

    @pl.when(
        (pl.program_id(0) == 0)
        & (pl.program_id(1) == 0)
        & (pl.program_id(2) == 0)
    )
    def _():
        dW_ref[...] = jnp.zeros_like(dW_ref)

    gx, rk, w, _onehot, g = _recompute_wg(
        idx_ref, gx_ref, feats_ref, rk_ref, sigma=sigma, cdt=cdt
    )
    dout = dout_ref[0, :, 0, 0].astype(jnp.float32)           # [TM, D]
    w3 = w.reshape(TM, nn, ks).astype(cdt)
    g3 = g.reshape(TM, nn, C).astype(cdt)
    # forward acc, needed for dW: [TM, ks, C]
    acc = jax.lax.dot_general(
        w3, g3, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    dw_cols = []
    for k in range(ks):
        # dacc_k [TM, C] = dout @ W[k]^T (contract D)
        dacc_k = jax.lax.dot_general(
            dout.astype(cdt), w_ref[k].astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dW[k] += acc[:, k, :]^T @ dout (contract TM)
        dW_ref[k] += jax.lax.dot_general(
            acc[:, k, :].astype(cdt), dout.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dW_ref.dtype)
        # dw_k [TM, nn] = sum_c g3 * dacc_k  (batched over TM, contract C)
        dw_cols.append(
            jax.lax.dot_general(
                g3, dacc_k[..., None].astype(cdt),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[..., 0]
        )
    dw = jnp.stack(dw_cols, axis=-1).reshape(TM * nn, ks)     # [TM*nn, ks]
    mdw = jnp.where(w > 0.0, dw, 0.0) * (-2.0 / sigma)
    # dgx = gx * sum_k mdw - mdw @ rk
    sgx = gx * jnp.sum(mdw, axis=-1, keepdims=True) - jnp.dot(
        mdw.astype(cdt), rk.astype(cdt), preferred_element_type=jnp.float32
    )
    dgx_ref[0] += sgx.reshape(TM, nn, 4).astype(dgx_ref.dtype)


def _bwd_kernel_dfeats(
    idx_ref,      # [1, TM, nn]     int32
    gx_ref,       # [1, TM, nn, 4]  f32
    feats_ref,    # [1, N, 1, 1, C]
    rk_ref,       # [1, ks, 4]
    w_ref,        # [ks, C, D]
    dout_ref,     # [1, TM, 1, 1, D] f32
    dfeats_ref,   # [1, N, 1, 1, C] f32 out (accumulated over centre tiles)
    *,
    sigma: float,
    cdt,
):
    """Grid (B, A, M/TM), centre tile innermost: the [N, C] dfeats block for
    (b, a) accumulates across the trailing m axis."""
    TM, nn = idx_ref.shape[1], idx_ref.shape[2]
    ks = rk_ref.shape[1]
    C = w_ref.shape[1]

    @pl.when(pl.program_id(2) == 0)
    def _():
        dfeats_ref[...] = jnp.zeros_like(dfeats_ref)

    _gx, _rk, w, onehot, _g = _recompute_wg(
        idx_ref, gx_ref, feats_ref, rk_ref, sigma=sigma, cdt=cdt
    )
    dout = dout_ref[0, :, 0, 0].astype(jnp.float32)           # [TM, D]
    w3 = w.reshape(TM, nn, ks).astype(cdt)
    dg = jnp.zeros((TM, nn, C), dtype=jnp.float32)
    for k in range(ks):
        dacc_k = jax.lax.dot_general(
            dout.astype(cdt), w_ref[k].astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dg = dg + w3[:, :, k][..., None].astype(jnp.float32) * dacc_k[:, None, :]
    # dfeats[n, c] += onehot^T @ dg (contract the TM*nn rows)
    dfeats_ref[0, :, 0, 0] += jax.lax.dot_general(
        onehot, dg.reshape(TM * nn, C).astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dfeats_ref.dtype)


def _fused_backward(
    feats, ball_idx, grouped_xyz, anchors, kernels, sigma, W, dout,
    compute_dtype, interpret,
):
    """Pallas backward: (dfeats, dgrouped_xyz, dW) for the fused conv."""
    B, N, A, C = feats.shape
    M, nn = ball_idx.shape[1], ball_idx.shape[2]
    ks = kernels.shape[0]
    D = W.shape[2]
    Mp = -(-M // _TMB) * _TMB
    # Degenerate channel counts (the backbones' first occupancy layer has
    # C=1) make several dots here contract or emit a size-1 dimension;
    # Mosaic lowers those bf16 dots via a vector.broadcast with an illegal
    # bf16->f32 element-type change ('op failed to verify that source
    # operand and result have same element type', observed on v5e).  f32
    # costs nothing at C<8 (no MXU win), so sidestep the lowering entirely.
    if C < 8:
        compute_dtype = jnp.float32

    rk = jnp.einsum("aij,kj->aki", anchors, kernels)
    rk4 = jnp.pad(rk, ((0, 0), (0, 0), (0, 1)))
    gx4 = jnp.pad(
        grouped_xyz.astype(jnp.float32),
        ((0, 0), (0, Mp - M), (0, 0), (0, 1)),
    )
    idx_p = jnp.pad(
        ball_idx.astype(jnp.int32), ((0, 0), (0, Mp - M), (0, 0)),
        constant_values=N + 1,
    )
    feats_a = feats[:, :, :, None, :]
    # zero-padded cotangent: padded centre rows contribute nothing
    dout_p = jnp.pad(
        dout.astype(jnp.float32), ((0, 0), (0, Mp - M), (0, 0), (0, 0))
    )[:, :, :, None, :]                                       # [B, Mp, A, 1, D]

    common_in = [idx_p, gx4, feats_a, rk4, W]
    kw = dict(sigma=float(sigma), cdt=compute_dtype)

    dgx4, dW = pl.pallas_call(
        functools.partial(_bwd_kernel_dgx_dw, **kw),
        grid=(B, Mp // _TMB, A),
        in_specs=[
            pl.BlockSpec((1, _TMB, nn), lambda b, m, a: (b, m, 0)),
            pl.BlockSpec((1, _TMB, nn, 4), lambda b, m, a: (b, m, 0, 0)),
            pl.BlockSpec((1, N, 1, 1, C), lambda b, m, a: (b, 0, a, 0, 0)),
            pl.BlockSpec((1, ks, 4), lambda b, m, a: (a, 0, 0)),
            pl.BlockSpec((ks, C, D), lambda b, m, a: (0, 0, 0)),
            pl.BlockSpec((1, _TMB, 1, 1, D), lambda b, m, a: (b, m, a, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TMB, nn, 4), lambda b, m, a: (b, m, 0, 0)),
            pl.BlockSpec((ks, C, D), lambda b, m, a: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, nn, 4), jnp.float32),
            jax.ShapeDtypeStruct((ks, C, D), jnp.float32),
        ],
        interpret=interpret,
    )(*common_in, dout_p)

    dfeats = pl.pallas_call(
        functools.partial(_bwd_kernel_dfeats, **kw),
        grid=(B, A, Mp // _TMB),
        in_specs=[
            pl.BlockSpec((1, _TMB, nn), lambda b, a, m: (b, m, 0)),
            pl.BlockSpec((1, _TMB, nn, 4), lambda b, a, m: (b, m, 0, 0)),
            pl.BlockSpec((1, N, 1, 1, C), lambda b, a, m: (b, 0, a, 0, 0)),
            pl.BlockSpec((1, ks, 4), lambda b, a, m: (a, 0, 0)),
            pl.BlockSpec((ks, C, D), lambda b, a, m: (0, 0, 0)),
            pl.BlockSpec((1, _TMB, 1, 1, D), lambda b, a, m: (b, m, a, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, 1, 1, C), lambda b, a, m: (b, 0, a, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, A, 1, C), jnp.float32),
        interpret=interpret,
    )(*common_in, dout_p)

    return (
        dfeats[:, :, :, 0].astype(feats.dtype),
        dgx4[:, :M, :, :3].astype(grouped_xyz.dtype),
        dW.astype(W.dtype),
    )


def _xla_chunked(
    feats, ball_idx, grouped_xyz, anchors, kernels, sigma, W, chunk_a,
    compute_dtype,
):
    """Anchor-chunked XLA composition of the same conv (bounded memory) —
    used as the linearization point for the fused kernel's backward pass."""
    from ...nn.so3conv import gather_neighbors_anchors, inter_kernel_weights
    from ..sampling import group_points

    A = anchors.shape[0]
    B, M, nn = ball_idx.shape

    def contract(g, w):
        acc = jnp.einsum(
            "bmakn,bmnac->bmakc",
            w.astype(compute_dtype), g.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "bmakc,kcd->bmad", acc, W.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    if chunk_a and A > chunk_a and A % chunk_a == 0:
        # gather per anchor chunk (identity permutation) so nothing of size
        # [B, M, nn, A, C] is ever resident — matches the unfused chunk path
        def chunk_fn(sl_anchors, sl_perm):
            w = inter_kernel_weights(grouped_xyz, sl_anchors, kernels, sigma)
            g = gather_neighbors_anchors(feats, ball_idx, sl_perm)
            return contract(g, w)

        chunk_fn = jax.checkpoint(chunk_fn)
        outs = []
        for c0 in range(0, A, chunk_a):
            sl_perm = jnp.broadcast_to(
                jnp.arange(c0, c0 + chunk_a, dtype=jnp.int32),
                (B, M, nn, chunk_a),
            )
            outs.append(chunk_fn(anchors[c0 : c0 + chunk_a], sl_perm))
        return jnp.concatenate(outs, axis=2)
    w = inter_kernel_weights(grouped_xyz, anchors, kernels, sigma)
    return contract(group_points(feats, ball_idx), w)


def inter_conv_fused(
    feats: jnp.ndarray,        # [B, N, A, C]
    ball_idx: jnp.ndarray,     # [B, M, nn] int32
    grouped_xyz: jnp.ndarray,  # [B, M, nn, 3] relative offsets
    anchors: jnp.ndarray,      # [A, 3, 3]
    kernels: jnp.ndarray,      # [ks, 3]
    sigma: float,
    W: jnp.ndarray,            # [ks, C, D]
    chunk_a: int = 12,         # backward anchor-chunk size (XLA backward)
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    fused_bwd: bool = False,   # Pallas backward kernels instead of XLA
) -> jnp.ndarray:
    """-> [B, M, A, D].  Identity anchor permutation only (active path).

    Differentiable: the forward runs the fused Pallas kernel; the backward
    either linearises the mathematically-identical anchor-chunked XLA
    composition (``_xla_chunked``) at the same primals (default), or — with
    ``fused_bwd`` — runs two Pallas kernels that recompute the VMEM
    intermediates and emit (dfeats, dgrouped_xyz, dW) directly, never
    re-materialising the [B, M, nn, A, C] gather in HBM.  Gradients for
    ``feats``, ``grouped_xyz`` and ``W`` match the unfused path either way
    (the round-2 fused kernel had no VJP at all, so it could never be
    trained through)."""
    if fused_bwd and feats.shape[-1] < 8:
        # Degenerate-channel layers (the backbones' C=1 occupancy layer) run
        # the kernels in f32 (see _fused_backward's Mosaic note), which
        # doubles the [TM*nn, N] one-hot/iota temporaries: the dgx/dW kernel's
        # scoped-vmem stack then overflows the 16M v5e limit (observed 28.85M
        # at B=8/N=380/nn=64, logs_r3/ab_fusedbwd2.err).  The XLA backward is
        # mathematically identical and costs nothing at C=1 (no MXU win to
        # preserve), so route these layers there and keep the fused backward
        # for the wide layers it was built for.
        fused_bwd = False
    if fused_bwd and kernels.shape[0] * feats.shape[-1] * W.shape[2] * 4 > 2**22:
        # Very wide layers (the backbones' last 128->512 conv): the dgx/dW
        # backward kernel must hold the full [ks, C, D] weight block AND an
        # f32 dW accumulator of the same shape across the whole grid — 6.3M
        # each at ks=24/C=128/D=512, overflowing scoped vmem (18.25M
        # observed) regardless of the centre-tile size.  Tiling dW over a
        # ks/D grid axis is possible but these layers are few and MXU-bound,
        # so the XLA backward loses little; route them there.
        fused_bwd = False

    @jax.custom_vjp
    def _f(feats, gx, W):
        return _fused_forward(
            feats, ball_idx, gx, anchors, kernels, sigma, W,
            compute_dtype, interpret,
        )

    def _fwd(feats, gx, W):
        return _f(feats, gx, W), (feats, gx, W)

    def _bwd(res, g):
        f0, gx0, W0 = res
        if fused_bwd:
            return _fused_backward(
                f0, ball_idx, gx0, anchors, kernels, sigma, W0, g,
                compute_dtype, interpret,
            )
        _, vjp = jax.vjp(
            lambda f_, gx_, W_: _xla_chunked(
                f_, ball_idx, gx_, anchors, kernels, sigma, W_,
                chunk_a, compute_dtype,
            ),
            f0, gx0, W0,
        )
        return vjp(g)

    _f.defvjp(_fwd, _bwd)
    return _f(feats, grouped_xyz, W)


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
