"""Pallas TPU furthest-point-sampling kernel.

FPS is inherently sequential (each selection depends on the previous), so
the XLA implementation is a ``fori_loop`` whose body executes ~8 HLO ops per
selected point — ~3k op executions per call, ~9 calls per stage-1 train step
(stride blocks x twin backbones x num_iters, plus the global-chamfer
resample).  The round-2 device profile shows exactly this signature: ~7.2k
``dynamic-update-slice`` executions per step, the largest single op-count
family in the graph (OPTIMIZATION.md "relay execution modes").  This kernel
runs the whole greedy loop in VMEM as ONE fused op per call: the cloud fits
comfortably ([4, N] transposed layout, N <= ~4k), each iteration is a
handful of vector ops on [1, N] rows, and the selected-index vector is
written once at the end.

Semantics are index-exact with ``ops.sampling.furthest_point_sampling``
(first sample = index 0; squared-norm <= 1e-3 shadow-point guard, ref
``grouping_cuda_kernel.cu:369-371``; first-index tie-breaking).  Caveat:
across BACKENDS the selection can differ at near-exact distance ties
(measured on chip: one divergence in 8x380 selections, at a relative
distance difference of 2e-6 — TPU float rounding vs interpret/XLA), which
is functionally equivalent sampling.  Within a backend it is deterministic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SHADOW_NORM_SQ = 1e-3
_NEG = -3.0e38  # effectively -inf, avoids inf arithmetic in the kernel


def _fps_kernel(xt_ref, idx_ref, *, n_sample: int, n_valid: int):
    """xt_ref: [1, 4, Np] transposed padded coords; idx_ref: [1, 8, Mp] int32
    (8 identical sublane rows — the TPU lowering needs a sublane-tileable
    output block; the wrapper reads row 0)."""
    xt = xt_ref[0]                                   # [4, Np]
    Np = xt.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    x2 = jnp.sum(xt * xt, axis=0, keepdims=True)     # [1, Np]
    # shadow-point guard + padding exclusion (padding rows are zeros, which
    # the norm guard already rejects, but keep the explicit bound too)
    valid = (x2 > SHADOW_NORM_SQ) & (lane < n_valid)

    Mp = idx_ref.shape[2]
    miota = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)

    def body(m, carry):
        dists, idxv, prev = carry
        onehot = (lane == prev).astype(jnp.float32)  # [1, Np]
        last = jnp.sum(xt * onehot, axis=1, keepdims=True)      # [4, 1]
        cross = jnp.sum(xt * last, axis=0, keepdims=True)       # [1, Np]
        l2 = jnp.sum(last * last)
        d = x2 - 2.0 * cross + l2
        dists = jnp.minimum(dists, d)
        score = jnp.where(valid, dists, _NEG)
        nxt = jnp.argmax(score, axis=1)[0].astype(jnp.int32)
        idxv = jnp.where(miota == m, nxt, idxv)
        return dists, idxv, nxt

    dists0 = jnp.full((1, Np), 3.0e38, jnp.float32)
    idxv0 = jnp.zeros((1, Mp), jnp.int32)
    _, idxv, _ = jax.lax.fori_loop(
        1, n_sample, body, (dists0, idxv0, jnp.int32(0))
    )
    idx_ref[0] = jnp.broadcast_to(idxv, (8, Mp))


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("n_sample", "interpret")
)
def fps_fused(
    xyz: jnp.ndarray, n_sample: int, interpret: bool = False
) -> jnp.ndarray:
    """xyz: [B, N, 3] -> idx: [B, n_sample] int32; one kernel call per batch
    row (grid over B), whole greedy loop inside the kernel."""
    # Index selection is non-differentiable; cutting the tangent at the INPUT
    # (not just the output) keeps jax.grad from trying to linearize the
    # pallas_call, which has no autodiff rule and would raise
    # "Linearization failed to produce known values for all output primals".
    xyz = jax.lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    Np = max(128, -(-N // 128) * 128)
    Mp = max(128, -(-n_sample // 128) * 128)
    xt = _pad_to(
        _pad_to(jnp.moveaxis(xyz.astype(jnp.float32), 1, 2), 4, 1), Np, 2
    )  # [B, 4, Np]
    idx = pl.pallas_call(
        functools.partial(_fps_kernel, n_sample=n_sample, n_valid=N),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 4, Np), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, Mp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 8, Mp), jnp.int32),
        interpret=interpret,
    )(xt)
    return jax.lax.stop_gradient(idx[:, 0, :n_sample])
