"""Normalisation for equivariant features [B, N, A, C].

The reference uses BatchNorm2d over [b, c, p, a] + SyncBatchNorm across 8 GPUs
at per-device batch 1 (SURVEY.md §2.4) — i.e. statistics over (batch, points,
anchors) per channel.  We reproduce those semantics with on-the-fly batch
statistics (optionally psum'd over the data-parallel mesh axis, which IS
SyncBN), since anchor/point reductions are permutation-invariant and therefore
preserve SO(3) anchor equivariance.

``kind='instance'`` normalises per-sample (equivalent to the reference's
per-device bsz=1 regime without cross-replica sync).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class EquivNorm(nn.Module):
    """Normalise per channel over (N, A[, B]) with learned scale/bias.

    kind: 'batch' | 'instance' | 'none'
    axis_name: mesh axis for cross-replica (SyncBN) statistics, or None.
    """

    kind: str = "batch"
    axis_name: Optional[str] = None
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "none":
            return x
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1)) if self.kind == "batch" else tuple(
            range(1, x.ndim - 1)
        )
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=reduce_axes, keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes, keepdims=True)
        if self.kind == "batch" and self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)
