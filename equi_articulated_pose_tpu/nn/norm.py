"""Normalisation for equivariant features [B, N, A, C].

The reference uses BatchNorm2d over [b, c, p, a] + SyncBatchNorm across 8 GPUs
at per-device batch 1 (SURVEY.md §2.4) — i.e. statistics over (batch, points,
anchors) per channel, with running averages used at eval (``model.eval()``).
We reproduce both behaviours:

* **train** — on-the-fly batch statistics (optionally pmean'd over the
  data-parallel mesh axis, which IS SyncBN), and a running mean/var update in
  the ``batch_stats`` collection (torch momentum 0.1 ⇒ keep-fraction 0.9);
* **eval** — the stored running averages, so per-sample predictions are
  deterministic and independent of batch composition.

Mode selection follows the flax convention: callers that pass
``mutable=['batch_stats']`` to ``apply`` get training behaviour; a plain
``apply`` uses the running averages.  (Anchor/point reductions are
permutation-invariant, so either mode preserves SO(3) anchor equivariance.)

``kind='instance'`` normalises per-sample (no stored state; equivalent to the
reference's per-device bsz=1 regime without cross-replica sync).
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
    momentum: keep-fraction for the running averages (torch BN's 1-momentum).
    """

    kind: str = "batch"
    axis_name: Optional[str] = None
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "none":
            return x
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)

        if self.kind == "batch":
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
            )
            training = self.is_mutable_collection("batch_stats")
            if training:
                reduce_axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x32, axis=reduce_axes)
                mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes)
                if self.axis_name is not None:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
                if not self.is_initializing():
                    m = self.momentum
                    ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                    ra_var.value = m * ra_var.value + (1.0 - m) * var
            else:
                mean, var = ra_mean.value, ra_var.value
        else:  # instance: per-sample statistics, no stored state
            reduce_axes = tuple(range(1, x.ndim - 1))
            mean = jnp.mean(x32, axis=reduce_axes, keepdims=True)
            mean_sq = jnp.mean(jnp.square(x32), axis=reduce_axes, keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)
