"""Chamfer distance (bidirectional nearest-neighbour), TPU-native.

Replaces the reference CUDA extension ``extensions/chamfer_dist/chamfer.cu``
(N9 in SURVEY.md).  The XLA path here forms the pairwise distance matrix with
an MXU matmul and reduces; at the model's shipped shapes (N <= 512) it beats
the fused Pallas kernel (``ops/pallas/chamfer.py``), which is kept — with a
custom VJP that rematerialises instead of storing [N, M] — as the scaling
path for large point counts and is NOT dispatched to automatically.

API mirrors the reference autograd function
(``extensions/chamfer_dist/__init__.py:13-45``): returns squared distances
``dist1: [B, N]`` (a->b) and ``dist2: [B, M]`` (b->a).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import pairwise_sqdist


def chamfer_sq(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a: [..., N, 3], b: [..., M, 3] -> (dist1 [..., N], dist2 [..., M])."""
    d2 = pairwise_sqdist(a, b)
    return jnp.min(d2, axis=-1), jnp.min(d2, axis=-2)


def chamfer_sq_with_idx(a: jnp.ndarray, b: jnp.ndarray):
    d2 = pairwise_sqdist(a, b)
    return (
        jnp.min(d2, axis=-1),
        jnp.min(d2, axis=-2),
        jnp.argmin(d2, axis=-1).astype(jnp.int32),
        jnp.argmin(d2, axis=-2).astype(jnp.int32),
    )


def chamfer_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(sqrt(cd_a->b).mean + sqrt(cd_b->a).mean) / 2 — the reference's
    'chamfer L1' eval statistic (``unsup_..._40:1497-1502``)."""
    d1, d2 = chamfer_sq(a, b)
    return 0.5 * (jnp.sqrt(d1).mean(-1) + jnp.sqrt(d2).mean(-1))


def chamfer_chunked(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 8):
    """Batch-chunked chamfer mirroring ``safe_chamfer_dist_call``
    (ref ``SPConvNets/models/common_utils.py:32-41``); under jit the chunking
    is a lax.map over leading-batch chunks to bound peak memory."""
    B = a.shape[0]
    if B <= chunk:
        return chamfer_sq(a, b)
    pad = (-B) % chunk
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        b = jnp.concatenate([b, jnp.zeros((pad,) + b.shape[1:], b.dtype)], 0)
    an = a.reshape(-1, chunk, *a.shape[1:])
    bn = b.reshape(-1, chunk, *b.shape[1:])
    d1, d2 = jax.lax.map(lambda ab: chamfer_sq(ab[0], ab[1]), (an, bn))
    d1 = d1.reshape(-1, *d1.shape[2:])[:B]
    d2 = d2.reshape(-1, *d2.shape[2:])[:B]
    return d1, d2
