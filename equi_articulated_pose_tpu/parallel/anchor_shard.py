"""Anchor-orbit model parallelism — sharding the 60-anchor icosahedral axis
across the device mesh.

The reference has exactly one parallelism strategy (DDP data parallelism,
SURVEY.md §2.4).  On TPU the anchor orbit is the natural *model*-parallel
axis beyond it:

* the inter (spatial) conv is **independent per anchor** — each device holds
  a contiguous anchor slab [B, N, A_loc, C] and needs NO communication
  (kernel weights are a function of its own anchor rotations only);
* the intra (rotation-group) conv mixes each anchor with its 12 SO(3)-
  adjacent anchors (``TRACE_IDX``) — the only layer that communicates; v1
  uses one tiled ``all_gather`` over the anchor axis (A=60 ⇒ the gathered
  [B, N, 60, C] slab is small; a ``ppermute`` ring exchanging just the
  boundary anchors is the documented upgrade);
* invariant out-block pooling over anchors becomes mesh collectives
  (``pmax`` / ``psum``), including a numerically-stable distributed softmax
  for attention pooling.

All functions run INSIDE ``shard_map`` with the anchor axis named
``ANCHOR_AXIS``; combined data x anchor meshes compose with the DP helpers
(`dp.py`) since collectives name their axes explicitly.

Anchor slabs are contiguous: device i owns anchors [i*A_loc, (i+1)*A_loc).
A_loc must divide 60 — mesh anchor sizes 2, 3, 4, 5, 6, 10, 12, 15, 20, 30,
60 are valid.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..nn.so3conv import inter_conv_contract, inter_kernel_weights
from ..ops.sampling import group_points

ANCHOR_AXIS = "anchor"
DATA_AXIS = "data"


def make_mesh_2d(n_data: int, n_anchor: int,
                 data_axis: str = DATA_AXIS,
                 anchor_axis: str = ANCHOR_AXIS) -> Mesh:
    """data x anchor mesh: DP on one axis, anchor-orbit MP on the other.

    Lay the anchor axis innermost so its (chattier) collectives ride
    neighbouring ICI links."""
    devs = jax.devices()
    assert len(devs) >= n_data * n_anchor, (
        f"need {n_data * n_anchor} devices, have {len(devs)}"
    )
    arr = np.asarray(devs[: n_data * n_anchor]).reshape(n_data, n_anchor)
    return Mesh(arr, (data_axis, anchor_axis))


def local_anchor_slice(full: jnp.ndarray, a_loc: int, axis_name: str,
                       axis: int = 0) -> jnp.ndarray:
    """Slice this device's contiguous anchor slab out of a replicated
    full-anchor array (anchors, trace rows, ...)."""
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(full, i * a_loc, a_loc, axis=axis)


def inter_conv_anchor_sharded(
    feats: jnp.ndarray,        # [B, N, A_loc, C]  this device's slab
    ball_idx: jnp.ndarray,     # [B, M, nn]        replicated
    grouped_xyz: jnp.ndarray,  # [B, M, nn, 3]     replicated
    anchors_full: jnp.ndarray,  # [A, 3, 3]        replicated
    kernels: jnp.ndarray,      # [ks, 3]
    sigma: float,
    W: jnp.ndarray,            # [ks, C, D]
    axis_name: str = ANCHOR_AXIS,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """-> [B, M, A_loc, D].  Zero communication: the inter conv is
    anchor-diagonal (identity-permutation path), so each device convolves
    its own slab with kernel weights from its own anchor rotations."""
    a_loc = feats.shape[2]
    anchors_local = local_anchor_slice(anchors_full, a_loc, axis_name)
    w = inter_kernel_weights(grouped_xyz, anchors_local, kernels, sigma)
    g = group_points(feats, ball_idx)                  # [B, M, nn, A_loc, C]
    return inter_conv_contract(g, w, W, compute_dtype)


def intra_conv_anchor_sharded(
    feats: jnp.ndarray,        # [B, N, A_loc, C]
    trace_idx_full: jnp.ndarray,  # [A, K] global anchor indices, replicated
    W: jnp.ndarray,            # [K, C, D]
    axis_name: str = ANCHOR_AXIS,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """-> [B, N, A_loc, D].  One tiled all_gather reassembles the full
    anchor axis (the 12-neighbour mixing pattern touches anchors on other
    devices), then each device computes only its own output rows."""
    a_loc = feats.shape[2]
    full = jax.lax.all_gather(
        feats, axis_name, axis=2, tiled=True
    )                                                  # [B, N, A, C]
    rows = local_anchor_slice(trace_idx_full, a_loc, axis_name)  # [A_loc, K]
    out = None
    for k in range(trace_idx_full.shape[1]):
        gk = jnp.take_along_axis(
            full, rows[None, None, :, k, None], axis=2
        ).astype(compute_dtype)                        # [B, N, A_loc, C]
        term = jnp.einsum(
            "bnac,cd->bnad", gk, W[k].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out


def anchor_max_pool_sharded(
    feats: jnp.ndarray,        # [B, ..., A_loc, C]
    axis_name: str = ANCHOR_AXIS,
    anchor_axis: int = -2,
) -> jnp.ndarray:
    """Global max over the (sharded) anchor axis -> [B, ..., C]."""
    return jax.lax.pmax(jnp.max(feats, axis=anchor_axis), axis_name)


def anchor_mean_pool_sharded(
    feats: jnp.ndarray, axis_name: str = ANCHOR_AXIS, anchor_axis: int = -2
) -> jnp.ndarray:
    s = jax.lax.psum(jnp.sum(feats, axis=anchor_axis), axis_name)
    n = jax.lax.psum(jnp.asarray(feats.shape[anchor_axis], jnp.float32), axis_name)
    return s / n


def anchor_attn_pool_sharded(
    feats: jnp.ndarray,        # [B, A_loc, C]
    logits: jnp.ndarray,       # [B, A_loc]
    axis_name: str = ANCHOR_AXIS,
):
    """Numerically-stable distributed softmax-attention pooling over the
    global anchor axis (the out-block confidence pooling,
    ref ``base_so3conv.py:1013-1152``) -> (pooled [B, C], attn [B, A_loc])."""
    m = jax.lax.pmax(jnp.max(logits, axis=1), axis_name)        # [B]
    e = jnp.exp(logits - m[:, None])                            # [B, A_loc]
    z = jax.lax.psum(jnp.sum(e, axis=1), axis_name)             # [B]
    attn = e / z[:, None]
    pooled = jax.lax.psum(
        jnp.einsum("ba,bac->bc", attn, feats), axis_name
    )
    return pooled, attn
