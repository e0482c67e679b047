"""Point sampling / neighborhood ops (jittable XLA formulations).

TPU-native replacements for the reference CUDA kernels:

* ``furthest_point_sampling``  — ref ``vgtk/vgtk/cuda/grouping_cuda_kernel.cu:352-466``
  (N1 in SURVEY.md).  Same semantics: starts at index 0, greedy farthest point,
  points with ||p||^2 <= 1e-3 (shadow guard) are never selected.
* ``ball_query``               — ref ``grouping_cuda_kernel.cu:68-113`` (N2).
  Same semantics: per center, the first ``nsample`` support points (in index
  order) with squared distance < radius^2; if fewer are found the remaining
  slots repeat the first found index.
* ``gather_points`` / ``group_points`` — ref ``gathering_cuda_kernel.cu`` (N6);
  XLA ``take_along_axis`` handles forward+backward natively.

Shapes are channels-last: points are ``[B, N, 3]``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SHADOW_NORM_SQ = 1e-3  # ref grouping_cuda_kernel.cu:369-371


@functools.partial(jax.jit, static_argnames=("n_sample",))
def furthest_point_sampling(xyz: jnp.ndarray, n_sample: int) -> jnp.ndarray:
    """Greedy FPS.  xyz: [B, N, 3] -> idx: [B, n_sample] int32.

    First sample is always index 0 (deterministic, matching the reference's
    tie-breaking).  Points with squared norm <= 1e-3 are skipped (the
    reference's shadow-point guard).

    On TPU this dispatches to the Pallas kernel (index-exact, tested): the
    XLA fori_loop executes ~8 HLO ops per selected point, and FPS is the
    single largest op-count family in the stage-1 step (~7.2k
    dynamic-update-slice executions/step in the round-2 device profile);
    the kernel runs the whole greedy loop in VMEM as one op per call.
    """
    if jax.default_backend() == "tpu":
        from .pallas.fps import fps_fused

        return fps_fused(xyz, n_sample)
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    valid = jnp.sum(x * x, axis=-1) > SHADOW_NORM_SQ  # [B, N]

    def body(i, carry):
        dists, idxs = carry
        last = jnp.take_along_axis(x, idxs[:, i - 1][:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((x - last) ** 2, axis=-1)  # [B, N]
        dists = jnp.minimum(dists, d)
        score = jnp.where(valid, dists, -jnp.inf)
        nxt = jnp.argmax(score, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return dists, idxs

    idxs0 = jnp.zeros((B, n_sample), dtype=jnp.int32)
    dists0 = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    _, idxs = jax.lax.fori_loop(1, n_sample, body, (dists0, idxs0))
    return idxs


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: [B, N, C], idx: [B, M] -> [B, M, C]."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: [B, N, ...C], idx: [B, M, K] -> [B, M, K, ...C]."""
    B, M, K = idx.shape
    flat = idx.reshape(B, M * K)
    tail = points.shape[2:]
    expand = flat.reshape(B, M * K, *([1] * len(tail)))
    out = jnp.take_along_axis(points, expand, axis=1)
    return out.reshape(B, M, K, *tail)


@functools.partial(jax.jit, static_argnames=("n_sample",))
def ball_query(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    n_sample: int,
) -> jnp.ndarray:
    """query: [B, M, 3], support: [B, N, 3] -> idx: [B, M, n_sample] int32.

    Reference pad-by-repeat semantics: the first ``n_sample`` in-radius support
    indices in ascending index order; missing slots repeat the first found.
    """
    d2 = pairwise_sqdist(query, support)  # [B, M, N]
    N = support.shape[1]
    in_ball = d2 < (radius * radius)
    # Key: index when valid else N (pushed past every valid index).
    key = jnp.where(in_ball, jnp.arange(N, dtype=jnp.int32)[None, None, :], N)
    # Smallest n_sample keys == first valid indices in order.
    k = min(n_sample, N)
    neg_topk = jax.lax.top_k(-key, k)[0]
    if k < n_sample:  # fewer support points than requested: pad by tiling
        reps = -(-n_sample // k)
        neg_topk = jnp.tile(neg_topk, (1, 1, reps))[..., :n_sample]
    idx = (-neg_topk).astype(jnp.int32)  # ascending
    first = idx[..., :1]
    idx = jnp.where(idx >= N, first, idx)
    # Degenerate case (no valid neighbor at all): index 0.
    return jnp.where(idx >= N, 0, idx)


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a: [..., N, 3], b: [..., M, 3] -> [..., N, M] squared distances.

    Computed as |a|^2 + |b|^2 - 2 a.b^T so the cross term rides the MXU.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    cross = jnp.einsum("...nc,...mc->...nm", a, b, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)
