"""Axis-prior slot-orbit selection (slot_single_mode=0 path).

Vectorised re-design of the reference's ``select_slot_orbits``
(``unsup_..._40:1132-1308``) which loops in Python over (batch, base-anchor,
3^(S-1) permutations).  Here the candidate shortlist (top-5 by axis-prior
consistency, then top-3 by relative angle) and the combination search are all
batched tensor ops over a static combination table (S <= 4 => <= 27 combos;
SURVEY.md §7(5)).

Also provides the axis-prior EMA update (ref ``update_slot_pair_axis_prior``,
:883-899) as a pure function so the prior lives in train-state.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def _skew_axis(R: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    from ..geom.so3 import safe_normalize

    return safe_normalize(ax)


def select_slot_orbits_axis_prior(
    orbit_cost: jnp.ndarray,   # [B, S, A] per-(slot, anchor) recon loss
    slot_R: jnp.ndarray,       # [B, S, A, 3, 3] anchor-composed rotations
    axis_prior: jnp.ndarray,   # [S, 3]
    slot_weights: jnp.ndarray, # [B, S]
):
    """Returns (slot_orbits [B, S], selected_axes [B, S, 3])."""
    B, S, A = orbit_cost.shape
    base = slot_R[:, 0]                                     # [B, A, 3, 3]
    # rel[b, s, a, c] = base[a]^T slot_R[s, c]
    rel = jnp.einsum("baji,bscjk->bsacik", base, slot_R)    # [B,S,A,A,3,3]
    axes = _skew_axis(rel)                                  # [B,S,A,A,3]
    dots = jnp.einsum("bsacx,sx->bsac", axes, axis_prior)   # [B,S,A,A]

    # shortlist: top-5 by prior consistency, then top-3 of those by angle
    d5, i5 = jax.lax.top_k(dots, 5)                         # [B,S,A,5]
    tr = jnp.einsum("bsacii->bsac", rel)
    ang5 = jnp.take_along_axis((tr - 1.0) * 0.5, i5, axis=-1)
    a3, i3 = jax.lax.top_k(ang5, 3)
    cand_idx = jnp.take_along_axis(i5, i3, axis=-1)         # [B,S,A,3]
    cand_dots = jnp.take_along_axis(d5, i3, axis=-1)        # [B,S,A,3]

    # static combination table over moving slots
    combos = np.asarray(
        list(itertools.product(range(3), repeat=max(S - 1, 1))), dtype=np.int32
    )                                                       # [K, S-1]
    K = combos.shape[0]
    cj = jnp.asarray(combos)                                # [K, S-1]
    # score[b, a, k] = sum_{s>=1} cand_dots[b, s, a, cj[k, s-1]] * w[b, s]
    moving = cand_dots[:, 1:]                               # [B, S-1, A, 3]
    w = slot_weights[:, 1:]                                 # [B, S-1]
    sel = jnp.take_along_axis(
        moving[:, None],                                    # [B, 1, S-1, A, 3]
        cj[None, :, :, None, None],                         # [1, K, S-1, 1, 1]
        axis=-1,
    )[..., 0]                                               # [B, K, S-1, A]
    score = jnp.einsum("bksa,bs->bak", sel, w)              # [B, A, K]

    flat = score.reshape(B, A * K)
    best = jnp.argmax(flat, axis=-1)
    best_a = (best // K).astype(jnp.int32)                  # base anchor
    best_k = (best % K).astype(jnp.int32)

    # moving-slot orbits from the chosen combination
    comb = cj[best_k]                                       # [B, S-1]
    ci = jnp.take_along_axis(
        cand_idx[:, 1:],
        best_a[:, None, None, None],
        axis=2,
    )[:, :, 0]                                              # [B, S-1, 3]
    mov_orbits = jnp.take_along_axis(ci, comb[..., None], axis=-1)[..., 0]
    slot_orbits = jnp.concatenate([best_a[:, None], mov_orbits], axis=1)

    # axes at the selected orbits (for the prior EMA): axes[b,s,best_a,orbit_s]
    ax_base = jnp.take_along_axis(
        axes, best_a[:, None, None, None, None], axis=2
    )[:, :, 0]                                              # [B, S, A, 3]
    sel_axes = jnp.take_along_axis(
        ax_base, slot_orbits[:, :, None, None], axis=2
    )[:, :, 0]                                              # [B, S, 3]
    return slot_orbits, sel_axes


def update_axis_prior(
    axis_prior: jnp.ndarray,   # [S, 3]
    axes: jnp.ndarray,         # [B, S, 3] selected per-sample axes
    factor: float = 0.9,
) -> jnp.ndarray:
    """Sign-aligned EMA of per-slot joint-axis direction
    (ref ``update_slot_pair_axis_prior``)."""
    d = jnp.einsum("bsx,sx->bs", axes, axis_prior)
    axes = jnp.where(d[..., None] < 0, -axes, axes)
    avg = axes.mean(0)
    avg = avg / jnp.clip(jnp.linalg.norm(avg, axis=-1, keepdims=True), 1e-8)
    new = axis_prior * factor + (1.0 - factor) * avg
    return new / jnp.clip(jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-8)
