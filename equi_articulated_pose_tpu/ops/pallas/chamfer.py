"""Pallas TPU chamfer kernel + gather-based custom VJP.

The slot-orbit chamfer is the FLOP/memory hot spot of the stage-1 loss
(ref ``unsup_..._40:2534`` builds a [bz, ns, na, M, N] tensor; SURVEY.md
§7.3(6)).  Two optimisations here:

1. a Pallas forward that streams b-tiles through VMEM and keeps a running
   (min, argmin) — the [N, M] distance matrix never touches HBM;
2. a custom VJP that backpropagates through the saved nearest-neighbour
   indices with gathers/scatter-adds — the backward never rebuilds the
   distance matrix (XLA's autodiff of min over a materialised d2 does).

The public entry ``chamfer_sq_fused`` works on [..., N, 3] x [..., M, 3] with
arbitrary leading batch dims and falls back to the XLA path off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

_TN = 256  # query rows per grid step
_TM = 1024  # support points per inner tile


def _nn_kernel(a_ref, b_ref, dist_ref, idx_ref, *, tm: int):
    """One grid step: a-block [1, TN, 4] vs all of b [1, M, 4] (xyz padded
    with 0).  Writes min distance [1, TN] and argmin [1, TN]."""
    a = a_ref[0]  # [TN, 4]
    M = b_ref.shape[1]
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [TN, 1]

    n_tiles = M // tm

    def body(t, carry):
        best, best_i = carry
        b = b_ref[0, pl.ds(t * tm, tm), :]  # [tm, 4]
        b2 = jnp.sum(b * b, axis=-1)[None, :]
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d2 = a2 + b2 - 2.0 * cross  # [TN, tm]
        # padding rows carry a FAR sentinel coordinate so they never win
        tile_min = jnp.min(d2, axis=-1)
        tile_arg = jnp.argmin(d2, axis=-1).astype(jnp.int32) + t * tm
        take = tile_min < best
        best = jnp.where(take, tile_min, best)
        best_i = jnp.where(take, tile_arg, best_i)
        return best, best_i

    init = (
        jnp.full((a.shape[0],), jnp.inf, jnp.float32),
        jnp.zeros((a.shape[0],), jnp.int32),
    )
    best, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[0, 0, 0, :] = best
    idx_ref[0, 0, 0, :] = best_i


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _nn_one_way_pallas(a: jnp.ndarray, b: jnp.ndarray):
    """a [BB, N, 3], b [BB, M, 3] -> (dist [BB, N], idx [BB, N])."""
    BB, N, _ = a.shape
    M = b.shape[1]
    Np = -(-N // _TN) * _TN
    tm = min(_TM, max(128, -(-M // 128) * 128))
    Mp = -(-M // tm) * tm
    # pad coords to 4 lanes; pad b rows with a FAR sentinel so they never win
    a4 = _pad_to(_pad_to(a.astype(jnp.float32), Np, 1), 4, 2)
    b4 = _pad_to(_pad_to(b.astype(jnp.float32), Mp, 1, value=1e6), 4, 2)

    n_nt = Np // _TN
    grid = (BB, n_nt)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TN, 4), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Mp, 4), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, _TN), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, _TN), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BB, n_nt, 1, _TN), jnp.float32),
            jax.ShapeDtypeStruct((BB, n_nt, 1, _TN), jnp.int32),
        ],
    )(a4, b4)
    dist = dist.reshape(BB, Np)[:, :N]
    idx = idx.reshape(BB, Np)[:, :N]
    return dist, jnp.clip(idx, 0, M - 1)


def _nn_one_way_xla(a: jnp.ndarray, b: jnp.ndarray):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, -1)[..., :, None]
    b2 = jnp.sum(b * b, -1)[..., None, :]
    d2 = a2 + b2 - 2.0 * jnp.einsum(
        "bnc,bmc->bnm", a, b, preferred_element_type=jnp.float32
    )
    return jnp.min(d2, -1), jnp.argmin(d2, -1).astype(jnp.int32)


def _use_pallas() -> bool:
    return _HAVE_PLTPU and jax.default_backend() == "tpu"


def _nn_one_way(a, b):
    if _use_pallas():
        return _nn_one_way_pallas(a, b)
    return _nn_one_way_xla(a, b)


# ---------------------------------------------------------------------------
# custom VJP wrapper (flat batch)
# ---------------------------------------------------------------------------
@jax.custom_vjp
def _chamfer_flat(a: jnp.ndarray, b: jnp.ndarray):
    d1, _ = _nn_one_way(a, b)
    d2, _ = _nn_one_way(b, a)
    return d1, d2


def _chamfer_fwd(a, b):
    d1, i1 = _nn_one_way(a, b)
    d2, i2 = _nn_one_way(b, a)
    return (d1, d2), (a, b, i1, i2)


def _chamfer_bwd(res, g):
    a, b, i1, i2 = res
    g1, g2 = g  # [BB, N], [BB, M]
    bn = jnp.take_along_axis(b, i1[..., None], axis=1)  # nearest b per a
    am = jnp.take_along_axis(a, i2[..., None], axis=1)  # nearest a per b
    diff1 = 2.0 * (a - bn)      # d d1/d a
    diff2 = 2.0 * (b - am)      # d d2/d b
    da = g1[..., None] * diff1
    db = g2[..., None] * diff2
    # scatter contributions to the matched points
    BB = a.shape[0]
    db_scatter = jax.vmap(
        lambda idx, upd, width: jnp.zeros((width, 3)).at[idx].add(upd)
        , in_axes=(0, 0, None)
    )(i1, -g1[..., None] * diff1, b.shape[1])
    da_scatter = jax.vmap(
        lambda idx, upd, width: jnp.zeros((width, 3)).at[idx].add(upd)
        , in_axes=(0, 0, None)
    )(i2, -g2[..., None] * diff2, a.shape[1])
    return da + da_scatter, db + db_scatter


_chamfer_flat.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_sq_fused(a: jnp.ndarray, b: jnp.ndarray):
    """Squared chamfer with fused forward and index-gather backward.

    a [..., N, 3], b [..., M, 3] -> (dist1 [..., N], dist2 [..., M]).
    """
    batch_shape = a.shape[:-2]
    N, M = a.shape[-2], b.shape[-2]
    af = a.reshape((-1, N, 3))
    bf = b.reshape((-1, M, 3))
    d1, d2 = _chamfer_flat(af, bf)
    return d1.reshape(batch_shape + (N,)), d2.reshape(batch_shape + (M,))
