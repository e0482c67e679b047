"""Data-parallel train/eval step builders (shard_map over the device mesh).

Replaces DDP + SyncBatchNorm + manual all-reduce (ref
``trainer_unsup_arti_align.py:425-445,779-797``):

* batch sharded on the ``data`` mesh axis, parameters replicated;
* gradients and metrics reduced with ``lax.pmean`` over ICI;
* cross-replica normalisation statistics come for free — ``EquivNorm`` takes
  the same axis name (SyncBN semantics).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .mesh import DATA_AXIS


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))


def _split_variables(variables):
    """Split a flax variables dict into (trainable params, other collections
    such as batch_stats)."""
    if "params" in variables:
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
    else:  # plain param tree (no collections)
        params, rest = variables, {}
    return params, rest


def make_dp_train_step(
    loss_fn: Callable[..., tuple],
    optimizer,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    donate: bool = True,
):
    """loss_fn(variables, batch, rng) -> (loss, (metrics-dict, model_state)).

    ``variables`` is the full flax variables dict ({'params': ..., possibly
    'batch_stats': ...}); ``model_state`` is the dict of updated non-param
    collections (``{}`` when the model has none).  Gradients flow to the
    'params' sub-tree only.  Returns step(variables, opt_state, batch, rng) ->
    (variables, opt_state, metrics) with batch sharded over ``axis_name`` and
    grads / metrics / model_state pmean'd (SyncBN semantics for batch_stats).
    """

    def _local_step(variables, opt_state, batch, rng):
        rng = rng[0]  # undo the leading shard axis on the per-device key
        params, rest = _split_variables(variables)

        def lf(p):
            return loss_fn({"params": p, **rest}, batch, rng)

        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean({**metrics, "loss": loss}, axis_name)
        new_state = jax.lax.pmean(new_state, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return {"params": params, **new_state}, opt_state, metrics

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(variables, opt_state, batch, rngs):
        return sharded(variables, opt_state, batch, rngs)

    return step


def make_dp_multi_train_step(
    loss_fn: Callable[..., tuple],
    optimizer,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    donate: bool = True,
):
    """Like make_dp_train_step, but executes K optimizer steps per dispatch
    via ``lax.scan`` over stacked batches — one host->device transfer and one
    RPC round-trip per K steps.  On relayed TPU backends the per-call
    overhead (~0.3-0.9 s) otherwise dominates the ~0.1 s step.

    step(variables, opt_state, batches, rngs) where every batch leaf has a
    leading [K, ...] axis and rngs is [K, n_dev, 2]; returns mean metrics.
    """

    def _local_step(variables, opt_state, batch, rng):
        rng = rng[0]
        params, rest = _split_variables(variables)

        def lf(p):
            return loss_fn({"params": p, **rest}, batch, rng)

        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean({**metrics, "loss": loss}, axis_name)
        new_state = jax.lax.pmean(new_state, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return {"params": params, **new_state}, opt_state, metrics

    def _local_multi(variables, opt_state, batches, rngs):
        def body(carry, xs):
            v, o = carry
            b, r = xs
            v, o, m = _local_step(v, o, b, r)
            return (v, o), m

        (variables, opt_state), ms = jax.lax.scan(
            body, (variables, opt_state), (batches, rngs)
        )
        return variables, opt_state, jax.tree_util.tree_map(
            lambda x: x.mean(0), ms
        )

    sharded = shard_map(
        _local_multi,
        mesh=mesh,
        # batches: [K, B/n_dev, ...] per device -> shard axis 1
        in_specs=(P(), P(), P(None, axis_name), P(None, axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(variables, opt_state, batches, rngs):
        return sharded(variables, opt_state, batches, rngs)

    return step


def make_dp_train_step_with_state(
    loss_fn: Callable[..., tuple],
    optimizer,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
):
    """Like make_dp_train_step but threads an auxiliary replicated state
    (e.g. the axis-prior EMA): loss_fn(variables, state, batch, rng) ->
    (loss, (metrics, new_state, model_state)).  new_state and model_state
    (non-param collections, e.g. batch_stats) are pmean'd across devices."""

    def _local_step(variables, state, opt_state, batch, rng):
        rng = rng[0]
        params, rest = _split_variables(variables)

        def lf(p):
            return loss_fn({"params": p, **rest}, state, batch, rng)

        (loss, (metrics, new_state, model_state)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis_name)
        metrics = jax.lax.pmean({**metrics, "loss": loss}, axis_name)
        new_state = jax.lax.pmean(new_state, axis_name)
        model_state = jax.lax.pmean(model_state, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return {"params": params, **model_state}, new_state, opt_state, metrics

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_eval_step(apply_fn: Callable, mesh: Mesh, axis_name: str = DATA_AXIS):
    sharded = shard_map(
        lambda params, batch: apply_fn(params, batch),
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)


def per_device_rngs(rng: jax.Array, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Split a key into one per device along the data axis: [n_dev, 2]."""
    n = mesh.shape[axis_name]
    return jax.random.split(rng, n)
