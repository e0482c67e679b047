"""Checkpoint save/restore.

Reproduces the reference protocol (SURVEY.md §5.4): weight checkpoints at
``<dir>/<exp_id>_net_Iter<k>.msgpack``; partial loads by key-intersection
(``safe_load_ckpt_common``, trainer:383-396) and the stage-0 -> stage-1
'glb'-filtered load (trainer:364-381), which in this framework is simply
loading the stage-0 model checkpoint into the SlotPoseModel's alignment
companion (the two-stage protocol keeps the stage-0 model separate).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, tree: Any):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def load_checkpoint(path: str, target: Any):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_train_state(
    path: str, params: Any, opt_state: Any, step: int, axis_prior: Any = None
):
    """Full-train-state checkpoint: params + optimizer state + step.

    The reference saves weights only (trainer:457-474), which silently resets
    Adam moments and the LR-schedule position on every resume — a measurable
    full-lr jolt when a run is resumed mid-decay (observed as joint-axis
    drift in the round-2 oven run).  Periodic checkpoints therefore carry the
    whole state; ``load_checkpoint``-style weight-only files remain readable
    (eval and the two-stage glb protocol keep using plain params files).

    ``axis_prior`` (slot_single_mode=0 only): the per-slot sign-aligned EMA
    axis used for orbit selection (ref update_slot_pair_axis_prior) is train
    state too — resuming without it resets every slot's prior to the +y
    default and jolts the orbit selection."""
    tree = {
        "params": jax.device_get(params),
        "opt_state": serialization.to_state_dict(jax.device_get(opt_state)),
        "step": int(step),
    }
    if axis_prior is not None:
        tree["axis_prior"] = np.asarray(jax.device_get(axis_prior))
    save_checkpoint(path, tree)


def is_train_state(path: str) -> bool:
    """Cheap sniff: full-train-state files deserialize to a dict with an
    'opt_state' key when loaded without a target."""
    with open(path, "rb") as f:
        try:
            raw = serialization.msgpack_restore(f.read())
        except Exception:
            return False
    return isinstance(raw, dict) and "opt_state" in raw and "params" in raw


def load_train_state(path: str, params_target: Any, opt_target: Any):
    """-> (params, opt_state, step, axis_prior | None).  Accepts weight-only
    files too (opt_state target returned untouched, step 0) and pre-round-3
    train-state files without the axis_prior field (None)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
        params = serialization.from_state_dict(params_target, raw["params"])
        opt_state = serialization.from_state_dict(opt_target, raw["opt_state"])
        prior = raw.get("axis_prior")
        if prior is not None:
            prior = np.asarray(prior)
        return params, opt_state, int(raw.get("step", 0)), prior
    params = serialization.from_state_dict(params_target, raw)
    return params, opt_target, 0, None


def load_params_any(path: str, target: Any):
    """Load a params tree from either a weight-only checkpoint or a
    full-train-state file (eval does not care about optimizer state)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
        raw = raw["params"]
    return serialization.from_state_dict(target, raw)


def safe_load_common(target_params: Any, source_params: Any) -> Any:
    """Key-intersection update: copy every leaf present in both trees with a
    matching shape (ref ``safe_load_ckpt_common``)."""
    tflat = flatten_dict(serialization.to_state_dict(target_params))
    sflat = flatten_dict(serialization.to_state_dict(source_params))
    loaded = 0
    for k, v in sflat.items():
        if k in tflat and np.shape(tflat[k]) == np.shape(v):
            tflat[k] = v
            loaded += 1
    out = unflatten_dict(tflat)
    return serialization.from_state_dict(target_params, out), loaded


def load_filtered(target_params: Any, source_params: Any, substring: str) -> Any:
    """Copy only leaves whose path contains ``substring`` (ref
    ``safe_load_ckpt`` 'glb' filter)."""
    tflat = flatten_dict(serialization.to_state_dict(target_params))
    sflat = flatten_dict(serialization.to_state_dict(source_params))
    for k, v in sflat.items():
        if k in tflat and any(substring in str(p) for p in k):
            if np.shape(tflat[k]) == np.shape(v):
                tflat[k] = v
    return serialization.from_state_dict(target_params, unflatten_dict(tflat))
