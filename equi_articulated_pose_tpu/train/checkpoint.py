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
import sys
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
        raw = serialization.msgpack_restore(f.read())
    return lenient_from_state_dict(target, raw, path)


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


def lenient_from_state_dict(target: Any, state: Any, what: str, min_frac: float = 0.5):
    """Strict restore with a key-intersection fallback.

    Checkpoints written before a model grew a new variable collection (e.g.
    the round-4 'state' purity-warmup counter) fail flax's strict
    ``from_state_dict`` on the *missing* keys even though every weight they
    do carry matches.  Mirror the reference's ``safe_load_ckpt_common``
    tolerance: copy every leaf present in both trees with a matching shape,
    keep the target's initial value for the rest, and report the accounting
    loudly.  A load that covers less than ``min_frac`` of the target's
    leaves raises instead — that regime means the file belongs to a
    *different model* (the round-4 wm arm once tried to resume a drawer
    checkpoint via a shared scratch dir; a silent 40%-load would have been
    far worse than the crash)."""
    try:
        return serialization.from_state_dict(target, state)
    except (ValueError, KeyError) as e:
        tflat = flatten_dict(serialization.to_state_dict(target))
        sflat = flatten_dict(state if isinstance(state, dict) else
                             serialization.to_state_dict(state))
        loaded, shape_skips = 0, 0
        for k, v in sflat.items():
            if k in tflat:
                if np.shape(tflat[k]) == np.shape(v):
                    tflat[k] = v
                    loaded += 1
                else:
                    shape_skips += 1
        frac = loaded / max(len(tflat), 1)
        missing = [k for k in tflat if k not in sflat]
        msg = (
            f"[checkpoint] lenient load of {what}: {loaded}/{len(tflat)} target "
            f"leaves restored ({frac:.0%}), {shape_skips} shape mismatches, "
            f"{len(missing)} left at init "
            f"(e.g. {['/'.join(map(str, m)) for m in missing[:3]]})"
        )
        if frac < min_frac:
            raise ValueError(
                msg + f" — below the {min_frac:.0%} floor; this checkpoint "
                "likely belongs to a different model/config"
            ) from e
        print(msg, file=sys.stderr, flush=True)
        return serialization.from_state_dict(target, unflatten_dict(tflat))


def load_train_state(path: str, params_target: Any, opt_target: Any):
    """-> (params, opt_state, step, axis_prior | None).  Accepts weight-only
    files too (opt_state target returned untouched, step 0) and pre-round-3
    train-state files without the axis_prior field (None).  Both restores are
    lenient (see ``lenient_from_state_dict``); if the optimizer state cannot
    be restored at all (shape drift in the moments), training falls back to
    fresh moments at the checkpoint's step rather than crashing."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
        params = lenient_from_state_dict(params_target, raw["params"], path + " params")
        try:
            opt_state = lenient_from_state_dict(
                opt_target, raw["opt_state"], path + " opt_state"
            )
        except ValueError as e:
            print(
                f"[checkpoint] optimizer state of {path} not restorable "
                f"({e}); resuming with FRESH Adam moments",
                file=sys.stderr,
                flush=True,
            )
            opt_state = opt_target
        prior = raw.get("axis_prior")
        if prior is not None:
            prior = np.asarray(prior)
        return params, opt_state, int(raw.get("step", 0)), prior
    params = lenient_from_state_dict(params_target, raw, path)
    return params, opt_target, 0, None


def load_params_any(path: str, target: Any):
    """Load a params tree from either a weight-only checkpoint or a
    full-train-state file (eval does not care about optimizer state)."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "opt_state" in raw and "params" in raw:
        raw = raw["params"]
    return lenient_from_state_dict(target, raw, path)


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
