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
