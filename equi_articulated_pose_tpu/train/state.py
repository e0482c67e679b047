"""Train state pytree.

Cross-step mutable state the reference keeps as module attributes / numpy
side-effects (axis-prior EMA ``unsup_..._40:883-899``, running joint stats) is
carried explicitly here, as SURVEY.md §7.3(4) prescribes.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # scalar int32
    params: Any
    opt_state: Any
    axis_prior: jnp.ndarray           # [S, 3] per-slot-pair axis prior EMA
    rng: jax.Array

    @classmethod
    def create(cls, params, opt_state, num_slots: int, rng):
        prior = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (num_slots, 1))
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            axis_prior=prior,
            rng=rng,
        )
