"""LR schedules.

Covers the reference's three live regimes:

* ``exp_decay`` — lr = init * rate^(step / decay_step), the vgtk
  LearningRateScheduler (``vgtk/vgtk/utils.py:33-68``);
* ``step`` — multiply by ``decay_rate`` every ``decay_step`` steps with a
  1e-7 floor (``adjust_lr_by_step``, trainer:1133-1141; the shipped recipes
  pass --lr-adjust=2 --n-dec-steps=1000);
* ``plateau`` — host-driven multiplicative decay when the loss has not
  improved for ``PLATEAU_PATIENCE`` steps (``adjust_lr_by_loss``,
  trainer:1119-1131).  Built with ``optax.inject_hyperparams`` so the
  trainer can rescale the learning rate between jitted steps.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

LR_FLOOR = 1e-7
PLATEAU_PATIENCE = 30


def make_schedule(init_lr: float, lr_type: str = "exp_decay",
                  decay_rate: float = 0.7, decay_step: int = 20000):
    if lr_type == "constant":
        return optax.constant_schedule(init_lr)
    if lr_type == "step":
        return lambda step: jnp.maximum(
            init_lr * (decay_rate ** (step // decay_step)), LR_FLOOR
        )
    return lambda step: init_lr * (decay_rate ** (step / decay_step))


def make_optimizer(init_lr: float, lr_type: str = "exp_decay",
                   decay_rate: float = 0.7, decay_step: int = 20000):
    if lr_type == "plateau":
        return optax.inject_hyperparams(optax.adam)(learning_rate=init_lr)
    sched = make_schedule(init_lr, lr_type, decay_rate, decay_step)
    return optax.adam(learning_rate=sched)


class PlateauState:
    """Host-side loss-plateau tracker (ref adjust_lr_by_loss)."""

    def __init__(self, init_lr: float, decay_rate: float,
                 patience: int = PLATEAU_PATIENCE):
        self.lr = init_lr
        self.decay_rate = decay_rate
        self.patience = patience
        self.best = float("inf")
        self.stale = 0

    def update(self, loss: float) -> float:
        """Feed the current step loss; returns the (possibly reduced) lr."""
        if loss < self.best:
            self.best = loss
            self.stale = 0
        else:
            self.stale += 1
            if self.stale >= self.patience:
                self.lr = max(self.lr * self.decay_rate, LR_FLOOR)
                self.stale = 0
        return self.lr
