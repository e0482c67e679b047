"""LR schedules (ref ``vgtk/vgtk/utils.py:33-68`` LearningRateScheduler:
lr = init * rate^(step / decay_step), or constant)."""
from __future__ import annotations

import optax


def make_schedule(init_lr: float, lr_type: str = "exp_decay",
                  decay_rate: float = 0.7, decay_step: int = 20000):
    if lr_type == "constant":
        return optax.constant_schedule(init_lr)
    return lambda step: init_lr * (decay_rate ** (step / decay_step))


def make_optimizer(init_lr: float, lr_type: str = "exp_decay",
                   decay_rate: float = 0.7, decay_step: int = 20000):
    sched = make_schedule(init_lr, lr_type, decay_rate, decay_step)
    return optax.adam(learning_rate=sched)
