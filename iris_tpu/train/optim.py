"""Optimizer factory: Adam/SGD + MultiStep LR schedule.

Parity with reference configure_optimizers (train_brdf_crf.py:106-114):
Adam(lr=1e-3, weight_decay=0) with MultiStepLR(milestones, gamma=0.5)
becomes optax adam over a piecewise-constant schedule.
"""

from __future__ import annotations

import optax


def make_optimizer(
    learning_rate: float = 1e-3,
    weight_decay: float = 0.0,
    milestones: tuple[int, ...] = (1000,),
    scheduler_rate: float = 0.5,
    optimizer: str = "Adam",
):
    schedule = optax.piecewise_constant_schedule(
        init_value=learning_rate,
        boundaries_and_scales={int(m): scheduler_rate for m in milestones},
    )
    if optimizer == "SGD":
        base = optax.sgd(schedule)
    else:
        base = optax.adamw(schedule, weight_decay=weight_decay) \
            if weight_decay else optax.adam(schedule)
    return base
