"""Optimizer factory: Adam/SGD + MultiStep LR schedule.

Parity with reference configure_optimizers (train_brdf_crf.py:106-114):
Adam(lr=1e-3, weight_decay=0) with MultiStepLR(milestones, gamma=0.5)
becomes optax adam over a piecewise-constant schedule.
"""

from __future__ import annotations

import jax
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


def scale_updates_for_key(optimizer, key: str, scale: float):
    """Multiply the updates of params[key] by `scale`.

    Adam moves a raw-valued leaf by ~lr per step regardless of magnitude,
    so an emitter radiance of O(10) starting from ~0 needs O(10/lr) steps
    (the reference pays this with multi-epoch budgets, train.sh). An
    update scale on just the radiance leaf converges it ~scale x faster
    without touching the parity default (scale=1 is a no-op)."""
    if scale == 1.0:
        return optimizer

    def scale_tx():
        def init(params):
            return optax.EmptyState()

        def update(updates, state, params=None):
            up = dict(updates)
            if key in up:
                up[key] = jax.tree_util.tree_map(lambda g: g * scale,
                                                 up[key])
            return type(updates)(up) if not isinstance(updates, dict) \
                else up, state
        return optax.GradientTransformation(init, update)

    return optax.chain(optimizer, scale_tx())
