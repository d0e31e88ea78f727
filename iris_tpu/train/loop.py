"""Generic jit-compiled training loop (replaces pytorch-lightning L5).

A stage provides loss_fn(params, batch, key) -> (loss, aux_dict); the loop
compiles one SPMD step over a data mesh: params replicated, batch sharded on
axis 0, gradients psum'd by GSPMD. Checkpoint/resume via train/checkpoint.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable

import jax
import optax

from iris_tpu.parallel.sharding import (
    batch_sharding, data_mesh, replicate, replicated_sharding, shard_batch,
)


@dataclass
class TrainerConfig:
    log_every: int = 50
    n_devices: int | None = None


def make_train_step(loss_fn: Callable, optimizer, mesh=None, donate=True):
    """Returns jit'd step(params, opt_state, batch, key) ->
    (params, opt_state, loss, aux)."""

    def step(params, opt_state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, shard, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )


def run_training(
    loss_fn: Callable,
    params,
    batches: Iterable,
    optimizer,
    n_steps: int,
    key,
    mesh=None,
    log_every: int = 50,
    log_fn: Callable | None = print,
    hooks: list | None = None,
    opt_state=None,
    start_step: int = 0,
    state_hooks: list | None = None,
    return_state: bool = False,
):
    """Drive training for steps [start_step, n_steps) over `batches` (an
    iterator of pytrees with leading batch axis, already positioned at
    start_step — see RayBatcher.iter_from).

    Full-state resume (reference Lightning resume, train_brdf_crf.py:541-545):
    pass the restored `opt_state` and `start_step`; the per-step
    jax.random.fold_in(key, step) keying makes the resumed stream identical
    to an uninterrupted run. state_hooks are called as h(step, params,
    opt_state) every step (each hook picks its own cadence).

    Returns params, or (params, opt_state) with return_state=True."""
    if mesh is None:
        mesh = data_mesh()
    if opt_state is None:
        opt_state = optimizer.init(params)
    opt_state = replicate(mesh, opt_state)
    params = replicate(mesh, params)
    step_fn = make_train_step(loss_fn, optimizer, mesh)

    t0 = time.time()
    it = iter(batches)
    for step in range(start_step, n_steps):
        batch = next(it)
        batch = jax.tree_util.tree_map(lambda x: shard_batch(mesh, x), batch)
        k = jax.random.fold_in(key, step)
        params, opt_state, loss, aux = step_fn(params, opt_state, batch, k)
        if hooks:
            for h in hooks:
                h(step, params, loss, aux)
        if state_hooks:
            for h in state_hooks:
                h(step, params, opt_state)
        if log_fn and (step % log_every == 0 or step == n_steps - 1):
            lv = float(loss)
            msg = f"step {step:6d}  loss {lv:.6f}  " + "  ".join(
                f"{k_}={float(v):.5f}" for k_, v in (aux or {}).items()
            ) + f"  [{time.time() - t0:.1f}s]"
            log_fn(msg)
    if return_state:
        return params, opt_state
    return params
