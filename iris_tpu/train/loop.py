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
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

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


def make_train_chunk(loss_fn: Callable, optimizer, mesh, k_steps: int):
    """jit'd chunk(params, opt_state, batches_K, key, step0) ->
    (params, opt_state, losses (K,), auxes {name: (K,)}).

    Runs k_steps optimizer steps inside ONE lax.scan: one dispatch and one
    stacked-batch transfer per chunk instead of per step. On the tunneled
    TPU every host->device transfer and op dispatch costs ~20-60 ms of
    RTT, which made the per-step Python loop host-bound (measured 0.66
    s/step where the step itself is ~0.15 s). Keys are folded from the
    ABSOLUTE step index, so chunked and unchunked runs consume the same
    key stream and resume identically."""

    def chunk(params, opt_state, batches, key, step0):
        def body(carry, xs):
            p, o = carry
            batch, i = xs
            k = jax.random.fold_in(key, i)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, k)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), (loss, aux)

        steps = step0 + jnp.arange(k_steps, dtype=jnp.int32)
        (params, opt_state), (losses, auxes) = jax.lax.scan(
            body, (params, opt_state), (batches, steps))
        return params, opt_state, losses, auxes

    rep = replicated_sharding(mesh)
    shard = NamedSharding(mesh, P(None, "data"))   # (K, B, ...) leaves
    return jax.jit(
        chunk,
        in_shardings=(rep, rep, shard, rep, rep),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1),
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
    chunk_steps: int = 1,
):
    """Drive training for steps [start_step, n_steps) over `batches` (an
    iterator of pytrees with leading batch axis, already positioned at
    start_step — see RayBatcher.iter_from).

    Full-state resume (reference Lightning resume, train_brdf_crf.py:541-545):
    pass the restored `opt_state` and `start_step`; the per-step
    jax.random.fold_in(key, step) keying makes the resumed stream identical
    to an uninterrupted run. state_hooks are called as h(step, params,
    opt_state) every step (each hook picks its own cadence).

    chunk_steps > 1 runs that many optimizer steps per dispatch inside one
    lax.scan (make_train_chunk): ~4x wall-clock on the tunneled TPU, same
    key stream and update math. hooks/state_hooks then see end-of-chunk
    params (validation/checkpoint cadence should be a multiple of
    chunk_steps; state_hooks fire once per chunk at its LAST step index so
    a resume never replays updates already applied).

    Returns params, or (params, opt_state) with return_state=True."""
    if mesh is None:
        mesh = data_mesh()
    if opt_state is None:
        opt_state = optimizer.init(params)
    opt_state = replicate(mesh, opt_state)
    params = replicate(mesh, params)
    step_fn = None
    chunk_fns: dict = {}
    chunk_shard = NamedSharding(mesh, P(None, "data"))

    t0 = time.time()
    it = iter(batches)
    step = start_step
    while step < n_steps:
        k_chunk = min(max(int(chunk_steps), 1), n_steps - step)
        if k_chunk > 1:
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs),
                *[next(it) for _ in range(k_chunk)])
            stacked = jax.device_put(stacked, chunk_shard)
            if k_chunk not in chunk_fns:
                chunk_fns[k_chunk] = make_train_chunk(
                    loss_fn, optimizer, mesh, k_chunk)
            params, opt_state, losses, auxes = chunk_fns[k_chunk](
                params, opt_state, stacked, key, jnp.int32(step))
            want_log = log_fn and (
                any((step + j) % log_every == 0 for j in range(k_chunk))
                or step + k_chunk == n_steps)
            if hooks or want_log:
                losses_h = np.asarray(losses)
                auxes_h = {k_: np.asarray(v) for k_, v in
                           (auxes or {}).items()}
                for j in range(k_chunk):
                    s = step + j
                    aux_j = {k_: v[j] for k_, v in auxes_h.items()}
                    if hooks:
                        for h in hooks:
                            h(s, params, losses_h[j], aux_j)
                    if log_fn and (s % log_every == 0 or s == n_steps - 1):
                        msg = (f"step {s:6d}  loss {float(losses_h[j]):.6f}"
                               "  " + "  ".join(
                                   f"{k_}={float(v):.5f}"
                                   for k_, v in aux_j.items())
                               + f"  [{time.time() - t0:.1f}s]")
                        log_fn(msg)
            if state_hooks:
                for h in state_hooks:
                    h(step + k_chunk - 1, params, opt_state)
            step += k_chunk
            continue
        batch = next(it)
        batch = jax.tree_util.tree_map(lambda x: shard_batch(mesh, x), batch)
        k = jax.random.fold_in(key, step)
        if step_fn is None:
            step_fn = make_train_step(loss_fn, optimizer, mesh)
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
        step += 1
    if return_state:
        return params, opt_state
    return params
