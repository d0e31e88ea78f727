"""Trustworthy device timing helpers.

In this environment, repeating a jitted call on IDENTICAL input buffers can
be served from an execution cache (measured: same-args loops report
microseconds for work that takes seconds with fresh inputs). Every
benchmark must therefore vary its inputs per iteration — the helpers here
thread a fresh PRNG key or input batch into each call and block on the
final result.
"""

from __future__ import annotations

import time

import jax


def _fetch(out):
    """Force a real host round-trip: block_until_ready alone can return
    before remote execution finishes on this backend."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def bench_keyed(fn, key, iters: int = 5, warmup: int = 1):
    """Time fn(key_i) with a fresh fold_in key per call, fetching each
    result to host. Returns seconds."""
    for i in range(warmup):
        _fetch(fn(jax.random.fold_in(key, 1000 + i)))
    t0 = time.time()
    for i in range(iters):
        _fetch(fn(jax.random.fold_in(key, i)))
    return (time.time() - t0) / iters


def bench_chained(step, iters: int = 8, warmup: int = 2):
    """Chained-carry timing: removes the per-iteration host round trip.

    `step(i, carry)` must return a scalar jax array that depends on the
    iteration's full computation, and must feed `carry` into its inputs in
    a way the compiler cannot fold away (e.g. `origins + carry * 1e-12`).
    All `iters` calls are enqueued back-to-back and ONE scalar is fetched
    at the end: the device executes enqueued programs in stream order and
    each call's inputs depend on the previous call's outputs, so the wall
    clock is a true lower-bound-tight measure of device throughput, while
    fetch-per-iteration timing adds ~40 ms of tunnel RTT to every
    iteration (measured, probe_floor.py). Grads must be jit OUTPUTS of
    the step to stay live (PERF.md DCE trap).

    Returns seconds per iteration."""
    import jax.numpy as jnp

    carry = jnp.float32(0.0)
    for i in range(warmup):
        carry = step(i, carry)
    _fetch(carry)
    carry = jnp.float32(0.0)
    t0 = time.time()
    for i in range(iters):
        carry = step(warmup + i, carry)
    _fetch(carry)
    return (time.time() - t0) / iters


def bench_batched(fn, make_input, iters: int = 5, warmup: int = 1):
    """Time fn(x_i) with freshly generated inputs (pre-built outside the
    timed region). make_input(i) -> pytree."""
    inputs = [make_input(i) for i in range(warmup + iters)]
    inputs = jax.block_until_ready(inputs)
    for i in range(warmup):
        jax.block_until_ready(fn(inputs[i]))
    t0 = time.time()
    outs = [fn(inputs[warmup + i]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / iters
