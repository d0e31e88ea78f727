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


def bench_chained_keyed(fn, key, iters: int = 8, warmup: int = 2):
    """bench_keyed with the per-iteration host round trip removed: outputs
    are chained (acc = fn(k_i) + acc * 1e-12) and ONE scalar is fetched at
    the end. The device executes enqueued programs in stream order and
    every call has fresh arguments (no execution-cache hit), so the wall
    clock covers all iterations of real device work; fetch-per-iteration
    adds ~40-60 ms of tunnel RTT per iteration (probe_floor.py) that this
    keeps out of the clock. fn(key) must return a scalar whose value
    depends on the full computation (sum a grad leaf in if timing fwd+bwd
    — PERF.md DCE trap). Validated against scan-in-jit timing to <1%."""
    import jax.numpy as jnp

    acc = jnp.float32(0.0)
    for i in range(warmup):
        acc = fn(jax.random.fold_in(key, 1000 + i)) + acc * 1e-12
    _fetch(acc)
    acc = jnp.float32(0.0)
    t0 = time.time()
    for i in range(iters):
        acc = fn(jax.random.fold_in(key, i)) + acc * 1e-12
    _fetch(acc)
    return (time.time() - t0) / iters


def bench_scan(fn, key, iters: int = 16):
    """Gold-standard device timing: run `iters` calls of fn inside ONE
    jitted lax.scan, carry-chained so no iteration can be elided or
    reordered, with a single dispatch + fetch for the whole run. Unlike
    bench_chained_keyed this stays honest for SMALL fns too (an enqueue
    costs ~20 ms of host time through the tunnel, so host-side loops are
    host-bound below ~100 ms/call). The one remaining RTT is amortized
    over `iters` (~3 ms/iter at 16). Costs one extra compile of fn inside
    the scan wrapper. fn(key) must return a scalar that depends on the
    full computation (sum a grad leaf in when timing fwd+bwd)."""
    import jax.numpy as jnp

    @jax.jit
    def run(k0):
        def body(carry, i):
            v = fn(jax.random.fold_in(k0, i))
            return v + carry * 1e-12, ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
        return out

    _fetch(run(jax.random.fold_in(key, 999)))   # compile + warm
    t0 = time.time()
    _fetch(run(key))
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
