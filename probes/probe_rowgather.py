"""Gather/scatter granularity microbench: are random-index ROW gathers
bandwidth-bound where scalar gathers are latency-bound?

Decides whether a row-packed hash-table layout (8 corners x 2 bf16 packed
into one 32 B row) can beat the current 1-scalar-per-(query,level) encode.
One JSON line per probe. Run detached on TPU.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def bench(fn, key, iters=6, warmup=2):
    for i in range(warmup):
        float(fn(jax.random.fold_in(key, i)))
    t0 = time.time()
    for i in range(iters):
        float(fn(jax.random.fold_in(key, 100 + i)))
    return (time.time() - t0) / iters


def report(name, dt, n):
    print(json.dumps({"metric": name, "ns_per_elem": round(dt * 1e9 / n, 3),
                      "ms": round(dt * 1e3, 2)}), flush=True)


def main():
    N = 1 << 23          # 8.4M accesses ~= the 32-level encode's gather count

    # A. scalar gather from flat (2^19,)
    tab1 = jax.random.normal(jax.random.PRNGKey(0), (1 << 19,))

    def scalar_gather(k):
        idx = jax.random.randint(k, (N,), 0, tab1.shape[0])
        return jnp.sum(tab1[idx])
    dt = bench(jax.jit(scalar_gather), jax.random.PRNGKey(1))
    report("scalar_gather_2e19", dt, N)

    # B. row-8 gather from (2^16, 8) — same total table bytes as A/2
    tab8 = jax.random.normal(jax.random.PRNGKey(0), (1 << 16, 8))

    def row8_gather(k):
        idx = jax.random.randint(k, (N,), 0, tab8.shape[0])
        return jnp.sum(tab8[idx])
    dt = bench(jax.jit(row8_gather), jax.random.PRNGKey(2))
    report("row8_gather_2e16", dt, N)

    # C. row-8 gather from (2^19, 8) — 16 MB table
    tab8b = jax.random.normal(jax.random.PRNGKey(0), (1 << 19, 8))

    def row8b_gather(k):
        idx = jax.random.randint(k, (N,), 0, tab8b.shape[0])
        return jnp.sum(tab8b[idx])
    dt = bench(jax.jit(row8b_gather), jax.random.PRNGKey(3))
    report("row8_gather_2e19", dt, N)

    # D. row-8 gather, FEWER rows (N/8 rows of 8 = same bytes as A's N)
    def row8_fewer(k):
        idx = jax.random.randint(k, (N // 8,), 0, tab8b.shape[0])
        return jnp.sum(tab8b[idx])
    dt = bench(jax.jit(row8_fewer), jax.random.PRNGKey(4))
    report("row8_gather_Nover8", dt, N // 8)

    # E. row-128 gather from (2^13, 128), N/8 rows (bandwidth reference)
    tab128 = jax.random.normal(jax.random.PRNGKey(0), (1 << 13, 128))

    def row128_gather(k):
        idx = jax.random.randint(k, (N // 8,), 0, tab128.shape[0])
        return jnp.sum(tab128[idx])
    dt = bench(jax.jit(row128_gather), jax.random.PRNGKey(5))
    report("row128_gather_Nover8", dt, N // 8)

    # F. scalar scatter-add into (2^19,)
    def scalar_scatter(k):
        idx = jax.random.randint(k, (N,), 0, 1 << 19)
        v = jax.random.normal(jax.random.fold_in(k, 1), (N,))
        return jnp.sum(jnp.zeros((1 << 19,)).at[idx].add(v))
    dt = bench(jax.jit(scalar_scatter), jax.random.PRNGKey(6))
    report("scalar_scatter_2e19", dt, N)

    # G. row-8 scatter-add into (2^16, 8), N/8 rows
    def row8_scatter(k):
        idx = jax.random.randint(k, (N // 8,), 0, 1 << 16)
        v = jax.random.normal(jax.random.fold_in(k, 1), (N // 8, 8))
        return jnp.sum(jnp.zeros((1 << 16, 8)).at[idx].add(v))
    dt = bench(jax.jit(row8_scatter), jax.random.PRNGKey(7))
    report("row8_scatter_Nover8", dt, N // 8)

    # H. row-8 scatter-add, N rows (same row count as scalar F)
    def row8_scatter_full(k):
        idx = jax.random.randint(k, (N,), 0, 1 << 16)
        v = jax.random.normal(jax.random.fold_in(k, 1), (N, 8))
        return jnp.sum(jnp.zeros((1 << 16, 8)).at[idx].add(v))
    dt = bench(jax.jit(row8_scatter_full), jax.random.PRNGKey(8))
    report("row8_scatter_N", dt, N)

    # I. scalar gather with sorted indices (locality sensitivity)
    def scalar_gather_sorted(k):
        idx = jnp.sort(jax.random.randint(k, (N,), 0, tab1.shape[0]))
        return jnp.sum(tab1[idx])
    dt = bench(jax.jit(scalar_gather_sorted), jax.random.PRNGKey(9))
    report("scalar_gather_sorted_2e19", dt, N)


if __name__ == "__main__":
    main()
    os._exit(0)
