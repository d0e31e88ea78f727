"""Round-5: does the GATHER share the scatter's target-size cliffs?

The compact-scatter fix (round-5a) left the encode FORWARD as the next
wall: 33 ms = 2.1M row-8 gathers from the 134 MB (4.2M, 8) f32 table at
~12-16 ns/row. The scatter microbench showed 2-8 MB targets run ~21
ns/row vs ~90-100 at 128 MB; if reads cliff the same way, storing the
table in bf16 (67 MB, one tier down) or gathering from a bf16 copy
would cut the forward.

Measures row-8 gathers (2.1M rows — the production per-step count) from
f32 tables of 2..134 MB, plus a bf16 67 MB arm and a bf16-cast-then-
gather arm (master f32 params, per-step cast — the realistic mixed-
precision formulation).

Run DETACHED: setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python probes/gather_size_probe.py > records/gather_size_r5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

F = 8
M = 2097152            # gathered rows per step (262144 queries x 8 levels)


def main():
    from iris_tpu.utils.timing import bench_scan

    def bench(name, fn, rows=M):
        t0 = time.time()
        dt = bench_scan(fn, jax.random.PRNGKey(0), iters=8)
        print(json.dumps({
            "probe": name, "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt / rows * 1e9, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)

    for logr in (16, 18, 19, 20, 21, 22):
        r = 1 << logr
        tab = jax.random.normal(jax.random.PRNGKey(1), (r, F))

        def f32_gather(key, tab=tab, r=r):
            idx = jax.random.randint(key, (M,), 0, r)
            return jnp.sum(tab[idx]) * 1e-20

        bench(f"f32_2^{logr}_{r * F * 4 // (1 << 20)}MB", f32_gather)

    tab_bf = jax.random.normal(
        jax.random.PRNGKey(1), (1 << 22, F)).astype(jnp.bfloat16)

    def bf16_gather(key):
        idx = jax.random.randint(key, (M,), 0, 1 << 22)
        return jnp.sum(tab_bf[idx].astype(jnp.float32)) * 1e-20

    bench("bf16_2^22_67MB", bf16_gather)

    tab_master = jax.random.normal(jax.random.PRNGKey(1), (1 << 22, F))

    def cast_then_gather(key):
        t = jax.lax.optimization_barrier(tab_master.astype(jnp.bfloat16))
        idx = jax.random.randint(key, (M,), 0, 1 << 22)
        return jnp.sum(t[idx].astype(jnp.float32)) * 1e-20

    bench("cast_bf16_then_gather", cast_then_gather)
    print("GATHER_SIZE_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
