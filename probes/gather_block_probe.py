"""Round-5: can the encode FORWARD gather ride the 2-8 MB fast tier by
splitting into per-level-block gathers (the compact-scatter trick,
round-5a, applied to reads)?

gather_size_r5.log showed the tier cliff: 12.2 ns/row at <=8 MB targets
vs 14.5-14.8 at >=16 MB. The production fwd gathers use GLOBAL indices
into the full table (134 MB row mode, 64 MB packed 32x2) — per-level
slicing confines each gather op's random accesses to one level block
(16 MB/2 MB), possibly realizing the fast tier. Arms (exact production
shapes, spatially-uncorrelated worst-case indices):

  32x2 packed (B=524288 queries x 32 levels, uint32 2 MB blocks):
    a. global gather from the 64 MB table       (today's formulation)
    b. 32 per-level gathers with local indices
  8x8 row mode (B=262144 x 8 levels, (T,8) f32 16 MB / bf16 8 MB blocks):
    c. global row gather from 134 MB            (today's formulation)
    d. 8 per-level-block row gathers, f32
    e. 8 per-level-block row gathers, bf16 (cast from f32 master)
    f. global row gather from the bf16 cast     (no blocking)

Run DETACHED: setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python probes/gather_block_probe.py > records/gather_block_r5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 1 << 19


def main():
    from iris_tpu.utils.timing import bench_scan

    def bench(name, fn, rows):
        t0 = time.time()
        dt = bench_scan(fn, jax.random.PRNGKey(0), iters=8)
        print(json.dumps({
            "probe": name, "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt / rows * 1e9, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)

    # ---- 32x2 packed flat: one uint32 per (level, entry)
    L, B = 32, 524288
    tab32 = jax.random.randint(jax.random.PRNGKey(1), (L * T,), 0,
                               1 << 30, jnp.uint32)

    def packed_global(key):
        idx = jax.random.randint(key, (B, L), 0, T) \
            + jnp.arange(L, dtype=jnp.int32)[None, :] * T
        idx = jax.lax.optimization_barrier(idx.reshape(-1))
        return jnp.sum(tab32[idx].astype(jnp.float32)) * 1e-20

    def packed_blocked(key):
        idx = jax.random.randint(key, (B, L), 0, T)
        idx = jax.lax.optimization_barrier(idx)
        acc = jnp.float32(0.0)
        for j in range(L):
            blk = jax.lax.dynamic_slice_in_dim(tab32, j * T, T)
            acc = acc + jnp.sum(blk[idx[:, j]].astype(jnp.float32))
        return acc * 1e-20

    bench("32x2_packed_global_64MB", packed_global, B * L)
    bench("32x2_packed_blocked_2MB", packed_blocked, B * L)

    # ---- 8x8 row mode: (L*T, 8) rows
    L8, B8, F = 8, 262144, 8
    tab8 = jax.random.normal(jax.random.PRNGKey(2), (L8 * T, F))

    def row_global(key, tab):
        idx = jax.random.randint(key, (B8, L8), 0, T) \
            + jnp.arange(L8, dtype=jnp.int32)[None, :] * T
        idx = jax.lax.optimization_barrier(idx.reshape(-1))
        return jnp.sum(tab[idx].astype(jnp.float32)) * 1e-20

    def row_blocked(key, tab):
        idx = jax.random.randint(key, (B8, L8), 0, T)
        idx = jax.lax.optimization_barrier(idx)
        acc = jnp.float32(0.0)
        for j in range(L8):
            blk = jax.lax.dynamic_slice_in_dim(tab, j * T, T)
            acc = acc + jnp.sum(blk[idx[:, j]].astype(jnp.float32))
        return acc * 1e-20

    bench("8x8_row_global_134MB", lambda k: row_global(k, tab8), B8 * L8)
    bench("8x8_row_blocked_16MB", lambda k: row_blocked(k, tab8), B8 * L8)
    bench("8x8_row_blocked_bf16_8MB",
          lambda k: row_blocked(k, tab8.astype(jnp.bfloat16)), B8 * L8)
    bench("8x8_row_global_bf16_67MB",
          lambda k: row_global(k, tab8.astype(jnp.bfloat16)), B8 * L8)
    print("GATHER_BLOCK_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
