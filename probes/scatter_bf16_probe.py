"""Round-5 probe 3: per-level compact scatter variants at the production
shape (262144 update rows per sampled level block, T=2^19, F=8).

scatter_size_probe established the size cliffs (2-8 MB ~21 ns/row,
16-64 MB ~48, 128 MB ~90). Production bwd_k=2 => 2 level blocks, each
(2^19, 8): f32 = 16 MB (mid tier), bf16 = 8 MB (fast tier). Measures:

  f32_block:   one (262144, 8) f32 scatter into (2^19, 8) f32  [16 MB]
  bf16_block:  same but bf16 updates + bf16 target              [8 MB]
  bf16_full_pipeline: 2x bf16 block scatters + f32 cast + DUS into the
               full (4.2M, 8) f32 zeros — the complete candidate backward

Run DETACHED:
  setsid nohup python probes/scatter_bf16_probe.py \
      > records/scatter_bf16_r5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

LT = 4194304
T = 524288
F = 8
MB = 262144            # update rows per level block (b queries)


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

    g = jax.random.normal(jax.random.PRNGKey(1), (MB, F))
    gb = g.astype(jnp.bfloat16)
    g2 = jax.random.normal(jax.random.PRNGKey(2), (2 * MB, F))

    def f32_block(key):
        idx = jax.random.randint(key, (MB,), 0, T)
        acc = jnp.zeros((T, F)).at[idx].add(g)
        return jnp.sum(acc) * 1e-20

    def bf16_block(key):
        idx = jax.random.randint(key, (MB,), 0, T)
        acc = jnp.zeros((T, F), jnp.bfloat16).at[idx].add(gb)
        return jnp.sum(acc.astype(jnp.float32)) * 1e-20

    def bf16_full_pipeline(key):
        k1, k2 = jax.random.split(key)
        idx0 = jax.random.randint(k1, (MB,), 0, T)
        idx1 = jax.random.randint(k2, (MB,), 0, T)
        gbb = g2.astype(jnp.bfloat16)
        b0 = jnp.zeros((T, F), jnp.bfloat16).at[idx0].add(gbb[:MB])
        b1 = jnp.zeros((T, F), jnp.bfloat16).at[idx1].add(gbb[MB:])
        phase = jax.random.randint(key, (), 0, 4)
        full = jnp.zeros((LT, F))
        full = jax.lax.dynamic_update_slice_in_dim(
            full, b0.astype(jnp.float32), phase * T, axis=0)
        full = jax.lax.dynamic_update_slice_in_dim(
            full, b1.astype(jnp.float32), (phase + 4) * T, axis=0)
        return jnp.sum(full) * 1e-20

    bench("f32_block_16MB", f32_block, MB)
    bench("bf16_block_8MB", bf16_block, MB)
    bench("bf16_full_pipeline", bf16_full_pipeline, 2 * MB)
    print("SCATTER_BF16_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
