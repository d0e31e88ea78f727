"""Row-scatter TARGET-SIZE microbench (round-5, follow-up to
scatter_layout_probe.py).

The layout probe showed ALL formulations of the (524288, 8) -> (4.2M, 8)
scatter cost ~52-55 ms (~100 ns/row) — layout is not the lever. But the
round-2e 20.4 ns/row row-scatter figure targeted a 2 MB table. Hypothesis:
scatter cost is set by the TARGET working-set size (VMEM residency), not
the update formulation. Production's bwd_k=2 level subsampling means the
524K updates touch only 2 of 8 level blocks (32 MB of the 134 MB table),
so a compact per-level target + dynamic_update_slice placement could win.

Probes (fixed M=524288 update rows, F=8):
  size sweep: scatter into (R, 8) for R = 2^16..2^22 (2 MB .. 134 MB)
  compact:    two (2^19, 8) level-block scatters + DUS into the full
              (4.2M, 8) zeros — the production-shaped fix
  sorted:     full-size target, indices sorted (payload gathered by
              argsort) — locality lever if size isn't the story

Run DETACHED on an idle chip:
  setsid nohup python probes/scatter_size_probe.py \
      > records/scatter_size_r5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

LT = 4194304          # 8 levels x 2^19
T = 524288            # rows per level block (2^19)
F = 8
M = 524288            # update rows


def main():
    from iris_tpu.utils.timing import bench_scan

    def bench(name, fn):
        t0 = time.time()
        dt = bench_scan(fn, jax.random.PRNGKey(0), iters=8)
        print(json.dumps({
            "probe": name, "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt / M * 1e9, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)

    g = jax.random.normal(jax.random.PRNGKey(1), (M, F))

    # -- target-size sweep ------------------------------------------------
    for logr in (16, 18, 19, 20, 21, 22):
        r = 1 << logr

        def size_fn(key, r=r):
            idx = jax.random.randint(key, (M,), 0, r)
            acc = jnp.zeros((r, F)).at[idx].add(g)
            return jnp.sum(acc) * 1e-20

        bench(f"size_2^{logr}_{r * F * 4 // (1 << 20)}MB", size_fn)

    # -- compact level-block target + DUS placement (production shape) ---
    def compact_dus(key):
        k1, k2 = jax.random.split(key)
        # per-level local indices for 2 sampled level blocks, M/2 rows each
        idx0 = jax.random.randint(k1, (M // 2,), 0, T)
        idx1 = jax.random.randint(k2, (M // 2,), 0, T)
        comp = jnp.zeros((2 * T, F))
        comp = comp.at[idx0].add(g[: M // 2])
        comp = comp.at[T + idx1].add(g[M // 2:])
        phase = jax.random.randint(key, (), 0, 4)
        full = jnp.zeros((LT, F))
        full = jax.lax.dynamic_update_slice_in_dim(
            full, comp[:T], phase * T, axis=0)
        full = jax.lax.dynamic_update_slice_in_dim(
            full, comp[T:], (phase + 4) * T, axis=0)
        return jnp.sum(full) * 1e-20

    bench("compact_2blk_dus", compact_dus)

    # -- sorted indices, full-size target ---------------------------------
    def sorted_full(key):
        idx = jax.random.randint(key, (M,), 0, LT)
        order = jnp.argsort(idx)
        acc = jnp.zeros((LT, F)).at[idx[order]].add(g[order])
        return jnp.sum(acc) * 1e-20

    bench("sorted_full", sorted_full)

    print("SCATTER_SIZE_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
