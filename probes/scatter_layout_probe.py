"""Row-scatter layout microbench (round-4g follow-up).

The device trace showed the 8Lx8F encode backward's row scatter runs at
per-ELEMENT latency because XLA assigns the (4.2M, 8) cotangent the
transposed {0,1:T(8,128)} tiling (each row update straddles 8 tiles),
plus 134 MB layout copies. This probe measures the scatter alone under
different consumers to find which formulation keeps the {1,0} layout:

  a) row scatter, output consumed by a full-array reduction (sum)
  b) row scatter, output reshaped to flat then reduced
  c) row scatter TRANSPOSED formulation: per-feature flat scatters into
     a feature-major (F, L*T) cotangent (each feature's updates are
     lane-contiguous 1-D scatters)
  d) row scatter with f32[524288, 128] zero-padded updates (rows span a
     full tile so the indexed dim cannot be assigned minor)

Run DETACHED on an idle chip:
  setsid nohup python probes/scatter_layout_probe.py > records/scatter_layout_r4.log 2>&1 &
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
F = 8
M = 524288            # updates (262144 queries x 2 sampled levels)


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
    gT = jnp.transpose(g)

    def idx_of(key):
        return jax.random.randint(key, (M,), 0, LT)

    def a_row_sum(key):
        idx = idx_of(key)
        acc = jnp.zeros((LT, F)).at[idx].add(g)
        return jnp.sum(acc) * 1e-20

    def b_row_flat(key):
        idx = idx_of(key)
        acc = jnp.zeros((LT, F)).at[idx].add(g)
        return jnp.sum(acc.reshape(-1)) * 1e-20

    def c_feature_major(key):
        idx = idx_of(key)
        acc = jnp.zeros((F, LT))
        for j in range(F):
            acc = acc.at[j, idx].add(gT[j])
        return jnp.sum(acc) * 1e-20

    def d_padded(key):
        idx = idx_of(key)
        gp = jnp.pad(g, ((0, 0), (0, 128 - F)))
        acc = jnp.zeros((LT, 128)).at[idx].add(gp)
        return jnp.sum(acc) * 1e-20

    for name, fn in (("a_row_sum", a_row_sum), ("b_row_flat", b_row_flat),
                     ("c_feature_major", c_feature_major),
                     ("d_padded", d_padded)):
        bench(name, fn)
    print("SCATTER_LAYOUT_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
