"""Device A/B: row-mode table stored FLAT (trace-time reshape) vs NATIVE
(L*T, F) — the round-4 hypothesis that the flat<->row reshapes around the
table cotangent cost ~45 ms of the 8Lx8F encode backward via (8,128)-tile
lane padding (TODO.md round-5 item; models/hashgrid.py row_native_layout).

Measures bare encode fwd / fwd+bwd (262K lane-queries) and the full
flagship train step for both layouts with bench_scan.

Run DETACHED on an idle chip:
  setsid nohup python probes/rownative_probe.py > records/rownative_r4.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from dataclasses import replace as dcr

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 262144
L, F = 8, 8
PLS = 1.3 ** (31.0 / 7.0)


def encode_times(native: bool):
    from iris_tpu.models.hashgrid import (
        HashGridConfig, hashgrid_encode, init_hashgrid,
    )
    from iris_tpu.utils.timing import bench_scan

    cfg = HashGridConfig(n_levels=L, n_features=F, log2_table_size=19,
                         per_level_scale=PLS, row_gather=True,
                         stochastic_fwd=True, stochastic_bwd=True,
                         bwd_level_sample=2, row_native_layout=native)
    table = init_hashgrid(jax.random.PRNGKey(7), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    def fwd(key):
        xs = x + jax.random.uniform(key, (1, 3)) * 1e-6
        return jnp.sum(hashgrid_encode(table, cfg, xs, key))

    def fwdbwd(key):
        xs = x + jax.random.uniform(key, (1, 3)) * 1e-6
        g = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cfg, xs, key) ** 2))(table)
        return jnp.sum(g * g) * 1e-20 + jnp.float32(0.0)

    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        t0 = time.time()
        dt = bench_scan(fn, jax.random.PRNGKey(2), iters=8)
        print(json.dumps({
            "probe": f"encode_{name}", "native": native,
            "ms": round(dt * 1e3, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)


def step_times(native: bool):
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import init_ngp_brdf, ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single
    from iris_tpu.utils.timing import bench_scan

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=L, hash_features=F,
        per_level_scale=-1.0, log2_table=19)
    cfg = dcr(ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
              bwd_level_sample=2, row_native_layout=native)
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), ngp.voxel_min,
                        ngp.voxel_max, cfg)
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(int(8192 ** 0.5)))
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5
    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

    def loss_fn(p, rays_o, key):
        from dataclasses import replace as dc_replace
        em2 = dc_replace(em, radiance=p["radiance"])
        crf2 = dc_replace(crf, weight=p["crf_w"])
        key, k_mat = jax.random.split(key)
        mat_fn = functools.partial(ngp_brdf_apply, p["material"], key=k_mat)
        li = path_tracing_single(key, tracer, em2, mat_fn, rays_o, d,
                                 dxdu, dydv, 32)
        return jnp.mean((crf_forward(crf2, li, 1.0) - target) ** 2)

    gfn = jax.grad(loss_fn)

    def step(key):
        eps = jax.random.uniform(key, (1, 3)) * 1e-6
        g = gfn(params, o + eps, key)
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(g):
            acc = acc + jnp.sum(leaf.astype(jnp.float32) ** 2) * 1e-20
        return acc

    t0 = time.time()
    dt = bench_scan(step, jax.random.PRNGKey(3), iters=8)
    print(json.dumps({
        "probe": "train_step", "native": native,
        "ms": round(dt * 1e3, 2), "rays_s": round(b * 32 / dt),
        "wall_incl_compile_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    for native in (False, True):
        encode_times(native)
    for native in (False, True):
        step_times(native)
    print("ROWNATIVE_PROBE_DONE", flush=True)
    os._exit(0)
