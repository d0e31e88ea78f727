"""Flagship-step throughput on BIG trees (round-3 verdict item 3).

Same chained-carry fwd+bwd harness as bench.py (fresh batch + key per
iteration, one host fetch at the end, grads live in jit outputs), run at
three scene sizes covering the kernel regimes the 398-face headline
never touches:

  n_clutter=2000  ->  24,014 faces  (paired resident kernel)
  n_clutter=8500  -> 102,014 faces  (lane-dense resident regime)
  n_clutter=30000 -> 360,014 faces  (HBM-streamed regime)

Step-level numbers (not traversal-only): full path_tracing_single
gradient step at the reference model config (32 levels x 2^19, batch
8192 x spp 32). Real ScanNet++ meshes are 0.5M-10M faces — this is the
regime record the headline bench structurally underweights.

Run DETACHED on an idle chip: setsid nohup python probes/bigtree_step.py
> outputs/bigtree_step.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import time
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8192
SPP = 32
WARMUP = 3
ITERS = 12
HASH_LEVELS = 32
LOG2_TABLE = 19


def measure(n_clutter: int) -> dict:
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import _pallas_mode
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single

    tracer, em, ngp, crf, mesh = make_demo_scene(
        n_clutter=n_clutter, slf_res=64, hash_levels=HASH_LEVELS,
        log2_table=LOG2_TABLE)
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(HASH_LEVELS)))
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5
    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

    def loss_fn(p, rays_o, rays_d, key):
        em2 = dc_replace(em, radiance=p["radiance"])
        crf2 = dc_replace(crf, weight=p["crf_w"])
        key, k_mat = jax.random.split(key)
        mat_fn = functools.partial(ngp_brdf_apply, p["material"], key=k_mat)
        l = path_tracing_single(key, tracer, em2, mat_fn, rays_o, rays_d,
                                jnp.asarray(dxdu), jnp.asarray(dydv), SPP)
        ldr = crf_forward(crf2, l, 1.0)
        return jnp.mean((ldr - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(WARMUP + ITERS):
        jo = (o + rng.uniform(-0.01, 0.01, o.shape)).astype(np.float32)
        batches.append((jnp.asarray(jo), jnp.asarray(d)))
    batches = jax.block_until_ready(batches)
    keys = jax.block_until_ready(
        [jax.random.fold_in(jax.random.PRNGKey(0), i)
         for i in range(WARMUP + ITERS)])

    carry = jnp.float32(0.0)
    t_c0 = time.time()
    for i in range(WARMUP):
        ro, rd = batches[i]
        carry, g = grad_fn(params, ro + carry * 1e-12, rd, keys[i])
    float(carry)
    compile_s = time.time() - t_c0

    t0 = time.time()
    carry = jnp.float32(0.0)
    for i in range(ITERS):
        ro, rd = batches[WARMUP + i]
        carry, g = grad_fn(params, ro + carry * 1e-12, rd,
                           keys[WARMUP + i])
    float(carry)
    dt = (time.time() - t0) / ITERS

    return {
        "n_clutter": n_clutter,
        "faces": int(mesh.n_faces),
        "kernel_mode": _pallas_mode(tracer, b * SPP) or "xla",
        "step_ms": round(dt * 1000, 1),
        "rays_per_s": round(b * SPP / dt, 1),
        "warmup_s": round(compile_s, 1),
    }


def main():
    for nc in (2000, 8500, 30000):
        r = measure(nc)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
