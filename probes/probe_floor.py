"""Dispatch-floor probe: how much of each fetch-per-iteration timing datum
is tunnel RTT rather than device compute, and what does the flagship step
cost under chained-carry timing (dispatch N data-dependent steps, fetch one
scalar at the end)?

Chained-carry is DCE-proof: iteration i's ray origins depend on iteration
i-1's loss (times 1e-12, numerically invisible but not foldable), and the
grads are jit OUTPUTS of every call so XLA must materialize them. The
device runs enqueued programs in stream order, so per-step time is honest
device throughput; only the per-iteration host round trip is removed.

One JSON line per probe. Run detached (CLAUDE.md tunnel rules).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def report(name, dt_iter, n=None):
    rec = {"metric": name, "ms": round(dt_iter * 1e3, 3)}
    if n:
        rec["per_s"] = round(n / dt_iter, 1)
    print(json.dumps(rec), flush=True)


def main():
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single

    # 1. RTT floor: trivial jit, fetch per iteration
    tiny = jax.jit(lambda k: jnp.sum(jax.random.uniform(k, (8,))))
    key = jax.random.PRNGKey(0)
    for i in range(3):
        float(tiny(jax.random.fold_in(key, i)))
    t0 = time.time()
    ITERS = 16
    for i in range(ITERS):
        float(tiny(jax.random.fold_in(key, 100 + i)))
    report("tiny_fetch_per_iter", (time.time() - t0) / ITERS)

    # 2. RTT floor, chained: each tiny call consumes the previous result
    t0 = time.time()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = tiny(jax.random.fold_in(key, jnp.int32(200 + i)) ) + acc * 1e-12
    float(acc)
    report("tiny_chained", (time.time() - t0) / ITERS)

    # flagship step (bench.py config)
    BATCH, SPP = 8192, 32
    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=32, log2_table=19)
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(32)))
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    N = b * SPP
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
    WARM, IT = 2, 8
    batches = []
    for _ in range(WARM + IT):
        jo = (o + rng.uniform(-0.01, 0.01, o.shape)).astype(np.float32)
        batches.append((jnp.asarray(jo), jnp.asarray(d)))
    batches = jax.block_until_ready(batches)

    for i in range(WARM):
        v, g = grad_fn(params, *batches[i], jax.random.fold_in(key, i))
        float(v)

    # 3. fetch-per-iteration (bench.py's current method)
    t0 = time.time()
    for i in range(IT):
        v, g = grad_fn(params, *batches[WARM + i],
                       jax.random.fold_in(key, 100 + i))
        float(v)
    report("step_fetch_per_iter", (time.time() - t0) / IT, N)

    # 4. chained-carry: origins perturbed by previous loss, one fetch
    t0 = time.time()
    carry = jnp.float32(0.0)
    for i in range(IT):
        ro, rd = batches[WARM + i]
        v, g = grad_fn(params, ro + carry * 1e-12, rd,
                       jax.random.fold_in(key, 300 + i))
        carry = v
    float(carry)
    report("step_chained_x8", (time.time() - t0) / IT, N)

    # 5. chained x16 (amortization check)
    t0 = time.time()
    carry = jnp.float32(0.0)
    for i in range(16):
        ro, rd = batches[WARM + (i % IT)]
        v, g = grad_fn(params, ro + carry * 1e-12, rd,
                       jax.random.fold_in(key, 400 + i))
        carry = v
    float(carry)
    report("step_chained_x16", (time.time() - t0) / 16, N)


if __name__ == "__main__":
    main()
    os._exit(0)
