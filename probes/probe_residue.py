"""Residue profiler: split the flagship train step (bench.py config) into
its non-hashgrid components on the real chip. One JSON line per probe.

Run detached (CLAUDE.md tunnel rules): setsid nohup python probe_residue.py
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, key, iters=8, warmup=2):
    for i in range(warmup):
        float(jnp.sum(fn(jax.random.fold_in(key, i))))
    t0 = time.time()
    for i in range(iters):
        float(jnp.sum(fn(jax.random.fold_in(key, 100 + i))))
    return (time.time() - t0) / iters


def report(name, dt, n, unit):
    print(json.dumps({"metric": name, "value": round(n / dt, 1),
                      "unit": unit, "ms": round(dt * 1e3, 2)}), flush=True)


def main():
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.emitter import eval_emitter, sample_emitter
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single

    BATCH = int(os.environ.get("PROBE_BATCH", 8192))
    SPP = int(os.environ.get("PROBE_SPP", 32))

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=32, log2_table=19)
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(32)))
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(n_side))
    N = o.shape[0] * SPP
    target = jnp.ones((o.shape[0], 3)) * 0.5

    def step(p, key, mat_fn_maker):
        em2 = dc_replace(em, radiance=p["radiance"])
        crf2 = dc_replace(crf, weight=p["crf_w"])
        key, k_mat = jax.random.split(key)
        mat_fn = mat_fn_maker(p, k_mat)
        l = path_tracing_single(key, tracer, em2, mat_fn, o, d, dxdu,
                                dydv, SPP)
        ldr = crf_forward(crf2, l, 1.0)
        return jnp.mean((ldr - target) ** 2)

    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

    def ngp_maker(p, k):
        return functools.partial(ngp_brdf_apply, p["material"], key=k)

    const_mat = {"albedo": jnp.full((1, 3), 0.6),
                 "roughness": jnp.full((1, 1), 0.5),
                 "metallic": jnp.full((1, 1), 0.0)}

    def const_maker(p, k):
        # material grads intentionally absent: this probe measures the step
        # WITHOUT the hash-grid encode; radiance/CRF grads stay live.
        return lambda x: {k2: jnp.broadcast_to(v, (x.shape[0], v.shape[1]))
                          for k2, v in const_mat.items()}

    # 1. full step fwd+bwd (should reproduce bench.py ~1.25M rays/s)
    gf = jax.jit(jax.value_and_grad(lambda p, k: step(p, k, ngp_maker)))
    dt = bench(jax.jit(lambda k: gf(params, k)[0] +
                       0.0 * sum(jnp.sum(x) for x in
                                 jax.tree_util.tree_leaves(
                                     gf(params, k)[1]))), jax.random.PRNGKey(1))
    report("step_full_fwd_bwd", dt, N, "rays/s")

    # 2. step with constant BRDF (no hashgrid encode anywhere) fwd+bwd
    gc = jax.jit(jax.value_and_grad(lambda p, k: step(p, k, const_maker)))
    dt = bench(jax.jit(lambda k: gc(params, k)[0] +
                       0.0 * sum(jnp.sum(x) for x in
                                 jax.tree_util.tree_leaves(
                                     gc(params, k)[1]))), jax.random.PRNGKey(2))
    report("step_constbrdf_fwd_bwd", dt, N, "rays/s")

    # 3. same, forward only (no grad at all)
    dt = bench(jax.jit(lambda k: step(params, k, const_maker)),
               jax.random.PRNGKey(3))
    report("step_constbrdf_fwd", dt, N, "rays/s")

    # 4. full step forward only
    dt = bench(jax.jit(lambda k: step(params, k, ngp_maker)),
               jax.random.PRNGKey(4))
    report("step_full_fwd", dt, N, "rays/s")

    # 5. primary traversal alone (N jittered coherent rays)
    o_r = jnp.repeat(o, SPP, 0)
    d_r = jnp.repeat(d, SPP, 0)

    def prim(k):
        dd = d_r + jax.random.uniform(k, (1, 3)) * 1e-3
        return ray_intersect(tracer, o_r, dd)[3].sum()
    dt = bench(jax.jit(prim), jax.random.PRNGKey(5))
    report("traversal_primary_N", dt, N, "rays/s")

    # 6. secondary-style traversal: 2N incoherent rays, sort hint on
    def sec(k):
        ks = jax.random.split(k, 2)
        oo = jax.random.uniform(ks[0], (2 * N, 3), minval=0.1, maxval=1.9)
        dd = jax.random.normal(ks[1], (2 * N, 3))
        dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
        return ray_intersect(tracer, oo, dd, sort=True)[3].sum()
    dt = bench(jax.jit(sec), jax.random.PRNGKey(6))
    report("traversal_secondary_2N", dt, 2 * N, "rays/s")

    # 7. emitter: sample + eval at N points
    def emit(k):
        ks = jax.random.split(k, 3)
        pos = jax.random.uniform(ks[0], (N, 3), minval=0.1, maxval=1.9)
        s1 = jax.random.uniform(ks[1], (N,))
        s2 = jax.random.uniform(ks[2], (N, 2))
        wi_e, pdf, tri = sample_emitter(em, s1, s2, pos)
        w, pdf2, valid = eval_emitter(em, pos, wi_e, tri)
        return jnp.sum(w) + jnp.sum(pdf) + jnp.sum(pdf2)
    dt = bench(jax.jit(emit), jax.random.PRNGKey(7))
    report("emitter_sample_eval_N", dt, N, "queries/s")

    # 8. CRF fwd+bwd at N
    def crf_loss(w, k):
        l = jax.random.uniform(k, (N, 3))
        return jnp.mean(crf_forward(dc_replace(crf, weight=w), l, 1.0) ** 2)
    gcrf = jax.jit(lambda k: jnp.sum(jax.grad(crf_loss)(crf.weight, k)))
    dt = bench(gcrf, jax.random.PRNGKey(8))
    report("crf_fwd_bwd_N", dt, N, "queries/s")


if __name__ == "__main__":
    main()
    os._exit(0)
