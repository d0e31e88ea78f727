"""Component benchmarks with fresh inputs per iteration, timed with
scan-in-jit (iris_tpu.utils.timing.bench_scan): each probe runs inside one
jitted lax.scan with a chained carry, so the numbers are pure device time —
fetch-per-iteration loops add ~40-60 ms of tunnel RTT per iteration and
host-side loops are host-bound below ~100 ms/call (PERF.md round 2e/2f).

Prints one JSON line per component.
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from iris_tpu.demo import demo_mat_fn, make_demo_scene
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import hashgrid_encode
    from iris_tpu.render.integrator import path_tracing_single
    from iris_tpu.utils.timing import bench_scan

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=16, log2_table=19)
    B, SPP = 8192, 32
    n = B * SPP

    def report(name, dt, unit_count, unit):
        print(json.dumps({"metric": name, "value": round(unit_count / dt, 1),
                          "unit": unit, "ms": round(dt * 1e3, 2)}),
              flush=True)

    # traversal, fresh ray sets
    o0, d0, *_ = camera_rays(512)
    o0, d0 = jnp.asarray(o0), jnp.asarray(d0)
    trace = jax.jit(lambda k: ray_intersect(
        tracer,
        o0 + jax.random.uniform(k, (1, 3)) * 0.2,
        d0)[3].sum())
    dt = bench_scan(trace, jax.random.PRNGKey(0))
    report("traversal_rays_per_s", dt, o0.shape[0], "rays/s")

    # hash-grid encode variants at 16 and the reference 32 levels
    from dataclasses import replace as dc_replace

    from iris_tpu.models.hashgrid import HashGridConfig, init_hashgrid

    for levels in (16, 32):
        cfg0 = HashGridConfig(n_levels=levels, log2_table_size=19)
        table = init_hashgrid(jax.random.PRNGKey(7), cfg0)
        variants = {
            "exact": (dc_replace(cfg0, stochastic_bwd=False), False),
            "stoch_bwd": (cfg0, True),
            "stoch_fwd": (dc_replace(cfg0, stochastic_fwd=True), True),
            # trainer default: stochastic fwd+bwd + 4x level-block
            # subsampled scatter
            "stoch_fwd_ls4": (dc_replace(cfg0, stochastic_fwd=True,
                                         bwd_level_sample=levels // 4),
                              True),
        }
        for name, (cfg, use_key) in variants.items():
            def enc_loss(tab, k, cfg=cfg, use_key=use_key):
                x = jax.random.uniform(k, (n, 3))
                return hashgrid_encode(tab, cfg, x,
                                       k if use_key else None).sum()

            if name == "exact":
                enc = jax.jit(lambda k, cfg=cfg: hashgrid_encode(
                    table, cfg, jax.random.uniform(k, (n, 3))).sum())
                dt = bench_scan(enc, jax.random.PRNGKey(1))
                report(f"hashgrid{levels}_fwd_queries_per_s", dt, n,
                       "queries/s")
            # NB: reduce the FULL grad — indexing [0] can let XLA
            # dead-code the backward scatter (PERF.md hygiene)
            encg = jax.jit(
                lambda k, f=enc_loss: jnp.sum(jax.grad(f)(table, k)))
            dt = bench_scan(encg, jax.random.PRNGKey(2))
            report(f"hashgrid{levels}_{name}_fwd_bwd_queries_per_s", dt, n,
                   "queries/s")

    # production-default row-gather grid (8 levels x 8 features, round 4):
    # equal capacity / MLP width as the reference 32x2
    cfg_row = HashGridConfig(n_levels=8, n_features=8, log2_table_size=19,
                             per_level_scale=1.3 ** (31.0 / 7.0),
                             row_gather=True, stochastic_fwd=True,
                             stochastic_bwd=True, bwd_level_sample=2)
    table_row = init_hashgrid(jax.random.PRNGKey(7), cfg_row)
    enc_row = jax.jit(lambda k: hashgrid_encode(
        table_row, dc_replace(cfg_row, stochastic_fwd=False,
                              stochastic_bwd=False),
        jax.random.uniform(k, (n, 3))).sum())
    dt = bench_scan(enc_row, jax.random.PRNGKey(1))
    report("hashgrid8x8row_fwd_queries_per_s", dt, n, "queries/s")

    def enc_row_loss(tab, k):
        x = jax.random.uniform(k, (n, 3))
        return hashgrid_encode(tab, cfg_row, x, k).sum()

    encg_row = jax.jit(lambda k: jnp.sum(jax.grad(enc_row_loss)(table_row,
                                                                k)))
    dt = bench_scan(encg_row, jax.random.PRNGKey(2))
    report("hashgrid8x8row_default_fwd_bwd_queries_per_s", dt, n,
           "queries/s")

    # full single-bounce fwd (fresh keys -> fresh jitter/samples)
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(int(B ** 0.5)))
    fwd = jax.jit(lambda k: path_tracing_single(
        k, tracer, em, demo_mat_fn(ngp), o, d, dxdu, dydv, SPP).sum())
    dt = bench_scan(fwd, jax.random.PRNGKey(3))
    report("pts_fwd_rays_per_s", dt, o.shape[0] * SPP, "rays/s")

    # fwd+bwd: exact grads vs the stochastic-corner train config
    def loss(p, k, use_key):
        key, k_mat = jax.random.split(k)
        mat_fn = (functools.partial(ngp_brdf_apply, p, key=k_mat)
                  if use_key else demo_mat_fn(p))
        l = path_tracing_single(key, tracer, em, mat_fn, o, d, dxdu,
                                dydv, SPP)
        return jnp.mean(crf_forward(crf, l, 1.0) ** 2)

    from dataclasses import replace as _dcr
    ngp_ls = _dcr(ngp, cfg=_dcr(ngp.cfg, stochastic_fwd=True,
                                bwd_level_sample=ngp.cfg.n_levels // 4))
    for name, use_key, p in (("exact", False, ngp),
                             ("stoch_bwd", True, ngp),
                             ("stoch_fwd_ls4", True, ngp_ls)):
        gradf = jax.jit(
            lambda k, u=use_key, p=p: jnp.sum(jax.grad(loss)(p, k, u).table))
        dt = bench_scan(gradf, jax.random.PRNGKey(4))
        report(f"pts_fwd_bwd_{name}_rays_per_s", dt, o.shape[0] * SPP,
               "rays/s")


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
