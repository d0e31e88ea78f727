"""Scan-timed flagship step: run N train steps inside ONE jitted lax.scan
(fresh ray batch + key per iteration, loss and a grad-norm term threaded
through the carry so no step can be elided), fetch one scalar. Measures
pure device throughput with zero per-iteration host overhead; compares
fwd_level_sample settings. Run detached on TPU.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single

    BATCH, SPP, IT = 8192, 32, 16
    tracer, em, ngp0, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=32, log2_table=19)
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    N = b * SPP
    target = jnp.ones((b, 3)) * 0.5

    rng = np.random.default_rng(0)
    obatch = jnp.asarray(np.stack([
        (o + rng.uniform(-0.01, 0.01, o.shape)).astype(np.float32)
        for _ in range(IT)]))                      # (IT, b, 3)
    d = jnp.asarray(d)

    for fls in (0, 16, 8):
        ngp = dc_replace(ngp0, cfg=dc_replace(
            ngp0.cfg, stochastic_fwd=True, stochastic_bwd=True,
            bwd_level_sample=auto_bwd_level_sample(32),
            fwd_level_sample=fls))
        params = {"material": ngp, "radiance": em.radiance,
                  "crf_w": crf.weight}

        def loss_fn(p, rays_o, k):
            em2 = dc_replace(em, radiance=p["radiance"])
            crf2 = dc_replace(crf, weight=p["crf_w"])
            k, k_mat = jax.random.split(k)
            mat_fn = functools.partial(ngp_brdf_apply, p["material"],
                                       key=k_mat)
            l = path_tracing_single(k, tracer, em2, mat_fn, rays_o, d,
                                    jnp.asarray(dxdu), jnp.asarray(dydv),
                                    SPP)
            return jnp.mean((crf_forward(crf2, l, 1.0) - target) ** 2)

        @jax.jit
        def run(key0, ob):
            def body(carry, xs):
                ro, i = xs
                k = jax.random.fold_in(key0, i)
                v, g = jax.value_and_grad(loss_fn)(
                    params, ro + carry * 1e-12, k)
                gn = sum(jnp.sum(jnp.abs(x))
                         for x in jax.tree_util.tree_leaves(g))
                return v + 1e-30 * gn, ()

            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  (ob, jnp.arange(IT)))
            return out

        # warmup/compile, then timed full scan
        float(run(jax.random.PRNGKey(1), obatch))
        t0 = time.time()
        float(run(jax.random.PRNGKey(2), obatch))
        dt = (time.time() - t0) / IT
        print(json.dumps({"metric": f"scan_step_fls{fls}",
                          "ms": round(dt * 1e3, 2),
                          "rays_per_s": round(N / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
