"""Device A/B: flagship step throughput vs fwd_level_sample (chained-carry
timing, bench.py config). Run detached on TPU.
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

    BATCH, SPP, WARM, IT = 8192, 32, 3, 16
    tracer, em, ngp0, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=32, log2_table=19)
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    N = b * SPP
    target = jnp.ones((b, 3)) * 0.5

    rng = np.random.default_rng(0)
    batches = jax.block_until_ready([
        (jnp.asarray((o + rng.uniform(-0.01, 0.01, o.shape))
                     .astype(np.float32)), jnp.asarray(d))
        for _ in range(WARM + IT)])
    key = jax.random.PRNGKey(0)
    keys = jax.block_until_ready(
        [jax.random.fold_in(key, i) for i in range(WARM + IT)])

    for fls in (0, 16, 8):
        ngp = dc_replace(ngp0, cfg=dc_replace(
            ngp0.cfg, stochastic_fwd=True, stochastic_bwd=True,
            bwd_level_sample=auto_bwd_level_sample(32),
            fwd_level_sample=fls))
        params = {"material": ngp, "radiance": em.radiance,
                  "crf_w": crf.weight}

        def loss_fn(p, rays_o, rays_d, k):
            em2 = dc_replace(em, radiance=p["radiance"])
            crf2 = dc_replace(crf, weight=p["crf_w"])
            k, k_mat = jax.random.split(k)
            mat_fn = functools.partial(ngp_brdf_apply, p["material"],
                                       key=k_mat)
            l = path_tracing_single(k, tracer, em2, mat_fn, rays_o, rays_d,
                                    jnp.asarray(dxdu), jnp.asarray(dydv),
                                    SPP)
            return jnp.mean((crf_forward(crf2, l, 1.0) - target) ** 2)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        carry = jnp.float32(0.0)
        for i in range(WARM):
            ro, rd = batches[i]
            carry, g = grad_fn(params, ro + carry * 1e-12, rd, keys[i])
        float(carry)
        t0 = time.time()
        carry = jnp.float32(0.0)
        for i in range(IT):
            ro, rd = batches[WARM + i]
            carry, g = grad_fn(params, ro + carry * 1e-12, rd,
                               keys[WARM + i])
        float(carry)
        dt = (time.time() - t0) / IT
        print(json.dumps({"metric": f"step_fls{fls}",
                          "ms": round(dt * 1e3, 2),
                          "rays_per_s": round(N / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
