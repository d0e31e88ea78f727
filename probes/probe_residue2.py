"""Residue-backward split (scan-in-jit timing): with a constant BRDF
(no hash grid anywhere), how much of the step's backward goes to the
emitter-radiance path vs the CRF path? Run detached on TPU.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp


def main():
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single
    from iris_tpu.utils.timing import bench_scan

    BATCH, SPP = 8192, 32
    tracer, em, _, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=32, log2_table=19)
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(n_side))
    b = o.shape[0]
    N = b * SPP
    target = jnp.ones((b, 3)) * 0.5

    const_mat = {"albedo": jnp.full((1, 3), 0.6),
                 "roughness": jnp.full((1, 1), 0.5),
                 "metallic": jnp.full((1, 1), 0.0)}

    def mat_fn(x):
        return {k: jnp.broadcast_to(v, (x.shape[0], v.shape[1]))
                for k, v in const_mat.items()}

    def step(rad, crf_w, key):
        em2 = dc_replace(em, radiance=rad)
        crf2 = dc_replace(crf, weight=crf_w)
        key, _ = jax.random.split(key)
        l = path_tracing_single(key, tracer, em2, mat_fn, o, d, dxdu,
                                dydv, SPP)
        return jnp.mean((crf_forward(crf2, l, 1.0) - target) ** 2)

    def live(v, g):
        return v + 1e-30 * sum(jnp.sum(jnp.abs(x))
                               for x in jax.tree_util.tree_leaves(g))

    probes = {
        "fwd_only": lambda k: step(em.radiance, crf.weight, k),
        "bwd_radiance": lambda k: live(*jax.value_and_grad(step, 0)(
            em.radiance, crf.weight, k)),
        "bwd_crf": lambda k: live(*jax.value_and_grad(step, 1)(
            em.radiance, crf.weight, k)),
        "bwd_both": lambda k: live(*jax.value_and_grad(step, (0, 1))(
            em.radiance, crf.weight, k)),
    }
    for name, fn in probes.items():
        dt = bench_scan(fn, jax.random.PRNGKey(hash(name) % 1000))
        print(json.dumps({"metric": f"resid_{name}",
                          "ms": round(dt * 1e3, 2),
                          "rays_per_s": round(N / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
