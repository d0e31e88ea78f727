"""Scan-timed traversal cost by ray population (demo scene, 262K rays):
coherent camera rays vs NEE shadow rays vs cosine bounce rays — sizes the
~32 ms residue forward of the flagship step. Run detached on TPU.
Set IRIS_TPU_NO_PALLAS=1 to compare the XLA path.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from iris_tpu.utils.timing import bench_scan


def main():
    from iris_tpu.core.vecmath import normalize
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.procedural import camera_rays

    tracer, em, _, _, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=4, log2_table=10)
    o, d, _, _ = map(jnp.asarray, camera_rays(512))
    N = o.shape[0]

    # materialize primary hits once (the step's secondary rays start here)
    pos, nrm, _, tri, valid = jax.block_until_ready(
        ray_intersect(tracer, o, d))

    def coherent(k):
        dd = normalize(d + jax.random.uniform(k, (1, 3)) * 1e-3)
        return ray_intersect(tracer, o, dd)[3].sum().astype(jnp.float32)

    def bounce(k):
        # cosine-hemisphere rays from the primary hits
        u = jax.random.uniform(k, (N, 2))
        r = jnp.sqrt(u[:, :1])
        phi = 2 * jnp.pi * u[:, 1:]
        loc = jnp.concatenate([r * jnp.cos(phi), r * jnp.sin(phi),
                               jnp.sqrt(1 - u[:, :1])], -1)
        t = normalize(jnp.cross(nrm, jnp.array([0.1, 0.7, 0.2])))
        b = jnp.cross(nrm, t)
        wd = normalize(loc[:, :1] * t + loc[:, 1:2] * b + loc[:, 2:] * nrm)
        return ray_intersect(tracer, pos + 1e-4 * wd,
                             wd)[3].sum().astype(jnp.float32)

    def shadow(k):
        # rays from hits toward jittered emitter-ish targets (semi-coherent)
        tgt = jnp.array([1.0, 1.0, 1.8]) + jax.random.uniform(
            k, (N, 3), minval=-0.2, maxval=0.2)
        wd = normalize(tgt - pos)
        return ray_intersect(tracer, pos + 1e-4 * wd,
                             wd)[3].sum().astype(jnp.float32)

    for name, fn in (("coherent", coherent), ("shadow", shadow),
                     ("bounce", bounce)):
        dt = bench_scan(fn, jax.random.PRNGKey(len(name)))
        print(json.dumps({"metric": f"trav_{name}",
                          "ms": round(dt * 1e3, 2),
                          "mrays_per_s": round(N / dt / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
