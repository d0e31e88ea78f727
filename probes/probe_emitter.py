"""Scan-timed emitter-path microsplit at 262K queries (demo scene):
searchsorted CDF inversion, (E,3,3) vertex row gather, full sample_emitter,
full eval_emitter. Sizes the ~19 ms non-traversal residue of the flagship
step. Run detached on TPU.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from iris_tpu.utils.timing import bench_scan


def main():
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.models.emitter import eval_emitter, sample_emitter

    tracer, em, _, _, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=4, log2_table=10)
    N = 262144
    n_tri = em.is_emitter.shape[0]
    print(json.dumps({"n_emitters": int(em.emitter_cdf.shape[0]),
                      "n_tris": int(n_tri)}), flush=True)

    def searchsorted_only(k):
        s1 = jax.random.uniform(k, (N,))
        e = jnp.searchsorted(em.emitter_cdf, jnp.maximum(s1, 1e-12))
        return jnp.sum(e).astype(jnp.float32)

    def vertices_gather(k):
        e = jax.random.randint(k, (N,), 0, em.emitter_cdf.shape[0])
        return jnp.sum(em.emitter_vertices[e])

    def sample_full(k):
        ks = jax.random.split(k, 3)
        pos = jax.random.uniform(ks[0], (N, 3), minval=0.1, maxval=1.9)
        s1 = jax.random.uniform(ks[1], (N,))
        s2 = jax.random.uniform(ks[2], (N, 2))
        wi, pdf, tri = sample_emitter(em, s1, s2, pos)
        return jnp.sum(wi) + jnp.sum(pdf)

    def eval_full(k):
        ks = jax.random.split(k, 2)
        pos = jax.random.uniform(ks[0], (N, 3), minval=0.1, maxval=1.9)
        wi = jax.random.normal(ks[1], (N, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        tri = jax.random.randint(ks[0], (N,), -1, n_tri)
        le, pdf, valid = eval_emitter(em, pos, wi, tri)
        return jnp.sum(le) + jnp.sum(pdf)

    def eval_full_slf(k):
        ks = jax.random.split(k, 2)
        pos = jax.random.uniform(ks[0], (N, 3), minval=0.1, maxval=1.9)
        wi = jax.random.normal(ks[1], (N, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        tri = jax.random.randint(ks[0], (N,), -1, n_tri)
        rough = jax.random.uniform(ks[1], (N, 1))
        le, pdf, valid = eval_emitter(em, pos, wi, tri, rough, 0.0)
        return jnp.sum(le) + jnp.sum(pdf)

    for name, fn in (("searchsorted", searchsorted_only),
                     ("vertices_gather", vertices_gather),
                     ("sample_full", sample_full),
                     ("eval_full", eval_full),
                     ("eval_full_slf", eval_full_slf)):
        dt = bench_scan(fn, jax.random.PRNGKey(len(name)))
        print(json.dumps({"metric": f"em_{name}",
                          "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
