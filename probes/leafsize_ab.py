"""Round-5: BVH leaf_size A/B at the 102K-face production regime.

The tile-union cost model (probes/sbvh_tile_sim2.py) says leaf_size=8
cuts pair-pop iterations 1.73x on fused NEE+bounce tiles (30.5K -> 17.6K)
at the price of 2x MT folds per leaf visit — a win iff the per-iteration
scalar overhead (SMEM stack ops, 4 conditional-DMA branches, near/far
ordering) outweighs the extra vectorized fold work. Host sim cannot
resolve that balance; this measures the full 8Lx8F train step per arm.

One arm per PROCESS (CLAUDE.md round-4e rule): run via
probes/run_r5_leafsize.sh, arm = argv[1] in {4, 8, 10}.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from dataclasses import replace as dc_replace


def main(leaf_size: int, n_clutter: int = 8500):
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import _pallas_mode
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single
    from iris_tpu.utils.timing import bench_scan

    tracer, em, ngp, crf, mesh = make_demo_scene(
        n_clutter=n_clutter, slf_res=64, hash_levels=8, log2_table=19,
        hash_features=8, per_level_scale=-1.0, leaf_size=leaf_size)
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(8)))
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(int(8192 ** 0.5)))
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5
    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

    def loss_fn(p, rays_o, key):
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

    dt = bench_scan(step, jax.random.PRNGKey(3), iters=8)
    print(json.dumps({
        "faces": int(mesh.n_faces), "leaf_size": leaf_size,
        "kernel": _pallas_mode(tracer, b * 32),
        "n_nodes": int(tracer.n_nodes),
        "tri_rows": int(tracer.tris.shape[0]),
        "ms": round(dt * 1e3, 2), "rays_s": round(b * 32 / dt),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]),
         int(sys.argv[2]) if len(sys.argv) > 2 else 8500)
    os._exit(0)
