"""Round-5: dense vs paired_streamed in the 30-95K-face window.

At 102K faces the same-timer A/B showed paired_streamed BEATS the
lane-dense resident kernel (292.8 vs 316.3 ms step — records/
policy102k_scan_r4.log), so the 12 MB gate widening was reverted. Open
question from TODO.md: dense is still auto-selected in the 30-95K
window (tree stages under the 10 MB gate) on the strength of a round-3b
win against the OLD union streamer — does it still beat the round-3e
paired_streamed kernel there? Same-timer (bench_scan), both arms,
full 8Lx8F-default train step, two sizes inside the window.

Run DETACHED: setsid nohup env PYTHONPATH=/root/repo:/root/.axon_site \
    python probes/window_policy_probe.py > records/window_policy_r5.log 2>&1 &
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


def run_size(n_clutter):
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
        hash_features=8, per_level_scale=-1.0)
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(8)))
    o, d, dxdu, dydv = map(jnp.asarray, camera_rays(int(8192 ** 0.5)))
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5
    params = {"material": ngp, "radiance": em.radiance,
              "crf_w": crf.weight}

    def run(arm, env):
        os.environ.update(env)

        def loss_fn(p, rays_o, key):
            em2 = dc_replace(em, radiance=p["radiance"])
            crf2 = dc_replace(crf, weight=p["crf_w"])
            key, k_mat = jax.random.split(key)
            mat_fn = functools.partial(ngp_brdf_apply, p["material"],
                                       key=k_mat)
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
            "faces": int(mesh.n_faces), "arm": arm,
            "kernel": _pallas_mode(tracer, b * 32),
            "ms": round(dt * 1e3, 2), "rays_s": round(b * 32 / dt),
        }), flush=True)

    run("dense_auto", {"IRIS_TPU_DENSE": "auto"})
    run("paired_streamed", {"IRIS_TPU_DENSE": "0"})


if __name__ == "__main__":
    for n in (3500, 6000):
        run_size(n)
    print("WINDOW_POLICY_DONE", flush=True)
    os._exit(0)
