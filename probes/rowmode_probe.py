"""Device A/B: row-gather wide-feature hash grid vs the reference 32x2.

Times (a) the bare encode fwd and fwd+bwd, (b) the full flagship train
step (bench.py program), at equal parameter count / MLP width:
32 levels x 2 features (reference parity), 16 x 4, 8 x 8 — all 2^19
tables, per-level scale auto-matched to span the reference resolution
range. Chained scan timing (pure device time).

Run detached on the TPU:  setsid nohup python probes/rowmode_probe.py \
    > outputs/rowmode_probe.log 2>&1 &
"""

import json
import os
import time
from dataclasses import replace as dcr

import jax
import jax.numpy as jnp

from iris_tpu.models.hashgrid import (HashGridConfig, auto_bwd_level_sample,
                                      hashgrid_encode, init_hashgrid)
from iris_tpu.utils.timing import bench_scan

N = int(os.environ.get("ROWMODE_N", 262144))   # 8192 batch x 32 spp


def encode_times(l, f):
    pls = 1.3 ** (31.0 / max(l - 1, 1))
    cfg = HashGridConfig(n_levels=l, n_features=f, log2_table_size=19,
                         per_level_scale=pls, row_gather=(f > 2),
                         stochastic_fwd=True, stochastic_bwd=True,
                         bwd_level_sample=auto_bwd_level_sample(l))
    table = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

    def fwd(key):
        xs = x + jax.random.uniform(key, (1, 3)) * 1e-6
        return jnp.sum(hashgrid_encode(table, cfg, xs, key))

    def fwdbwd(key):
        xs = x + jax.random.uniform(key, (1, 3)) * 1e-6
        g = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cfg, xs, key) ** 2))(table)
        return jnp.sum(g * g) * 1e-20 + jnp.float32(0.0)

    out = {}
    for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        t0 = time.time()
        dt = bench_scan(fn, jax.random.PRNGKey(2), iters=8)
        out[name] = dt
        print(json.dumps({
            "probe": f"encode_{name}", "levels": l, "features": f,
            "ms": round(dt * 1e3, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)
    return out


def step_times(l, f):
    """Full flagship train step (bench.py program) with the given grid."""
    import functools
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single

    pls = 1.3 ** (31.0 / max(l - 1, 1))
    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=l, log2_table=19)
    cfg = dcr(ngp.cfg, n_features=f, per_level_scale=pls,
              row_gather=(f > 2), stochastic_fwd=True, stochastic_bwd=True,
              bwd_level_sample=auto_bwd_level_sample(l))
    from iris_tpu.models.brdf import init_ngp_brdf
    # full rebuild: the MLP input width is n_levels * n_features
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), ngp.voxel_min,
                        ngp.voxel_max, cfg)
    o, d, dxdu, dydv = camera_rays(int(8192 ** 0.5))
    o, d = jnp.asarray(o), jnp.asarray(d)
    dxdu, dydv = jnp.asarray(dxdu), jnp.asarray(dydv)
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

    t0 = time.time()
    dt = bench_scan(step, jax.random.PRNGKey(3), iters=8)
    rays = b * 32
    print(json.dumps({
        "probe": "train_step", "levels": l, "features": f,
        "ms": round(dt * 1e3, 2), "rays_s": round(rays / dt),
        "wall_incl_compile_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    arms = tuple(
        tuple(int(v) for v in a.split("x"))
        for a in os.environ.get(
            "ROWMODE_ARMS", "32x2,16x4,8x8").split(","))
    for l, f in arms:
        encode_times(l, f)
    for l, f in arms:
        step_times(l, f)
    print("ROWMODE_PROBE_DONE", flush=True)
    os._exit(0)
