"""Multi-device scaling-efficiency harness (BASELINE.md target: >=85%).

Measures fwd+bwd training-step rays/s on 1, 2, 4, ... N devices of the
data-parallel mesh (replicated params, ray-sharded batch, GSPMD grad psum)
and reports efficiency vs linear scaling from 1 device. On a single-chip
host this exercises the virtual CPU mesh (functional validation); on a pod
slice it measures real ICI scaling.

Prints one JSON line per device count.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


def main(batch: int = 8192, spp: int = 8, iters: int = 5):
    from iris_tpu.demo import make_demo_batch, make_demo_scene
    from iris_tpu.parallel.sharding import data_mesh, replicate, shard_batch
    from iris_tpu.train.loop import make_train_step
    from iris_tpu.train.optim import make_optimizer
    from iris_tpu.train.steps import LossConfig, make_initialize_loss

    devices = jax.devices()
    if len(devices) == 1:
        devices = jax.devices("cpu")
    max_n = len(devices)
    counts = [n for n in [1, 2, 4, 8, 16, 32] if n <= max_n]

    # production-default row-gather grid (round 4), scaled-down table
    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=8, slf_res=32, hash_levels=8, hash_features=8,
        per_level_scale=-1.0, log2_table=14)
    cfg = LossConfig(spp=spp, max_segments=16)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    optimizer = make_optimizer()
    base_params = {"material": ngp, "radiance": em.radiance}

    batch_data = make_demo_batch(n_side=int(batch ** 0.5))
    results = {}
    for n in counts:
        mesh = data_mesh(n, devices=devices[:n])
        params = replicate(mesh, base_params)
        opt_state = replicate(mesh, optimizer.init(base_params))
        b = {k: shard_batch(mesh, v[: (len(v) // n) * n])
             for k, v in batch_data.items()}
        step = make_train_step(loss_fn, optimizer, mesh, donate=False)
        out = step(params, opt_state, b, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t0 = time.time()
        for i in range(iters):
            out = step(params, opt_state, b, jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        rays = b["rays"].shape[0] * spp
        rps = rays / dt
        results[n] = rps
        eff = rps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(json.dumps({
            "metric": "scaling_rays_per_s",
            "devices": n,
            "value": round(rps, 1),
            "unit": "rays/s",
            "efficiency_vs_linear": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
