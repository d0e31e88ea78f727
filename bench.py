"""Benchmark: forward+backward path-trace throughput (the training hot path).

Measures rays/s of a jit-compiled gradient step of `path_tracing_single`
(3 BVH traversals + hash-grid BRDF + emitter sampling + CRF per camera
sample, grads into material+emitter+CRF — mirrors SURVEY.md §3.2, the
reference's initialize/train_emitter inner loop) on the flagship demo scene
at the REFERENCE model capacity: 32 hash levels x 2^19 table
(reference model/brdf.py:222-240).

Timing hygiene (PERF.md): every iteration uses a FRESH ray batch and a
fresh PRNG key — repeated-args loops and fetch-free `block_until_ready`
report fantasy numbers on this backend. Timing is CHAINED-CARRY
(probe_floor.py): iteration i's ray origins depend on iteration i-1's
loss (x 1e-12, numerically invisible but not foldable) and the final
loss is fetched to host, so no step can be elided or reordered, while
the ~50-100 ms/iteration of pure tunnel RTT that a fetch-per-iteration
loop adds (measured: 59 ms for a trivial jit) stays out of the clock.
The grads are jit outputs of every call, so the backward stays live
(PERF.md DCE trap).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured against BASELINE_BENCH.json at repo root (the
recorded round-1 value); 1.0 when absent.

A "ray" here = one camera sample (each costs 3 ray_intersect calls +
2 material queries + NEE), matching how the reference pipeline counts its
per-step ray budget (batch * spp).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8192          # reference training batch (configs/config.py:9)
SPP = 32              # reference per-round spp (train.sh:20)
WARMUP = 4
ITERS = 24
HASH_LEVELS = 32      # reference model/brdf.py:223
LOG2_TABLE = 19       # reference model/brdf.py:226


def main():
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single

    from dataclasses import replace as _dcr

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=32, slf_res=64, hash_levels=HASH_LEVELS,
        log2_table=LOG2_TABLE,
    )
    # flagship TRAIN config = the trainers' defaults: stochastic-corner
    # fwd+bwd + auto level-block-subsampled gradient scatter (n_levels/4 =
    # 8 of 32; unbiased, quality validated — see PERF.md). Eval/render
    # paths pass no key and stay exact.
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    ngp = _dcr(ngp, cfg=_dcr(ngp.cfg, stochastic_fwd=True,
                             stochastic_bwd=True,
                             bwd_level_sample=auto_bwd_level_sample(
                                 HASH_LEVELS)))
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5

    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

    from dataclasses import replace as dc_replace

    def loss_fn(p, rays_o, rays_d, key):
        em2 = dc_replace(em, radiance=p["radiance"])
        crf2 = dc_replace(crf, weight=p["crf_w"])
        key, k_mat = jax.random.split(key)
        # stochastic-corner hash-grid gradients: the default train config
        mat_fn = functools.partial(ngp_brdf_apply, p["material"], key=k_mat)
        l = path_tracing_single(key, tracer, em2, mat_fn, rays_o, rays_d,
                                jnp.asarray(dxdu), jnp.asarray(dydv), SPP)
        ldr = crf_forward(crf2, l, 1.0)
        return jnp.mean((ldr - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # fresh ray batch per iteration: small per-iteration origin offsets,
    # pre-built and device-resident before the clock starts
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(WARMUP + ITERS):
        jo = (o + rng.uniform(-0.01, 0.01, o.shape)).astype(np.float32)
        batches.append((jnp.asarray(jo), jnp.asarray(d)))
    batches = jax.block_until_ready(batches)

    key = jax.random.PRNGKey(0)
    keys = jax.block_until_ready(
        [jax.random.fold_in(key, i) for i in range(WARMUP + ITERS)])

    # warmup chain (compile + pipeline fill), fetched before the clock
    carry = jnp.float32(0.0)
    for i in range(WARMUP):
        ro, rd = batches[i]
        carry, g = grad_fn(params, ro + carry * 1e-12, rd, keys[i])
    float(carry)

    # timed chain: one fetch at the end; each step's origins depend on the
    # previous step's loss, so the device must run all ITERS steps in order
    t0 = time.time()
    carry = jnp.float32(0.0)
    for i in range(ITERS):
        ro, rd = batches[WARMUP + i]
        carry, g = grad_fn(params, ro + carry * 1e-12, rd, keys[WARMUP + i])
    float(carry)
    dt = (time.time() - t0) / ITERS

    rays_per_s = b * SPP / dt

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_BENCH.json")
    vs = 1.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("value", 1.0)
        vs = rays_per_s / baseline
    else:
        # first successful run records the round-1 baseline
        try:
            with open(base_path, "w") as f:
                json.dump({"metric": "train_fwd_bwd_rays_per_s",
                           "value": round(rays_per_s, 1),
                           "unit": "rays/s/chip"}, f)
        except OSError:
            pass

    print(json.dumps({
        "metric": "train_fwd_bwd_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
    os._exit(0)
