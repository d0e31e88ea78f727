"""Benchmark: forward+backward path-trace throughput (the training hot path).

Measures rays/s of a jit-compiled gradient step of `path_tracing_single`
(3 BVH traversals + hash-grid BRDF + emitter sampling + CRF per camera
sample, grads into material+emitter+CRF — mirrors SURVEY.md §3.2, the
reference's initialize/train_emitter inner loop) at the PRODUCTION DEFAULT
model parameterization (pipeline/config.py, round 5): the 4-level x
16-feature row-gather hash grid — the SAME parameter count (2^24 table
floats) and 64-wide MLP input as the reference's 32 levels x 2 features x
2^19 (reference model/brdf.py:222-240), laid out for TPU row gathers
(quality receipts: miniature equal-capacity arm round-3a + the FULL
production-scale grid-only A/B, PERF.md round-5f — image metrics
neutral, decomposition correlations better than the round-4 8x8).

Two regimes in one JSON line (round-3 verdict item 2 — the 398-face
flagship number alone overstates the production regime by 1.5-2x):
  value                  — flagship demo scene (398 faces, VMEM-resident
                           Pallas traversal), the round-over-round headline
  rays_per_s_102k_faces  — a 102,014-face clutter scene (the HBM-streamed /
                           dense-resident regime, ScanNet++-scale tree)

Timing hygiene (PERF.md): every iteration uses a FRESH ray jitter and a
fresh PRNG key — repeated-args loops and fetch-free `block_until_ready`
report fantasy numbers on this backend. Timing is the canonical
`iris_tpu.utils.timing.bench_scan`: N gradient steps inside ONE jitted
lax.scan, carry-chained (step i's ray origins depend on step i-1's grads
x 1e-20 — numerically invisible but not foldable) with a single host
fetch at the end, and every grad leaf folded into the fetched scalar so
the backward stays live (PERF.md DCE trap). This matches how the
trainers actually dispatch work — `chunk_steps=10` optimizer steps per
jitted lax.scan (pipeline/config.py, train/loop.py make_train_chunk) —
whereas a one-dispatch-per-step host loop pays ~10 ms/step of tunnel
RTT that production runs do not (round-4 A/B: 105.9 ms/step host loop
vs 96.6 ms/step in-scan on the identical program).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"rays_per_s_102k_faces", "kernel_mode_102k"}. `vs_baseline` is measured
against BASELINE_BENCH.json at repo root (the recorded round-1 value);
1.0 when absent.

A "ray" here = one camera sample (each costs 3 ray_intersect calls +
2 material queries + NEE), matching how the reference pipeline counts its
per-step ray budget (batch * spp).
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp

BATCH = 8192          # reference training batch (configs/config.py:9)
SPP = 32              # reference per-round spp (train.sh:20)
HASH_LEVELS = 4       # production default (pipeline/config.py hash_levels)
HASH_FEATURES = 16    # row-gather grid: L*F*2^19 = reference capacity
LOG2_TABLE = 19       # reference model/brdf.py:226


def measure(n_clutter: int, iters: int) -> dict:
    from dataclasses import replace as dc_replace

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import _pallas_mode
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.models.hashgrid import auto_bwd_level_sample
    from iris_tpu.render.integrator import path_tracing_single

    tracer, em, ngp, crf, mesh = make_demo_scene(
        n_clutter=n_clutter, slf_res=64, hash_levels=HASH_LEVELS,
        log2_table=LOG2_TABLE, hash_features=HASH_FEATURES,
        per_level_scale=-1.0,   # auto: span the reference resolution range
    )
    # flagship TRAIN config = the trainers' defaults: stochastic-corner
    # fwd+bwd + auto level-block-subsampled gradient scatter (n_levels/4;
    # unbiased, quality validated — see PERF.md). Eval/render paths pass
    # no key and stay exact.
    ngp = dc_replace(ngp, cfg=dc_replace(
        ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
        bwd_level_sample=auto_bwd_level_sample(HASH_LEVELS)))
    n_side = int(BATCH ** 0.5)
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    target = jnp.ones((b, 3)) * 0.5
    params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

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

    grad_fn = jax.grad(loss_fn)
    o, d = jnp.asarray(o), jnp.asarray(d)

    def step(key):
        # fresh ray batch per iteration (device-side jitter) + fresh key;
        # folding every grad leaf into the carried scalar keeps the
        # backward live and chains the steps (no elision / reordering)
        eps = jax.random.uniform(key, (1, 3)) * 1e-6
        g = grad_fn(params, o + eps, d, key)
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(g):
            acc = acc + jnp.sum(leaf.astype(jnp.float32) ** 2) * 1e-20
        return acc

    from iris_tpu.utils.timing import bench_scan
    dt = bench_scan(step, jax.random.PRNGKey(0), iters=iters)

    return {
        "rays_per_s": b * SPP / dt,
        "faces": int(mesh.n_faces),
        "kernel_mode": _pallas_mode(tracer, b * SPP) or "xla",
    }


def main():
    head = measure(n_clutter=32, iters=24)
    rays_per_s = head["rays_per_s"]

    # production-regime companion metric (round-3 verdict item 2): a
    # ScanNet++-scale 102K-face tree, same train step. Skippable for
    # quick headline-only runs (IRIS_TPU_BENCH_SMALL_ONLY=1).
    big = None
    if not os.environ.get("IRIS_TPU_BENCH_SMALL_ONLY"):
        big = measure(n_clutter=8500, iters=8)

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

    out = {
        "metric": "train_fwd_bwd_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(vs, 4),
    }
    if big is not None:
        out["rays_per_s_102k_faces"] = round(big["rays_per_s"], 1)
        out["kernel_mode_102k"] = big["kernel_mode"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    os._exit(0)
