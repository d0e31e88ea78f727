"""Device A/B: paired vs ordered vs streamed traversal kernels.

Measures the three Mosaic traversal kernels on the two scale-record
regimes (8.4K faces N_CLUTTER=700, ~24K faces N_CLUTTER=2000) with
coherent camera rays and incoherent bounce-like rays, using the
chained-carry scan timer (pure device time; PERF.md timing truth).

Run detached on the TPU:  setsid nohup python probes/paired_probe.py \
    > outputs/paired_probe.log 2>&1 &
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.pallas_intersect import (
    dense_available, dense_vmem_bytes, paired_available, paired_vmem_bytes,
    pallas_available, pallas_ray_trace, pallas_ray_trace_dense,
    pallas_ray_trace_ordered, pallas_ray_trace_paired,
    pallas_ray_trace_streamed, vmem_bytes)
from iris_tpu.geometry.procedural import _box, make_box_scene, random_rays
from iris_tpu.utils.timing import bench_scan

B = 1 << 18


def rays_for(tracer, coherent: bool, seed: int):
    if coherent:
        # camera-like: one origin, directions in a cone
        key = jax.random.PRNGKey(seed)
        d = jax.random.normal(key, (B, 3)) * jnp.asarray([0.3, 0.3, 1.0])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(jnp.asarray([0.0, 0.5, -2.5]), (B, 3))
        return o, d
    o, d = random_rays(B, seed=seed)
    return jnp.asarray(o), jnp.asarray(d)


def run(n_clutter: int):
    mesh, _ = make_box_scene(n_clutter=n_clutter, seed=3)
    tracer = build_bvh(mesh.triangles())
    print(f"--- n_clutter={n_clutter} faces={tracer.n_faces} "
          f"resident={vmem_bytes(tracer)>>20}MB "
          f"paired={paired_vmem_bytes(tracer)>>20}MB "
          f"dense={dense_vmem_bytes(tracer)>>10}KB "
          f"fits: resident={pallas_available(tracer)} "
          f"paired={paired_available(tracer)} "
          f"dense={dense_available(tracer)}", flush=True)
    kernels = {}
    if pallas_available(tracer):
        kernels["ordered"] = lambda o, d: pallas_ray_trace_ordered(
            tracer, o, d, tile=8192)
        kernels["union"] = lambda o, d: pallas_ray_trace(
            tracer, o, d, tile=8192)
    if paired_available(tracer):
        kernels["paired"] = lambda o, d: pallas_ray_trace_paired(
            tracer, o, d, tile=8192)
    if dense_available(tracer):
        kernels["dense"] = lambda o, d: pallas_ray_trace_dense(
            tracer, o, d, tile=8192)
    kernels["streamed"] = lambda o, d: pallas_ray_trace_streamed(
        tracer, o, d, tile=8192)
    for coherent in (True, False):
        o, d = rays_for(tracer, coherent, seed=11)
        for name, fn in kernels.items():
            t0 = time.time()

            def step(key):
                # key-derived jitter so scan iterations cannot be hoisted
                eps = jax.random.uniform(key, (1, 3)) * 1e-6
                t, *_ = fn(o + eps, d)
                return jnp.mean(jnp.where(t < 1e30, t, 0.0))

            dt = bench_scan(step, jax.random.PRNGKey(0), iters=8)
            rate = B / dt
            print(json.dumps({
                "n_clutter": n_clutter, "faces": int(tracer.n_faces),
                "kernel": name, "coherent": coherent,
                "ms_per_call": round(dt * 1e3, 2),
                "mrays_s": round(rate / 1e6, 2),
                "wall_incl_compile_s": round(time.time() - t0, 1),
            }), flush=True)


def run_big(side: int = 707):
    """~1M-face regime (real ScanNet++ scale): streamed kernel only.
    A wavy heightfield floor inside the room box keeps every ray hitting
    real geometry."""
    import numpy as np

    xs = np.linspace(0.05, 1.95, side + 1, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.15 + 0.1 * np.sin(gx * 9.0) * np.cos(gy * 7.0)
    v = np.stack([gx, gy, gz], -1)
    a = v[:-1, :-1].reshape(-1, 3)
    b = v[1:, :-1].reshape(-1, 3)
    c = v[1:, 1:].reshape(-1, 3)
    d = v[:-1, 1:].reshape(-1, 3)
    tris = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)], 0)
    room = _box((0, 0, 0), (2, 2, 1))
    tracer = build_bvh(np.concatenate([room, tris], 0))
    print(f"--- heightfield faces={tracer.n_faces} "
          f"paired={paired_vmem_bytes(tracer)>>20}MB (streamed regime)",
          flush=True)
    for coherent in (True, False):
        o, d2 = rays_for(tracer, coherent, seed=21)
        t0 = time.time()

        def step(key):
            eps = jax.random.uniform(key, (1, 3)) * 1e-6
            t, *_ = pallas_ray_trace_streamed(tracer, o + eps, d2, tile=8192)
            return jnp.mean(jnp.where(t < 1e30, t, 0.0))

        dt = bench_scan(step, jax.random.PRNGKey(0), iters=8)
        print(json.dumps({
            "faces": int(tracer.n_faces), "kernel": "streamed",
            "coherent": coherent, "ms_per_call": round(dt * 1e3, 2),
            "mrays_s": round(B / dt / 1e6, 2),
            "wall_incl_compile_s": round(time.time() - t0, 1),
        }), flush=True)


def run_mid(side: int = 200):
    """~80K-face regime: beyond the paired 10 MB gate, inside the dense
    one — dense (VMEM-resident) vs streamed (HBM) head to head."""
    import numpy as np

    xs = np.linspace(0.05, 1.95, side + 1, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.15 + 0.1 * np.sin(gx * 9.0) * np.cos(gy * 7.0)
    v = np.stack([gx, gy, gz], -1)
    a = v[:-1, :-1].reshape(-1, 3)
    b = v[1:, :-1].reshape(-1, 3)
    c = v[1:, 1:].reshape(-1, 3)
    d = v[:-1, 1:].reshape(-1, 3)
    tris = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)], 0)
    room = _box((0, 0, 0), (2, 2, 1))
    tracer = build_bvh(np.concatenate([room, tris], 0))
    print(f"--- mid heightfield faces={tracer.n_faces} "
          f"paired={paired_vmem_bytes(tracer)>>20}MB "
          f"dense={dense_vmem_bytes(tracer)>>20}MB "
          f"fits: paired={paired_available(tracer)} "
          f"dense={dense_available(tracer)}", flush=True)
    kernels = {"streamed": lambda o, d: pallas_ray_trace_streamed(
        tracer, o, d, tile=8192)}
    if dense_available(tracer):
        kernels["dense"] = lambda o, d: pallas_ray_trace_dense(
            tracer, o, d, tile=8192)
    for coherent in (True, False):
        o, d2 = rays_for(tracer, coherent, seed=31)
        for name, fn in kernels.items():
            t0 = time.time()

            def step(key):
                eps = jax.random.uniform(key, (1, 3)) * 1e-6
                t, *_ = fn(o + eps, d2)
                return jnp.mean(jnp.where(t < 1e30, t, 0.0))

            dt = bench_scan(step, jax.random.PRNGKey(0), iters=8)
            print(json.dumps({
                "faces": int(tracer.n_faces), "kernel": name,
                "coherent": coherent, "ms_per_call": round(dt * 1e3, 2),
                "mrays_s": round(B / dt / 1e6, 2),
                "wall_incl_compile_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    run(700)
    run(2000)
    if os.environ.get("PROBE_MID"):
        run_mid()
    else:
        run_big()
    print("PAIRED_PROBE_DONE", flush=True)
    os._exit(0)
