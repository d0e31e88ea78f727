"""Device A/B: paired-streamed vs plain streamed traversal (PERF ladder
item: the streamed kernel's incoherent-ray floor, 0.25-0.6 Mrays/s).

Scenes: 360K-face box clutter (bigtree step regime) and the ~1M-face
heightfield (real-ScanNet++ scale, same fixture as paired_probe.run_big).
Coherent camera-cone and incoherent random rays, chained-carry scan
timer (pure device time).

Run detached on an idle chip:
  setsid nohup python probes/paired_streamed_ab.py \
      > outputs/paired_streamed_ab.log 2>&1 &
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.pallas_intersect import (
    paired_vmem_bytes, pallas_ray_trace_dense_streamed,
    pallas_ray_trace_paired_streamed, pallas_ray_trace_streamed)
from iris_tpu.geometry.procedural import _box, make_box_scene, random_rays
from iris_tpu.utils.timing import bench_scan

B = 1 << 18


def rays_for(coherent: bool, seed: int):
    if coherent:
        key = jax.random.PRNGKey(seed)
        d = jax.random.normal(key, (B, 3)) * jnp.asarray([0.3, 0.3, 1.0])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(jnp.asarray([0.0, 0.5, -2.5]), (B, 3))
        return o, d
    o, d = random_rays(B, seed=seed)
    return jnp.asarray(o), jnp.asarray(d)


def heightfield_tracer(side: int = 707):
    xs = np.linspace(0.05, 1.95, side + 1, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.15 + 0.1 * np.sin(gx * 9.0) * np.cos(gy * 7.0)
    v = np.stack([gx, gy, gz], -1)
    a = v[:-1, :-1].reshape(-1, 3)
    b = v[1:, :-1].reshape(-1, 3)
    c = v[1:, 1:].reshape(-1, 3)
    d = v[:-1, 1:].reshape(-1, 3)
    tris = np.concatenate([np.stack([a, b, c], 1),
                           np.stack([a, c, d], 1)], 0)
    room = _box((0, 0, 0), (2, 2, 1))
    return build_bvh(np.concatenate([room, tris], 0))


def run(tag: str, tracer):
    print(f"--- {tag}: faces={tracer.n_faces} "
          f"paired_bytes={paired_vmem_bytes(tracer)>>20}MB", flush=True)
    kernels = {
        "streamed": lambda o, d: pallas_ray_trace_streamed(
            tracer, o, d, tile=8192),
        "paired_streamed": lambda o, d: pallas_ray_trace_paired_streamed(
            tracer, o, d, tile=8192),
        "dense_streamed": lambda o, d: pallas_ray_trace_dense_streamed(
            tracer, o, d, tile=8192),
    }
    arms = os.environ.get("AB_ARMS")
    if arms:
        kernels = {k: v for k, v in kernels.items()
                   if k in arms.split(",")}
    for coherent in (True, False):
        o, d = rays_for(coherent, seed=11)
        for name, fn in kernels.items():
            t0 = time.time()

            def step(key):
                eps = jax.random.uniform(key, (1, 3)) * 1e-6
                t, *_ = fn(o + eps, d)
                return jnp.mean(jnp.where(t < 1e30, t, 0.0))

            dt = bench_scan(step, jax.random.PRNGKey(0), iters=8)
            print(json.dumps({
                "scene": tag, "faces": int(tracer.n_faces),
                "kernel": name, "coherent": coherent,
                "ms_per_call": round(dt * 1e3, 2),
                "mrays_s": round(B / dt / 1e6, 2),
                "wall_incl_compile_s": round(time.time() - t0, 1),
            }), flush=True)


def main():
    mesh, _ = make_box_scene(n_clutter=30000, seed=3)
    run("clutter360k", build_bvh(mesh.triangles()))
    run("heightfield1m", heightfield_tracer())


if __name__ == "__main__":
    main()
    os._exit(0)
