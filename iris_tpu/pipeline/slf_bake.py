"""Stage 1: bake the voxel surface-light-field radiance cache.

Parity: reference slf_bake.py — three dataset passes:
  1. scene AABB from first-hit positions (scalar min/max, 1.1x inflation)
  2. voxel-visibility histogram (device-resident scatter, replaces the
     torch scatter_add_ at slf_bake.py:113)
  3. CRF-inverted LDR radiance scatter-add + mean pooling (the reference
     does this pass on CPU, slf_bake.py:135 — here it stays on device)
Writes vslf.npz.

Usage: python -m iris_tpu.pipeline.slf_bake --dataset synthetic <root> \
           --scene x --output outputs/x [--voxel_num 256]
"""

from __future__ import annotations

import functools
import os
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models.crf import crf_inverse, init_emor_crf
from iris_tpu.models.slf import init_voxel_slf, slf_finalize_mean, slf_scatter_add
from iris_tpu.pipeline.common import load_scene, save_vslf


def bake_slf(tracer, dataset, crf, voxel_num: int = 256,
             dataset_kind: str = "synthetic", log=print):
    """Run the three passes; returns (vslf, mask)."""

    @jax.jit
    def first_hits(rays):
        xs, ds = rays[..., :3], rays[..., 3:6]
        pos, _, _, _, valid = ray_intersect(tracer, xs, ds)
        big = jnp.float32(3e38)
        lo = jnp.min(jnp.where(valid[:, None], pos, big))
        hi = jnp.max(jnp.where(valid[:, None], pos, -big))
        return pos, valid, lo, hi

    # pass 1: scene bounds (scalar, isotropic — slf_bake.py:84-85)
    log("[slf_bake] pass 1: scene bounds")
    vmin, vmax = np.float32(1e30), np.float32(-1e30)
    for fr in dataset.frames():
        _, _, lo, hi = first_hits(jnp.asarray(fr["rays"]))
        vmin = min(vmin, float(lo))
        vmax = max(vmax, float(hi))
    if dataset_kind in ("synthetic", "real"):
        vmin, vmax = 1.1 * vmin, 1.1 * vmax
    else:
        c = vmin + vmax
        vmin, vmax = c + (vmin - c) * 1.1, c + (vmax - c) * 1.1

    # pass 2: visibility histogram
    log("[slf_bake] pass 2: voxel visibility")
    res = voxel_num

    @jax.jit
    def hist_update(hist, rays):
        pos, valid, _, _ = first_hits(rays)
        x = (pos - vmin) / (vmax - vmin)
        xi = jnp.clip((x * res).astype(jnp.int32), 0, res - 1)
        flat = xi[:, 0] + xi[:, 1] * res + xi[:, 2] * res * res
        return hist.at[flat].add(valid.astype(jnp.float32))

    hist = jnp.zeros((res ** 3,), jnp.float32)
    for fr in dataset.frames():
        hist = hist_update(hist, jnp.asarray(fr["rays"]))
    mask = np.asarray(hist > 0).reshape(res, res, res)

    # pass 3: radiance bake
    log("[slf_bake] pass 3: radiance scatter")
    vslf = init_voxel_slf(mask, vmin, vmax)

    @jax.jit
    def bake_update(slf_rad, slf_cnt, rays, rgbs, exposure):
        slf = vslf.__class__(vslf.inds, slf_rad, slf_cnt, vslf.voxel_min,
                             vslf.voxel_max, vslf.H)
        pos, valid, _, _ = first_hits(rays)
        radiance = crf_inverse(crf, rgbs, exposure)
        slf = slf_scatter_add(slf, pos, radiance, mask=valid)
        return slf.radiance, slf.count

    rad, cnt = vslf.radiance, vslf.count
    for fr in dataset.frames():
        exposure = fr.get("exposure")
        if exposure is None:
            exposure = np.float32(1.0)
        rad, cnt = bake_update(rad, cnt, jnp.asarray(fr["rays"]),
                               jnp.asarray(fr["rgbs"]), exposure)
    vslf = vslf.__class__(vslf.inds, rad, cnt, vslf.voxel_min,
                          vslf.voxel_max, vslf.H)
    vslf = slf_finalize_mean(vslf)
    return vslf, mask


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--voxel_num", type=int, default=256)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--res_scale", type=float, default=1.0)
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    root = args.dataset_root or args.scene
    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = root if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)

    from iris_tpu.data.datasets import load_dataset
    kw = dict(split="train", res_scale=args.res_scale)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    dataset = load_dataset(args.dataset, data_root, scene=scene_id, **kw)

    crf = init_emor_crf(dim=11)
    t0 = time.time()
    vslf, mask = bake_slf(tracer, dataset, crf, args.voxel_num, args.dataset)
    save_vslf(os.path.join(args.output, "vslf.npz"), vslf, mask)
    print(f"[slf_bake] time (s): {time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
