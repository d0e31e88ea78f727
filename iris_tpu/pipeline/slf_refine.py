"""Stage 7: re-bake the SLF radiance with the learned CRF.

Parity: reference slf_refine.py — reuse the existing vslf mask/bbox, redo
only the radiance scatter pass with crf_inverse using the trained CRF
weights from a checkpoint. Writes vslf_0.npz (or --save).
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models.crf import crf_inverse, init_emor_crf
from iris_tpu.models.slf import init_voxel_slf, slf_finalize_mean, slf_scatter_add
from iris_tpu.pipeline.common import load_scene, save_vslf
from iris_tpu.train.checkpoint import load_pytree


def refine_slf(tracer, dataset, crf, mask, vmin, vmax):
    vslf = init_voxel_slf(mask, vmin, vmax)

    @jax.jit
    def update(rad, cnt, rays, rgbs, exposure):
        slf = vslf.__class__(vslf.inds, rad, cnt, vslf.voxel_min,
                             vslf.voxel_max, vslf.H)
        xs, ds = rays[..., :3], rays[..., 3:6]
        pos, _, _, _, valid = ray_intersect(tracer, xs, ds)
        radiance = crf_inverse(crf, rgbs, exposure)
        slf = slf_scatter_add(slf, pos, radiance, mask=valid)
        return slf.radiance, slf.count

    rad, cnt = vslf.radiance, vslf.count
    for fr in dataset.frames():
        exposure = fr.get("exposure")
        if exposure is None:
            exposure = np.float32(1.0)
        rad, cnt = update(rad, cnt, jnp.asarray(fr["rays"]),
                          jnp.asarray(fr["rgbs"]), exposure)
    vslf2 = vslf.__class__(vslf.inds, rad, cnt, vslf.voxel_min,
                           vslf.voxel_max, vslf.H)
    return slf_finalize_mean(vslf2)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--load", type=str, default="vslf.npz")
    parser.add_argument("--save", type=str, default="vslf_0.npz")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--crf_basis", type=int, default=3)
    parser.add_argument("--res_scale", type=float, default=1.0)
    args = parser.parse_args(argv)

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)

    crf = init_emor_crf(dim=args.crf_basis)
    if args.ckpt:
        ckpt = load_pytree(args.ckpt)
        if "crf_weight" in ckpt:
            crf = dc_replace(crf, weight=jnp.asarray(ckpt["crf_weight"]))

    z = np.load(os.path.join(args.output, args.load))
    from iris_tpu.data.datasets import load_dataset
    kw = dict(split="train", res_scale=args.res_scale)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    dataset = load_dataset(args.dataset, data_root, scene=scene_id, **kw)

    t0 = time.time()
    vslf = refine_slf(tracer, dataset, crf, z["mask"],
                      float(z["voxel_min"]), float(z["voxel_max"]))
    save_vslf(os.path.join(args.output, args.save), vslf, z["mask"])
    print(f"[slf_refine] time (s): {time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
