"""Export per-view position / normal / depth maps.

Parity: reference utils/dataset/neilf/extract_geometry.py — geometry buffers
for NeILF-style baselines, produced by ray casting each dataset view.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.utils.exr import write_exr


def extract_geometry(tracer, dataset, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    h, w = dataset.img_hw

    @jax.jit
    def trace(rays):
        xs, ds = rays[..., :3], rays[..., 3:6]
        pos, nrm, _, _, valid = ray_intersect(tracer, xs, ds)
        depth = jnp.linalg.norm(pos - xs, axis=-1) * valid
        return pos, nrm, depth

    for i, fr in enumerate(dataset.frames()):
        pos, nrm, depth = [np.asarray(x)
                           for x in trace(jnp.asarray(fr["rays"]))]
        write_exr(os.path.join(out_dir, f"{i:03d}_position.exr"),
                  pos.reshape(h, w, 3))
        write_exr(os.path.join(out_dir, f"{i:03d}_normal.exr"),
                  nrm.reshape(h, w, 3))
        write_exr(os.path.join(out_dir, f"{i:03d}_depth.exr"),
                  depth.reshape(h, w))


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--split", type=str, default="train")
    args = parser.parse_args(argv)

    from iris_tpu.data.datasets import load_dataset
    from iris_tpu.pipeline.common import load_scene

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)
    kw = dict(split=args.split)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    ds = load_dataset(args.dataset, data_root, scene=scene_id, **kw)
    extract_geometry(tracer, ds, args.output)
    print("[extract_geometry] wrote", args.output)


if __name__ == "__main__":
    main()
