"""Semantic-mesh -> per-view segmentation maps via ray casting.

Parity: reference utils/dataset/scannetpp/render_semantic.py — a labeled
mesh (per-face semantic id) is ray-cast from every camera to produce
per-view segmentation EXRs; also covers scannetpp/process.py's image-resize
prep via --res_scale on the datasets themselves.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.utils.exr import write_exr


def render_semantic(tracer, face_labels: np.ndarray, dataset, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    h, w = dataset.img_hw
    lab = jnp.asarray(face_labels, jnp.int32)

    @jax.jit
    def trace(rays):
        xs, ds = rays[..., :3], rays[..., 3:6]
        _, _, _, tri, valid = ray_intersect(tracer, xs, ds)
        out = jnp.where(valid, lab[jnp.maximum(tri, 0)], -1)
        return out

    for i, fr in enumerate(dataset.frames()):
        seg = np.asarray(trace(jnp.asarray(fr["rays"])))
        img = np.repeat(seg.astype(np.float32).reshape(h, w, 1), 3, -1)
        write_exr(os.path.join(out_dir, f"{i:03d}.exr"), img)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--labels", type=str, required=True,
                        help=".npy per-face semantic labels")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    args = parser.parse_args(argv)

    from iris_tpu.data.datasets import load_dataset
    from iris_tpu.pipeline.common import load_scene

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)
    labels = np.load(args.labels)
    kw = dict(split="train")
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    ds = load_dataset(args.dataset, data_root, scene=scene_id, **kw)
    render_semantic(tracer, labels, ds, args.output)
    print("[render_semantic] wrote", args.output)


if __name__ == "__main__":
    main()
