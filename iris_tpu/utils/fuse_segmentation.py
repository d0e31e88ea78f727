"""Multi-view segmentation fusion by per-triangle voting.

Parity: reference utils/fuse_segmentation.py — ray-cast every view, build a
per-triangle label histogram (scatter_add -> segment_sum), take the argmax
label per triangle, then rewrite each view's segmentation from the fused
per-triangle labels so maps are multi-view consistent.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.utils.exr import read_exr, write_exr


def fuse_segmentation(tracer, n_faces: int, frames, n_labels: int = 128):
    """frames: iterable of dicts with 'rays' (HW,12) and 'segmentation' (HW,).
    Returns per-triangle fused labels (F,) int32 (-1 = unobserved)."""

    @jax.jit
    def accumulate(hist, rays, seg):
        xs, ds = rays[..., :3], rays[..., 3:6]
        _, _, _, tri, valid = ray_intersect(tracer, xs, ds)
        lab = jnp.clip(seg.astype(jnp.int32), 0, n_labels - 1)
        flat = jnp.where(valid, jnp.maximum(tri, 0) * n_labels + lab,
                         n_faces * n_labels)
        return hist.at[flat].add(valid.astype(jnp.float32))

    hist = jnp.zeros((n_faces * n_labels + 1,), jnp.float32)
    for fr in frames:
        hist = accumulate(hist, jnp.asarray(fr["rays"]),
                          jnp.asarray(fr["segmentation"]))
    h = np.asarray(hist[:-1]).reshape(n_faces, n_labels)
    labels = np.where(h.sum(-1) > 0, h.argmax(-1), -1).astype(np.int32)
    return labels


def rewrite_views(tracer, labels, frames, out_dir: str, img_hw):
    os.makedirs(out_dir, exist_ok=True)
    lab = jnp.asarray(labels)

    @jax.jit
    def relabel(rays, seg):
        xs, ds = rays[..., :3], rays[..., 3:6]
        _, _, _, tri, valid = ray_intersect(tracer, xs, ds)
        fused = lab[jnp.maximum(tri, 0)]
        keep = (~valid) | (fused < 0)
        return jnp.where(keep, seg.astype(jnp.int32), fused)

    h, w = img_hw
    for i, fr in enumerate(frames):
        new = np.asarray(relabel(jnp.asarray(fr["rays"]),
                                 jnp.asarray(fr["segmentation"])))
        img = np.repeat(new.astype(np.float32).reshape(h, w, 1), 3, -1)
        write_exr(os.path.join(out_dir, f"{i:03d}.exr"), img)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--n_labels", type=int, default=128)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    args = parser.parse_args(argv)

    from iris_tpu.data.datasets import load_dataset
    from iris_tpu.pipeline.common import load_scene

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)
    kw = dict(split="train", load_inverse=True)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    ds = load_dataset(args.dataset, data_root, scene=scene_id, **kw)
    labels = fuse_segmentation(tracer, mesh.n_faces, ds.frames(),
                               args.n_labels)
    rewrite_views(tracer, labels, ds.frames(), args.output, ds.img_hw)
    print(f"[fuse_segmentation] fused {int((labels >= 0).sum())} labeled "
          f"faces -> {args.output}")


if __name__ == "__main__":
    main()
