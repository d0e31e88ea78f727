"""Stages 2/4: emitter mask extraction & radiance update.

Parity: reference extract_emitter_ldr.py —
  export: per-triangle mean observed LDR radiance via segment reduction
          (torch_scatter :90-95 -> jax.ops.segment_sum), threshold 0.99,
          triangle geometry/area via cross products; writes emitter.npz
  update: copy the learned emitter radiance from a checkpoint into
          emitter.npz (:117-122)
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.pipeline.common import load_scene, save_emitter


def extract_emitter(tracer, mesh, dataset, threshold: float = 0.99,
                    log=print):
    n_face = mesh.n_faces

    @jax.jit
    def accumulate(rad_sum, cnt, rays, rgbs):
        xs, ds = rays[..., :3], rays[..., 3:6]
        _, _, _, tri, valid = ray_intersect(tracer, xs, ds)
        seg = jnp.where(valid, tri, n_face)  # invalid -> overflow bucket
        rad_sum = rad_sum + jax.ops.segment_sum(
            jnp.where(valid[:, None], rgbs, 0.0), seg, n_face + 1)
        cnt = cnt + jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, n_face + 1)
        return rad_sum, cnt

    rad = jnp.zeros((n_face + 1, 3), jnp.float32)
    cnt = jnp.zeros((n_face + 1,), jnp.float32)
    for fr in dataset.frames():
        rad, cnt = accumulate(rad, cnt, jnp.asarray(fr["rays"]),
                              jnp.asarray(fr["rgbs"]))
    mean = np.asarray(rad[:n_face]) / np.maximum(
        np.asarray(cnt[:n_face]), 1.0)[:, None]
    peak = mean.max(-1)  # max channel (extract_emitter_ldr.py:98)
    is_emitter = peak > threshold

    tri = mesh.triangles()[is_emitter]
    c = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = np.linalg.norm(c, axis=-1)
    emitter_normal = c / np.maximum(norm, 1e-20)[:, None]
    emitter_area = norm / 2.0
    emitter_radiance = np.zeros((max(int(is_emitter.sum()), 1), 3),
                                np.float32)
    log(f"[extract_emitter] {int(is_emitter.sum())}/{n_face} emitter faces")
    return is_emitter, tri, emitter_area, emitter_normal, emitter_radiance


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--mode", type=str, default="export",
                        choices=["export", "update"])
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--threshold", type=float, default=0.99)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--res_scale", type=float, default=1.0)
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    emitter_file = os.path.join(args.output, "emitter.npz")

    if args.mode == "update":
        from iris_tpu.train.checkpoint import load_pytree

        ckpt = load_pytree(args.ckpt)
        z = dict(np.load(emitter_file))
        z["emitter_radiance"] = np.asarray(ckpt["radiance"])
        save_emitter(emitter_file, z["is_emitter"], z["emitter_vertices"],
                     z["emitter_area"], z["emitter_normal"],
                     z["emitter_radiance"])
        print("[extract_emitter] updated radiance from", args.ckpt)
        return

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)

    from iris_tpu.data.datasets import load_dataset
    kw = dict(split="train", res_scale=args.res_scale)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    dataset = load_dataset(args.dataset, data_root, scene=scene_id, **kw)

    out = extract_emitter(tracer, mesh, dataset, args.threshold)
    save_emitter(emitter_file, *out)


if __name__ == "__main__":
    main()
