"""Quality A/B for HashGridConfig.fwd_level_sample (CPU, miniature scale).

Mirrors the tests/test_quality.py fixture up to the brdf0 stage (shared
dataset + init + bakes), then trains brdf0 once per fwd_level_sample
setting and prints the recovered-albedo per-channel correlations vs the
generator's closed-form GT field. Decides whether the forward level-block
dropout is quality-neutral enough to recommend (PERF.md round 2f).

Run: IRIS_TPU_FORCE_CPU=1 python ab_fwd_level_sample.py
"""

from __future__ import annotations

import os
import shutil

os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def albedo_corrs(root, ck, exp):
    from iris_tpu.data.make_demo_dataset import gt_mat_fn
    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.train.checkpoint import load_pytree

    mesh = load_mesh(os.path.join(root, "scene.obj"))
    tracer = build_bvh(mesh.triangles())
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(0.3, 1.7, (4096, 3)) * [1, 1, 0.45]
                    + [0, 0, 0.1], jnp.float32)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, _, _, _, valid = ray_intersect(tracer, o,
                                        jnp.asarray(d, jnp.float32))
    mask = np.asarray(valid)
    gt = np.asarray(gt_mat_fn(pos)["albedo"])[mask]
    p = load_pytree(os.path.join(ck, exp, "last.pkl"))["material"]
    tr = np.asarray(ngp_brdf_apply(p, pos)["albedo"])[mask]
    return [float(np.corrcoef(tr[:, c], gt[:, c])[0, 1]) for c in range(3)]


def main():
    from iris_tpu.data.make_demo_dataset import make_dataset
    from iris_tpu.pipeline import (
        bake_shading, extract_emitter, initialize, slf_bake, train_brdf_crf,
    )

    root = "/tmp/ab_fls_scene"
    out = "/tmp/ab_fls_out"
    for p in (root, out):
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p)
    ck = os.path.join(out, "ckpt")
    make_dataset(root, img_hw=(24, 32), n_train=4, n_val=1, spp=32,
                 indir_depth=2)

    common = ["--dataset", "synthetic", "--scene", root, "--output", out,
              "--ldr_img_dir", "ldr"]
    slf_bake.main(common + ["--voxel_num", "48"])
    extract_emitter.main(common + ["--threshold", "0.99"])
    train_common = [
        "--dataset", "synthetic", root, "--ldr_img_dir", "ldr",
        "--voxel_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", os.path.join(out, "emitter.npz"),
        "--checkpoint_path", ck,
        "--hash_levels", "8", "--log2_hashmap_size", "13",
        "--max_segments", "16", "--batch_size", "1024",
        "--has_part", "1",
    ]
    initialize.main(train_common + [
        "--experiment_name", "init", "--SPP", "4", "--spp", "4",
        "--max_steps", "150", "--radiance_lr_scale", "30"])
    extract_emitter.main(common + [
        "--mode", "update", "--ckpt", os.path.join(ck, "init", "last.pkl")])
    p = os.path.join(out, "emitter.npz")
    z = dict(np.load(p))
    z["emitter_radiance"] = np.full_like(z["emitter_radiance"], 10.0)
    np.savez(p, **z)
    bake_shading.main(common + [
        "--slf_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", p,
        "--output", os.path.join(out, "shading"),
        "--spp_diffuse", "64"])

    results = {}
    for fls in (0, 4, 2):   # off / 2x / 4x of the 8-level fixture model
        exp = f"q_fls{fls}"
        train_brdf_crf.main(train_common + [
            "--experiment_name", exp,
            "--max_steps", "400",
            "--fwd_level_sample", str(fls),
            "--ckpt_path", os.path.join(ck, "init", "last.pkl"),
            "--cache_dir", os.path.join(out, "shading"),
            "--lp", "0.005", "--la", "0.01"])
        results[fls] = albedo_corrs(root, ck, exp)
        print(f"[ab] fwd_level_sample={fls}: albedo corr {results[fls]}",
              flush=True)

    print("[ab] summary:", results, flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
