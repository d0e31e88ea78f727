"""Training-level n_pairs A/B (verdict weak item 6 follow-up).

probes/npairs_error.py showed the propagation-loss ESTIMATOR at 256
partners is noticeably noisier than at the reference's 1024
(grad cos 0.69 vs 0.88 against a 16384-pair reference). Does that noise
matter where it counts — the recovered BRDF fields after brdf0 training?
Same miniature chain as the denoiser A/B, arms differing only in
--n_pairs (256 vs 1024).

CPU: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python probes/npairs_train_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_arm(root: str, out: str, n_pairs: int) -> dict:
    ck = os.path.join(out, "ckpt")
    from iris_tpu.pipeline import (
        bake_shading, extract_emitter, initialize, slf_bake, train_brdf_crf,
    )
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
        "--has_part", "0", "--n_pairs", str(n_pairs),
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
    train_brdf_crf.main(train_common + [
        "--experiment_name", "np_brdf",
        "--max_steps", "400",
        "--ckpt_path", os.path.join(ck, "init", "last.pkl"),
        "--cache_dir", os.path.join(out, "shading"),
        "--lp", "0.005", "--la", "0.01"])

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
    pos, _, _, _, valid = ray_intersect(tracer, o, jnp.asarray(d,
                                                               jnp.float32))
    mask = np.asarray(valid)
    gt = gt_mat_fn(pos)
    params = load_pytree(os.path.join(ck, "np_brdf", "last.pkl"))["material"]
    tr = ngp_brdf_apply(params, pos)
    albedo_corr = [
        float(np.corrcoef(np.asarray(tr["albedo"])[mask, c],
                          np.asarray(gt["albedo"])[mask, c])[0, 1])
        for c in range(3)]
    rough_corr = float(np.corrcoef(
        np.asarray(tr["roughness"])[mask, 0],
        np.asarray(gt["roughness"])[mask, 0])[0, 1])
    log = os.path.join("outputs", "np_brdf", "train_log.jsonl")
    last_loss = None
    if os.path.exists(log):
        with open(log) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    last_loss = rec["loss"]
        os.remove(log)
    return {"n_pairs": n_pairs, "albedo_corr": albedo_corr,
            "rough_corr": rough_corr, "final_loss": last_loss}


def main():
    from iris_tpu.data.make_demo_dataset import make_dataset

    base = tempfile.mkdtemp(prefix="npairs_ab_")
    root = os.path.join(base, "scene")
    make_dataset(root, img_hw=(24, 32), n_train=4, n_val=1, spp=32,
                 indir_depth=2)
    for n_pairs in (256, 1024):
        out = os.path.join(base, f"out_{n_pairs}")
        os.makedirs(out, exist_ok=True)
        print(json.dumps(run_arm(root, out, n_pairs)), flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
    os._exit(0)
