"""Denoiser A/B (round-4 verdict item 8): what do denoised shading caches
buy the BRDF fit?

The reference applies the OptiX denoiser to every shading map before it
is written (bake_shading.py:81,198) — cache bias feeds the BRDF fit. Our
substitute is the aux-guided a-trous filter (render/denoise.py). This
probe runs the miniature pipeline chain twice — bake_shading + brdf0 with
the denoiser ON vs OFF (IRIS_TPU_NO_DENOISE=1) — on the hermetic demo
scene and reports per-channel albedo/roughness correlation vs the
generator's closed-form GT field, plus the final train loss.

CPU-runnable:
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python probes/denoise_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_arm(root: str, out: str, denoise: bool) -> dict:
    if denoise:
        os.environ.pop("IRIS_TPU_NO_DENOISE", None)
    else:
        os.environ["IRIS_TPU_NO_DENOISE"] = "1"

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

    # the stage under test: shading caches written with/without denoise
    bake_shading.main(common + [
        "--slf_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", p,
        "--output", os.path.join(out, "shading"),
        "--spp_diffuse", "64"])
    train_brdf_crf.main(train_common + [
        "--experiment_name", "dn_brdf",
        "--max_steps", "400",
        "--ckpt_path", os.path.join(ck, "init", "last.pkl"),
        "--cache_dir", os.path.join(out, "shading"),
        "--lp", "0.005", "--la", "0.01"])

    # score: correlation of recovered fields vs the generator's GT
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
    params = load_pytree(os.path.join(ck, "dn_brdf", "last.pkl"))["material"]
    tr = ngp_brdf_apply(params, pos)
    albedo_corr = [
        float(np.corrcoef(np.asarray(tr["albedo"])[mask, c],
                          np.asarray(gt["albedo"])[mask, c])[0, 1])
        for c in range(3)]
    rough_corr = float(np.corrcoef(
        np.asarray(tr["roughness"])[mask, 0],
        np.asarray(gt["roughness"])[mask, 0])[0, 1])

    log = os.path.join("outputs", "dn_brdf", "train_log.jsonl")
    last_loss = None
    if os.path.exists(log):
        with open(log) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    last_loss = rec["loss"]
        os.remove(log)
    return {"denoise": denoise, "albedo_corr": albedo_corr,
            "rough_corr": rough_corr, "final_loss": last_loss}


def main():
    from iris_tpu.data.make_demo_dataset import make_dataset

    base = tempfile.mkdtemp(prefix="denoise_ab_")
    root = os.path.join(base, "scene")
    make_dataset(root, img_hw=(24, 32), n_train=4, n_val=1, spp=32,
                 indir_depth=2)
    for arm in (True, False):
        out = os.path.join(base, f"out_{int(arm)}")
        os.makedirs(out, exist_ok=True)
        r = run_arm(root, out, arm)
        print(json.dumps(r), flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
    os._exit(0)
