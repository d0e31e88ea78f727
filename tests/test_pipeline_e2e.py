"""End-to-end pipeline smoke test on a generated miniature dataset.

Exercises the full 9-stage flow (SURVEY.md §0) hermetically:
  slf_bake -> extract_emitter -> initialize -> bake_shading ->
  train_brdf_crf -> slf_refine -> train_emitter -> refine_shading -> render
with tiny budgets. Checks artifacts exist, losses are finite, and the
recovered emitter mask matches the GT emissive faces.
"""

import json
import os

import numpy as np
import pytest

from iris_tpu.data.make_demo_dataset import GT_RADIANCE, make_dataset


@pytest.fixture(scope="module")
def demo_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demo_scene"))
    make_dataset(root, img_hw=(32, 40), n_train=4, n_val=1, spp=24,
                 indir_depth=2)
    return root


def test_full_pipeline(demo_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    ckpt_root = os.path.join(out, "ckpt")

    # ---- stage 1: slf_bake
    from iris_tpu.pipeline import slf_bake
    slf_bake.main([
        "--dataset", "synthetic", "--scene", demo_root, "--output", out,
        "--voxel_num", "24", "--ldr_img_dir", "ldr",
    ])
    assert os.path.exists(os.path.join(out, "vslf.npz"))
    z = np.load(os.path.join(out, "vslf.npz"))
    assert z["mask"].sum() > 0
    assert np.isfinite(z["radiance"]).all()
    assert z["radiance"].max() > 0

    # ---- stage 2: extract_emitter
    from iris_tpu.pipeline import extract_emitter
    extract_emitter.main([
        "--dataset", "synthetic", "--scene", demo_root, "--output", out,
        "--threshold", "0.99", "--ldr_img_dir", "ldr",
    ])
    ez = np.load(os.path.join(out, "emitter.npz"))
    # GT: the last two faces are the emissive quad
    gt_faces = np.zeros(len(ez["is_emitter"]), bool)
    gt_faces[-2:] = True
    found = ez["is_emitter"]
    assert found[-2:].all(), "GT emitter faces not detected"
    assert found.sum() <= 8, f"too many emitter faces: {found.sum()}"

    # ---- stage 3: initialize
    from iris_tpu.pipeline import initialize
    common = [
        "--dataset", "synthetic", demo_root, "--ldr_img_dir", "ldr",
        "--voxel_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", os.path.join(out, "emitter.npz"),
        "--checkpoint_path", ckpt_root,
        "--hash_levels", "4", "--log2_hashmap_size", "10",
        "--max_segments", "16", "--batch_size", "512",
        "--SPP", "4", "--spp", "2",
    ]
    initialize.main(common + ["--experiment_name", "init",
                              "--max_steps", "10"])
    init_ckpt = os.path.join(ckpt_root, "init", "last.pkl")
    assert os.path.exists(init_ckpt)

    # ---- stage 4: emitter radiance update into emitter.npz
    extract_emitter.main([
        "--dataset", "synthetic", "--scene", demo_root, "--output", out,
        "--mode", "update", "--ckpt", init_ckpt,
    ])
    ez2 = np.load(os.path.join(out, "emitter.npz"))
    assert np.abs(ez2["emitter_radiance"]).sum() > 0

    # ---- stage 5: bake_shading
    from iris_tpu.pipeline import bake_shading
    bake_shading.main([
        "--dataset", "synthetic", "--scene", demo_root,
        "--slf_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", os.path.join(out, "emitter.npz"),
        "--output", os.path.join(out, "cache"),
        "--ldr_img_dir", "ldr", "--spp_diffuse", "8",
    ])
    assert os.path.exists(os.path.join(out, "cache", "diffuse", "000.exr"))
    assert os.path.exists(os.path.join(out, "cache", "specular",
                                       "000_1_5.exr"))

    # ---- stage 6: train_brdf_crf
    from iris_tpu.pipeline import train_brdf_crf
    train_brdf_crf.main(common + [
        "--experiment_name", "brdf", "--max_steps", "10",
        "--cache_dir", os.path.join(out, "cache"),
        "--ckpt_path", init_ckpt,
    ])
    brdf_ckpt = os.path.join(ckpt_root, "brdf", "last.pkl")
    assert os.path.exists(brdf_ckpt)

    # ---- stage 7: slf_refine
    from iris_tpu.pipeline import slf_refine
    slf_refine.main([
        "--dataset", "synthetic", "--scene", demo_root, "--output", out,
        "--ldr_img_dir", "ldr", "--ckpt", brdf_ckpt, "--crf_basis", "3",
        "--save", "vslf_0.npz",
    ])
    assert os.path.exists(os.path.join(out, "vslf_0.npz"))

    # ---- stage 8: train_emitter
    from iris_tpu.pipeline import train_emitter
    train_emitter.main(common + [
        "--experiment_name", "emitter", "--max_steps", "5",
        "--ckpt_path", brdf_ckpt,
        "--radiance_log_space", "1",   # exercise the log-space leaf wiring
    ])
    em_pkl = os.path.join(ckpt_root, "emitter", "emitter_last.pkl")
    assert os.path.exists(em_pkl)
    # the stage artifact must store PLAIN radiance (wire format), not the
    # trained log-space leaf
    from iris_tpu.train.checkpoint import load_pytree
    rad = np.asarray(load_pytree(em_pkl)["radiance"])
    assert np.all(np.isfinite(rad)) and rad.min() >= 0.0

    # ---- stage 9: refine_shading (tiny budgets)
    from iris_tpu.pipeline import refine_shading
    refine_shading.main([
        "--dataset", "synthetic", "--scene", demo_root,
        "--slf_path", os.path.join(out, "vslf_0.npz"),
        "--emitter_path", os.path.join(out, "emitter.npz"),
        "--ckpt", brdf_ckpt,
        "--output", os.path.join(out, "cache2"),
        "--ldr_img_dir", "ldr",
        "--spp_diffuse", "4", "--spp_specular", "4", "--indir_depth", "1",
    ])
    assert os.path.exists(os.path.join(out, "cache2", "diffuse", "000.exr"))

    # ---- stage 9 with the stochastic-corner encode: same bake within MC
    # noise of the exact 8-corner one (both arms spp 32 so estimator
    # variance, not sampling noise, dominates any systematic gap)
    from iris_tpu.utils.exr import read_exr
    for enc, outdir in [("exact", "cache2x"), ("stoch", "cache2s")]:
        refine_shading.main([
            "--dataset", "synthetic", "--scene", demo_root,
            "--slf_path", os.path.join(out, "vslf_0.npz"),
            "--emitter_path", os.path.join(out, "emitter.npz"),
            "--ckpt", brdf_ckpt,
            "--output", os.path.join(out, outdir),
            "--ldr_img_dir", "ldr",
            "--spp_diffuse", "32", "--spp_specular", "4",
            "--indir_depth", "2", "--encode", enc, "--max_frames", "1",
        ])
    d_exact = read_exr(os.path.join(out, "cache2x", "diffuse", "000.exr"))
    d_stoch = read_exr(os.path.join(out, "cache2s", "diffuse", "000.exr"))
    assert np.all(np.isfinite(d_stoch)) and d_stoch.min() >= 0.0
    scale = max(float(d_exact.mean()), 1e-6)
    assert abs(float(d_stoch.mean()) - float(d_exact.mean())) / scale < 0.15

    # ---- render + metrics
    from iris_tpu.pipeline import render
    render.main([
        "--dataset", "synthetic", demo_root, "--ldr_img_dir", "ldr",
        "--experiment_name", "brdf", "--checkpoint_path", ckpt_root,
        "--emitter_path", out, "--output_path", os.path.join(out, "render"),
        "--split", "val", "--SPP", "4", "--spp", "4", "--indir_depth", "2",
        "--hash_levels", "4", "--log2_hashmap_size", "10",
    ])
    metrics = os.path.join(out, "render", "val", "rgb", "metrics.txt")
    assert os.path.exists(metrics)
    lines = open(metrics).read().strip().splitlines()
    mean_psnr = float(lines[-1].split(",")[1])
    assert np.isfinite(mean_psnr) and mean_psnr > 5.0, lines[-1]
