"""BRDF-recovery quality gate (TODO.md 'Quality'): train the demo pipeline
long enough that the recovered albedo beats the untrained field by a clear
margin against the generator's closed-form GT BRDF."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tpu.data.make_demo_dataset import gt_mat_fn, make_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("q_scene"))
    make_dataset(root, img_hw=(24, 32), n_train=4, n_val=1, spp=16,
                 indir_depth=2)
    out = str(tmp_path_factory.mktemp("q_out"))
    ck = os.path.join(out, "ckpt")

    from iris_tpu.pipeline import (
        bake_shading, extract_emitter, initialize, slf_bake, train_brdf_crf,
    )
    common = ["--dataset", "synthetic", "--scene", root, "--output", out,
              "--ldr_img_dir", "ldr"]
    slf_bake.main(common + ["--voxel_num", "24"])
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
        "--max_steps", "150"])
    bake_shading.main(common + [
        "--slf_path", os.path.join(out, "vslf.npz"),
        "--emitter_path", os.path.join(out, "emitter.npz"),
        "--output", os.path.join(out, "shading"),
        "--spp_diffuse", "16"])
    train_brdf_crf.main(train_common + [
        "--experiment_name", "brdf", "--max_steps", "500",
        "--ckpt_path", os.path.join(ck, "init", "last.pkl"),
        "--cache_dir", os.path.join(out, "shading"),
        "--lp", "0.005", "--la", "0.01"])
    return root, out, ck


def test_albedo_recovery_beats_untrained(trained):
    root, out, ck = trained
    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.geometry.mesh import load_mesh
    from iris_tpu.models.brdf import init_ngp_brdf, ngp_brdf_apply
    from iris_tpu.models.hashgrid import HashGridConfig
    from iris_tpu.train.checkpoint import load_pytree

    mesh = load_mesh(os.path.join(root, "scene.obj"))
    tracer = build_bvh(mesh.triangles())
    # surface sample points: random rays from inside the box
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(0.3, 1.7, (4096, 3)) * [1, 1, 0.45]
                    + [0, 0, 0.1], jnp.float32)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, _, _, _, valid = ray_intersect(tracer, o, jnp.asarray(d,
                                                               jnp.float32))
    mask = np.asarray(valid)

    gt = gt_mat_fn(pos)
    trained_p = load_pytree(os.path.join(ck, "brdf", "last.pkl"))["material"]
    got = ngp_brdf_apply(trained_p, pos)

    fresh = init_ngp_brdf(jax.random.PRNGKey(9), trained_p.voxel_min,
                          trained_p.voxel_max, trained_p.cfg)
    base = ngp_brdf_apply(fresh, pos)

    def kd_psnr(mat):
        a = np.asarray(mat["albedo"])[mask]
        b = np.asarray(gt["albedo"])[mask]
        return float(-10 * np.log10(max(np.mean((a - b) ** 2), 1e-10)))

    p_trained, p_fresh = kd_psnr(got), kd_psnr(base)
    print("albedo PSNR: trained", p_trained, "untrained", p_fresh)
    assert p_trained > p_fresh + 3.0, (p_trained, p_fresh)
    assert p_trained > 12.0, p_trained
