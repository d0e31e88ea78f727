"""Quality A/B for the row-gather wide-feature hash grid (CPU, miniature).

Same harness as ab_fwd_level_sample.py: shared dataset + init + bakes,
then one brdf0 train per grid shape at EQUAL parameter count and EQUAL
MLP input width — the fixture's 8 levels x 2 features vs 4 x 4 and
2 x 8 row-gather grids (per_level_scale auto-matched to span the same
resolution range). Prints recovered-albedo correlations vs the
generator's closed-form GT. Decides whether the access-count win
measured by rowmode_probe.py ships quality-gated or as a default.

Run: IRIS_TPU_FORCE_CPU=1 python probes/ab_rowmode.py
"""

from __future__ import annotations

import os
import shutil

os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np  # noqa: E402


def albedo_corrs(root, ck, exp):
    import jax.numpy as jnp

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

    root = "/tmp/ab_row_scene"
    out = "/tmp/ab_row_out"
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
        "--log2_hashmap_size", "13",
        "--max_segments", "16", "--batch_size", "1024",
        "--has_part", "1",
    ]
    # shared init only feeds the emitter-update step; each arm gets its own
    # material init below (a warm start can't cross grid shapes)
    initialize.main(train_common + [
        "--hash_levels", "8",
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
    # equal params (L*F*2^13) and equal MLP input (L*F = 16) throughout;
    # every arm gets its OWN init (same budget) so the warm start is fair.
    for lv, ft in ((8, 2), (4, 4), (2, 8)):
        shape = ["--hash_levels", str(lv), "--hash_features", str(ft)]
        exp = f"q_row{lv}x{ft}"
        initialize.main(train_common + shape + [
            "--experiment_name", f"init_{exp}", "--SPP", "4", "--spp", "4",
            "--max_steps", "150", "--radiance_lr_scale", "30"])
        train_brdf_crf.main(train_common + shape + [
            "--experiment_name", exp,
            "--max_steps", "400",
            "--ckpt_path", os.path.join(ck, f"init_{exp}", "last.pkl"),
            "--cache_dir", os.path.join(out, "shading"),
            "--lp", "0.005", "--la", "0.01"])
        results[(lv, ft)] = albedo_corrs(root, ck, exp)
        print(f"[ab] {lv}x{ft}: albedo corr {results[(lv, ft)]}",
              flush=True)

    print("[ab] summary:", results, flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
