"""Does the metallic blob make roughness identifiable? (CPU, miniature A/B)

PERF round-2i: on the all-dielectric demo scene (ks=0.04) roughness
saturates during training — no specular signal. The generator now has an
opt-in metallic low-roughness blob (--metallic_amp) meant to give the
scale record a scoreable specular region. This probe is the receipt:
same harness as ab_rowmode.py, one arm per metallic_amp in {0, 0.8},
reporting the correlation of recovered roughness/metallic/albedo against
the closed-form GT over random surface points (all valid points, and
blob-gated points for the metallic arm).

Run: IRIS_TPU_FORCE_CPU=1 python probes/ab_metallic.py
"""

from __future__ import annotations

import os
import shutil

os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np  # noqa: E402


def mat_corrs(root, ck, exp, amp):
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
    o = jnp.asarray(rng.uniform(0.3, 1.7, (8192, 3)) * [1, 1, 0.45]
                    + [0, 0, 0.1], jnp.float32)
    d = rng.normal(size=(8192, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, _, _, _, valid = ray_intersect(tracer, o,
                                        jnp.asarray(d, jnp.float32))
    mask = np.asarray(valid)
    gt = gt_mat_fn(pos, metallic_amp=amp)
    p = load_pytree(os.path.join(ck, exp, "last.pkl"))["material"]
    tr = ngp_brdf_apply(p, pos)

    def corr(a, b, m):
        a, b = np.asarray(a)[m].ravel(), np.asarray(b)[m].ravel()
        if len(a) < 8 or a.std() < 1e-6 or b.std() < 1e-6:
            return float("nan")
        return float(np.corrcoef(a, b)[0, 1])

    out = {
        "albedo": [corr(tr["albedo"][:, c:c + 1], gt["albedo"][:, c:c + 1],
                        mask) for c in range(3)],
        "roughness": corr(tr["roughness"], gt["roughness"], mask),
        "metallic": corr(tr["metallic"], gt["metallic"], mask),
        "rough_pred_range": [float(np.asarray(tr["roughness"])[mask].min()),
                             float(np.asarray(tr["roughness"])[mask].max())],
    }
    if amp:
        # blob-gated pass: restrict to points where the injected metallic
        # gate is strong, so the roughness/metallic signal is not diluted
        # over the mostly-dielectric remainder (ADVICE round-2 #2)
        gate = np.asarray(gt["metallic"])[:, 0] > 0.5 * amp
        bmask = mask & gate
        out["blob_n"] = int(bmask.sum())
        out["blob_roughness"] = corr(tr["roughness"], gt["roughness"], bmask)
        out["blob_metallic"] = corr(tr["metallic"], gt["metallic"], bmask)
    return out


def main():
    from iris_tpu.data.make_demo_dataset import make_dataset
    from iris_tpu.pipeline import (
        bake_shading, extract_emitter, initialize, slf_bake, train_brdf_crf,
    )

    for amp in (0.0, 0.8):
        root = f"/tmp/ab_metal_scene_{amp}"
        out = f"/tmp/ab_metal_out_{amp}"
        for p in (root, out):
            shutil.rmtree(p, ignore_errors=True)
            os.makedirs(p)
        ck = os.path.join(out, "ckpt")
        make_dataset(root, img_hw=(24, 32), n_train=4, n_val=1, spp=32,
                     indir_depth=2, metallic_amp=amp)

        common = ["--dataset", "synthetic", "--scene", root, "--output",
                  out, "--ldr_img_dir", "ldr"]
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
            "--mode", "update",
            "--ckpt", os.path.join(ck, "init", "last.pkl")])
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
            "--experiment_name", "brdf0",
            "--max_steps", "400",
            "--ckpt_path", os.path.join(ck, "init", "last.pkl"),
            "--cache_dir", os.path.join(out, "shading"),
            "--lp", "0.005", "--la", "0.01"])
        r = mat_corrs(root, ck, "brdf0", amp)
        print(f"[ab_metal] amp={amp}: {r}", flush=True)

    print("[ab_metal] done", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
