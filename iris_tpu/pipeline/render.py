"""Render stills + intrinsics AOVs + PSNR/SSIM metrics.

Parity: reference render.py — per test frame: SPP-chunked path_tracing,
AOV pass (kd, a' = g0*ks+g1+kd reflectance, roughness, metallic, emission,
slf), denoise, CRF to LDR, PSNR/SSIM vs GT, metrics.txt.
"""

from __future__ import annotations

import functools
import os
from argparse import ArgumentParser
from dataclasses import replace as dc_replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.core.vecmath import normalize
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models import brdf as B
from iris_tpu.models.brdf import ngp_brdf_apply
from iris_tpu.models.crf import crf_forward, init_emor_crf
from iris_tpu.models.emitter import eval_emitter, slf_forward
from iris_tpu.pipeline.common import load_emitter, load_scene, load_vslf
from iris_tpu.pipeline.config import add_model_specific_args
from iris_tpu.render.denoise import denoise_hdr
from iris_tpu.render.integrator import path_tracing
from iris_tpu.train.checkpoint import load_pytree
from iris_tpu.utils.exr import write_exr
from iris_tpu.utils.image import save_image
from iris_tpu.utils.metrics import psnr, ssim


def make_render_fns(tracer, em, mat_fn, spp, indir_depth):
    @jax.jit
    def render_chunk(rays, key):
        o, d = rays[..., :3], normalize(rays[..., 3:6])
        dxdu, dydv = rays[..., 6:9], rays[..., 9:12]
        return path_tracing(key, tracer, em, mat_fn, o, d, dxdu, dydv, spp,
                            indir_depth)

    @jax.jit
    def aov_chunk(rays, key):
        o, d = rays[..., :3], normalize(rays[..., 3:6])
        dxdu, dydv = rays[..., 6:9], rays[..., 9:12]
        b = o.shape[0]
        du, dv = jax.random.uniform(key, (2, b, spp, 1))
        ds = normalize(d[:, None] + dxdu[:, None] * du + dydv[:, None] * dv
                       ).reshape(-1, 3)
        xs = jnp.repeat(o, spp, 0)
        pos, nrm, _, tri, valid = ray_intersect(tracer, xs, ds)
        mat = mat_fn(pos)
        kd = mat["albedo"] * (1 - mat["metallic"])
        ks = 0.04 * (1 - mat["metallic"]) + mat["albedo"] * mat["metallic"]
        s2 = jax.random.uniform(jax.random.fold_in(key, 1),
                                (pos.shape[0], 2))
        _, _, g0, g1 = B.sample_specular(s2, -ds, nrm, mat["roughness"])
        a_prime = g0 * ks + g1 + kd
        emission = eval_emitter(em, pos, ds, tri)[0]
        slf_v = slf_forward(em, pos)
        non_emit = jnp.sum(emission, -1) == 0
        ok = valid & non_emit
        kd = jnp.where(ok[:, None], kd, 1.0)
        a_prime = jnp.where(ok[:, None], a_prime, 1.0)
        rough = jnp.where(ok[:, None], mat["roughness"], 1.0)
        metal = jnp.where(ok[:, None], mat["metallic"], 0.0)

        def avg(x):
            return x.reshape(b, spp, -1).mean(1)

        return (avg(kd), avg(a_prime), avg(rough), avg(metal),
                avg(emission), avg(slf_v))

    return render_chunk, aov_chunk


def render_frame(render_chunk, aov_chunk, rays, n_rounds, key):
    b = rays.shape[0]
    l_full = np.zeros((b, 3), np.float32)
    aovs = None
    for r in range(n_rounds):
        k = jax.random.fold_in(key, r)
        l_full += np.asarray(render_chunk(jnp.asarray(rays), k))
        a = aov_chunk(jnp.asarray(rays), jax.random.fold_in(k, 999))
        a = [np.asarray(x) for x in a]
        aovs = a if aovs is None else [p + q for p, q in zip(aovs, a)]
    l_full /= n_rounds
    aovs = [x / n_rounds for x in aovs]
    return l_full, aovs


def main(argv=None):
    parser = add_model_specific_args(ArgumentParser())
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--checkpoint_path", type=str,
                        default="./checkpoints")
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--split", type=str, default="val")
    parser.add_argument("--ckpt", type=str, default="last.pkl")
    parser.add_argument("--light_type", type=str, default="slf",
                        choices=["slf", "area"])
    parser.add_argument("--max_frames", type=int, default=0,
                        help="render only the first N frames (0 = all)")
    args = parser.parse_args(argv)

    ds_name, ds_root = args.dataset
    scene_id = args.scene if ds_name == "scannetpp" else ""
    mesh, tracer = load_scene(ds_name, ds_root, scene_id)

    emitter_dir = args.emitter_path
    slf_file = os.path.join(emitter_dir, "vslf_0.npz")
    if not os.path.exists(slf_file):
        slf_file = os.path.join(emitter_dir, "vslf.npz")
    slf, _ = load_vslf(slf_file)
    em = load_emitter(os.path.join(emitter_dir, "emitter.npz"), mesh,
                      slf=slf)

    ckpt = load_pytree(
        os.path.join(args.checkpoint_path, args.experiment_name, args.ckpt))
    material = ckpt["material"]
    crf = init_emor_crf(dim=args.crf_basis)
    if "crf_weight" in ckpt:
        crf = dc_replace(crf, weight=jnp.asarray(ckpt["crf_weight"]))
    if "radiance" in ckpt:
        em = dc_replace(em, radiance=jnp.asarray(ckpt["radiance"]))
    mat_fn = functools.partial(ngp_brdf_apply, material)

    from iris_tpu.pipeline.common import make_dataset
    dataset = make_dataset(args, args.split)
    h, w = dataset.img_hw

    dirs = {}
    for name in ["rgb", "diffuse", "a_prime", "roughness", "metallic",
                 "emission", "slf", "merge"]:
        d = Path(args.output_path) / args.split / name
        d.mkdir(exist_ok=True, parents=True)
        dirs[name] = d

    render_chunk, aov_chunk = make_render_fns(tracer, em, mat_fn, args.spp,
                                              args.indir_depth)
    n_rounds = max(args.SPP // args.spp, 1)

    n_frames = len(dataset)
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)
    psnrs, ssims = [], []
    for i in range(n_frames):
        fr = dataset.frame(i)
        l_full, aovs = render_frame(render_chunk, aov_chunk, fr["rays"],
                                    n_rounds, jax.random.PRNGKey(i))
        kd, a_prime, rough, metal, emission, slf_v = aovs

        img = denoise_hdr(l_full.reshape(h, w, 3),
                          albedo=np.asarray(kd).reshape(h, w, 3))
        write_exr(str(dirs["rgb"] / f"{i:05d}_rgb_full.exr"), img)
        exposure = fr.get("exposure") or 1.0
        ldr = np.asarray(crf_forward(crf, jnp.asarray(img.reshape(-1, 3)),
                                     exposure)).reshape(h, w, 3)
        save_image(ldr, str(dirs["rgb"] / f"{i:05d}_rgb_full.png"))

        gt = np.asarray(fr["rgbs"]).reshape(h, w, 3)
        psnrs.append(psnr(gt, ldr))
        ssims.append(ssim(gt, ldr))

        for name, arr in [("diffuse", kd), ("a_prime", a_prime)]:
            arr = arr.reshape(h, w, 3)
            write_exr(str(dirs[name] / f"{i:05d}_{name}.exr"), arr)
            save_image(arr, str(dirs[name] / f"{i:05d}_{name}.png"))
        for name, arr in [("roughness", rough), ("metallic", metal)]:
            arr = arr.reshape(h, w)
            write_exr(str(dirs[name] / f"{i:05d}_{name}.exr"), arr)
            save_image(arr, str(dirs[name] / f"{i:05d}_{name}_color.png"),
                       colormap=True)
        emission_img = emission.reshape(h, w, 3)
        write_exr(str(dirs["emission"] / f"{i:05d}_emission.exr"),
                  emission_img)
        save_image(emission_img, str(dirs["emission"] / f"{i:05d}.png"))
        write_exr(str(dirs["slf"] / f"{i:05d}_slf.exr"),
                  slf_v.reshape(h, w, 3))
        rough3 = np.repeat(rough.reshape(h, w, 1), 3, -1)
        metal3 = np.repeat(metal.reshape(h, w, 1), 3, -1)
        merge = np.concatenate(
            [gt, ldr, kd.reshape(h, w, 3), a_prime.reshape(h, w, 3),
             rough3, metal3, emission_img], axis=1)
        save_image(merge, str(dirs["merge"] / f"{i:05d}_merge.png"))
        print(f"frame {i}: psnr={psnrs[-1]:.3f} ssim={ssims[-1]:.4f}")

    print(f"Mean PSNR: {np.mean(psnrs):.5f}")
    print(f"Mean SSIM: {np.mean(ssims):.5f}")
    with open(dirs["rgb"] / "metrics.txt", "w") as f:
        f.write("Name, PSNR, SSIM\n")
        for i, (p, s) in enumerate(zip(psnrs, ssims)):
            f.write(f"{i:05d}, {p:.5f}, {s:.5f}\n")
        f.write(f"mean , {np.mean(psnrs):.5f}, {np.mean(ssims):.5f}\n")


if __name__ == "__main__":
    main()
