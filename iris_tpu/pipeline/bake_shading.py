"""Stage 5: bake diffuse + specular shading caches per view.

Parity: reference bake_shading.py — per view, from deterministic first hits:
  diffuse:  cosine-sample spp=256, one bounce into the SLF cache
            (trace_roughness=0.0 -> always use cache, :113-123)
  specular: 6 roughness levels linspace(0.02, 1.0), GGX sampling, the two
            Fresnel-split maps, spp=[64,128x5] (:143-188)
Each map is denoised (edge-aware a-trous replaces OptixDenoiser) and written
as {im}.exr / {im}_{0,1}_{r}.exr EXRs for the train_brdf_crf stage.

The reference's ray-chunk loop (batch_size = 10240*64//spp, :105) is kept as
a fixed-size chunking so each jit program has a static shape.
"""

from __future__ import annotations

import functools
import math
import os
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.const import RAY_EPS
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models import brdf as B
from iris_tpu.models.emitter import eval_emitter
from iris_tpu.pipeline.common import load_emitter, load_scene, load_vslf
from iris_tpu.render.denoise import denoise_hdr
from iris_tpu.utils.exr import write_exr

ROUGHNESS_LEVELS = np.linspace(0.02, 1.0, 6)
SPP_SPECULAR = [64, 128, 128, 128, 128, 128]


def _bake_maps_for_frame(tracer, em, rays, img_hw, spp_diffuse=256,
                         chunk_rays=10240 * 64, trace_roughness=0.0,
                         key=None, denoise=True, spp_scale=1):
    """Returns dict: diffuse (H,W,3), spec0/spec1 lists of (H,W,3)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    xs = jnp.asarray(rays[..., :3])
    ds = jnp.asarray(rays[..., 3:6])
    pos, nrm, _, _, valid = jax.jit(
        lambda x, d: ray_intersect(tracer, x, d))(xs, ds)
    pos, nrm, valid = np.asarray(pos), np.asarray(nrm), np.asarray(valid)
    ds_np = np.asarray(ds)
    n = pos.shape[0]

    @functools.partial(jax.jit, static_argnames=("spp",))
    def diffuse_chunk(p, nr, k, spp):
        b = p.shape[0]
        s2 = jax.random.uniform(k, (b * spp, 2))
        nr_r = jnp.repeat(nr, spp, 0)
        wi, _, _ = B.sample_diffuse(s2, nr_r)
        p_r = jnp.repeat(p, spp, 0)
        p_next, _, _, tri, _ = ray_intersect(tracer, p_r + RAY_EPS * wi, wi)
        rough1 = jnp.ones((b * spp, 1))
        le, _, _ = eval_emitter(em, p_next, wi, tri, rough1, trace_roughness)
        return le.reshape(b, spp, 3).mean(1)

    @functools.partial(jax.jit, static_argnames=("spp",))
    def specular_chunk(p, nr, wo, rough, k, spp):
        b = p.shape[0]
        s2 = jax.random.uniform(k, (b * spp, 2))
        nr_r = jnp.repeat(nr, spp, 0)
        wo_r = jnp.repeat(wo, spp, 0)
        wi, _, g0, g1 = B.sample_specular(s2, wo_r, nr_r, rough)
        p_r = jnp.repeat(p, spp, 0)
        p_next, _, _, tri, _ = ray_intersect(tracer, p_r + RAY_EPS * wi, wi)
        rough1 = jnp.ones((b * spp, 1))
        le, _, _ = eval_emitter(em, p_next, wi, tri, rough1, trace_roughness)
        l0 = (le * g0).reshape(b, spp, 3).mean(1)
        l1 = (le * g1).reshape(b, spp, 3).mean(1)
        return l0, l1

    def run_chunked(fn, spp, *extra):
        # cap the reference chunk budget at the frame's pixel count
        # (rounded to 256): the fixed-size jit pad wasted up to 3.3x rays
        # on small frames (PERF.md round-2g)
        batch = min(max(chunk_rays // spp, 1), -(-n // 256) * 256)
        out = []
        n_chunks = math.ceil(n / batch)
        for c in range(n_chunks):
            b0, b1 = c * batch, min((c + 1) * batch, n)
            # pad to the fixed chunk size so jit compiles once
            p = np.zeros((batch, 3), np.float32)
            nr = np.zeros((batch, 3), np.float32)
            nr[:, 2] = 1.0
            wo = np.zeros((batch, 3), np.float32)
            wo[:, 2] = 1.0
            p[: b1 - b0] = pos[b0:b1]
            nr[: b1 - b0] = nrm[b0:b1]
            wo[: b1 - b0] = -ds_np[b0:b1]
            k = jax.random.fold_in(key, c)
            res = fn(jnp.asarray(p), jnp.asarray(nr), jnp.asarray(wo),
                     *extra, k, spp)
            out.append(res)
        if isinstance(out[0], tuple):
            return [np.concatenate([np.asarray(o[i]) for o in out], 0)[:n]
                    for i in range(len(out[0]))]
        return np.concatenate([np.asarray(o) for o in out], 0)[:n]

    h, w = img_hw
    result = {}
    ld = run_chunked(lambda p, nr, wo, k, spp: diffuse_chunk(p, nr, k, spp),
                     spp_diffuse)
    ld = np.where(valid[:, None], ld, 0.0).reshape(h, w, 3)
    nrm_guide = np.where(valid[:, None], nrm, 0.0).reshape(h, w, 3)
    mask_hw = np.asarray(valid).reshape(h, w)
    result["diffuse"] = (denoise_hdr(ld, normal=nrm_guide, mask=mask_hw)
                         if denoise else ld)

    spec0, spec1 = [], []
    for r_idx, rough in enumerate(ROUGHNESS_LEVELS):
        spp = SPP_SPECULAR[r_idx] * spp_scale
        l0, l1 = run_chunked(
            lambda p, nr, wo, rv, k, spp: specular_chunk(p, nr, wo, rv, k,
                                                         spp),
            spp, jnp.float32(rough),
        )
        l0 = np.where(valid[:, None], l0, 0.0).reshape(h, w, 3)
        l1 = np.where(valid[:, None], l1, 0.0).reshape(h, w, 3)
        if denoise and r_idx > 0:  # low roughness: no denoise (ref :198)
            l0 = denoise_hdr(l0, normal=nrm_guide, mask=mask_hw)
            l1 = denoise_hdr(l1, normal=nrm_guide, mask=mask_hw)
        spec0.append(l0)
        spec1.append(l1)
    result["specular0"] = spec0
    result["specular1"] = spec1
    return result


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--slf_path", type=str, required=True)
    parser.add_argument("--emitter_path", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--res_scale", type=float, default=1.0)
    parser.add_argument("--spp_diffuse", type=int, default=256)
    parser.add_argument("--max_frames", type=int, default=0,
                        help="bake only the first N frames (0 = all); "
                        "subset dial like refine_shading's")
    parser.add_argument("--denoise", type=int, default=1,
                        help="0 disables the a-trous pass (A/B arm; the "
                        "reference's OptixDenoiser analogue is ON)")
    parser.add_argument("--spp_specular_scale", type=int, default=1,
                        help="multiply the specular spp ladder (oracle "
                        "bakes for denoiser A/Bs)")
    args = parser.parse_args(argv)

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)
    slf, _ = load_vslf(args.slf_path)
    em = load_emitter(args.emitter_path, mesh, slf=slf)

    from iris_tpu.data.datasets import load_dataset
    kw = dict(split="train", res_scale=args.res_scale)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    dataset = load_dataset(args.dataset, data_root, scene=scene_id, **kw)

    dif_dir = os.path.join(args.output, "diffuse")
    spec_dir = os.path.join(args.output, "specular")
    os.makedirs(dif_dir, exist_ok=True)
    os.makedirs(spec_dir, exist_ok=True)

    t0 = time.time()
    for im_id, fr in enumerate(dataset.frames()):
        if args.max_frames and im_id >= args.max_frames:
            break
        maps = _bake_maps_for_frame(
            tracer, em, fr["rays"], dataset.img_hw,
            spp_diffuse=args.spp_diffuse,
            key=jax.random.PRNGKey(im_id),
            denoise=bool(args.denoise),
            spp_scale=args.spp_specular_scale,
        )
        write_exr(os.path.join(dif_dir, f"{im_id:03d}.exr"), maps["diffuse"])
        for r_idx in range(len(ROUGHNESS_LEVELS)):
            write_exr(os.path.join(spec_dir, f"{im_id:03d}_0_{r_idx}.exr"),
                      maps["specular0"][r_idx])
            write_exr(os.path.join(spec_dir, f"{im_id:03d}_1_{r_idx}.exr"),
                      maps["specular1"][r_idx])
    print(f"[bake_shading] time (s): {time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
