"""Stage 9-prep: re-bake shading caches with the learned BRDF + full
indirect lighting (parity: reference refine_shading.py).

Unlike bake_shading (SLF-only, one bounce), this uses the det_diff/det_spec
integrators with the trained NGP material and indir_depth=5.
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

from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models.brdf import ngp_brdf_apply
from iris_tpu.pipeline.common import load_emitter, load_scene, load_vslf
from iris_tpu.render.denoise import denoise_hdr
from iris_tpu.render.integrator import (
    path_tracing_det_diff, path_tracing_det_spec,
)
from iris_tpu.train.checkpoint import load_pytree
from iris_tpu.utils.exr import write_exr

ROUGHNESS_LEVELS = np.linspace(0.02, 1.0, 6)


def _chunked_det(fn_jit, pos, wi, nrm, uv, tri, chunk, n_out=1, key=None):
    n = pos.shape[0]
    outs = [[] for _ in range(n_out)]
    for c in range(math.ceil(n / chunk)):
        b0, b1 = c * chunk, min((c + 1) * chunk, n)
        pad = chunk - (b1 - b0)
        sl = lambda x: np.pad(np.asarray(x[b0:b1]),
                              [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        res = fn_jit(jnp.asarray(sl(pos)), jnp.asarray(sl(wi)),
                     jnp.asarray(sl(nrm)), jnp.asarray(sl(uv)),
                     jnp.asarray(np.pad(np.asarray(tri[b0:b1]), (0, pad),
                                        constant_values=-1)),
                     jax.random.fold_in(key, c))
        if n_out == 1:
            res = (res,)
        for i in range(n_out):
            outs[i].append(np.asarray(res[i])[: b1 - b0])
    return [np.concatenate(o, 0) for o in outs]


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--slf_path", type=str, required=True)
    parser.add_argument("--emitter_path", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--ldr_img_dir", type=str, default=None)
    parser.add_argument("--res_scale", type=float, default=1.0)
    parser.add_argument("--spp_diffuse", type=int, default=128)
    parser.add_argument("--spp_specular", type=int, default=64)
    parser.add_argument("--indir_depth", type=int, default=5)
    parser.add_argument(
        "--encode", type=str, default="exact", choices=("exact", "stoch"),
        help="hash-grid encode at indirect vertices: exact 8-corner "
             "(reference semantics) or the 1-corner stochastic estimator "
             "(unbiased per query, ~6x cheaper encode; the bake is already "
             "an spp-average so the extra variance folds into MC noise)")
    parser.add_argument("--max_frames", type=int, default=0,
                        help="bake only the first N frames (0 = all); "
                             "probe/A-B harness knob")
    parser.add_argument("--seed", type=int, default=0,
                        help="extra fold into the per-frame sampling key "
                             "(A/B noise-floor probes)")
    args = parser.parse_args(argv)

    scene_id = args.scene if args.dataset == "scannetpp" else ""
    data_root = (args.dataset_root or args.scene) \
        if args.dataset == "scannetpp" else args.scene
    mesh, tracer = load_scene(args.dataset, data_root, scene_id)
    slf, _ = load_vslf(args.slf_path)
    em = load_emitter(args.emitter_path, mesh, slf=slf)
    material = load_pytree(args.ckpt)["material"]
    if args.encode == "stoch":
        from dataclasses import replace as _dcr
        material = _dcr(material, cfg=_dcr(
            material.cfg, stochastic_fwd=True, stochastic_bwd=True,
            fwd_level_sample=0, bwd_level_sample=0))

        def make_mat_fn(key):
            # one key per chunk launch: the per-query corner draws come
            # from uniform(key, (3, B*L)) inside hashgrid_encode, so the
            # estimator stays unbiased per call; cross-bounce reuse of the
            # key only correlates the draws, which folds into MC variance.
            return lambda pos: ngp_brdf_apply(material, pos, key)
    else:
        def make_mat_fn(key):
            del key
            return functools.partial(ngp_brdf_apply, material)

    from iris_tpu.data.datasets import load_dataset
    kw = dict(split="train", res_scale=args.res_scale)
    if args.dataset in ("synthetic", "real"):
        kw["img_dir"] = args.ldr_img_dir
    if args.dataset == "synthetic":
        kw["load_gt"] = False
    dataset = load_dataset(args.dataset, data_root, scene=scene_id, **kw)
    h, w = dataset.img_hw

    dif_dir = os.path.join(args.output, "diffuse")
    spec_dir = os.path.join(args.output, "specular")
    os.makedirs(dif_dir, exist_ok=True)
    os.makedirs(spec_dir, exist_ok=True)

    spp_d, spp_s, depth = args.spp_diffuse, args.spp_specular, args.indir_depth
    # reference chunk budget (refine_shading.py:103-107), capped to the
    # frame's pixel count rounded up to 256 — the fixed-size jit pad was
    # up to 3.3x wasted rays on small frames (PERF.md round-2g)
    n_px = h * w
    cap = -(-n_px // 256) * 256
    chunk_d = min(max(10240 * 128 // spp_d, 1), cap)
    chunk_s = min(max(10240 * 128 // spp_s, 1), cap)

    diff_jit = jax.jit(lambda p, wi, nr, uv, tri, k: path_tracing_det_diff(
        k, tracer, em, make_mat_fn(jax.random.fold_in(k, 94)), p, wi, nr,
        uv, tri, spp_d, depth))
    # roughness enters as a TRACED scalar so all 6 levels share one
    # compiled program (a closure-baked float cost 6 full jit compiles,
    # each minutes on the tunneled TPU)
    spec_jit = jax.jit(lambda p, wi_, nr, uv_, tri_, k, rv:
                       path_tracing_det_spec(
                           k, tracer, em,
                           make_mat_fn(jax.random.fold_in(k, 95)), rv, p,
                           wi_, nr, uv_, tri_, spp_s, depth))

    first_jit = jax.jit(lambda x, d: ray_intersect(tracer, x, d))

    t0 = time.time()
    for im_id, fr in enumerate(dataset.frames()):
        if args.max_frames and im_id >= args.max_frames:
            break
        rays = fr["rays"]
        pos, nrm, uv, tri, valid = first_jit(jnp.asarray(rays[..., :3]),
                                             jnp.asarray(rays[..., 3:6]))
        wi = rays[..., 3:6]
        key = jax.random.fold_in(jax.random.PRNGKey(im_id), args.seed)

        nrm_hw = np.asarray(nrm).reshape(h, w, 3)
        mask_hw = np.asarray(valid).reshape(h, w)
        (ld,) = _chunked_det(diff_jit, np.asarray(pos), wi, np.asarray(nrm),
                             np.asarray(uv), np.asarray(tri), chunk_d, 1, key)
        assert not np.isnan(ld).any()
        write_exr(os.path.join(dif_dir, f"{im_id:03d}.exr"),
                  denoise_hdr(ld.reshape(h, w, 3), normal=nrm_hw, mask=mask_hw))

        for r_idx, rough in enumerate(ROUGHNESS_LEVELS):
            def spec_fn(p, wi_, nr, uv_, tri_, k, rv=float(rough)):
                return spec_jit(p, wi_, nr, uv_, tri_, k, jnp.float32(rv))
            l0, l1 = _chunked_det(spec_fn, np.asarray(pos), wi,
                                  np.asarray(nrm), np.asarray(uv),
                                  np.asarray(tri), chunk_s, 2,
                                  jax.random.fold_in(key, 7 + r_idx))
            assert not np.isnan(l0).any() and not np.isnan(l1).any()
            write_exr(os.path.join(spec_dir, f"{im_id:03d}_0_{r_idx}.exr"),
                      denoise_hdr(l0.reshape(h, w, 3), normal=nrm_hw, mask=mask_hw))
            write_exr(os.path.join(spec_dir, f"{im_id:03d}_1_{r_idx}.exr"),
                      denoise_hdr(l1.reshape(h, w, 3), normal=nrm_hw, mask=mask_hw))
    print(f"[refine_shading] time (s): {time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
