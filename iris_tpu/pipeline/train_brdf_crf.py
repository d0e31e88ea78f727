"""Stages 6/9: BRDF + CRF optimization against cached shadings.

Parity: reference train_brdf_crf.py — the main trainer. Re-renders each
pixel from the baked diffuse/specular caches (L = kd*Ld + ks*lerp(spec0,r)
+ lerp(spec1,r)), tone-maps through the learnable CRF, and applies the
diffuse / segmentation-propagation / albedo / CRF regularizers.
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser

import jax
import numpy as np

from iris_tpu.data.datasets import RayBatcher
from iris_tpu.models.crf import init_emor_crf
from iris_tpu.parallel.sharding import data_mesh
from iris_tpu.pipeline.common import (
    adopt_estimator_cfg, build_material, ckpt_path, load_scene, load_vslf,
    make_dataset, mesh_batch_size,
)
from iris_tpu.pipeline.config import add_model_specific_args
from iris_tpu.train.checkpoint import (
    load_pytree, load_train_state, make_state_saver, save_pytree,
)
from iris_tpu.train.loop import run_training
from iris_tpu.train.optim import make_optimizer
from iris_tpu.train.steps import LossConfig, make_brdf_crf_loss, check_max_segments


def main(argv=None):
    from iris_tpu.parallel.distributed import ensure_multihost
    ensure_multihost()
    parser = add_model_specific_args(ArgumentParser())
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--max_steps", type=int, default=4000)
    parser.add_argument("--checkpoint_path", type=str,
                        default="./checkpoints")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--cache_dir", type=str, required=True)
    parser.add_argument("--val_frame", type=int, default=0)
    args = parser.parse_args(argv)

    ds_name, ds_root = args.dataset
    scene_id = args.scene if ds_name == "scannetpp" else ""
    mesh, tracer = load_scene(ds_name, ds_root, scene_id)
    slf, _ = load_vslf(args.voxel_path)
    crf = init_emor_crf(dim=args.crf_basis)

    material = build_material(args, float(slf.voxel_min),
                              float(slf.voxel_max))
    crf_weight = crf.weight
    if args.ckpt_path:
        prev = load_pytree(args.ckpt_path)
        if "material" in prev:
            material = adopt_estimator_cfg(prev["material"], args)
        if args.load_crf and "crf_weight" in prev:
            crf_weight = prev["crf_weight"]
        print("[train_brdf_crf] warm start from", args.ckpt_path)
    params = {"material": material, "crf_weight": crf_weight}

    out = ckpt_path(args.checkpoint_path, args.experiment_name)
    state_out = ckpt_path(args.checkpoint_path, args.experiment_name,
                          "last_state.pkl")
    opt_state, start_step = None, 0
    if args.resume:
        params, opt_state, start_step = load_train_state(state_out, out,
                                                         params)
        params = adopt_estimator_cfg(params, args)
        opt_state = adopt_estimator_cfg(opt_state, args)

    dataset = make_dataset(args, "train", load_inverse=True,
                           has_part=bool(args.has_part),
                           cache_dir=args.cache_dir)
    bank = dataset.pixel_bank(keys=("rays", "rgbs", "segmentation",
                                    "int_albedo", "diffuse", "specular0",
                                    "specular1"))
    batcher = RayBatcher(bank, mesh_batch_size(
        args.batch_size, data_mesh(args.n_devices),
        __name__.split('.')[-1]))
    if getattr(args, "max_epochs", 0):
        args.max_steps = args.max_epochs * batcher.batches_per_epoch
        print(f"[{__name__.split('.')[-1]}] max_epochs="
              f"{args.max_epochs} -> max_steps={args.max_steps}")
    check_max_segments(bank["segmentation"], args.max_segments)

    cfg = LossConfig(
        ld=args.ld, lp=args.lp, ls=args.ls, la=args.la,
        sigma_albedo=args.sigma_albedo, sigma_pos=args.sigma_pos,
        l_crf_increasing=args.l_crf_increasing,
        l_crf_weight=args.l_crf_weight,
        max_segments=args.max_segments, has_part=bool(args.has_part),
        n_pairs=args.n_pairs,
    )
    loss_fn = make_brdf_crf_loss(tracer, crf, cfg, float(slf.voxel_min),
                                 float(slf.voxel_max))
    optimizer = make_optimizer(args.learning_rate, args.weight_decay,
                               tuple(args.milestones), args.scheduler_rate,
                               args.optimizer)
    from iris_tpu.train.validation import (
        ScalarLogger, make_material_diag_hook, make_validation_hook,
    )
    log_path = os.path.join("outputs", args.experiment_name,
                            "train_log.jsonl")
    hooks = [ScalarLogger(log_path)]
    try:
        from iris_tpu.pipeline.common import load_emitter
        val_ds = make_dataset(args, "val")
        vb = val_ds.frame(min(args.val_frame, len(val_ds) - 1))
        em = load_emitter(args.emitter_path, mesh, slf=slf)
        hooks.append(make_validation_hook(
            tracer, em, crf, vb, val_ds.img_hw,
            os.path.join("outputs", args.experiment_name, args.dir_val),
            val_step=args.val_step, spp=args.spp,
            indir_depth=args.indir_depth, crf_gt=val_ds.crfs))
        hooks.append(make_material_diag_hook(tracer, vb, log_path,
                                             val_step=args.val_step))
    except Exception as e:
        print("[train_brdf_crf] no validation split:", e)

    t0 = time.time()
    params, opt_state = run_training(
        loss_fn, params, batcher.iter_from(start_step), optimizer,
        args.max_steps, jax.random.PRNGKey(0),
        mesh=data_mesh(args.n_devices), hooks=hooks,
        opt_state=opt_state, start_step=start_step,
        state_hooks=[make_state_saver(state_out, args.save_every)],
        return_state=True,
        chunk_steps=int(getattr(args, "chunk_steps", 1)))
    save_pytree(out, jax.device_get(params))
    save_pytree(state_out, {"params": jax.device_get(params),
                            "opt_state": jax.device_get(opt_state),
                            "step": args.max_steps})
    print(f"[train - BRDF-emission] time (s): {time.time() - t0:.1f}")
    print("[train_brdf_crf] saved", out)


if __name__ == "__main__":
    main()
