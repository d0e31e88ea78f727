"""Stage 3: joint BRDF + emitter initialization by differentiable path
tracing (parity: reference initialize.py).

Optimizes {hash-grid material, emitter radiance} against LDR pixels through
the frozen CRF: rendered loss (material detached in the render) + segment-
mean albedo anchor. Writes init ckpt consumed by later stages.
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
    adopt_estimator_cfg, build_material, ckpt_path, load_emitter,
    load_scene, load_vslf, make_dataset, mesh_batch_size,
)
from iris_tpu.pipeline.config import add_model_specific_args
from iris_tpu.train.checkpoint import (
    load_pytree, load_train_state, make_state_saver, save_pytree,
)
from iris_tpu.train.loop import run_training
from iris_tpu.train.optim import make_optimizer
from iris_tpu.train.steps import (
    LossConfig, check_max_segments, make_initialize_loss, param_to_radiance,
    radiance_to_param,
)


def main(argv=None):
    from iris_tpu.parallel.distributed import ensure_multihost
    ensure_multihost()
    parser = add_model_specific_args(ArgumentParser())
    parser.add_argument("--experiment_name", type=str, required=True)
    parser.add_argument("--max_steps", type=int, default=2000)
    parser.add_argument("--checkpoint_path", type=str,
                        default="./checkpoints")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--val_frame", type=int, default=0)
    args = parser.parse_args(argv)

    ds_name, ds_root = args.dataset
    scene_id = args.scene if ds_name == "scannetpp" else ""
    mesh, tracer = load_scene(ds_name, ds_root, scene_id)

    slf, _ = load_vslf(args.voxel_path)
    em = load_emitter(args.emitter_path, mesh, slf=slf)
    crf = init_emor_crf(dim=args.crf_basis)

    material = build_material(args, float(slf.voxel_min),
                              float(slf.voxel_max))
    params = {"material": material, "radiance": em.radiance}
    out = ckpt_path(args.checkpoint_path, args.experiment_name)
    state_out = ckpt_path(args.checkpoint_path, args.experiment_name,
                          "last_state.pkl")
    opt_state, start_step = None, 0
    if args.resume:
        params, opt_state, start_step = load_train_state(state_out, out,
                                                         params)
        params = adopt_estimator_cfg(params, args)
        opt_state = adopt_estimator_cfg(opt_state, args)
    log_rad = bool(getattr(args, "radiance_log_space", 0))
    if log_rad and start_step == 0 and opt_state is None:
        # fresh start or params-only fallback hold PLAIN radiance; a
        # full-state resume already holds the trained log-space leaf
        params = {**params,
                  "radiance": radiance_to_param(params["radiance"])}

    dataset = make_dataset(args, "train", load_inverse=True,
                           has_part=bool(args.has_part))
    bank = dataset.pixel_bank(keys=("rays", "rgbs", "segmentation",
                                    "int_albedo"))
    batcher = RayBatcher(bank, mesh_batch_size(
        args.batch_size, data_mesh(args.n_devices),
        __name__.split('.')[-1]))
    if getattr(args, "max_epochs", 0):
        args.max_steps = args.max_epochs * batcher.batches_per_epoch
        print(f"[{__name__.split('.')[-1]}] max_epochs="
              f"{args.max_epochs} -> max_steps={args.max_steps}")
    check_max_segments(bank["segmentation"], args.max_segments)

    cfg = LossConfig(
        spp=args.spp, n_spp_rounds=max(args.SPP // args.spp, 1),
        ld=args.ld, lp=args.lp, ls=args.ls, la=args.la,
        max_segments=args.max_segments, has_part=bool(args.has_part),
        n_pairs=args.n_pairs,
        radiance_log_space=log_rad,
    )
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    optimizer = make_optimizer(args.learning_rate, args.weight_decay,
                               tuple(args.milestones), args.scheduler_rate,
                               args.optimizer)
    if getattr(args, "radiance_lr_scale", 1.0) != 1.0:
        from iris_tpu.train.optim import scale_updates_for_key
        optimizer = scale_updates_for_key(optimizer, "radiance",
                                          args.radiance_lr_scale)
    mesh_dev = data_mesh(args.n_devices)

    from iris_tpu.train.validation import (
        ScalarLogger, make_material_diag_hook, make_validation_hook,
    )
    log_path = os.path.join("outputs", args.experiment_name,
                            "train_log.jsonl")
    hooks = [ScalarLogger(log_path)]
    try:
        val_ds = make_dataset(args, "val")
        vb = val_ds.frame(min(args.val_frame, len(val_ds) - 1))
        hooks.append(make_validation_hook(
            tracer, em, crf, vb, val_ds.img_hw,
            os.path.join("outputs", args.experiment_name, args.dir_val),
            val_step=args.val_step, spp=args.spp,
            indir_depth=args.indir_depth, crf_gt=val_ds.crfs,
            param_tx=(lambda p: {**p, "radiance": param_to_radiance(
                p["radiance"])}) if log_rad else None))
        hooks.append(make_material_diag_hook(tracer, vb, log_path,
                                             val_step=args.val_step))
    except Exception as e:  # val split optional
        print("[initialize] no validation split:", e)

    t0 = time.time()
    params, opt_state = run_training(
        loss_fn, params, batcher.iter_from(start_step), optimizer,
        args.max_steps, jax.random.PRNGKey(0), mesh=mesh_dev, hooks=hooks,
        opt_state=opt_state, start_step=start_step,
        state_hooks=[make_state_saver(state_out, args.save_every)],
        return_state=True,
        chunk_steps=int(getattr(args, "chunk_steps", 1)))
    # state file keeps the TRAINED leaf (log-space when enabled) so
    # --resume is exact; the stage artifact always stores plain radiance
    # for downstream wire-format compatibility.
    save_pytree(state_out, {"params": jax.device_get(params),
                            "opt_state": jax.device_get(opt_state),
                            "step": args.max_steps})
    final = jax.device_get(params)
    if log_rad:
        final = {**final, "radiance": jax.device_get(
            param_to_radiance(final["radiance"]))}
    save_pytree(out, final)
    print(f"[train - BRDF-emission] time (s): {time.time() - t0:.1f}")
    print("[initialize] saved", out)


if __name__ == "__main__":
    main()
