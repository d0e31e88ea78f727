"""Stage 8: emitter radiance refinement (parity: reference train_emitter.py).

Material + CRF frozen (loaded from the train_brdf_crf checkpoint); only the
emitter radiance receives gradients from MSE(CRF(path_tracing_single), LDR).
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp

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
    LossConfig, make_train_emitter_loss, param_to_radiance,
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
    assert args.ckpt_path, "train_emitter needs --ckpt_path (material+CRF)"
    prev = load_pytree(args.ckpt_path)
    material = adopt_estimator_cfg(prev["material"], args)
    if "crf_weight" in prev:
        crf = dc_replace(crf, weight=jnp.asarray(prev["crf_weight"]))

    log_rad = bool(getattr(args, "radiance_log_space", 0))
    params = {"radiance": em.radiance}
    out = ckpt_path(args.checkpoint_path, args.experiment_name,
                    "emitter_last.pkl")
    state_out = ckpt_path(args.checkpoint_path, args.experiment_name,
                          "emitter_last_state.pkl")
    opt_state, start_step = None, 0
    if args.resume:
        params, opt_state, start_step = load_train_state(state_out, out,
                                                         params)
    if log_rad and start_step == 0 and opt_state is None:
        # fresh start or params-only fallback: both hold PLAIN radiance;
        # a full-state resume already holds the trained log-space leaf
        params = {**params,
                  "radiance": radiance_to_param(params["radiance"])}

    dataset = make_dataset(args, "train")
    bank = dataset.pixel_bank(keys=("rays", "rgbs"))
    batcher = RayBatcher(bank, mesh_batch_size(
        args.batch_size, data_mesh(args.n_devices),
        __name__.split('.')[-1]))
    if getattr(args, "max_epochs", 0):
        args.max_steps = args.max_epochs * batcher.batches_per_epoch
        print(f"[{__name__.split('.')[-1]}] max_epochs="
              f"{args.max_epochs} -> max_steps={args.max_steps}")

    cfg = LossConfig(spp=args.spp,
                     n_spp_rounds=max(args.SPP // args.spp, 1),
                     radiance_log_space=log_rad)
    loss_fn = make_train_emitter_loss(tracer, em, material, crf, cfg)
    optimizer = make_optimizer(args.learning_rate, args.weight_decay,
                               tuple(args.milestones), args.scheduler_rate,
                               args.optimizer)
    if getattr(args, "radiance_lr_scale", 1.0) != 1.0:
        from iris_tpu.train.optim import scale_updates_for_key
        optimizer = scale_updates_for_key(optimizer, "radiance",
                                          args.radiance_lr_scale)
    from iris_tpu.train.validation import ScalarLogger, make_validation_hook
    hooks = [ScalarLogger(os.path.join("outputs", args.experiment_name,
                                       "train_log.jsonl"))]
    # validation-frame dumps during emitter training (reference
    # train_emitter.py renders val frames; observability parity)
    try:
        val_ds = make_dataset(args, "val")
        vb = val_ds.frame(min(args.val_frame, len(val_ds) - 1))
        hooks.append(make_validation_hook(
            tracer, em, crf, vb, val_ds.img_hw,
            os.path.join("outputs", args.experiment_name, args.dir_val),
            val_step=args.val_step, spp=args.spp,
            indir_depth=args.indir_depth, crf_gt=val_ds.crfs,
            frozen={"material": material, "crf_weight": crf.weight},
            param_tx=(lambda p: {**p, "radiance": param_to_radiance(
                jnp.asarray(p["radiance"]))}) if log_rad else None))
    except Exception as e:  # val split optional
        print("[train_emitter] no validation split:", e)
    t0 = time.time()
    params, opt_state = run_training(
        loss_fn, params, batcher.iter_from(start_step), optimizer,
        args.max_steps, jax.random.PRNGKey(0),
        mesh=data_mesh(args.n_devices), hooks=hooks,
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
            param_to_radiance(jnp.asarray(final["radiance"])))}
    save_pytree(out, final)
    print(f"[train - emitter] time (s): {time.time() - t0:.1f}")
    print("[train_emitter] saved", out)


if __name__ == "__main__":
    main()
