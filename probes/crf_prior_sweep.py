"""CRF-prior weight sweep under radiance-scale ambiguity (CPU, miniature).

Round-2i observed the classic scale ambiguity of joint radiance+CRF
optimization: at production budgets the learned emitter radiance overshoots
~1.5x and the CRF bends to absorb it (CRF L2 3.85 while render PSNR is
fine). The reference has the same degree of freedom and pins it only with
reg_crf=0.001 on the EMoR weights (configs/config.py:125-136,
train_brdf_crf.py:318-330). This probe isolates exactly that ambiguity on
the committed miniature fixture's REAL pixel pairs:

  GT:    ldr = crf0(hdr)            (generator: mean-EMoR curve, exposure 1)
  model: ldr = crf_w(s * hdr)       s learnable, init 1.5 (the observed
                                    overshoot); crf weights learnable,
                                    init mean curve (= GT)

A perfect fit is reachable two ways: s -> 1 with crf_w -> crf0 (correct
decomposition), or s stuck high with crf_w(y) = crf0(y/s) (bent CRF). The
sweep over l_crf_weight measures which path Adam takes, using the SAME
regularizer stack as train/steps.py:322-323 (l_crf_increasing=0.1 mono +
w * reg_weight).

Run: IRIS_TPU_FORCE_CPU=1 python probes/crf_prior_sweep.py
"""

from __future__ import annotations

import os

os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..", "workdir_scene_m")


def load_pairs(n_frames=3, n_pix=32768, seed=0):
    from iris_tpu.utils.exr import read_exr
    from iris_tpu.utils.image import open_png

    rng = np.random.default_rng(seed)
    hdrs, ldrs = [], []
    for i in range(n_frames):
        hdr = read_exr(os.path.join(ROOT, "train", "Image",
                                    f"{i:03d}_0001.exr"))[..., :3]
        ldr = open_png(os.path.join(ROOT, "train", "ldr",
                                    f"{i:03d}_0001.png"))
        hdrs.append(hdr.reshape(-1, 3))
        ldrs.append(ldr.reshape(-1, 3))
    hdr = np.concatenate(hdrs, 0)
    ldr = np.concatenate(ldrs, 0)
    sel = rng.choice(len(hdr), size=min(n_pix, len(hdr)), replace=False)
    return hdr[sel].astype(np.float32), ldr[sel].astype(np.float32)


def run_arm(hdr, ldr, w_reg, steps=800, lr=1e-2, s_init=1.5):
    import jax
    import jax.numpy as jnp
    import optax

    from iris_tpu.models.crf import (
        crf_forward, get_crf, init_emor_crf, reg_monotonically_increasing,
        reg_weight)
    from iris_tpu.utils.metric_crf import crf_l2

    crf0 = init_emor_crf(dim=3)
    gt_curves = np.asarray(get_crf(crf0))
    params = {"log_s": jnp.log(jnp.float32(s_init)),
              "weight": jnp.zeros((3, 3), jnp.float32)}
    hdr_j, ldr_j = jnp.asarray(hdr), jnp.asarray(ldr)

    def loss_fn(p):
        import dataclasses
        crf = dataclasses.replace(crf0, weight=p["weight"])
        pred = crf_forward(crf, hdr_j * jnp.exp(p["log_s"]), 1.0)
        data = jnp.mean((pred - ldr_j) ** 2)
        reg = 0.1 * reg_monotonically_increasing(crf) \
            + w_reg * reg_weight(crf)
        return data + reg, data

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, st):
        (_, data), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, st = opt.update(g, st)
        return optax.apply_updates(p, upd), st, data

    for _ in range(steps):
        params, state, data = step(params, state)

    import dataclasses
    crf = dataclasses.replace(crf0, weight=params["weight"])
    pred_curves = np.asarray(get_crf(crf))
    return dict(
        w=w_reg,
        s=float(np.exp(params["log_s"])),
        crf_l2=float(crf_l2(gt_curves, pred_curves)),
        fit_mse=float(data),
    )


def main():
    hdr, ldr = load_pairs()
    # sanity: GT decomposition reproduces the pixels
    from iris_tpu.models.crf import crf_forward, init_emor_crf
    import jax.numpy as jnp
    crf0 = init_emor_crf(dim=3)
    base = float(np.mean((np.asarray(crf_forward(
        crf0, jnp.asarray(hdr), 1.0)) - ldr) ** 2))
    print(f"pixels={len(hdr)}  GT-decomposition MSE={base:.2e} "
          "(quantization floor)")
    print(f"{'l_crf_weight':>12} {'final s':>8} {'crf L2':>10} "
          f"{'fit MSE':>10}")
    for w in [0.0, 1e-4, 1e-3, 1e-2, 1e-1]:
        r = run_arm(hdr, ldr, w)
        print(f"{r['w']:>12g} {r['s']:>8.4f} {r['crf_l2']:>10.4f} "
              f"{r['fit_mse']:>10.2e}")
    os._exit(0)


if __name__ == "__main__":
    main()
