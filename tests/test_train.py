import os
import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.demo import make_demo_batch, make_demo_scene
from iris_tpu.parallel.sharding import data_mesh, replicate, shard_batch
from iris_tpu.train.loop import make_train_step
from iris_tpu.train.optim import make_optimizer
from iris_tpu.train.steps import (
    LossConfig, make_brdf_crf_loss, make_initialize_loss,
    make_train_emitter_loss,
)


def _tiny():
    return make_demo_scene(n_clutter=2, slf_res=8, hash_levels=4,
                           log2_table=8)


def test_initialize_step_decreases_loss():
    tracer, em, ngp, crf, _ = _tiny()
    cfg = LossConfig(spp=2, max_segments=8)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    params = {"material": ngp, "radiance": em.radiance}
    opt = make_optimizer(learning_rate=5e-2)
    opt_state = opt.init(params)
    step = make_train_step(loss_fn, opt, donate=False)
    batch = make_demo_batch(n_side=8)
    losses = []
    for i in range(12):
        params, opt_state, loss, aux = step(params, opt_state, batch,
                                            jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < losses[0], losses


def test_train_emitter_loss_grads_only_radiance():
    tracer, em, ngp, crf, _ = _tiny()
    cfg = LossConfig(spp=2)
    loss_fn = make_train_emitter_loss(tracer, em, ngp, crf, cfg)
    batch = make_demo_batch(n_side=8)
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0))[0])(
        {"radiance": em.radiance}
    )
    assert np.all(np.isfinite(np.asarray(g["radiance"])))
    assert float(jnp.abs(g["radiance"]).sum()) > 0


def test_brdf_crf_loss_both_variants():
    tracer, em, ngp, crf, mesh = _tiny()
    b = 64
    rng = np.random.default_rng(0)
    batch = make_demo_batch(n_side=8)
    batch = {k: v[:b] for k, v in batch.items()}
    batch["diffuse"] = jnp.asarray(rng.uniform(0, 1, (b, 3)), jnp.float32)
    batch["specular0"] = jnp.asarray(rng.uniform(0, 1, (b, 6, 3)), jnp.float32)
    batch["specular1"] = jnp.asarray(rng.uniform(0, 1, (b, 6, 3)), jnp.float32)

    for has_part in (True, False):
        cfg = LossConfig(max_segments=8, has_part=has_part, la=0.1)
        loss_fn = make_brdf_crf_loss(tracer, crf, cfg, -0.1, 2.1)
        params = {"material": ngp, "crf_weight": crf.weight}
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(loss))
        assert float(jnp.abs(g["crf_weight"]).sum()) > 0
        assert float(jnp.abs(g["material"].table).sum()) > 0


def test_sharded_step_matches_single_device():
    """The 8-device SPMD step must produce the same loss as unsharded."""
    tracer, em, ngp, crf, _ = _tiny()
    cfg = LossConfig(spp=2, max_segments=8)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    params = {"material": ngp, "radiance": em.radiance}
    opt = make_optimizer()
    opt_state = opt.init(params)
    batch = make_demo_batch(n_side=8)
    key = jax.random.PRNGKey(0)

    step1 = make_train_step(loss_fn, opt, donate=False)
    _, _, loss1, _ = step1(params, opt_state, batch, key)

    mesh = data_mesh(8, devices=jax.devices("cpu"))
    p8 = replicate(mesh, params)
    o8 = replicate(mesh, opt_state)
    b8 = {k: shard_batch(mesh, v) for k, v in batch.items()}
    step8 = make_train_step(loss_fn, opt, mesh, donate=False)
    _, _, loss8, _ = step8(p8, o8, b8, key)
    assert np.isclose(float(loss1), float(loss8), rtol=1e-4), (
        float(loss1), float(loss8))


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 3
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _propagation_oracle(seg, valid, pos_n, alb, rough, metal, cfg):
    """Direct port of the reference within-segment propagation loss
    (train_brdf_crf.py:240-290) with ALL pairs (exact, small segments):
    the fixed-shape JAX estimator must converge to this."""
    idx = np.where(valid)[0]
    total = 0.0
    n_seg = 0
    for s in np.unique(seg[idx]):
        i = idx[seg[idx] == s]
        da = alb[i][:, None] - alb[i][None]              # (c, c, 3)
        dp = pos_n[i][:, None] - pos_n[i][None]
        w = np.exp(-(da ** 2).sum(-1) / cfg.sigma_albedo ** 2 / 2.0) \
            * np.exp(-(dp ** 2).sum(-1) / cfg.sigma_pos ** 2 / 2.0)
        denom = w.sum(-1) + 1e-4
        mean_r = (w * rough[i][None]).sum(-1) / denom
        mean_m = (w * metal[i][None]).sum(-1) / denom
        per_pix = np.abs(mean_r - rough[i]) + np.abs(mean_m - metal[i])
        total += per_pix.mean()
        n_seg += 1
    return total


def test_propagation_loss_matches_reference_oracle():
    from iris_tpu.train.steps import propagation_loss

    rng = np.random.default_rng(0)
    b = 512
    seg = rng.integers(0, 6, b)
    valid = rng.uniform(size=b) > 0.15
    pos = rng.uniform(-1, 1, (b, 3)).astype(np.float32)
    alb = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    rough = rng.uniform(0, 1, b).astype(np.float32)
    metal = rng.uniform(0, 1, b).astype(np.float32)
    cfg = LossConfig(max_segments=8, n_pairs=512, sigma_albedo=0.3,
                     sigma_pos=0.5)

    expected = _propagation_oracle(seg, valid, pos, alb, rough, metal, cfg)

    vals = []
    f = jax.jit(lambda k: propagation_loss(
        k, jnp.asarray(seg, jnp.int32), jnp.asarray(valid),
        jnp.asarray(pos), jnp.asarray(alb), jnp.asarray(rough),
        jnp.asarray(metal), cfg))
    for i in range(8):
        vals.append(float(f(jax.random.PRNGKey(i))))
    got = np.mean(vals)
    assert abs(got - expected) / expected < 0.05, (got, expected)


def test_check_max_segments_guard():
    from iris_tpu.train.steps import check_max_segments

    check_max_segments(np.asarray([0, 3, 7]), 8)
    import pytest
    with pytest.raises(ValueError, match="max_segments"):
        check_max_segments(np.asarray([0, 3, 8]), 8)


def test_full_state_resume_matches_uninterrupted():
    """Stopping at step N and resuming with {params, opt_state, step} plus
    RayBatcher.iter_from reproduces the uninterrupted run EXACTLY
    (reference Lightning resume contract, train_brdf_crf.py:541-545)."""
    from iris_tpu.data.datasets import RayBatcher
    from iris_tpu.train.loop import run_training
    from iris_tpu.train.steps import make_initialize_loss

    tracer, em, ngp, crf, _ = _tiny()
    cfg = LossConfig(spp=2, max_segments=8)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    optimizer = make_optimizer()
    params_host = jax.device_get({"material": ngp, "radiance": em.radiance})

    def params0():
        # fresh buffers per run: the jitted step donates params/opt_state
        return jax.tree_util.tree_map(jnp.asarray, params_host)

    bank = make_demo_batch(n_side=16)
    bank = {k: np.asarray(v) for k, v in bank.items()}
    key = jax.random.PRNGKey(0)
    kw = dict(log_fn=None, return_state=True)

    def fresh_batcher():
        return RayBatcher(bank, batch_size=64, seed=3)

    # uninterrupted: 2.5 epochs worth of steps (bpe=4 -> resample replay
    # matters)
    p_full, _ = run_training(loss_fn, params0(), fresh_batcher().iter_from(0),
                             optimizer, 10, key, **kw)
    p_full = jax.device_get(p_full)

    # interrupted at step 5, resumed with full state + repositioned stream
    p_half, s_half = run_training(loss_fn, params0(),
                                  fresh_batcher().iter_from(0),
                                  optimizer, 5, key, **kw)
    p_half, s_half = jax.device_get((p_half, s_half))
    p_res, _ = run_training(loss_fn,
                            jax.tree_util.tree_map(jnp.asarray, p_half),
                            fresh_batcher().iter_from(5),
                            optimizer, 10, key,
                            opt_state=jax.tree_util.tree_map(
                                jnp.asarray, s_half),
                            start_step=5, **kw)
    p_res = jax.device_get(p_res)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # params-only resume must NOT be bit-identical (Adam moments reset) —
    # guards against the test passing vacuously
    p_bad, _ = run_training(loss_fn,
                            jax.tree_util.tree_map(jnp.asarray, p_half),
                            fresh_batcher().iter_from(5),
                            optimizer, 10, key, start_step=5, **kw)
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(jax.tree_util.tree_leaves(p_full),
                               jax.tree_util.tree_leaves(p_bad)))
    assert diff > 1e-7


def test_radiance_lr_scale_accelerates_emitter():
    """scale_updates_for_key: the radiance leaf moves ~scale x faster,
    other leaves untouched; scale=1 is an exact no-op."""
    import optax

    from iris_tpu.train.optim import make_optimizer, scale_updates_for_key

    params = {"radiance": jnp.zeros((4, 3)), "material": jnp.zeros(5)}
    g = {"radiance": -jnp.ones((4, 3)), "material": -jnp.ones(5)}

    def step_once(opt):
        st = opt.init(params)
        up, _ = opt.update(g, st, params)
        return optax.apply_updates(params, up)

    base = make_optimizer(learning_rate=1e-3)
    p1 = step_once(base)
    p10 = step_once(scale_updates_for_key(base, "radiance", 10.0))
    assert np.allclose(np.asarray(p10["radiance"]),
                       10 * np.asarray(p1["radiance"]), rtol=1e-5)
    assert np.allclose(np.asarray(p10["material"]),
                       np.asarray(p1["material"]))
    assert scale_updates_for_key(base, "radiance", 1.0) is base


def test_radiance_param_roundtrip():
    from iris_tpu.train.steps import param_to_radiance, radiance_to_param

    r = jnp.asarray([1e-4, 1e-2, 0.5, 1.0, 10.0, 100.0, 1000.0])
    back = param_to_radiance(radiance_to_param(r))
    assert np.allclose(np.asarray(back), np.asarray(r), rtol=1e-5)
    # identity when disabled
    assert radiance_to_param(r, False) is r
    assert param_to_radiance(r, False) is r
    # near-zero init clamps instead of producing -inf/nan
    assert np.all(np.isfinite(np.asarray(radiance_to_param(
        jnp.zeros((4, 3))))))


def test_radiance_log_space_converges_faster():
    """From a dark init toward a bright (radiance=10) emitter, the
    log-space leaf reaches the target in far fewer Adam steps than the
    linear leaf, which crawls at ~lr/step (the TODO.md quality finding)."""
    import optax

    from iris_tpu.train.steps import param_to_radiance, radiance_to_param

    tracer, em, ngp, crf, _ = _tiny()
    batch = make_demo_batch(n_side=8)
    # GT pixels rendered with the TRUE radiance (em is the bright emitter)
    import functools

    from iris_tpu.core.vecmath import normalize
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single

    rays = jnp.asarray(batch["rays"])
    xs, ds = rays[..., :3], normalize(rays[..., 3:6])
    l_gt = path_tracing_single(
        jax.random.PRNGKey(7), tracer, em, functools.partial(
            ngp_brdf_apply, ngp), xs, ds, rays[..., 6:9], rays[..., 9:12], 8)
    batch = dict(batch, rgbs=np.asarray(crf_forward(crf, l_gt, 1.0)))

    dark = jnp.full_like(em.radiance, 0.05)
    true_r = np.asarray(em.radiance)

    def run(log_space, steps=30, lr=0.25):
        cfg = LossConfig(spp=4, radiance_log_space=log_space)
        loss_fn = make_train_emitter_loss(tracer, em, ngp, crf, cfg)
        params = {"radiance": radiance_to_param(dark, log_space)}
        opt = optax.adam(lr)
        st = opt.init(params)

        @jax.jit
        def step(p, s, k):
            g = jax.grad(lambda q: loss_fn(q, batch, k)[0])(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s

        for i in range(steps):
            params, st = step(params, st, jax.random.PRNGKey(i))
        return np.asarray(param_to_radiance(params["radiance"], log_space))

    r_lin = run(False)
    r_log = run(True)
    # log-ratio error: the right metric for a multiplicative quantity
    # (linear Adam moves ~lr/step and is still far below target after 30
    # steps; log-space multiplies by ~e^lr per step and locks on)
    err_lin = np.abs(np.log(np.maximum(r_lin, 1e-3) / true_r)).mean()
    err_log = np.abs(np.log(np.maximum(r_log, 1e-3) / true_r)).mean()
    assert err_log < 0.5 * err_lin, (err_log, err_lin, r_log.mean(),
                                     r_lin.mean())
    assert r_log.mean() > 5.0 > r_lin.mean()  # reached the bright regime


def test_warm_start_adopts_stage_estimator_flags():
    """A warm-started material must take its estimator policy (stochastic_*,
    *_level_sample) from the CURRENT stage's flags, not from the static cfg
    pickled into the checkpoint — regression for the A/B whose arms were
    bit-identical because the checkpoint cfg silently won."""
    from argparse import Namespace

    from iris_tpu.pipeline.common import adopt_estimator_cfg, build_material

    mk = lambda **kw: Namespace(hash_levels=8, log2_hashmap_size=10,
                                stochastic_bwd=1, stochastic_fwd=1,
                                bwd_level_sample=-1, fwd_level_sample=0,
                                **kw)
    m = build_material(mk(), 0.0, 1.0)
    assert m.cfg.fwd_level_sample == 0 and m.cfg.bwd_level_sample == 2

    args2 = mk()
    args2.fwd_level_sample, args2.bwd_level_sample = 4, 2
    args2.stochastic_bwd = 0
    m2 = adopt_estimator_cfg(m, args2)
    assert m2.cfg.fwd_level_sample == 4
    assert m2.cfg.bwd_level_sample == 2
    assert not m2.cfg.stochastic_bwd
    # model-defining fields and weights stay with the checkpoint
    assert m2.cfg.n_levels == m.cfg.n_levels
    assert m2.cfg.log2_table_size == m.cfg.log2_table_size
    assert (m2.table == m.table).all()


def test_chunked_training_matches_unchunked():
    """chunk_steps>1 (K steps per dispatch inside one lax.scan) must
    reproduce the unchunked loss curve and final params: same absolute-step
    key folding, same update math, one batch stream."""
    import optax

    from iris_tpu.train.loop import run_training

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        noise = 0.01 * jax.random.normal(key, pred.shape)
        loss = jnp.mean((pred + noise - batch["y"]) ** 2)
        return loss, {"l2": loss}

    rng = np.random.default_rng(0)
    batches = [{"x": rng.normal(size=(16, 4)).astype(np.float32),
                "y": rng.normal(size=(16, 2)).astype(np.float32)}
               for _ in range(12)]
    params0 = {"w": jnp.zeros((4, 2))}
    opt = optax.adam(1e-2)

    def run(chunk):
        seen = []
        hooks = [lambda s, p, l, a: seen.append((s, float(l)))]
        p = run_training(loss_fn, {"w": params0["w"] + 0}, iter(batches),
                         opt, 12, jax.random.PRNGKey(7), hooks=hooks,
                         log_fn=None, chunk_steps=chunk)
        return np.asarray(p["w"]), seen

    w1, seen1 = run(1)
    w4, seen4 = run(4)
    assert [s for s, _ in seen1] == [s for s, _ in seen4]
    l1 = np.asarray([l for _, l in seen1])
    l4 = np.asarray([l for _, l in seen4])
    assert np.allclose(l1, l4, rtol=1e-5, atol=1e-7), (l1, l4)
    assert np.allclose(w1, w4, rtol=1e-5, atol=1e-7)

    # remainder chunk (12 % 5 != 0) still runs every step exactly once
    w5, seen5 = run(5)
    assert [s for s, _ in seen5] == [s for s, _ in seen1]
    assert np.allclose(w1, w5, rtol=1e-5, atol=1e-7)


def test_validation_hook_chunked_render(tmp_path):
    """The val-frame render must run in fixed-size pixel chunks: a
    whole-frame program at production resolution compiled to a 16 GB HBM
    footprint (scoped OOM). A non-chunk-multiple frame exercises the pad
    path; outputs must exist and be finite."""
    import jax
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.train.validation import make_validation_hook

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=2, hash_levels=2, log2_table=8, slf_res=8)
    h = w = 18                       # 324 px: not a multiple of 256
    o, d, dxdu, dydv = camera_rays(h)
    rays = np.concatenate([o, d, dxdu, dydv], -1).astype(np.float32)
    vb = {"rays": rays, "rgbs": np.zeros((h * w, 3), np.float32),
          "exposure": 1.0}
    hook = make_validation_hook(
        tracer, em, crf, vb, (h, w), str(tmp_path), val_step=5, spp=2,
        indir_depth=1)
    hook(4, {"material": ngp, "radiance": em.radiance,
             "crf_weight": crf.weight}, 0.0, {})   # not a val step: no-op
    assert not os.listdir(tmp_path)
    hook(5, {"material": ngp, "radiance": em.radiance,
             "crf_weight": crf.weight}, 0.0, {})
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert {"00005_L_train.png", "00005_L_full.png",
            "00005_L_gt.png"} <= set(pngs), pngs


def test_material_diag_hook_logs_saturation(tmp_path):
    """The roughness-saturation diagnostic (validation.py) must append
    rough_* stats to the JSONL and emit the warning record when the
    material's roughness rides the sigmoid ceiling."""
    import json

    from iris_tpu.train.validation import make_material_diag_hook

    tracer, em, ngp, crf, _ = _tiny()
    batch = make_demo_batch(n_side=8)
    path = str(tmp_path / "log.jsonl")
    hook = make_material_diag_hook(tracer, batch, path, val_step=10)

    hook(10, {"material": ngp}, 0.0, {})
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 1
    r = recs[0]
    assert set(r) >= {"step", "rough_mean", "rough_ceiling_frac",
                      "rough_floor_frac"}
    assert 0.0 <= r["rough_ceiling_frac"] <= 1.0

    # saturate the head: huge positive bias on the roughness output unit
    # (NGPBRDF head layout: material MLP final bias, roughness channel)
    import dataclasses

    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(ngp)
    # crude but robust: push ALL params high -> sigmoid outputs ~1
    sat = jtu.tree_unflatten(treedef, [l + 50.0 for l in leaves])
    hook(20, {"material": sat}, 0.0, {})
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 2
    assert recs[1]["rough_ceiling_frac"] > 0.5
    assert "warning" in recs[1] and "ld" in recs[1]["warning"]

    hook(25, {"material": ngp}, 0.0, {})  # off-cadence: no record
    assert len(open(path).readlines()) == 2
