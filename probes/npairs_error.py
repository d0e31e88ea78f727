"""Propagation-loss estimator error vs partner-sample count (verdict weak
item 6: n_pairs=256 vs the reference's 1024, train_brdf_crf.py:249).

The semantic propagation loss estimates per-pixel bilateral-weighted
segment means of roughness/metallic from n_pairs partner draws
(train/steps.py propagation_loss). This probe measures the Monte-CarlO
error of that estimator on a realistic batch (demo scene first-hit
positions, generator GT albedo, an untrained-field roughness/metallic —
the regime where the loss actually steers training): loss value and
gradient deviation at n_pairs in {64, 256, 1024} against a 16384-pair
reference, over 8 independent keys.

CPU: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python probes/npairs_error.py
"""

from __future__ import annotations

import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass


def main():
    from iris_tpu.data.make_demo_dataset import gt_mat_fn
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry.intersect import ray_intersect
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.train.steps import LossConfig, propagation_loss

    tracer, em, ngp, crf, mesh = make_demo_scene(
        n_clutter=8, hash_levels=4, log2_table=10)
    b = 8192
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(0.3, 1.7, (b, 3)) * [1, 1, 0.45]
                    + [0, 0, 0.1], jnp.float32)
    d = rng.normal(size=(b, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, _, _, tri, valid = ray_intersect(tracer, o,
                                          jnp.asarray(d, jnp.float32))
    # part segments: face-id buckets (the demo datasets segment by object)
    seg = jnp.asarray(np.asarray(tri) % 16, jnp.float32)
    albedo_d = jnp.asarray(gt_mat_fn(pos)["albedo"])
    # roughness/metallic from the UNTRAINED field: the training regime
    mat = ngp_brdf_apply(ngp, pos)
    rough = mat["roughness"][:, 0]
    metal = mat["metallic"][:, 0]
    pos_n = (pos - (-0.1)) / (2.1 - (-0.1))

    def loss_and_grad(n_pairs, key):
        cfg = LossConfig(max_segments=16, n_pairs=n_pairs)

        def f(rm):
            r, m = rm
            return propagation_loss(key, seg, valid, pos_n, albedo_d,
                                    r, m, cfg)

        l, g = jax.value_and_grad(f)((rough, metal))
        return float(l), np.concatenate([np.asarray(x).ravel() for x in g])

    keys = [jax.random.PRNGKey(i) for i in range(8)]
    # reference estimate: 16384 pairs averaged over all keys
    ref_l, ref_g = zip(*(loss_and_grad(16384, k) for k in keys))
    l_star = float(np.mean(ref_l))
    g_star = np.mean(ref_g, axis=0)

    print(json.dumps({"n_pairs": 16384, "loss_mean": l_star,
                      "loss_rel_std": float(np.std(ref_l) / abs(l_star)),
                      "note": "reference estimate"}), flush=True)
    for n_pairs in (64, 256, 1024):
        ls, gs = zip(*(loss_and_grad(n_pairs, k) for k in keys))
        rel_err = [abs(l - l_star) / abs(l_star) for l in ls]
        gcos = [float(np.dot(g, g_star)
                      / max(np.linalg.norm(g) * np.linalg.norm(g_star),
                            1e-12)) for g in gs]
        grel = [float(np.linalg.norm(g - g_star)
                      / max(np.linalg.norm(g_star), 1e-12)) for g in gs]
        print(json.dumps({
            "n_pairs": n_pairs,
            "loss_rel_err_mean": float(np.mean(rel_err)),
            "loss_rel_err_max": float(np.max(rel_err)),
            "grad_cos_mean": float(np.mean(gcos)),
            "grad_relnorm_mean": float(np.mean(grel)),
        }), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
