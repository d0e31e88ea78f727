"""brdf0 -> brdf1 channel-correlation shuffle at PRODUCTION scale.

TODO round-3 last item / verdict item 1: both BRDF runs restart from
init.ckpt (reference train.sh:104-108); the miniature quality suite
showed refine SHUFFLES correlation between albedo channels rather than
degrading the mean. This checks the same at the scale record's size:
per-channel albedo correlation vs the closed-form GT for brdf0 and
brdf1, plus roughness/metallic (all-points AND blob-gated — the scale
record runs METALLIC_AMP=0.8).

CPU-runnable after scripts/run_scale_demo.sh:
  IRIS_TPU_FORCE_CPU=1 PYTHONPATH=/root/repo:/root/.axon_site \
    python probes/scale_shuffle_check.py [root=workdir_scene_l] [exp=tpu_l]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "workdir_scene_l"
    exp = sys.argv[2] if len(sys.argv) > 2 else "tpu_l"
    amp = float(os.environ.get("METALLIC_AMP", "0.8"))

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
    pts = []
    for c in range(4):          # 32K surface points, chunked traversal
        o = jnp.asarray(rng.uniform(0.3, 1.7, (8192, 3)) * [1, 1, 0.45]
                        + [0, 0, 0.1], jnp.float32)
        d = rng.normal(size=(8192, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pos, _, _, _, valid = ray_intersect(tracer, o,
                                            jnp.asarray(d, jnp.float32))
        pts.append(np.asarray(pos)[np.asarray(valid)])
    pos = jnp.asarray(np.concatenate(pts, 0))
    gt = gt_mat_fn(pos, metallic_amp=amp)
    gate = np.asarray(gt["metallic"])[:, 0] > 0.5 * amp if amp else None

    def corr(a, b, m=None):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        if m is not None:
            a, b = a[m], b[m]
        if len(a) < 8 or a.std() < 1e-6 or b.std() < 1e-6:
            return float("nan")
        return float(np.corrcoef(a, b)[0, 1])

    out = {}
    for stage in ("brdf0", "brdf1"):
        p = load_pytree(os.path.join("checkpoints", exp, stage,
                                     "last.pkl"))["material"]
        tr = ngp_brdf_apply(p, pos)
        out[stage] = {
            "albedo": [corr(tr["albedo"][:, c], gt["albedo"][:, c])
                       for c in range(3)],
            "roughness": corr(tr["roughness"], gt["roughness"]),
            "metallic": corr(tr["metallic"], gt["metallic"]),
        }
        if gate is not None:
            out[stage]["blob_roughness"] = corr(tr["roughness"],
                                                gt["roughness"], gate)
            out[stage]["blob_metallic"] = corr(tr["metallic"],
                                               gt["metallic"], gate)
            out[stage]["blob_n"] = int(gate.sum())
    m0 = np.nanmean(out["brdf0"]["albedo"])
    m1 = np.nanmean(out["brdf1"]["albedo"])
    out["albedo_corr_mean"] = {"brdf0": round(float(m0), 4),
                               "brdf1": round(float(m1), 4),
                               "mean_preserved": bool(m1 > m0 - 0.1)}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
