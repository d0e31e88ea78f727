#!/usr/bin/env bash
# Final policy check: scan-timed (bench_scan) step at 102K faces for BOTH
# kernels — the dense-vs-paired_streamed decision has so far mixed
# harnesses (python-loop A/B says paired_streamed 363 vs dense 388 ms;
# bench_scan measured dense alone at 322 ms). Same timer, both arms,
# separate jit closures.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

while ! grep -q "ENDWINDOW_DONE" outputs/endwindow_r4.log 2>/dev/null; do
  sleep 60
done
sleep 240
python - > records/policy102k_scan_r4.log 2>&1 <<'EOF'
import functools, json, os, sys
from dataclasses import replace as dc_replace
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp
from iris_tpu.demo import make_demo_scene
from iris_tpu.geometry.intersect import _pallas_mode
from iris_tpu.geometry.procedural import camera_rays
from iris_tpu.models.brdf import ngp_brdf_apply
from iris_tpu.models.crf import crf_forward
from iris_tpu.models.hashgrid import auto_bwd_level_sample
from iris_tpu.render.integrator import path_tracing_single
from iris_tpu.utils.timing import bench_scan

tracer, em, ngp, crf, mesh = make_demo_scene(
    n_clutter=8500, slf_res=64, hash_levels=8, log2_table=19,
    hash_features=8, per_level_scale=-1.0)
ngp = dc_replace(ngp, cfg=dc_replace(
    ngp.cfg, stochastic_fwd=True, stochastic_bwd=True,
    bwd_level_sample=auto_bwd_level_sample(8)))
o, d, dxdu, dydv = map(jnp.asarray, camera_rays(int(8192 ** 0.5)))
b = o.shape[0]
target = jnp.ones((b, 3)) * 0.5
params = {"material": ngp, "radiance": em.radiance, "crf_w": crf.weight}

def run(arm, env):
    os.environ.update(env)
    def loss_fn(p, rays_o, key):
        em2 = dc_replace(em, radiance=p["radiance"])
        crf2 = dc_replace(crf, weight=p["crf_w"])
        key, k_mat = jax.random.split(key)
        mat_fn = functools.partial(ngp_brdf_apply, p["material"], key=k_mat)
        li = path_tracing_single(key, tracer, em2, mat_fn, rays_o, d,
                                 dxdu, dydv, 32)
        return jnp.mean((crf_forward(crf2, li, 1.0) - target) ** 2)
    gfn = jax.grad(loss_fn)
    def step(key):
        eps = jax.random.uniform(key, (1, 3)) * 1e-6
        g = gfn(params, o + eps, key)
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(g):
            acc = acc + jnp.sum(leaf.astype(jnp.float32) ** 2) * 1e-20
        return acc
    dt = bench_scan(step, jax.random.PRNGKey(3), iters=8)
    print(json.dumps({"arm": arm, "kernel": _pallas_mode(tracer, b * 32),
                      "ms": round(dt * 1e3, 2),
                      "rays_s": round(b * 32 / dt)}), flush=True)

run("dense", {"IRIS_TPU_DENSE": "auto"})
run("paired_streamed", {"IRIS_TPU_DENSE": "0"})
os._exit(0)
EOF
echo "=== policy102k done $(date +%H:%M:%S) ==="
grep -a '"arm"' records/policy102k_scan_r4.log
echo "POLICY_FIX_DONE"
