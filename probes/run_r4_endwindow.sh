#!/usr/bin/env bash
# Round-4 end-window chip queue (one job at a time, generous gaps):
#   1. dense vs paired_streamed at 102K faces, DENSE FIRST — cross-check
#      of the same-process ordering hazard (PERF round-4b): if dense-as-
#      arm-1 matches its cross-process 322-334 ms, the hazard is
#      confirmed as an arm-2 effect.
#   2. device_trace attempt on the 8Lx8F encode fwd+bwd (does profiling
#      work through the tunnel? round-5 attribution tool check).
#   3. bench.py confirm (warms the driver's caches; two-regime line).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
mkdir -p records outputs

echo "=== endwindow start $(date +%H:%M:%S) ==="
python - > records/dense102k_ab_r4b.log 2>&1 <<'EOF'
import json, os, sys
sys.path.insert(0, os.path.join(os.getcwd(), "probes"))
from bigtree_step import measure
os.environ["IRIS_TPU_DENSE"] = "auto"     # arm 1: dense resident FIRST
r = measure(8500); r["arm"] = "dense_resident_first"
print(json.dumps(r), flush=True)
os.environ["IRIS_TPU_DENSE"] = "0"        # arm 2: paired_streamed second
r = measure(8500); r["arm"] = "paired_streamed_second"
print(json.dumps(r), flush=True)
os._exit(0)
EOF
echo "=== dense-first AB done $(date +%H:%M:%S) ==="
tail -2 records/dense102k_ab_r4b.log
sleep 240

python - > records/trace_attempt_r4.log 2>&1 <<'EOF'
import os, sys
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp
from iris_tpu.models.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from iris_tpu.utils.profiling import device_trace
cfg = HashGridConfig(n_levels=8, n_features=8, log2_table_size=19,
                     per_level_scale=1.3 ** (31.0 / 7.0), row_gather=True,
                     stochastic_fwd=True, stochastic_bwd=True,
                     bwd_level_sample=2)
table = init_hashgrid(jax.random.PRNGKey(7), cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (262144, 3))
f = jax.jit(lambda t, k: jax.grad(lambda tt: jnp.sum(
    hashgrid_encode(tt, cfg, x, k) ** 2))(t))
g = jax.block_until_ready(f(table, jax.random.PRNGKey(2)))   # compile
with device_trace("records/trace_encode_r4"):
    for i in range(3):
        g = jax.block_until_ready(f(table, jax.random.fold_in(
            jax.random.PRNGKey(3), i)))
n = sum(len(fs) for _, _, fs in os.walk("records/trace_encode_r4"))
print("trace files:", n)
os._exit(0)
EOF
echo "=== trace attempt done $(date +%H:%M:%S) ==="
tail -3 records/trace_attempt_r4.log
sleep 240

python bench.py > records/bench_r4final.log 2>&1
echo "=== bench done $(date +%H:%M:%S) ==="
tail -1 records/bench_r4final.log
echo "ENDWINDOW_DONE"
