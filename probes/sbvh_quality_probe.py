"""SBVH vs object-SAH tree quality, host-side (no TPU).

Builds the 102K-face bench clutter scene with spatial splits OFF/ON and
reports: ref duplication, SAH tree cost, and the mean node-visit +
leaf-row-test counts of a simulated preorder union traversal over a
camera-ray set (the exact walk the Pallas/XLA kernels do). Pure numpy.

Run: env IRIS_TPU_FORCE_CPU=1 PYTHONPATH=/root/repo python probes/sbvh_quality_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np


def tree_cost(nodes, leaf_size):
    """SAH cost: sum SA(n)/SA(root) * (Ct internal | Ci*leaf_size leaf)."""
    lo, hi = nodes[:, 0:3], nodes[:, 3:6]
    ext = np.maximum(hi - lo, 0)
    sa = 2 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
              + ext[:, 2] * ext[:, 0])
    internal = nodes[:, 7] >= 1
    w = np.where(internal, 1.0, float(leaf_size))
    return float((sa * w).sum() / max(sa[0], 1e-20))


def simulate_union_walk(nodes, o, d, max_steps=200000):
    """Per-ray preorder walk with skip pointers; returns (visits, leaf_tests)
    averaged over rays. Vectorized over rays, stepping all in lockstep
    (cursor 0 = done) — mirrors geometry/intersect.py ray_trace semantics
    minus the triangle tests (we count, not intersect)."""
    n = nodes.shape[0]
    lo = nodes[:, 0:3]
    hi = nodes[:, 3:6]
    skip = nodes[:, 6].astype(np.int64)
    desc = nodes[:, 7]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    cur = np.ones(o.shape[0], np.int64)  # 1-based
    visits = np.zeros(o.shape[0], np.int64)
    leaf_tests = np.zeros(o.shape[0], np.int64)
    alive = cur > 0
    for _ in range(max_steps):
        if not alive.any():
            break
        c = cur[alive] - 1
        t0 = (lo[c] - o[alive]) * inv[alive]
        t1 = (hi[c] - o[alive]) * inv[alive]
        tmin = np.minimum(t0, t1).max(1)
        tmax = np.maximum(t0, t1).min(1)
        hit = (tmax >= np.maximum(tmin, 0)) & (tmin < 3e38)
        visits[alive] += 1
        dsc = desc[c]
        is_leaf = dsc <= 0
        leaf_tests[alive] += (hit & is_leaf).astype(np.int64)
        nxt = np.where(hit & ~is_leaf, dsc.astype(np.int64), skip[c])
        cur[alive] = nxt
        alive = cur > 0
    return float(visits.mean()), float(leaf_tests.mean())


def main():
    from iris_tpu.geometry.bvh_native import build_sah_arrays
    from iris_tpu.geometry.procedural import camera_rays, make_box_scene

    mesh, _ = make_box_scene(n_clutter=8500, seed=0)
    tris = mesh.triangles()
    f = tris.shape[0]
    o, d, _, _ = camera_rays(96)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)

    for alpha in (-1.0, 1e-5, 1e-4, 1e-3):
        t0 = time.time()
        built = build_sah_arrays(tris, leaf_size=4, spatial_alpha=alpha)
        bt = time.time() - t0
        nodes, rows = built
        ids = rows[:, 9].astype(int)
        real = ids[ids >= 0]
        assert set(real.tolist()) == set(range(f)), "missing faces!"
        visits, ltests = simulate_union_walk(nodes, o, d)
        print(json.dumps({
            "alpha": alpha, "faces": int(f), "refs": int(len(real)),
            "dup_ratio": round(len(real) / f, 3),
            "nodes": int(len(nodes)), "rows": int(len(rows)),
            "build_s": round(bt, 2),
            "sah_cost": round(tree_cost(nodes, 4), 1),
            "mean_node_visits": round(visits, 1),
            "mean_leaf_tests": round(ltests, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
