"""Host-side cost model of the paired_streamed kernel's tile walk.

The kernel (geometry/pallas_intersect.py:_kernel_paired_streamed) pops ONE
sibling-pair row per iteration for an entire 8192-ray tile: 2 slab tests
across all lanes, leaf children intersected in place (vectorized
Moller-Trumbore, t_best shrinks), near-first descent ordered by mean lane
entry t. Per-tile cost ~ a*iterations + b*leaf_visits*leaf_size +
c*window_reloads. This simulates that walk exactly (per-lane t_best,
any-lane push policy) and reports the three counts per tree config, for a
coherent camera tile and a sorted-incoherent bounce tile — ranking tree
builds (spatial-split alpha x leaf_size) BEFORE paying 10-20 min device
compiles per arm.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python probes/sbvh_tile_sim.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np

PAIR_WIN = 512
LEAF_WIN = 512


def walk_tile(nodes, tris, leaf_size, o, d, t_cap=3e38):
    lo = nodes[:, 0:3]
    hi = nodes[:, 3:6]
    skip = nodes[:, 6].astype(np.int64)
    desc = nodes[:, 7]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    L = o.shape[0]
    t_best = np.full(L, t_cap, np.float64)

    # pair ids (window modeling): rank of internal node in preorder
    internal = desc >= 1
    pair_rank = np.cumsum(internal) - 1

    def slab(c):
        t0 = (lo[c] - o) * inv
        t1 = (hi[c] - o) * inv
        tmin = np.maximum(np.minimum(t0, t1).max(1), 0.0)
        tmax = np.minimum(np.maximum(t0, t1).min(1), t_best)
        return tmax >= tmin, tmin

    def leaf_test(c):
        nonlocal t_best
        start = int(-desc[c])
        for k in range(leaf_size):
            row = tris[start + k]
            if row[9] < 0:
                continue
            v0, e1, e2 = row[0:3], row[3:6], row[6:9]
            p = np.cross(d, e2)
            det = (p * e1).sum(1)
            det = np.where(np.abs(det) < 1e-12, 1e-12, det)
            tvec = o - v0
            u = (p * tvec).sum(1) / det
            q = np.cross(tvec, e1)
            v = (q * d).sum(1) / det
            t = (q * e2).sum(1) / det
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) \
                & (t < t_best)
            t_best = np.where(ok, t, t_best)

    # near-first stack walk over internal nodes, starting at root
    stack = [0]
    iters = 0
    leaf_visits = 0
    pwin = -1
    lwin = -1
    pwin_reloads = 0
    lwin_reloads = 0
    while stack:
        i = stack.pop()
        iters += 1
        tp = pair_rank[i] // PAIR_WIN
        if tp != pwin:
            pwin_reloads += 1
            pwin = tp
        l = i + 1
        r = skip[l] - 1
        hit_l, tlo_l = slab(l)
        hit_r, tlo_r = slab(r)
        out = []
        for c, h, tl in ((l, hit_l, tlo_l), (r, hit_r, tlo_r)):
            if not h.any():
                continue
            if desc[c] <= 0:
                leaf_visits += 1
                tl_ = (int(-desc[c]) // leaf_size) // LEAF_WIN
                if tl_ != lwin:
                    lwin_reloads += 1
                    lwin = tl_
                leaf_test(c)
            else:
                out.append((np.where(h, tl, 0).sum() / max(h.sum(), 1), c))
        out.sort()                      # near first -> push far, then near
        for _, c in reversed(out):
            stack.append(c)
    return iters, leaf_visits, pwin_reloads, lwin_reloads, t_best


def bounce_rays(tris, n, seed=1):
    """Sorted incoherent rays: origins on random triangles, cosine dirs —
    the bench's NEE/bounce population, pre-sorted like the kernels do."""
    rng = np.random.default_rng(seed)
    f = rng.integers(0, len(tris), n)
    w = rng.dirichlet((1, 1, 1), n)
    tv = tris[f]
    o = (tv * w[:, :, None]).sum(1)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    key = np.zeros(n)
    for c in range(3):
        q = np.clip((o[:, c] - o[:, c].min())
                    / max(np.ptp(o[:, c]), 1e-9), 0, 1)
        key = key * 256 + np.floor(q * 255)
    idx = np.argsort(key, kind="stable")
    return o[idx], d[idx]


def main():
    from iris_tpu.geometry.bvh_native import build_sah_arrays
    from iris_tpu.geometry.procedural import camera_rays, make_box_scene

    mesh, _ = make_box_scene(n_clutter=8500, seed=0)
    tris9 = mesh.triangles()
    o_cam, d_cam, _, _ = camera_rays(64)      # 4096-lane coherent tile
    o_cam = np.asarray(o_cam, np.float64)
    d_cam = np.asarray(d_cam, np.float64)
    o_b, d_b = bounce_rays(np.asarray(tris9, np.float64), 4096)

    for leaf_size in (4, 8, 10):
        for alpha in (-1.0, 1e-3):
            built = build_sah_arrays(tris9, leaf_size=leaf_size,
                                     spatial_alpha=alpha)
            if built is None:
                continue
            nodes, rows = built
            t0 = time.time()
            res = {}
            for name, (o, d) in (("cam", (o_cam, d_cam)),
                                 ("bounce", (o_b, d_b))):
                it, lv, pr, lr, _ = walk_tile(nodes, rows, leaf_size, o, d)
                res[name] = {"iters": it, "leaf_visits": lv,
                             "pair_reloads": pr, "leaf_reloads": lr}
            print(json.dumps({
                "leaf_size": leaf_size, "alpha": alpha,
                "nodes": int(len(nodes)), "rows": int(len(rows)),
                "sim_s": round(time.time() - t0, 1), **res}), flush=True)


if __name__ == "__main__":
    main()
