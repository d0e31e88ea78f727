"""Tile-walk cost model v2: anyhit shadow lanes + leaf_size, fused tiles.

Models the bench 102K-face regime's dominant traversal: the fused 2N
NEE+bounce call (integrator.py _nee_and_bounce) — N shadow rays toward
sampled emitter points + N cosine bounce rays, spatially sorted together.
Arms:
  base      — today's semantics (closest hit, t_init = inf, ls=4)
  tcap      — shadow lanes start t_best at the emitter distance
  anyhit    — shadow lanes ALSO collapse t_best -> 0 on the first hit
              strictly before the emitter (lane leaves the union walk)
  ls8/ls10  — anyhit + bigger leaves (fewer pair pops, more MT folds)
Costs reported: pair iterations (2 slab tests each), leaf visits
(leaf_size MT folds each), window reloads.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python probes/sbvh_tile_sim2.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("IRIS_TPU_FORCE_CPU", "1")

import numpy as np

PAIR_WIN = 512
LEAF_WIN = 512


def walk_tile(nodes, tris, leaf_size, o, d, t_init, anyhit):
    lo = nodes[:, 0:3]
    hi = nodes[:, 3:6]
    skip = nodes[:, 6].astype(np.int64)
    desc = nodes[:, 7]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t_best = t_init.astype(np.float64).copy()
    internal = desc >= 1
    pair_rank = np.cumsum(internal) - 1

    def slab(c):
        t0 = (lo[c] - o) * inv
        t1 = (hi[c] - o) * inv
        tmin = np.maximum(np.minimum(t0, t1).max(1), 0.0)
        tmax = np.minimum(np.maximum(t0, t1).min(1), t_best)
        return tmax >= tmin, tmin

    def leaf_test(c, boxhit):
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
                & (t < t_best) & boxhit
            t_best = np.where(ok & anyhit, 0.0, np.where(ok, t, t_best))

    stack = [0]
    iters = 0
    leaf_visits = 0
    pwin = lwin = -1
    pr = lr = 0
    while stack:
        i = stack.pop()
        iters += 1
        tp = pair_rank[i] // PAIR_WIN
        if tp != pwin:
            pr += 1
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
                    lr += 1
                    lwin = tl_
                leaf_test(c, h)
            else:
                out.append((np.where(h, tl, 0).sum() / max(h.sum(), 1), c))
        out.sort()
        for _, c in reversed(out):
            stack.append(c)
    return iters, leaf_visits, pr, lr


def fused_tile(tris, is_em, n, seed=3):
    """N surface points -> N shadow rays (to sampled emitter points) + N
    cosine bounce rays, spatially sorted together like the kernel input."""
    rng = np.random.default_rng(seed)
    em_ids = np.nonzero(is_em)[0]
    f = rng.integers(0, len(tris), n)
    w = rng.dirichlet((1, 1, 1), n)
    pts = (tris[f] * w[:, :, None]).sum(1)
    le = em_ids[rng.integers(0, len(em_ids), n)]
    wl = rng.dirichlet((1, 1, 1), n)
    lpts = (tris[le] * wl[:, :, None]).sum(1)
    d_sh = lpts - pts
    dist = np.linalg.norm(d_sh, axis=1, keepdims=True)
    d_sh = d_sh / np.maximum(dist, 1e-9)
    d_b = rng.normal(size=(n, 3))
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
    o = np.concatenate([pts + 1e-3 * d_sh, pts + 1e-3 * d_b], 0)
    d = np.concatenate([d_sh, d_b], 0)
    t_init = np.concatenate([dist[:, 0] * (1 + 2e-4),
                             np.full(n, 3e38)], 0)
    is_shadow = np.concatenate([np.ones(n, bool), np.zeros(n, bool)], 0)
    key = np.zeros(2 * n)
    for c in range(3):
        q = np.clip((o[:, c] - o[:, c].min())
                    / max(np.ptp(o[:, c]), 1e-9), 0, 1)
        key = key * 256 + np.floor(q * 255)
    idx = np.argsort(key, kind="stable")
    return o[idx], d[idx], t_init[idx], is_shadow[idx]


def main():
    from iris_tpu.geometry.bvh_native import build_sah_arrays
    from iris_tpu.geometry.procedural import make_box_scene

    mesh, is_em = make_box_scene(n_clutter=8500, seed=0)
    tris9 = np.asarray(mesh.triangles(), np.float64)
    o, d, t_init, is_sh = fused_tile(tris9, np.asarray(is_em), 2048)
    inf = np.full(len(o), 3e38)
    no = np.zeros(len(o), bool)

    trees = {ls: build_sah_arrays(np.asarray(tris9, np.float32),
                                  leaf_size=ls, spatial_alpha=-1.0)
             for ls in (4, 8, 10)}
    arms = [
        ("base_ls4", 4, inf, no),
        ("tcap_ls4", 4, t_init, no),
        ("anyhit_ls4", 4, t_init, is_sh),
        ("anyhit_ls8", 8, t_init, is_sh),
        ("anyhit_ls10", 10, t_init, is_sh),
        ("base_ls8", 8, inf, no),
    ]
    for name, ls, ti, ah in arms:
        nodes, rows = trees[ls]
        it, lv, pr, lr = walk_tile(nodes, rows, ls, o, d, ti, ah)
        cost2 = 2 * it + ls * lv          # vector-op units (slabs + folds)
        print(json.dumps({"arm": name, "iters": it, "leaf_visits": lv,
                          "pair_reloads": pr, "leaf_reloads": lr,
                          "vec_units": cost2}), flush=True)


if __name__ == "__main__":
    main()
