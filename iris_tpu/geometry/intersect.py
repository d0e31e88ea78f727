"""Ray–mesh intersection (JAX). The single geometry choke point.

API parity with reference utils/path_tracing.py:17-48 `ray_intersect`:
returns (positions, normals, uvs, tri_idx, valid) with normals normalized
and flipped toward the ray origin (double_sided(-d, n)), tri_idx == -1 for
misses. Geometry carries no gradients (wrapped in stop_gradient), matching
the reference's gradient policy (grads never flow through hit points).

Traversal is stackless skip-pointer preorder over the complete-tree BVH
(see bvh.py), vectorized over the full ray batch inside one
`lax.while_loop` — fixed shapes, TPU/XLA-legal control flow. All memory
access is 1-D row gathers of the packed (N,8) node / (P,12) triangle
arrays (2-D index gathers lower to slow generic XLA gathers on TPU), and
the leaf's triangles are tested with a statically-unrolled running-min
instead of argmin/take_along_axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iris_tpu.core.vecmath import double_sided, normalize
from iris_tpu.geometry.bvh import Tracer

T_MISS = 3e37
_MT_EPS = 1e-9


def _moller_trumbore(o, d, v0, e1, e2, eps=_MT_EPS):
    """Batched Möller–Trumbore; broadcasts over matching leading axes.
    Returns t, u, v, hit."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > eps)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, hit


def _slab_test(o, inv_d, bmin, bmax, t_best):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = jnp.max(jnp.minimum(t0, t1), axis=-1)
    thi = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (thi >= jnp.maximum(tlo, 0.0)) & (tlo <= t_best)


def ray_trace(tracer: Tracer, origins: jnp.ndarray, dirs: jnp.ndarray,
              unroll: int = 4):
    """Closest-hit traversal. Returns (t, u, v, face_id, valid) where
    face_id is the ORIGINAL mesh face index (-1 = miss)."""
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    B = origins.shape[0]
    L = tracer.leaf_size
    n_nodes = tracer.n_nodes
    P = tracer.tris.shape[0]

    d_safe = jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    inv_d = 1.0 / d_safe

    def step(cur, t_best, uvi_best):
        active = cur > 0
        node = jnp.clip(cur - 1, 0, n_nodes - 1)
        nd = tracer.nodes[node]                       # (B, 8) one row gather
        hit_box = _slab_test(origins, inv_d, nd[:, 0:3], nd[:, 3:6],
                             t_best) & active
        desc = nd[:, 7]
        is_leaf = desc <= 0
        do_leaf = hit_box & is_leaf
        leaf_base = jnp.where(do_leaf, (-desc).astype(jnp.int32), 0)

        for k in range(L):
            row = tracer.tris[jnp.clip(leaf_base + k, 0, P - 1)]  # (B, 12)
            t, u, v, hit = _moller_trumbore(
                origins, dirs, row[:, 0:3], row[:, 3:6], row[:, 6:9])
            fid = row[:, 9]
            hit = hit & (fid >= 0) & do_leaf & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            uvi_best = jnp.where(hit[:, None],
                                 jnp.stack([u, v, fid], -1), uvi_best)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, desc.astype(jnp.int32),
                        nd[:, 6].astype(jnp.int32))
        cur = jnp.where(active, nxt, 0)
        return cur, t_best, uvi_best

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        cur, t_best, uvi_best = state
        for _ in range(unroll):
            cur, t_best, uvi_best = step(cur, t_best, uvi_best)
        return cur, t_best, uvi_best

    state0 = (
        jnp.ones((B,), jnp.int32),
        jnp.full((B,), T_MISS, jnp.float32),
        jnp.concatenate([jnp.zeros((B, 2), jnp.float32),
                         jnp.full((B, 1), -1.0, jnp.float32)], axis=1),
    )
    cur, t, uvi = jax.lax.while_loop(cond, body, state0)
    face = uvi[:, 2].astype(jnp.int32)
    valid = face >= 0
    return t, uvi[:, 0], uvi[:, 1], face, valid


def ray_trace_tiled(tracer: Tracer, origins: jnp.ndarray, dirs: jnp.ndarray,
                    tile: int = 256):
    """Union traversal over ray tiles — the TPU-native fast path.

    Rays are grouped into tiles of `tile` lanes; each tile shares ONE
    traversal cursor that walks the union of its rays' BVH paths (descend
    when ANY lane hits the box). All node/triangle fetches are then small
    (n_tiles,) row gathers and every test is dense (n_tiles, tile)
    elementwise VPU math — no per-ray gathers at all. Coherent tiles
    (camera rays, pixel-ordered batches) traverse near-optimal node sets;
    incoherent tiles degrade gracefully toward a full sweep.

    Returns (t, u, v, face_id, valid), each (B,).
    """
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    B = origins.shape[0]
    L = tracer.leaf_size
    n_nodes = tracer.n_nodes
    P = tracer.tris.shape[0]

    pad = (-B) % tile
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                    (pad, 3))], 0)
    nt = (B + pad) // tile
    o = origins.reshape(nt, tile, 3)
    d = dirs.reshape(nt, tile, 3)
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / d_safe

    def step(cur, t_best, uvi_best):
        active = cur > 0                               # (nt,)
        node = jnp.clip(cur - 1, 0, n_nodes - 1)
        nd = tracer.nodes[node]                        # (nt, 8)
        bmin = nd[:, None, 0:3]
        bmax = nd[:, None, 3:6]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tlo = jnp.max(jnp.minimum(t0, t1), axis=-1)    # (nt, tile)
        thi = jnp.min(jnp.maximum(t0, t1), axis=-1)
        lane_hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo <= t_best)
        any_hit = jnp.any(lane_hit, axis=-1) & active  # (nt,)

        desc = nd[:, 7]
        is_leaf = desc <= 0
        do_leaf = any_hit & is_leaf
        leaf_base = jnp.where(do_leaf, (-desc).astype(jnp.int32), 0)

        for k in range(L):
            row = tracer.tris[jnp.clip(leaf_base + k, 0, P - 1)]  # (nt, 12)
            t, u, v, hit = _moller_trumbore(
                o, d, row[:, None, 0:3], row[:, None, 3:6], row[:, None, 6:9]
            )                                          # (nt, tile)
            fid = row[:, 9]
            hit = hit & (fid >= 0)[:, None] & do_leaf[:, None] \
                & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            uvi_best = jnp.where(
                hit[..., None],
                jnp.stack([u, v, jnp.broadcast_to(fid[:, None], u.shape)],
                          -1),
                uvi_best)

        descend = any_hit & ~is_leaf
        nxt = jnp.where(descend, desc.astype(jnp.int32),
                        nd[:, 6].astype(jnp.int32))
        cur = jnp.where(active, nxt, 0)
        return cur, t_best, uvi_best

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        cur, t_best, uvi_best = state
        for _ in range(4):
            cur, t_best, uvi_best = step(cur, t_best, uvi_best)
        return cur, t_best, uvi_best

    state0 = (
        jnp.ones((nt,), jnp.int32),
        jnp.full((nt, tile), T_MISS, jnp.float32),
        jnp.concatenate([jnp.zeros((nt, tile, 2), jnp.float32),
                         jnp.full((nt, tile, 1), -1.0, jnp.float32)], -1),
    )
    cur, t, uvi = jax.lax.while_loop(cond, body, state0)
    t = t.reshape(-1)[:B]
    uvi = uvi.reshape(-1, 3)[:B]
    face = uvi[:, 2].astype(jnp.int32)
    valid = face >= 0
    return t, uvi[:, 0], uvi[:, 1], face, valid


def ray_trace_tiled_ordered(tracer: Tracer, origins: jnp.ndarray,
                            dirs: jnp.ndarray, tile: int = 1024,
                            stack_depth: int | None = None):
    """Union traversal with a per-tile stack and near-child-first ordering.

    Like ray_trace_tiled, but instead of the fixed preorder walk each tile
    keeps a small explicit stack and descends into the child whose box the
    tile's rays hit nearer on average — closest hits are found earlier and
    t-pruning culls far subtrees, cutting union path length on large trees.
    Stack state is (n_tiles, depth): all gathers stay per-tile. The stack
    is sized from the tree's measured depth (occupancy bound depth + 1,
    see pallas_intersect._auto_stack_depth) so the overflow clamp below
    never drops subtrees on skewed SAH trees.
    """
    if stack_depth is None:
        # single source of truth for the depth+4 headroom, 64 fallback,
        # and the degenerate-tree guard
        from iris_tpu.geometry.pallas_intersect import _auto_stack_depth
        stack_depth = _auto_stack_depth(tracer, None)
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    B = origins.shape[0]
    L = tracer.leaf_size
    n_nodes = tracer.n_nodes
    P = tracer.tris.shape[0]

    pad = (-B) % tile
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                    (pad, 3))], 0)
    nt = (B + pad) // tile
    o = origins.reshape(nt, tile, 3)
    d = dirs.reshape(nt, tile, 3)
    d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    inv_d = 1.0 / d_safe

    def box_hit(nd, t_best):
        bmin = nd[:, None, 0:3]
        bmax = nd[:, None, 3:6]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tlo = jnp.max(jnp.minimum(t0, t1), axis=-1)
        thi = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo <= t_best)
        return hit, jnp.where(hit, tlo, T_MISS)

    def step(state):
        stack, sp, t_best, uvi_best = state
        alive = sp > 0
        sp_new = jnp.maximum(sp - 1, 0)
        node0 = stack[jnp.arange(nt), sp_new]          # (nt,) popped (0-based)
        node = jnp.clip(node0, 0, n_nodes - 1)
        nd = tracer.nodes[node]
        desc = nd[:, 7]
        is_leaf = desc <= 0
        # pop-time pruning: skip subtrees now beyond every lane's t_best
        pop_hit, _ = box_hit(nd, t_best)
        active = alive & jnp.any(pop_hit, axis=-1)

        # leaf processing
        do_leaf = active & is_leaf
        leaf_base = jnp.where(do_leaf, (-desc).astype(jnp.int32), 0)
        for k in range(L):
            row = tracer.tris[jnp.clip(leaf_base + k, 0, P - 1)]
            t, u, v, hit = _moller_trumbore(
                o, d, row[:, None, 0:3], row[:, None, 3:6],
                row[:, None, 6:9])
            fid = row[:, 9]
            hit = hit & (fid >= 0)[:, None] & do_leaf[:, None] & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            uvi_best = jnp.where(
                hit[..., None],
                jnp.stack([u, v, jnp.broadcast_to(fid[:, None], u.shape)],
                          -1),
                uvi_best)

        # internal: test children, push far then near among those hit
        child_l = jnp.clip(desc.astype(jnp.int32) - 1, 0, n_nodes - 1)
        # right sibling = left child's skip pointer (preorder invariant)
        child_r = jnp.clip(
            tracer.nodes[child_l][:, 6].astype(jnp.int32) - 1,
            0, n_nodes - 1)
        do_int = active & ~is_leaf
        hit_l, tlo_l = box_hit(tracer.nodes[child_l], t_best)
        hit_r, tlo_r = box_hit(tracer.nodes[child_r], t_best)
        nl = jnp.sum(hit_l & do_int[:, None], axis=-1)
        nr = jnp.sum(hit_r & do_int[:, None], axis=-1)
        any_l = (nl > 0)
        any_r = (nr > 0)
        # near = child hit by more lanes at smaller mean entry t
        mean_l = jnp.sum(jnp.where(hit_l, tlo_l, 0.0), -1) / jnp.maximum(
            nl, 1)
        mean_r = jnp.sum(jnp.where(hit_r, tlo_r, 0.0), -1) / jnp.maximum(
            nr, 1)
        l_near = jnp.where(any_l & any_r, mean_l <= mean_r, any_l)

        far = jnp.where(l_near, child_r, child_l)
        near = jnp.where(l_near, child_l, child_r)
        far_ok = do_int & any_l & any_r
        near_ok = do_int & (any_l | any_r)

        idx = jnp.arange(nt)
        sp1 = sp_new
        stack = stack.at[idx, jnp.minimum(sp1, stack_depth - 1)].set(
            jnp.where(far_ok, far, stack[idx, jnp.minimum(sp1,
                                                          stack_depth - 1)]))
        sp1 = sp1 + far_ok.astype(jnp.int32)
        stack = stack.at[idx, jnp.minimum(sp1, stack_depth - 1)].set(
            jnp.where(near_ok, near, stack[idx, jnp.minimum(
                sp1, stack_depth - 1)]))
        sp1 = sp1 + near_ok.astype(jnp.int32)
        return stack, sp1, t_best, uvi_best

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        for _ in range(2):
            state = step(state)
        return state

    stack0 = jnp.zeros((nt, stack_depth), jnp.int32)
    state0 = (
        stack0,
        jnp.ones((nt,), jnp.int32),     # stack holds root (0-based node 0)
        jnp.full((nt, tile), T_MISS, jnp.float32),
        jnp.concatenate([jnp.zeros((nt, tile, 2), jnp.float32),
                         jnp.full((nt, tile, 1), -1.0, jnp.float32)], -1),
    )
    _, _, t, uvi = jax.lax.while_loop(cond, body, state0)
    t = t.reshape(-1)[:B]
    uvi = uvi.reshape(-1, 3)[:B]
    face = uvi[:, 2].astype(jnp.int32)
    valid = face >= 0
    return t, uvi[:, 0], uvi[:, 1], face, valid


def _spread8(v: jnp.ndarray) -> jnp.ndarray:
    """Interleave the low 8 bits of v into every 3rd bit (Morton spread)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def spatial_sort_perm(tracer: Tracer, xs: jnp.ndarray, ds: jnp.ndarray
                      ) -> jnp.ndarray:
    """In-jit ray-coherence permutation: direction octant (3 bits) then
    8-bit-per-axis origin Morton code, one u32 sort key. Secondary/bounce
    rays arrive scrambled; sorting them keeps the union-traversal tiles
    coherent (measured 2-3x traversal on incoherent sets, PERF.md).

    Device-side twin of data/datasets.sort_rays_spatially (host numpy,
    used by RayBatcher); keep their key structure in sync."""
    lo = tracer.nodes[0, 0:3]
    hi = tracer.nodes[0, 3:6]
    key = jnp.zeros(xs.shape[0], jnp.uint32)
    octant = jnp.zeros(xs.shape[0], jnp.uint32)
    for c in range(3):
        o = jnp.clip((xs[:, c] - lo[c])
                     / jnp.maximum(hi[c] - lo[c], 1e-9), 0.0, 1.0)
        key = key | (_spread8((o * 255.0).astype(jnp.uint32)) << c)
        octant = octant | ((ds[:, c] > 0).astype(jnp.uint32) << c)
    return jnp.argsort((octant << jnp.uint32(24)) | key)


def _pallas_mode(tracer: Tracer, n_rays: int) -> str | None:
    """Auto-select the fused Mosaic traversal kernel (device-measured,
    PERF.md round 2): it beats the XLA union walk at EVERY measured scene
    size — 1.25-2.7x coherent, 1.5-4x incoherent — so any TPU-backed
    call with a reasonably large batch uses it. Returns 'resident' (BVH
    fits VMEM), 'streamed' (HBM-windowed DMA, needs the preorder SAH
    layout), or None (XLA path). Escape hatch: IRIS_TPU_NO_PALLAS=1;
    TPU backend only (CPU tests keep XLA)."""
    import os

    if os.environ.get("IRIS_TPU_NO_PALLAS"):
        return None
    if n_rays < 8192:
        return None
    try:
        from iris_tpu.geometry.pallas_intersect import (
            paired_available, pallas_available, pallas_streamable)

        import jax as _jax

        dev = _jax.config.jax_default_device
        if dev is not None and getattr(dev, "platform", "") == "cpu":
            return None       # CPU-pinned runs (tests) keep the XLA path
        if _jax.default_backend() == "cpu":
            return None
        from iris_tpu.geometry.pallas_intersect import dense_available

        dense_pref = os.environ.get("IRIS_TPU_DENSE", "auto")
        paired_pref = os.environ.get("IRIS_TPU_PAIRED", "auto")
        if dense_pref == "1" and dense_available(tracer):
            return "dense"              # explicit A/B escape hatch
        if paired_pref != "0" and paired_available(tracer):
            # Device A/B (PERF.md round-3a): the packed sibling-pair kernel
            # beats ordered 1.3-1.5x on >=5K-face trees (1 dynamic VMEM
            # read per visited pair vs 3 per node) and its ~3x smaller
            # staged layout covers trees the (N,8)/(P,12) resident gate
            # rejects. Small trees keep the plain union kernel (cheap full
            # sweep, 1 slab/step) unless forced with IRIS_TPU_PAIRED=1.
            if (paired_pref == "1" or tracer.n_faces >= 5000
                    or not pallas_available(tracer)):
                return "paired"
        # Past the paired-resident gate, the near-first paired traversal
        # through HBM windows beats the lane-dense resident kernel at
        # EVERY same-timer-measured size — 42K faces: 196.8 vs 204.4 ms
        # full step, 72K: 236.0 vs 257.2 (records/window_policy_r5.log;
        # dense ran FIRST in that shared process, so the known arm-2 slow
        # bias can only understate the ps win), 102K: 292.8 vs 316.3
        # (records/policy102k_scan_r4.log) — so paired_streamed now
        # outranks dense in auto mode (round-5 policy fix, VERDICT item
        # 3). dense stays one flag away (IRIS_TPU_DENSE=1) for A/Bs.
        from iris_tpu.geometry.pallas_intersect import (
            dense_streamed_available, paired_streamed_available)

        if (not paired_available(tracer)
                and os.environ.get("IRIS_TPU_PAIRED_STREAMED", "auto")
                != "0" and paired_streamed_available(tracer)):
            return "paired_streamed"
        if dense_pref != "0" and dense_available(tracer):
            # the lane-dense layout (PAIR_PACK pairs + LEAF_PACK leaves per
            # 128-lane row) stages ~10x less VMEM than (N,8)/(P,12) and
            # ~3x less than paired (device-measured 1.15x coherent / 13x
            # incoherent over the PLAIN streamed kernel at 24K faces,
            # PERF.md round-3b) — reached in auto mode only when the
            # paired-streamed gate rejects the tracer (leaf rows > 128
            # lanes or a non-preorder layout)
            if not paired_available(tracer):
                return "dense"
        if pallas_available(tracer):
            return "resident"
        if pallas_streamable(tracer):
            # beyond every resident gate (IRIS_TPU_PAIRED_STREAMED=0
            # restores the plain streamed kernel for A/B).
            # IRIS_TPU_DENSE_STREAMED=1 opts into the dense-packed
            # streamed kernel (8 pairs / 2 leaves per DMA'd 128-lane row,
            # ~8x fewer HBM bytes on DMA-bound walks) — opt-in until
            # device-A/B'd.
            if (os.environ.get("IRIS_TPU_DENSE_STREAMED", "0") == "1"
                    and dense_streamed_available(tracer)):
                return "dense_streamed"
            if (os.environ.get("IRIS_TPU_PAIRED_STREAMED", "auto") != "0"
                    and paired_streamed_available(tracer)):
                return "paired_streamed"
            return "streamed"
        return None
    except Exception:
        return None


def ray_intersect(tracer: Tracer, xs: jnp.ndarray, ds: jnp.ndarray,
                  tile: int | None = 1024, sort: bool = False):
    """Reference-parity wrapper (utils/path_tracing.py:17-48).

    Args:
        xs: (B, 3) ray origins.  ds: (B, 3) ray directions.
        tile: union-traversal tile width (None = per-ray traversal).
        sort: hint that the rays are spatially INCOHERENT (secondary /
            bounce rays). Whether a spatial re-sort actually happens is a
            per-path perf decision (device-measured, PERF.md): the Pallas
            union kernel sorts on big trees (4.6x there), small trees and
            the XLA ordered walk never sort (net loss in both).
    Returns:
        positions (B,3), normals (B,3) unit & viewer-facing, uvs (B,2),
        idx (B,) original face index (-1 = miss), valid (B,) bool.
    """
    mode = _pallas_mode(tracer, xs.shape[0])
    perm = None
    if mode and tile and sort and tracer.n_faces >= 5000:
        perm = spatial_sort_perm(tracer, xs, ds)
        xs_t, ds_t = xs[perm], ds[perm]
    else:
        xs_t, ds_t = xs, ds
    if mode and tile:
        from iris_tpu.geometry.pallas_intersect import (
            pallas_ray_trace, pallas_ray_trace_dense,
            pallas_ray_trace_dense_streamed, pallas_ray_trace_ordered,
            pallas_ray_trace_paired, pallas_ray_trace_paired_streamed,
            pallas_ray_trace_streamed)

        if mode == "dense_streamed":
            t, u, v, face, valid = pallas_ray_trace_dense_streamed(
                tracer, xs_t, ds_t, tile=8192)
        elif mode == "paired_streamed":
            t, u, v, face, valid = pallas_ray_trace_paired_streamed(
                tracer, xs_t, ds_t, tile=8192)
        elif mode == "streamed":
            t, u, v, face, valid = pallas_ray_trace_streamed(
                tracer, xs_t, ds_t, tile=8192)
        elif mode == "dense":
            t, u, v, face, valid = pallas_ray_trace_dense(
                tracer, xs_t, ds_t, tile=8192)
        elif mode == "paired":
            t, u, v, face, valid = pallas_ray_trace_paired(
                tracer, xs_t, ds_t, tile=8192)
        elif tracer.n_faces >= 5000 and tracer.layout == "preorder":
            # big resident trees: the near-first pruned kernel wins
            # (coherent 1.75x, realistic bounce 1.27x vs plain union;
            # PERF.md round-2 probes)
            t, u, v, face, valid = pallas_ray_trace_ordered(
                tracer, xs_t, ds_t, tile=8192)
        else:
            # small trees: the union sweep is already cheap; the plain
            # kernel's 1 slab/step beats ordered's 3 (9.9 vs 9.7 / 8.2
            # vs 7.1 Mrays/s at 398 faces)
            t, u, v, face, valid = pallas_ray_trace(
                tracer, xs_t, ds_t, tile=16384)
    elif tile:
        t, u, v, face, valid = ray_trace_tiled_ordered(tracer, xs_t, ds_t,
                                                       tile)
    else:
        t, u, v, face, valid = ray_trace(tracer, xs_t, ds_t)
    if perm is not None:
        b = xs.shape[0]
        inv = jnp.zeros(b, jnp.int32).at[perm].set(
            jnp.arange(b, dtype=jnp.int32))
        t, u, v, face, valid = (t[inv], u[inv], v[inv], face[inv],
                                valid[inv])
    # geometric normal from the original face id requires the packed row of
    # that face: build an id -> packed-row map once per tracer (host side it
    # is the inverse Morton permutation; here recover via gather of tris by
    # searching is avoided — we store normals per packed row and look up by
    # face through the permutation captured at build time).
    n = _face_normal(tracer, face, valid)
    n = double_sided(-ds, n)
    n = jnp.where(valid[:, None], n, 0.0)
    pos = jnp.where(valid[:, None], xs + t[:, None] * ds, 0.0)
    uv = jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0)
    idx = jnp.where(valid, face, -1)
    return pos, n, uv, idx, valid


def _face_normal(tracer: Tracer, face: jnp.ndarray, valid: jnp.ndarray):
    """Unit geometric normal per original face id (gather from the
    precomputed per-face normal table)."""
    safe = jnp.clip(face, 0, tracer.face_normals.shape[0] - 1)
    return tracer.face_normals[safe]


def ray_intersect_brute(triangles: jnp.ndarray, xs: jnp.ndarray, ds: jnp.ndarray):
    """O(B*F) reference intersector for tests: triangles (F,3,3)."""
    v0 = triangles[:, 0]
    e1 = triangles[:, 1] - triangles[:, 0]
    e2 = triangles[:, 2] - triangles[:, 0]
    t, u, v, hit = _moller_trumbore(
        xs[:, None, :], ds[:, None, :], v0[None], e1[None], e2[None]
    )
    t = jnp.where(hit, t, T_MISS)
    k = jnp.argmin(t, axis=-1)
    t_k = jnp.take_along_axis(t, k[:, None], -1)[:, 0]
    valid = jnp.take_along_axis(hit, k[:, None], -1)[:, 0]
    u_k = jnp.take_along_axis(u, k[:, None], -1)[:, 0]
    v_k = jnp.take_along_axis(v, k[:, None], -1)[:, 0]
    n = normalize(jnp.cross(e1, e2))[k]
    n = double_sided(-ds, n)
    n = jnp.where(valid[:, None], n, 0.0)
    pos = jnp.where(valid[:, None], xs + t_k[:, None] * ds, 0.0)
    idx = jnp.where(valid, k.astype(jnp.int32), -1)
    uv = jnp.where(valid[:, None], jnp.stack([u_k, v_k], -1), 0.0)
    return pos, n, uv, idx, valid
