"""Pallas TPU kernel for the tiled union BVH traversal.

Same algorithm as geometry/intersect.ray_trace_tiled — one traversal cursor
per tile of rays, walking the union of the tile's BVH paths — but fused
into a single Mosaic kernel: the cursor is a scalar loop carry, node and
leaf rows are scalar-indexed VMEM slices, and every lane op is a (1, TILE)
vector on the VPU. This removes the XLA while-loop per-iteration overhead
and the (n_tiles,) gathers of the XLA formulation.

v1 keeps the whole BVH resident in VMEM (nodes + padded tris <= ~12 MB,
i.e. meshes up to roughly 150K faces); larger scenes fall back to the XLA
path (geometry/intersect.py). HBM-streaming nodes via scalar-indexed DMA is
the planned extension for bigger meshes.

Layout contract shared with bvh.py: nodes (N, 8) = [min, max, skip, desc],
tris (P, 12) = [v0, e1, e2, face_id, pad].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iris_tpu.geometry.bvh import Tracer

T_MISS = 3e37
_MT_EPS = 1e-9


# --------------------------------------------------------------------------
# Shared kernel building blocks (round-4 dedup of the 7-kernel family).
# Every kernel composes the same lane-vector primitives; only traversal
# order, BVH row layout, and memory staging differ. The helpers are
# Python-level extraction: they trace to the SAME jaxpr the inlined copies
# produced, so compiled kernels (and their compile-cache entries and
# device A/B numbers) are unchanged by construction.

def _ray_ctx(rays_ref):
    """Unpack the (8, TILE) ray block into lane vectors + safe reciprocal
    directions: [ox oy oz dx dy dz pad pad] rows."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    def safe(v):
        return jnp.where(jnp.abs(v) < 1e-12, 1e-12, v)

    ix = 1.0 / safe(dx)
    iy = 1.0 / safe(dy)
    iz = 1.0 / safe(dz)
    return ox, oy, oz, dx, dy, dz, ix, iy, iz


def _make_slab(ox, oy, oz, ix, iy, iz, with_tlo=False):
    """Lane-vector AABB slab test against scalar bounds. with_tlo also
    returns the entry distance (near-first kernels order children by it)."""

    def slab(n0, n1, n2, n3, n4, n5, t_best):
        tx0 = (n0 - ox) * ix
        tx1 = (n3 - ox) * ix
        ty0 = (n1 - oy) * iy
        ty1 = (n4 - oy) * iy
        tz0 = (n2 - oz) * iz
        tz1 = (n5 - oz) * iz
        tlo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                      jnp.minimum(ty0, ty1)),
                          jnp.minimum(tz0, tz1))
        thi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo <= t_best)
        if with_tlo:
            return hit, tlo
        return hit

    return slab


def _mt_fold(tri, fid, hit, rays, state):
    """Moller-Trumbore: ONE scalar triangle (v0, e1, e2 components) against
    the lane ray vectors, folded into the per-lane best-hit state under
    `hit` (the enclosing box/leaf mask) and the standard validity clause."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri
    ox, oy, oz, dx, dy, dz = rays
    t_best, u_b, v_b, f_b = state
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > _MT_EPS, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > _MT_EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > 0.0) & (fid >= 0.0)
          & hit & (t < t_best))
    t_best = jnp.where(ok, t, t_best)
    u_b = jnp.where(ok, u, u_b)
    v_b = jnp.where(ok, v, v_b)
    f_b = jnp.where(ok, fid, f_b)
    return t_best, u_b, v_b, f_b


def _pack_rays(origins, dirs, tile):
    """Host side: pad B rays to a tile multiple and pack 8 rows per tile
    ([ox oy oz dx dy dz 0 0] — Mosaic requires sublane-divisible blocks).
    Returns (rays (nt*8, tile), nt, B)."""
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    B = origins.shape[0]
    pad = (-B) % tile
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                    (pad, 3))], 0)
    nt = (B + pad) // tile
    o = origins.reshape(nt, tile, 3)
    d = dirs.reshape(nt, tile, 3)
    rays = jnp.concatenate([
        jnp.swapaxes(o, 1, 2), jnp.swapaxes(d, 1, 2),
        jnp.zeros((nt, 2, tile)),
    ], axis=1).reshape(nt * 8, tile)
    return rays, nt, B


def _run_chunked(rays, nt, tile, max_rays_per_call, call):
    """Host side: cap each pallas_call at max_rays_per_call rays — this
    backend stages the ENTIRE in/out of a tpu_custom_call in scoped VMEM
    (measured: 16 MB OOM at 262K rays regardless of grid blocking) — via
    an UNROLLED python loop, not lax.map (the map's stacked accumulator
    gets VMEM-pinned next to the custom call; separate sequential calls
    keep only ~2 MB live at once)."""
    chunk_nt = max(1, max_rays_per_call // tile)
    if nt <= chunk_nt:
        return call(rays)
    n_super = -(-nt // chunk_nt)
    pad_t = n_super * chunk_nt - nt
    rays = rays.reshape(nt, 8, tile)
    if pad_t:
        filler = jnp.zeros((pad_t, 8, tile), rays.dtype)
        filler = filler.at[:, 5].set(1.0)   # dz=1 dummy rays
        rays = jnp.concatenate([rays, filler], 0)
    parts = [call(rays[s * chunk_nt:(s + 1) * chunk_nt].reshape(
        chunk_nt * 8, tile)) for s in range(n_super)]
    return jnp.concatenate(
        [p.reshape(chunk_nt, 8, tile) for p in parts], 0
    )[:nt].reshape(nt * 8, tile)


def _unpack_out(out, nt, tile, B):
    """Host side: (nt*8, tile) result rows -> (t, u, v, face_id, valid)."""
    out = out.reshape(nt, 8, tile)
    t = out[:, 0].reshape(-1)[:B]
    u = out[:, 1].reshape(-1)[:B]
    v = out[:, 2].reshape(-1)[:B]
    face = out[:, 3].reshape(-1)[:B].astype(jnp.int32)
    valid = face >= 0
    return t, u, v, face, valid



def _kernel(rays_ref, nodes_ref, tris_ref, out_ref, *, leaf_size: int,
            n_nodes: int):
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz)

    def body(state):
        cur, t_best, u_b, v_b, f_b = state
        node = jnp.clip(cur - 1, 0, n_nodes - 1)
        nd = nodes_ref[pl.ds(node, 1), :]            # (1, 8)
        hit = slab(nd[0, 0], nd[0, 1], nd[0, 2], nd[0, 3], nd[0, 4],
                   nd[0, 5], t_best)
        any_hit = jnp.any(hit)
        desc = nd[0, 7]
        is_leaf = desc <= 0.0

        def leaf_case(args):
            t_best, u_b, v_b, f_b = args
            base = (-desc).astype(jnp.int32)
            for k in range(leaf_size):
                row = tris_ref[pl.ds(jnp.clip(base + k, 0,
                                              tris_ref.shape[0] - 1), 1), :]
                v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
                e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
                e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
                fid = row[0, 9]
                # Moller-Trumbore with scalar triangle, vector rays
                t_best, u_b, v_b, f_b = _mt_fold(
                    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                    fid, hit, (ox, oy, oz, dx, dy, dz),
                    (t_best, u_b, v_b, f_b))
            return t_best, u_b, v_b, f_b

        t_best, u_b, v_b, f_b = jax.lax.cond(
            any_hit & is_leaf, leaf_case, lambda a: a,
            (t_best, u_b, v_b, f_b))

        descend = any_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, desc, nd[0, 6]).astype(jnp.int32)
        return nxt, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    # 8 rows per tile (Mosaic requires sublane-divisible blocks): 4 results
    # + 4 zero pad rows
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call"))
def pallas_ray_trace(tracer: Tracer, origins: jnp.ndarray,
                     dirs: jnp.ndarray, tile: int = 1024,
                     interpret: bool = False,
                     max_rays_per_call: int = 1 << 16):
    """Returns (t, u, v, face_id, valid), each (B,)."""
    rays, nt, B = _pack_rays(origins, dirs, tile)

    kernel = functools.partial(_kernel, leaf_size=tracer.leaf_size,
                               n_nodes=tracer.n_nodes)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            interpret=interpret,
        )(rays_chunk, tracer.nodes, tracer.tris)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def _kernel_streamed(rays_ref, nodes_hbm, tris_hbm, out_ref,
                     node_buf, tri_buf, nsem, tsem, *, leaf_size: int,
                     n_nodes: int, node_win: int, tri_win: int):
    """Union traversal with the BVH left in HBM: node/leaf rows are
    DMA'd into VMEM in `node_win`/`tri_win`-row windows on demand.

    Requires a PREORDER tree (bvh.py layout="preorder", the SAH builder):
    both the node cursor and the leaf triangle base are strictly
    increasing along any traversal, so windows advance monotonically —
    each window is fetched at most once per tile walk.

    Layout: Mosaic DMA slices of HBM buffers must be 128-lane aligned, so
    the caller re-packs the BVH into 128-wide rows — one node per row
    (8 floats used) and one whole leaf per row (leaf_size*12 floats used).
    Every in-kernel lane offset is then STATIC; only sublane indices are
    dynamic (which VMEM supports).
    """
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz)

    def body(state):
        cur, nwin, twin, t_best, u_b, v_b, f_b = state
        node = jnp.clip(cur - 1, 0, n_nodes - 1)
        tgt_nwin = node // node_win

        @pl.when(tgt_nwin != nwin)
        def _():
            cp = pltpu.make_async_copy(
                nodes_hbm.at[pl.ds(tgt_nwin * node_win, node_win), :],
                node_buf, nsem)
            cp.start()
            cp.wait()

        nd = node_buf[pl.ds(node - tgt_nwin * node_win, 1), :]
        hit = slab(nd[0, 0], nd[0, 1], nd[0, 2], nd[0, 3], nd[0, 4],
                   nd[0, 5], t_best)
        any_hit = jnp.any(hit)
        desc = nd[0, 7]
        is_leaf = desc <= 0.0
        do_leaf = any_hit & is_leaf
        # -desc is the first padded-triangle row; rows are leaf_size-
        # aligned, so the leaf ordinal (= packed 128-wide row) is exact
        leaf_idx = (-desc).astype(jnp.int32) // leaf_size
        tgt_twin = jnp.where(do_leaf, leaf_idx // tri_win, twin)

        @pl.when(tgt_twin != twin)
        def _():
            cp = pltpu.make_async_copy(
                tris_hbm.at[pl.ds(tgt_twin * tri_win, tri_win), :],
                tri_buf, tsem)
            cp.start()
            cp.wait()

        def leaf_case(args):
            t_best, u_b, v_b, f_b = args
            local = jnp.clip(leaf_idx - tgt_twin * tri_win, 0, tri_win - 1)
            lf = tri_buf[pl.ds(local, 1), :]        # (1, 128): whole leaf
            for k in range(leaf_size):
                c = k * 12
                v0x, v0y, v0z = lf[0, c + 0], lf[0, c + 1], lf[0, c + 2]
                e1x, e1y, e1z = lf[0, c + 3], lf[0, c + 4], lf[0, c + 5]
                e2x, e2y, e2z = lf[0, c + 6], lf[0, c + 7], lf[0, c + 8]
                fid = lf[0, c + 9]
                t_best, u_b, v_b, f_b = _mt_fold(
                    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                    fid, hit, (ox, oy, oz, dx, dy, dz),
                    (t_best, u_b, v_b, f_b))
            return t_best, u_b, v_b, f_b

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_leaf, leaf_case, lambda a: a, (t_best, u_b, v_b, f_b))

        descend = any_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, desc, nd[0, 6]).astype(jnp.int32)
        return nxt, tgt_nwin, tgt_twin, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.int32(-1),      # no node window loaded
        jnp.int32(-1),      # no tri window loaded
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, _, _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "node_win", "tri_win"))
def pallas_ray_trace_streamed(tracer: Tracer, origins: jnp.ndarray,
                              dirs: jnp.ndarray, tile: int = 8192,
                              interpret: bool = False,
                              max_rays_per_call: int = 1 << 16,
                              node_win: int = 512, tri_win: int = 512):
    """HBM-streamed variant of pallas_ray_trace for BVHs too big for VMEM
    (>~150K faces). Returns (t, u, v, face_id, valid), each (B,).

    HBM cost: the 128-wide re-pack (see _kernel_streamed) stores 512 B per
    node and per leaf — ~0.7 MB per 1K faces at leaf_size=4; a 1M-face
    scene streams from ~700 MB of HBM. `node_win`/`tri_win` count 128-wide
    rows (nodes / whole leaves); each window is a 256 KB VMEM buffer at
    the 512 default."""
    assert tracer.layout == "preorder", \
        "streamed traversal needs the preorder (SAH) node layout"
    assert tracer.leaf_size * 12 <= 128, "leaf row exceeds one 128-lane row"
    rays, nt, B = _pack_rays(origins, dirs, tile)

    # 128-wide re-pack (Mosaic HBM DMA slices must be 128-lane aligned):
    # one node per row, one whole leaf per row; pad to whole windows
    nodes = jnp.pad(tracer.nodes, ((0, (-tracer.nodes.shape[0]) % node_win),
                                   (0, 120)))
    L = tracer.leaf_size
    n_leaves = tracer.tris.shape[0] // L
    leaves = tracer.tris.reshape(n_leaves, L * 12)
    lpad = (-n_leaves) % tri_win
    leaves = jnp.pad(leaves, ((0, lpad), (0, 128 - L * 12)))
    if lpad:
        # padded leaves must never report a hit: face_id lanes -> -1
        fid_mask = jnp.zeros((lpad, 128), leaves.dtype)
        fid_mask = fid_mask.at[:, [k * 12 + 9 for k in range(L)]].set(-1.0)
        leaves = leaves.at[n_leaves:].set(fid_mask)
    tris = leaves

    kernel = functools.partial(
        _kernel_streamed, leaf_size=tracer.leaf_size,
        n_nodes=tracer.n_nodes, node_win=node_win, tri_win=tri_win)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((node_win, 128), jnp.float32),
                pltpu.VMEM((tri_win, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(rays_chunk, nodes, tris)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def _kernel_ordered(rays_ref, nodes_ref, tris_ref, out_ref, stack_ref, *,
                    leaf_size: int, n_nodes: int, stack_depth: int):
    """Near-child-first union traversal with a per-tile stack (the Mosaic
    fusion of intersect.ray_trace_tiled_ordered): pop a node, prune it
    against the CURRENT t_best, descend into the child whose box the
    tile's rays enter nearer on average, push the far child. Early, close
    hits shrink t_best so pop-time pruning culls far subtrees — preorder
    union instead visits every box the tile touches in a fixed order.

    stack_ref is SMEM (scalar memory allows dynamic indexing); requires a
    preorder tree (right sibling = left child's skip pointer)."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    def slab(nd, t_best):
        tx0 = (nd[0, 0] - ox) * ix
        tx1 = (nd[0, 3] - ox) * ix
        ty0 = (nd[0, 1] - oy) * iy
        ty1 = (nd[0, 4] - oy) * iy
        tz0 = (nd[0, 2] - oz) * iz
        tz1 = (nd[0, 5] - oz) * iz
        tlo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                      jnp.minimum(ty0, ty1)),
                          jnp.minimum(tz0, tz1))
        thi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        hit = (thi >= jnp.maximum(tlo, 0.0)) & (tlo <= t_best)
        return hit, tlo

    def body(state):
        sp, t_best, u_b, v_b, f_b = state
        sp1 = sp - 1
        node = stack_ref[sp1]                       # 0-based
        nd = nodes_ref[pl.ds(node, 1), :]
        hit, _ = slab(nd, t_best)                   # pop-time pruning
        any_hit = jnp.any(hit)
        desc = nd[0, 7]
        is_leaf = desc <= 0.0
        do_leaf = any_hit & is_leaf

        def leaf_case(args):
            t_best, u_b, v_b, f_b = args
            base = (-desc).astype(jnp.int32)
            for k in range(leaf_size):
                row = tris_ref[pl.ds(jnp.clip(base + k, 0,
                                              tris_ref.shape[0] - 1), 1), :]
                v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
                e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
                e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
                fid = row[0, 9]
                t_best, u_b, v_b, f_b = _mt_fold(
                    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                    fid, hit, (ox, oy, oz, dx, dy, dz),
                    (t_best, u_b, v_b, f_b))
            return t_best, u_b, v_b, f_b

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_leaf, leaf_case, lambda a: a, (t_best, u_b, v_b, f_b))

        # internal: box-test both children, push far then near
        do_int = any_hit & jnp.logical_not(is_leaf)

        child_l = jnp.clip(desc.astype(jnp.int32) - 1, 0, n_nodes - 1)
        nd_l = nodes_ref[pl.ds(child_l, 1), :]
        # preorder invariant: right sibling = left child's skip pointer
        child_r = jnp.clip(nd_l[0, 6].astype(jnp.int32) - 1, 0, n_nodes - 1)
        nd_r = nodes_ref[pl.ds(child_r, 1), :]
        hit_l, tlo_l = slab(nd_l, t_best)
        hit_r, tlo_r = slab(nd_r, t_best)
        hit_l = hit_l & do_int
        hit_r = hit_r & do_int
        nl = jnp.sum(hit_l.astype(jnp.float32))
        nr = jnp.sum(hit_r.astype(jnp.float32))
        mean_l = jnp.sum(jnp.where(hit_l, tlo_l, 0.0)) / jnp.maximum(nl, 1.0)
        mean_r = jnp.sum(jnp.where(hit_r, tlo_r, 0.0)) / jnp.maximum(nr, 1.0)
        any_l = nl > 0.0
        any_r = nr > 0.0
        l_near = jnp.where(any_l & any_r, mean_l <= mean_r, any_l)
        far = jnp.where(l_near, child_r, child_l)
        near = jnp.where(l_near, child_l, child_r)
        push_far = any_l & any_r
        push_near = any_l | any_r

        sp2 = sp1

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp2, stack_depth - 1)] = far

        sp3 = sp2 + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[jnp.minimum(sp3, stack_depth - 1)] = near

        sp4 = jnp.minimum(sp3 + push_near.astype(jnp.int32), stack_depth)
        return sp4, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    stack_ref[0] = jnp.int32(0)                     # root
    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


def _auto_stack_depth(tracer: Tracer, stack_depth: int | None) -> int:
    """Size the per-tile traversal stack from the tree's measured depth.

    Stack occupancy during near-first traversal is bounded by depth + 1
    (each pop pushes at most far+near and the near entry is popped next
    step), so tracer.depth + 4 makes the in-kernel overflow clamp
    unreachable — a fixed 64 silently DROPS subtrees (false misses) once
    a skewed SAH tree exceeds 64 both-children-hit levels. depth == 0
    (legacy tracer built before the field existed): keep the old 64."""
    if stack_depth is not None:
        return stack_depth
    if not tracer.depth:
        return 64
    d = max(64, tracer.depth + 4)
    if d > 32768:
        # not an assert: under python -O this must still fail host-side
        # instead of shipping a huge SMEM request to the remote compiler
        raise ValueError(
            f"degenerate BVH (depth {tracer.depth}): traversal stack would "
            f"need {d} SMEM words — rebuild with a saner leaf_size/split")
    return d


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "stack_depth"))
def pallas_ray_trace_ordered(tracer: Tracer, origins: jnp.ndarray,
                             dirs: jnp.ndarray, tile: int = 8192,
                             interpret: bool = False,
                             max_rays_per_call: int = 1 << 16,
                             stack_depth: int | None = None):
    """Near-first + pop-time-pruned variant of pallas_ray_trace (VMEM-
    resident BVH, preorder layout required). Same results as the other
    kernels; faster where early close hits let pruning bite.
    Returns (t, u, v, face_id, valid), each (B,)."""
    assert tracer.layout == "preorder", \
        "ordered traversal needs the preorder (SAH) node layout"
    stack_depth = _auto_stack_depth(tracer, stack_depth)
    rays, nt, B = _pack_rays(origins, dirs, tile)

    kernel = functools.partial(_kernel_ordered, leaf_size=tracer.leaf_size,
                               n_nodes=tracer.n_nodes,
                               stack_depth=stack_depth)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_depth,), jnp.int32),
            ],
            interpret=interpret,
        )(rays_chunk, tracer.nodes, tracer.tris)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def _pack_paired(tracer: Tracer, n_pairs: int, n_leaf_rows: int):
    """Re-pack a preorder BVH into the PAIRED layout (traceable jnp; runs
    inside the jitted trace call and is CSE'd by XLA across traversals).

    Mosaic stages f32 VMEM operands as (8, 128) tiles, so the narrow
    (N, 8) node and (P, 12) triangle rows lane-pad 16x / 10.7x (see
    vmem_bytes). The paired layout fills the 128 lanes with useful data:

    - ``pairs`` (R, 128): row r holds BOTH children of internal node r
      (r = preorder rank among internal nodes): lanes 0-5 left child
      min/max, lane 6 its desc', lanes 8-13 right child min/max, lane 14
      its desc'. desc' > 0 -> internal child, its own pair row is
      desc'-1; desc' <= 0 -> leaf child, its leaf row is -desc'.
    - ``leaves`` (P/L, 128): one WHOLE leaf per row (leaf_size*12 lanes,
      the streamed kernel's packing).

    Net: ~3x smaller staged VMEM than the (N,8)/(P,12) resident layout
    and one dynamic sublane read per visited pair instead of three
    (node + 2 children) in _kernel_ordered.
    """
    nodes = tracer.nodes
    n = tracer.n_nodes
    L = tracer.leaf_size
    desc = nodes[:, 7]
    internal = desc > 0.0
    pair_id = jnp.cumsum(internal.astype(jnp.int32)) - 1
    c_l = jnp.clip(desc.astype(jnp.int32) - 1, 0, n - 1)
    # preorder invariant: right sibling = left child's skip pointer
    c_r = jnp.clip(nodes[c_l, 6].astype(jnp.int32) - 1, 0, n - 1)

    def child_desc(c):
        dc = desc[c]
        # leaf rows are leaf_size-aligned -> exact integer division
        leaf_row = (-dc) / float(L)
        return jnp.where(dc > 0.0, (pair_id[c] + 1).astype(jnp.float32),
                         -leaf_row)

    row = jnp.concatenate([
        nodes[c_l, 0:6], child_desc(c_l)[:, None],
        jnp.zeros((n, 1), jnp.float32),
        nodes[c_r, 0:6], child_desc(c_r)[:, None],
        jnp.zeros((n, 1), jnp.float32),
    ], axis=1)                                       # (N, 16)
    row = jnp.pad(row, ((0, 0), (0, 112)))
    tgt = jnp.where(internal, pair_id, n_pairs)      # drop non-internal
    pairs = jnp.zeros((n_pairs, 128), jnp.float32).at[tgt].set(
        row, mode="drop")
    pairs = jnp.pad(pairs, ((0, (-n_pairs) % 8), (0, 0)))

    leaves = tracer.tris.reshape(n_leaf_rows, L * 12)
    leaves = jnp.pad(leaves, ((0, (-n_leaf_rows) % 8), (0, 128 - L * 12)))
    return pairs, leaves


def _kernel_paired(rays_ref, pairs_ref, leaves_ref, out_ref, stack_ref, *,
                   leaf_size: int, n_pairs: int, n_leaf_rows: int,
                   stack_depth: int):
    """Near-child-first union traversal over the PAIRED layout (see
    _pack_paired): pop an internal node's pair row, slab-test both
    children against the CURRENT t_best (pop-time pruning at child
    granularity), intersect leaf children in place, push internal
    children far-then-near. One dynamic VMEM read per pair, one per
    visited leaf."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz, with_tlo=True)

    def leaf_hits(lrow, hit, args):
        t_best, u_b, v_b, f_b = args
        lf = leaves_ref[pl.ds(jnp.clip(lrow, 0, n_leaf_rows - 1), 1), :]
        for k in range(leaf_size):
            c = k * 12
            v0x, v0y, v0z = lf[0, c + 0], lf[0, c + 1], lf[0, c + 2]
            e1x, e1y, e1z = lf[0, c + 3], lf[0, c + 4], lf[0, c + 5]
            e2x, e2y, e2z = lf[0, c + 6], lf[0, c + 7], lf[0, c + 8]
            fid = lf[0, c + 9]
            t_best, u_b, v_b, f_b = _mt_fold(
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                fid, hit, (ox, oy, oz, dx, dy, dz),
                (t_best, u_b, v_b, f_b))
        return t_best, u_b, v_b, f_b

    def body(state):
        sp, t_best, u_b, v_b, f_b = state
        sp1 = sp - 1
        r = stack_ref[sp1]
        row = pairs_ref[pl.ds(r, 1), :]
        dl = row[0, 6]
        dr = row[0, 14]
        hit_l, tlo_l = slab(row[0, 0], row[0, 1], row[0, 2], row[0, 3],
                            row[0, 4], row[0, 5], t_best)
        hit_r, tlo_r = slab(row[0, 8], row[0, 9], row[0, 10], row[0, 11],
                            row[0, 12], row[0, 13], t_best)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        l_leaf = dl <= 0.0
        r_leaf = dr <= 0.0

        # leaf children first: their hits shrink t_best before the pushes
        t_best, u_b, v_b, f_b = jax.lax.cond(
            any_l & l_leaf,
            functools.partial(leaf_hits, (-dl).astype(jnp.int32), hit_l),
            lambda a: a, (t_best, u_b, v_b, f_b))
        t_best, u_b, v_b, f_b = jax.lax.cond(
            any_r & r_leaf,
            functools.partial(leaf_hits, (-dr).astype(jnp.int32), hit_r),
            lambda a: a, (t_best, u_b, v_b, f_b))

        pid_l = jnp.clip(dl.astype(jnp.int32) - 1, 0, n_pairs - 1)
        pid_r = jnp.clip(dr.astype(jnp.int32) - 1, 0, n_pairs - 1)
        want_l = any_l & jnp.logical_not(l_leaf)
        want_r = any_r & jnp.logical_not(r_leaf)
        nl = jnp.sum((hit_l & want_l).astype(jnp.float32))
        nr = jnp.sum((hit_r & want_r).astype(jnp.float32))
        mean_l = jnp.sum(jnp.where(hit_l & want_l, tlo_l, 0.0)) \
            / jnp.maximum(nl, 1.0)
        mean_r = jnp.sum(jnp.where(hit_r & want_r, tlo_r, 0.0)) \
            / jnp.maximum(nr, 1.0)
        l_near = jnp.where(want_l & want_r, mean_l <= mean_r, want_l)
        far = jnp.where(l_near, pid_r, pid_l)
        near = jnp.where(l_near, pid_l, pid_r)
        push_far = want_l & want_r
        push_near = want_l | want_r

        sp2 = sp1

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp2, stack_depth - 1)] = far

        sp3 = sp2 + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[jnp.minimum(sp3, stack_depth - 1)] = near

        sp4 = jnp.minimum(sp3 + push_near.astype(jnp.int32), stack_depth)
        return sp4, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    stack_ref[0] = jnp.int32(0)                     # root's children pair
    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "stack_depth"))
def pallas_ray_trace_paired(tracer: Tracer, origins: jnp.ndarray,
                            dirs: jnp.ndarray, tile: int = 8192,
                            interpret: bool = False,
                            max_rays_per_call: int = 1 << 16,
                            stack_depth: int | None = None):
    """Paired-layout variant of pallas_ray_trace_ordered: same near-first
    + pop-time-pruned traversal, but the VMEM-resident BVH is packed as
    sibling-pair rows + whole-leaf rows (~3x smaller staged footprint and
    1 dynamic read per pair instead of 3; see _pack_paired). Preorder
    layout required; root must be internal. Returns (t, u, v, face_id,
    valid), each (B,)."""
    assert tracer.layout == "preorder", \
        "paired traversal needs the preorder (SAH) node layout"
    assert tracer.leaf_size * 12 <= 128, "leaf row exceeds one 128-lane row"
    assert tracer.n_nodes > 1, "paired traversal needs an internal root"
    stack_depth = _auto_stack_depth(tracer, stack_depth)
    rays, nt, B = _pack_rays(origins, dirs, tile)

    L = tracer.leaf_size
    n_leaf_rows = tracer.tris.shape[0] // L
    n_pairs = tracer.n_nodes - n_leaf_rows
    pairs, leaves = _pack_paired(tracer, n_pairs, n_leaf_rows)

    kernel = functools.partial(
        _kernel_paired, leaf_size=L, n_pairs=n_pairs,
        n_leaf_rows=n_leaf_rows, stack_depth=stack_depth)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_depth,), jnp.int32),
            ],
            interpret=interpret,
        )(rays_chunk, pairs, leaves)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def _kernel_paired_streamed(rays_ref, pairs_hbm, leaves_hbm, out_ref,
                            stack_ref, pair_buf, leaf_buf, psem, lsem, *,
                            leaf_size: int, n_pairs: int, n_leaf_rows: int,
                            stack_depth: int, pair_win: int, leaf_win: int):
    """Near-child-first PAIRED traversal with the BVH left in HBM.

    Attacks the streamed kernel's incoherent-ray floor (PERF ladder #4):
    the plain streamed walk is single-cursor union over one node per
    iteration; this one pops a sibling-pair row (2 slab tests/visit),
    intersects leaf children in place so t_best shrinks before the
    pushes, and descends near-first — the same traversal that beat
    `ordered` 1.3-1.5x VMEM-resident (PERF.md round-3a), now fed by
    `pair_win`/`leaf_win`-row HBM->VMEM windows. Near-first popping makes
    window motion mostly ascending but NOT monotone; windows reload on
    any change (correct either way; a reload is ~2 us against ~100 us of
    compute per window of visits)."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz, with_tlo=True)

    def leaf_hits(local, hit, args):
        t_best, u_b, v_b, f_b = args
        lf = leaf_buf[pl.ds(jnp.clip(local, 0, leaf_win - 1), 1), :]
        for k in range(leaf_size):
            c = k * 12
            v0x, v0y, v0z = lf[0, c + 0], lf[0, c + 1], lf[0, c + 2]
            e1x, e1y, e1z = lf[0, c + 3], lf[0, c + 4], lf[0, c + 5]
            e2x, e2y, e2z = lf[0, c + 6], lf[0, c + 7], lf[0, c + 8]
            fid = lf[0, c + 9]
            t_best, u_b, v_b, f_b = _mt_fold(
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                fid, hit, (ox, oy, oz, dx, dy, dz),
                (t_best, u_b, v_b, f_b))
        return t_best, u_b, v_b, f_b

    def body(state):
        sp, pwin, lwin, t_best, u_b, v_b, f_b = state
        sp1 = sp - 1
        r = stack_ref[sp1]
        tgt_pwin = r // pair_win

        @pl.when(tgt_pwin != pwin)
        def _():
            cp = pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(tgt_pwin * pair_win, pair_win), :],
                pair_buf, psem)
            cp.start()
            cp.wait()

        row = pair_buf[pl.ds(r - tgt_pwin * pair_win, 1), :]
        dl = row[0, 6]
        dr = row[0, 14]
        hit_l, tlo_l = slab(row[0, 0], row[0, 1], row[0, 2], row[0, 3],
                            row[0, 4], row[0, 5], t_best)
        hit_r, tlo_r = slab(row[0, 8], row[0, 9], row[0, 10], row[0, 11],
                            row[0, 12], row[0, 13], t_best)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        l_leaf = dl <= 0.0
        r_leaf = dr <= 0.0

        # leaf children first (t_best shrinks before the pushes); each
        # leaf access may move the leaf window — DMAs stay OUTSIDE the
        # lax.cond (streamed-kernel pattern), targets gated by the do flag
        lrow_l = (-dl).astype(jnp.int32)
        lrow_r = (-dr).astype(jnp.int32)
        do_l = any_l & l_leaf
        do_r = any_r & r_leaf
        tgt_lwin1 = jnp.where(do_l, lrow_l // leaf_win, lwin)

        @pl.when(tgt_lwin1 != lwin)
        def _():
            cp = pltpu.make_async_copy(
                leaves_hbm.at[pl.ds(tgt_lwin1 * leaf_win, leaf_win), :],
                leaf_buf, lsem)
            cp.start()
            cp.wait()

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_l,
            functools.partial(leaf_hits, lrow_l - tgt_lwin1 * leaf_win,
                              hit_l),
            lambda a: a, (t_best, u_b, v_b, f_b))

        tgt_lwin2 = jnp.where(do_r, lrow_r // leaf_win, tgt_lwin1)

        @pl.when(tgt_lwin2 != tgt_lwin1)
        def _():
            cp = pltpu.make_async_copy(
                leaves_hbm.at[pl.ds(tgt_lwin2 * leaf_win, leaf_win), :],
                leaf_buf, lsem)
            cp.start()
            cp.wait()

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_r,
            functools.partial(leaf_hits, lrow_r - tgt_lwin2 * leaf_win,
                              hit_r),
            lambda a: a, (t_best, u_b, v_b, f_b))

        pid_l = jnp.clip(dl.astype(jnp.int32) - 1, 0, n_pairs - 1)
        pid_r = jnp.clip(dr.astype(jnp.int32) - 1, 0, n_pairs - 1)
        want_l = any_l & jnp.logical_not(l_leaf)
        want_r = any_r & jnp.logical_not(r_leaf)
        nl = jnp.sum((hit_l & want_l).astype(jnp.float32))
        nr = jnp.sum((hit_r & want_r).astype(jnp.float32))
        mean_l = jnp.sum(jnp.where(hit_l & want_l, tlo_l, 0.0)) \
            / jnp.maximum(nl, 1.0)
        mean_r = jnp.sum(jnp.where(hit_r & want_r, tlo_r, 0.0)) \
            / jnp.maximum(nr, 1.0)
        l_near = jnp.where(want_l & want_r, mean_l <= mean_r, want_l)
        far = jnp.where(l_near, pid_r, pid_l)
        near = jnp.where(l_near, pid_l, pid_r)
        push_far = want_l & want_r
        push_near = want_l | want_r

        sp2 = sp1

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp2, stack_depth - 1)] = far

        sp3 = sp2 + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[jnp.minimum(sp3, stack_depth - 1)] = near

        sp4 = jnp.minimum(sp3 + push_near.astype(jnp.int32), stack_depth)
        return sp4, tgt_pwin, tgt_lwin2, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    stack_ref[0] = jnp.int32(0)                     # root's children pair
    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.int32(-1),      # no pair window loaded
        jnp.int32(-1),      # no leaf window loaded
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, _, _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "stack_depth", "pair_win",
    "leaf_win"))
def pallas_ray_trace_paired_streamed(tracer: Tracer, origins: jnp.ndarray,
                                     dirs: jnp.ndarray, tile: int = 8192,
                                     interpret: bool = False,
                                     max_rays_per_call: int = 1 << 16,
                                     stack_depth: int | None = None,
                                     pair_win: int = 512,
                                     leaf_win: int = 512):
    """HBM-streamed variant of pallas_ray_trace_paired for BVHs too big
    for any resident layout: paired rows + whole-leaf rows stay in HBM
    and are DMA'd through (pair_win, 128)/(leaf_win, 128) VMEM windows
    (256 KB each at the 512 default). Returns (t, u, v, face_id, valid)."""
    assert tracer.layout == "preorder", \
        "paired-streamed traversal needs the preorder (SAH) node layout"
    assert tracer.leaf_size * 12 <= 128, "leaf row exceeds one 128-lane row"
    assert tracer.n_nodes > 1, "paired traversal needs an internal root"
    stack_depth = _auto_stack_depth(tracer, stack_depth)
    rays, nt, B = _pack_rays(origins, dirs, tile)

    L = tracer.leaf_size
    n_leaf_rows = tracer.tris.shape[0] // L
    n_pairs = tracer.n_nodes - n_leaf_rows
    pairs, leaves = _pack_paired(tracer, n_pairs, n_leaf_rows)
    # pad to whole DMA windows
    pairs = jnp.pad(pairs, ((0, (-pairs.shape[0]) % pair_win), (0, 0)))
    leaves = jnp.pad(leaves, ((0, (-leaves.shape[0]) % leaf_win), (0, 0)))

    kernel = functools.partial(
        _kernel_paired_streamed, leaf_size=L, n_pairs=n_pairs,
        n_leaf_rows=n_leaf_rows, stack_depth=stack_depth,
        pair_win=pair_win, leaf_win=leaf_win)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_depth,), jnp.int32),
                pltpu.VMEM((pair_win, 128), jnp.float32),
                pltpu.VMEM((leaf_win, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(rays_chunk, pairs, leaves)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


# ----------------------------------------------------------- dense layout
# The paired layout still wastes lanes: a pair uses 16 of its row's 128
# (8x pad) and a leaf_size=4 leaf 48 (2.7x). Since Mosaic only forbids
# DYNAMIC lane indexing, multiple records can share a row as long as the
# kernel extracts each record's scalars from STATIC lane offsets and
# selects between the slots with scalar `where`s on the slot id.

PAIR_PACK = 8    # sibling pairs per 128-lane row (16 lanes each)
LEAF_PACK = 2    # whole leaves per 128-lane row (64 lanes each)


def _pack_dense(tracer: Tracer, n_pairs: int, n_leaf_rows: int):
    """Re-pack a preorder BVH into the DENSE layout: the paired layout's
    records (see _pack_paired), but PAIR_PACK pairs per 128-lane row and
    LEAF_PACK leaves per row. Staged VMEM shrinks ~8x on pairs and ~2x on
    leaves vs paired (~10x vs the (N,8)/(P,12) resident layout), putting
    ~100K-face scenes in VMEM where they previously streamed from HBM."""
    nodes = tracer.nodes
    n = tracer.n_nodes
    L = tracer.leaf_size
    desc = nodes[:, 7]
    internal = desc > 0.0
    pair_id = jnp.cumsum(internal.astype(jnp.int32)) - 1
    c_l = jnp.clip(desc.astype(jnp.int32) - 1, 0, n - 1)
    c_r = jnp.clip(nodes[c_l, 6].astype(jnp.int32) - 1, 0, n - 1)

    def child_desc(c):
        dc = desc[c]
        leaf_row = (-dc) / float(L)
        return jnp.where(dc > 0.0, (pair_id[c] + 1).astype(jnp.float32),
                         -leaf_row)

    row = jnp.concatenate([
        nodes[c_l, 0:6], child_desc(c_l)[:, None],
        jnp.zeros((n, 1), jnp.float32),
        nodes[c_r, 0:6], child_desc(c_r)[:, None],
        jnp.zeros((n, 1), jnp.float32),
    ], axis=1)                                       # (N, 16)
    tgt = jnp.where(internal, pair_id, n_pairs)
    flat = jnp.zeros((n_pairs, 16), jnp.float32).at[tgt].set(
        row, mode="drop")
    rp = -(-n_pairs // PAIR_PACK) * PAIR_PACK
    flat = jnp.pad(flat, ((0, rp - n_pairs), (0, 0)))
    pairs = flat.reshape(rp // PAIR_PACK, 128)
    pairs = jnp.pad(pairs, ((0, (-pairs.shape[0]) % 8), (0, 0)))

    leaves = tracer.tris.reshape(n_leaf_rows, L * 12)
    leaves = jnp.pad(leaves, ((0, (-n_leaf_rows) % LEAF_PACK),
                              (0, 64 - L * 12)))
    leaves = leaves.reshape(-1, 128)
    leaves = jnp.pad(leaves, ((0, (-leaves.shape[0]) % 8), (0, 0)))
    return pairs, leaves


def _kernel_dense(rays_ref, pairs_ref, leaves_ref, out_ref, stack_ref, *,
                  leaf_size: int, n_pairs: int, n_leaf_rows: int,
                  stack_depth: int):
    """Near-child-first union traversal over the DENSE layout (see
    _pack_dense). Same algorithm as _kernel_paired; each pair/leaf scalar
    is extracted from its packed row by reading all PAIR_PACK/LEAF_PACK
    static slots and scalar-selecting on the slot id (no dynamic lane
    indexing). The scalar-core select overhead is negligible next to the
    (1, tile) VPU slab/intersection math."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz, with_tlo=True)

    def slot_scalar(row, slot, lanes, n_slots, width):
        """row[0, slot*width + k] for k in lanes, slot dynamic: read every
        static slot and scalar-select by slot id."""
        outs = []
        for k in lanes:
            v = row[0, k]
            for j in range(1, n_slots):
                v = jnp.where(slot == j, row[0, j * width + k], v)
            outs.append(v)
        return outs

    def leaf_hits(lrow, hit, args):
        t_best, u_b, v_b, f_b = args
        row = leaves_ref[pl.ds(jnp.clip(lrow // LEAF_PACK, 0,
                                        leaves_ref.shape[0] - 1), 1), :]
        slot = lrow % LEAF_PACK
        for k in range(leaf_size):
            c = k * 12
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             fid) = slot_scalar(row, slot, range(c, c + 10), LEAF_PACK, 64)
            t_best, u_b, v_b, f_b = _mt_fold(
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                fid, hit, (ox, oy, oz, dx, dy, dz),
                (t_best, u_b, v_b, f_b))
        return t_best, u_b, v_b, f_b

    def body(state):
        sp, t_best, u_b, v_b, f_b = state
        sp1 = sp - 1
        p = stack_ref[sp1]
        row = pairs_ref[pl.ds(jnp.clip(p // PAIR_PACK, 0,
                                       pairs_ref.shape[0] - 1), 1), :]
        (l0, l1, l2, l3, l4, l5, dl, r0, r1, r2, r3, r4, r5,
         dr) = slot_scalar(row, p % PAIR_PACK,
                           (0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14),
                           PAIR_PACK, 16)
        hit_l, tlo_l = slab(l0, l1, l2, l3, l4, l5, t_best)
        hit_r, tlo_r = slab(r0, r1, r2, r3, r4, r5, t_best)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        l_leaf = dl <= 0.0
        r_leaf = dr <= 0.0

        # leaf children first: their hits shrink t_best before the pushes
        t_best, u_b, v_b, f_b = jax.lax.cond(
            any_l & l_leaf,
            functools.partial(leaf_hits, (-dl).astype(jnp.int32), hit_l),
            lambda a: a, (t_best, u_b, v_b, f_b))
        t_best, u_b, v_b, f_b = jax.lax.cond(
            any_r & r_leaf,
            functools.partial(leaf_hits, (-dr).astype(jnp.int32), hit_r),
            lambda a: a, (t_best, u_b, v_b, f_b))

        pid_l = jnp.clip(dl.astype(jnp.int32) - 1, 0, n_pairs - 1)
        pid_r = jnp.clip(dr.astype(jnp.int32) - 1, 0, n_pairs - 1)
        want_l = any_l & jnp.logical_not(l_leaf)
        want_r = any_r & jnp.logical_not(r_leaf)
        nl = jnp.sum((hit_l & want_l).astype(jnp.float32))
        nr = jnp.sum((hit_r & want_r).astype(jnp.float32))
        mean_l = jnp.sum(jnp.where(hit_l & want_l, tlo_l, 0.0)) \
            / jnp.maximum(nl, 1.0)
        mean_r = jnp.sum(jnp.where(hit_r & want_r, tlo_r, 0.0)) \
            / jnp.maximum(nr, 1.0)
        l_near = jnp.where(want_l & want_r, mean_l <= mean_r, want_l)
        far = jnp.where(l_near, pid_r, pid_l)
        near = jnp.where(l_near, pid_l, pid_r)
        push_far = want_l & want_r
        push_near = want_l | want_r

        sp2 = sp1

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp2, stack_depth - 1)] = far

        sp3 = sp2 + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[jnp.minimum(sp3, stack_depth - 1)] = near

        sp4 = jnp.minimum(sp3 + push_near.astype(jnp.int32), stack_depth)
        return sp4, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    stack_ref[0] = jnp.int32(0)                     # root's children pair
    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "stack_depth"))
def pallas_ray_trace_dense(tracer: Tracer, origins: jnp.ndarray,
                           dirs: jnp.ndarray, tile: int = 8192,
                           interpret: bool = False,
                           max_rays_per_call: int = 1 << 16,
                           stack_depth: int | None = None):
    """Dense-layout variant of pallas_ray_trace_paired: PAIR_PACK sibling
    pairs and LEAF_PACK whole leaves per 128-lane VMEM row (~10x smaller
    staged footprint than the (N,8)/(P,12) resident layout — ~100K-face
    scenes stay VMEM-resident). Preorder layout required; root must be
    internal. Returns (t, u, v, face_id, valid), each (B,)."""
    assert tracer.layout == "preorder", \
        "dense traversal needs the preorder (SAH) node layout"
    assert tracer.leaf_size * 12 <= 64, "leaf exceeds its 64-lane slot"
    assert tracer.n_nodes > 1, "dense traversal needs an internal root"
    stack_depth = _auto_stack_depth(tracer, stack_depth)
    rays, nt, B = _pack_rays(origins, dirs, tile)

    L = tracer.leaf_size
    n_leaf_rows = tracer.tris.shape[0] // L
    n_pairs = tracer.n_nodes - n_leaf_rows
    pairs, leaves = _pack_dense(tracer, n_pairs, n_leaf_rows)

    kernel = functools.partial(
        _kernel_dense, leaf_size=L, n_pairs=n_pairs,
        n_leaf_rows=n_leaf_rows, stack_depth=stack_depth)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_depth,), jnp.int32),
            ],
            interpret=interpret,
        )(rays_chunk, pairs, leaves)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def _kernel_dense_streamed(rays_ref, pairs_hbm, leaves_hbm, out_ref,
                           stack_ref, pair_buf, leaf_buf, psem, lsem, *,
                           leaf_size: int, n_pairs: int, n_leaf_rows: int,
                           stack_depth: int, pair_win: int, leaf_win: int):
    """Near-child-first DENSE traversal with the packed BVH left in HBM.

    The paired-streamed kernel DMAs rows that carry ONE 16-lane pair in a
    128-lane row — 8x pad on every byte that crosses HBM. TPU HBM layouts
    tile the minor dim to 128 lanes, so the pad cannot be avoided by a
    narrower array; it CAN be avoided by the dense packing (PAIR_PACK
    pairs / LEAF_PACK leaves per row, _pack_dense): the same
    (pair_win, 128) window now covers 8x more pairs, cutting window
    crossings and total DMA bytes ~8x on DMA-bound walks (the 1M-face
    incoherent case, PERF.md round-3e's honest remainder). Traversal and
    slot extraction are identical to _kernel_dense; window machinery is
    identical to _kernel_paired_streamed."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz) = _ray_ctx(rays_ref)

    slab = _make_slab(ox, oy, oz, ix, iy, iz, with_tlo=True)

    def slot_scalar(row, slot, lanes, n_slots, width):
        outs = []
        for k in lanes:
            v = row[0, k]
            for j in range(1, n_slots):
                v = jnp.where(slot == j, row[0, j * width + k], v)
            outs.append(v)
        return outs

    def leaf_hits(local_row, slot, hit, args):
        t_best, u_b, v_b, f_b = args
        row = leaf_buf[pl.ds(jnp.clip(local_row, 0, leaf_win - 1), 1), :]
        for k in range(leaf_size):
            c = k * 12
            (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
             fid) = slot_scalar(row, slot, range(c, c + 10), LEAF_PACK, 64)
            t_best, u_b, v_b, f_b = _mt_fold(
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z),
                fid, hit, (ox, oy, oz, dx, dy, dz),
                (t_best, u_b, v_b, f_b))
        return t_best, u_b, v_b, f_b

    def body(state):
        sp, pwin, lwin, t_best, u_b, v_b, f_b = state
        sp1 = sp - 1
        p = stack_ref[sp1]
        prow = p // PAIR_PACK
        tgt_pwin = prow // pair_win

        @pl.when(tgt_pwin != pwin)
        def _():
            cp = pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(tgt_pwin * pair_win, pair_win), :],
                pair_buf, psem)
            cp.start()
            cp.wait()

        row = pair_buf[pl.ds(prow - tgt_pwin * pair_win, 1), :]
        (l0, l1, l2, l3, l4, l5, dl, r0, r1, r2, r3, r4, r5,
         dr) = slot_scalar(row, p % PAIR_PACK,
                           (0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14),
                           PAIR_PACK, 16)
        hit_l, tlo_l = slab(l0, l1, l2, l3, l4, l5, t_best)
        hit_r, tlo_r = slab(r0, r1, r2, r3, r4, r5, t_best)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        l_leaf = dl <= 0.0
        r_leaf = dr <= 0.0

        # leaf children first (t_best shrinks before the pushes); DMAs
        # stay OUTSIDE the lax.cond (streamed-kernel pattern), targets
        # gated by the do flag
        lrow_l = (-dl).astype(jnp.int32)
        lrow_r = (-dr).astype(jnp.int32)
        do_l = any_l & l_leaf
        do_r = any_r & r_leaf
        plrow_l = lrow_l // LEAF_PACK
        plrow_r = lrow_r // LEAF_PACK
        tgt_lwin1 = jnp.where(do_l, plrow_l // leaf_win, lwin)

        @pl.when(tgt_lwin1 != lwin)
        def _():
            cp = pltpu.make_async_copy(
                leaves_hbm.at[pl.ds(tgt_lwin1 * leaf_win, leaf_win), :],
                leaf_buf, lsem)
            cp.start()
            cp.wait()

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_l,
            functools.partial(leaf_hits, plrow_l - tgt_lwin1 * leaf_win,
                              lrow_l % LEAF_PACK, hit_l),
            lambda a: a, (t_best, u_b, v_b, f_b))

        tgt_lwin2 = jnp.where(do_r, plrow_r // leaf_win, tgt_lwin1)

        @pl.when(tgt_lwin2 != tgt_lwin1)
        def _():
            cp = pltpu.make_async_copy(
                leaves_hbm.at[pl.ds(tgt_lwin2 * leaf_win, leaf_win), :],
                leaf_buf, lsem)
            cp.start()
            cp.wait()

        t_best, u_b, v_b, f_b = jax.lax.cond(
            do_r,
            functools.partial(leaf_hits, plrow_r - tgt_lwin2 * leaf_win,
                              lrow_r % LEAF_PACK, hit_r),
            lambda a: a, (t_best, u_b, v_b, f_b))

        pid_l = jnp.clip(dl.astype(jnp.int32) - 1, 0, n_pairs - 1)
        pid_r = jnp.clip(dr.astype(jnp.int32) - 1, 0, n_pairs - 1)
        want_l = any_l & jnp.logical_not(l_leaf)
        want_r = any_r & jnp.logical_not(r_leaf)
        nl = jnp.sum((hit_l & want_l).astype(jnp.float32))
        nr = jnp.sum((hit_r & want_r).astype(jnp.float32))
        mean_l = jnp.sum(jnp.where(hit_l & want_l, tlo_l, 0.0)) \
            / jnp.maximum(nl, 1.0)
        mean_r = jnp.sum(jnp.where(hit_r & want_r, tlo_r, 0.0)) \
            / jnp.maximum(nr, 1.0)
        l_near = jnp.where(want_l & want_r, mean_l <= mean_r, want_l)
        far = jnp.where(l_near, pid_r, pid_l)
        near = jnp.where(l_near, pid_l, pid_r)
        push_far = want_l & want_r
        push_near = want_l | want_r

        sp2 = sp1

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp2, stack_depth - 1)] = far

        sp3 = sp2 + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[jnp.minimum(sp3, stack_depth - 1)] = near

        sp4 = jnp.minimum(sp3 + push_near.astype(jnp.int32), stack_depth)
        return sp4, tgt_pwin, tgt_lwin2, t_best, u_b, v_b, f_b

    def cond(state):
        return state[0] > 0

    stack_ref[0] = jnp.int32(0)                     # root's children pair
    tile = ox.shape
    init = (
        jnp.int32(1),
        jnp.int32(-1),      # no pair window loaded
        jnp.int32(-1),      # no leaf window loaded
        jnp.full(tile, T_MISS, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.zeros(tile, jnp.float32),
        jnp.full(tile, -1.0, jnp.float32),
    )
    _, _, _, t_best, u_b, v_b, f_b = jax.lax.while_loop(cond, body, init)
    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = u_b
    out_ref[2:3, :] = v_b
    out_ref[3:4, :] = f_b
    out_ref[4:8, :] = jnp.zeros((4,) + t_best.shape[1:], jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "max_rays_per_call", "stack_depth", "pair_win",
    "leaf_win"))
def pallas_ray_trace_dense_streamed(tracer: Tracer, origins: jnp.ndarray,
                                    dirs: jnp.ndarray, tile: int = 8192,
                                    interpret: bool = False,
                                    max_rays_per_call: int = 1 << 16,
                                    stack_depth: int | None = None,
                                    pair_win: int = 512,
                                    leaf_win: int = 512):
    """HBM-streamed variant of pallas_ray_trace_dense: the dense-packed
    rows (PAIR_PACK pairs / LEAF_PACK leaves per 128-lane row) stay in
    HBM behind (pair_win, 128)/(leaf_win, 128) VMEM windows — the same
    256 KB window as paired_streamed now covers 8x more pairs / 2x more
    leaves, so DMA-bound walks move ~8x fewer bytes.
    Returns (t, u, v, face_id, valid), each (B,)."""
    assert tracer.layout == "preorder", \
        "dense-streamed traversal needs the preorder (SAH) node layout"
    assert tracer.leaf_size * 12 <= 64, "leaf exceeds its 64-lane slot"
    assert tracer.n_nodes > 1, "dense traversal needs an internal root"
    stack_depth = _auto_stack_depth(tracer, stack_depth)
    rays, nt, B = _pack_rays(origins, dirs, tile)

    L = tracer.leaf_size
    n_leaf_rows = tracer.tris.shape[0] // L
    n_pairs = tracer.n_nodes - n_leaf_rows
    pairs, leaves = _pack_dense(tracer, n_pairs, n_leaf_rows)
    # pad to whole DMA windows
    pairs = jnp.pad(pairs, ((0, (-pairs.shape[0]) % pair_win), (0, 0)))
    leaves = jnp.pad(leaves, ((0, (-leaves.shape[0]) % leaf_win), (0, 0)))

    kernel = functools.partial(
        _kernel_dense_streamed, leaf_size=L, n_pairs=n_pairs,
        n_leaf_rows=n_leaf_rows, stack_depth=stack_depth,
        pair_win=pair_win, leaf_win=leaf_win)


    def call(rays_chunk):
        n_in = rays_chunk.shape[0] // 8
        return pl.pallas_call(
            kernel,
            grid=(n_in,),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_in * 8, tile), jnp.float32),
            scratch_shapes=[
                pltpu.SMEM((stack_depth,), jnp.int32),
                pltpu.VMEM((pair_win, 128), jnp.float32),
                pltpu.VMEM((leaf_win, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(rays_chunk, pairs, leaves)

    out = _run_chunked(rays, nt, tile, max_rays_per_call, call)

    return _unpack_out(out, nt, tile, B)


def dense_vmem_bytes(tracer: Tracer) -> int:
    """Staged VMEM footprint of the dense layout (packed pair + leaf rows,
    each a full (8,128)-tiled 128-lane row)."""

    def pad8(n: int) -> int:
        return -(-n // 8) * 8

    n_leaf_rows = tracer.tris.shape[0] // tracer.leaf_size
    n_pairs = tracer.n_nodes - n_leaf_rows
    return (pad8(-(-n_pairs // PAIR_PACK))
            + pad8(-(-n_leaf_rows // LEAF_PACK))) * 128 * 4


def dense_available(tracer: Tracer, budget: int = 10 << 20) -> bool:
    """Budget history (round 4): the gate was briefly widened to 12 MB so
    a 102K-face SAH tree (10.8 MB staged — 39% leaf padding) would stay
    VMEM-resident instead of streaming, and then REVERTED: the same-
    timer device A/B at that size says the near-first paired_streamed
    walk BEATS dense-resident — full train step 292.8 ms (0.885M rays/s)
    vs 316.3 ms (0.819M), records/policy102k_scan_r4.log; the python-
    loop harness agrees (363 vs 388 ms, records/dense102k_ab_r4b.log,
    position-independent across arm orders). Both kernels traverse
    near-first with pop-time pruning; the dense layout's per-pop SLOT
    EXTRACTION (picking one 16-lane pair out of a packed 128-lane row)
    costs more than the streamed kernel's window DMAs at this tree
    size. 10 MB keeps dense available for the mid-size trees where it
    was originally measured ahead of streaming (PERF.md round-3b)."""
    return (tracer.layout == "preorder" and tracer.n_nodes > 1
            and tracer.leaf_size * 12 <= 64
            and dense_vmem_bytes(tracer) <= budget)


def paired_vmem_bytes(tracer: Tracer) -> int:
    """Staged VMEM footprint of the paired layout (pairs + leaf rows,
    each a full (8,128)-tiled 128-lane row)."""

    def pad8(n: int) -> int:
        return -(-n // 8) * 8

    n_leaf_rows = tracer.tris.shape[0] // tracer.leaf_size
    n_pairs = tracer.n_nodes - n_leaf_rows
    return (pad8(n_pairs) + pad8(n_leaf_rows)) * 128 * 4


def paired_available(tracer: Tracer, budget: int = 10 << 20) -> bool:
    return (tracer.layout == "preorder" and tracer.n_nodes > 1
            and tracer.leaf_size * 12 <= 128
            and paired_vmem_bytes(tracer) <= budget)


def vmem_bytes(tracer: Tracer) -> int:
    """TRUE VMEM footprint of the resident kernels' BVH operands.

    Mosaic stages f32 operands as T(8,128) tiles, so the narrow (N, 8)
    node and (P, 12) triangle rows LANE-PAD to 128 — a 16x/10.7x
    inflation over their logical bytes. Counting logical bytes let a
    24K-face tree (2.1 MB logical, 25.7 MB staged) through the resident
    gate and the compile died with a scoped-vmem OOM (16 MB limit)
    inside large jit programs."""

    def pad8(n: int) -> int:
        return -(-n // 8) * 8

    return (pad8(tracer.nodes.shape[0]) + pad8(tracer.tris.shape[0])) \
        * 128 * 4


def pallas_available(tracer: Tracer, budget: int = 10 << 20) -> bool:
    """budget leaves ~4-6 MB of the 16 MB scoped-vmem limit for the ray
    in/out blocks of a 64K-ray chunk."""
    return vmem_bytes(tracer) <= budget


def pallas_streamable(tracer: Tracer) -> bool:
    """The streamed kernel handles any size, but needs the preorder (SAH)
    layout."""
    return tracer.layout == "preorder"


def paired_streamed_available(tracer: Tracer) -> bool:
    """Eligibility for the HBM-streamed paired kernel — the single source
    of truth shared with pallas_ray_trace_paired_streamed's asserts (a
    gate/assert drift turns auto-selection into an in-jit error)."""
    return (tracer.layout == "preorder" and tracer.n_nodes > 1
            and tracer.leaf_size * 12 <= 128)


def dense_streamed_available(tracer: Tracer) -> bool:
    """Eligibility for the HBM-streamed dense kernel (leaf must fit its
    64-lane slot; shares pallas_ray_trace_dense_streamed's asserts)."""
    return (tracer.layout == "preorder" and tracer.n_nodes > 1
            and tracer.leaf_size * 12 <= 64)
