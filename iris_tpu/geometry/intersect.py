"""Ray–mesh intersection (JAX). The single geometry choke point.

API parity with reference utils/path_tracing.py:17-48 `ray_intersect`:
returns (positions, normals, uvs, tri_idx, valid) with normals normalized
and flipped toward the ray origin (double_sided(-d, n)), tri_idx == -1 for
misses. Geometry carries no gradients (wrapped in stop_gradient), matching
the reference's gradient policy (grads never flow through hit points).

Traversal is stackless skip-pointer preorder over the complete-tree BVH
(see bvh.py), vectorized over the full ray batch inside one
`lax.while_loop` — fixed shapes, TPU/XLA-legal control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iris_tpu.core.vecmath import double_sided, normalize
from iris_tpu.geometry.bvh import Tracer

T_MISS = 3e37
_MT_EPS = 1e-9


def _moller_trumbore(o, d, v0, e1, e2, eps=_MT_EPS):
    """Batched Möller–Trumbore. Inputs broadcast over (..., K, 3) triangles
    against (..., 1, 3) rays. Returns t, u, v, hit."""
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


def ray_trace(tracer: Tracer, origins: jnp.ndarray, dirs: jnp.ndarray):
    """Closest-hit traversal. Returns (t, u, v, packed_tri, valid) where
    packed_tri indexes the Morton-sorted padded triangle arrays."""
    origins = jax.lax.stop_gradient(origins)
    dirs = jax.lax.stop_gradient(dirs)
    B = origins.shape[0]
    L = tracer.leaf_size
    first_leaf = tracer.first_leaf

    d_safe = jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    inv_d = 1.0 / d_safe

    def cond(state):
        cur = state[0]
        return jnp.any(cur > 0)

    def body(state):
        cur, t_best, uv_best, tri_best = state
        active = cur > 0
        node = jnp.clip(cur - 1, 0, tracer.n_nodes - 1)

        bmin = tracer.node_min[node]
        bmax = tracer.node_max[node]
        hit_box = _slab_test(origins, inv_d, bmin, bmax, t_best) & active

        is_leaf = node >= first_leaf
        do_leaf = hit_box & is_leaf

        # test the leaf's triangles (static unrolled gather of L tris)
        leaf_base = (node - first_leaf) * L
        tri_idx = jnp.clip(
            leaf_base[:, None] + jnp.arange(L, dtype=node.dtype)[None, :],
            0, tracer.v0.shape[0] - 1,
        )  # (B, L)
        v0 = tracer.v0[tri_idx]
        e1 = tracer.e1[tri_idx]
        e2 = tracer.e2[tri_idx]
        t, u, v, hit = _moller_trumbore(
            origins[:, None, :], dirs[:, None, :], v0, e1, e2
        )
        pad = tracer.tri_id[tri_idx] < 0
        hit = hit & ~pad & do_leaf[:, None] & (t < t_best[:, None])
        t = jnp.where(hit, t, T_MISS)
        k = jnp.argmin(t, axis=-1)
        t_k = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
        any_hit = jnp.take_along_axis(hit, k[:, None], axis=-1)[:, 0]
        u_k = jnp.take_along_axis(u, k[:, None], axis=-1)[:, 0]
        v_k = jnp.take_along_axis(v, k[:, None], axis=-1)[:, 0]
        idx_k = jnp.take_along_axis(tri_idx, k[:, None], axis=-1)[:, 0]

        upd = any_hit & (t_k < t_best)
        t_best = jnp.where(upd, t_k, t_best)
        uv_best = jnp.where(upd[:, None], jnp.stack([u_k, v_k], -1), uv_best)
        tri_best = jnp.where(upd, idx_k, tri_best)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, 2 * cur, tracer.skip[node])
        cur = jnp.where(active, nxt, 0)
        return cur, t_best, uv_best, tri_best

    state0 = (
        jnp.ones((B,), jnp.int32),
        jnp.full((B,), T_MISS, jnp.float32),
        jnp.zeros((B, 2), jnp.float32),
        jnp.full((B,), -1, jnp.int32),
    )
    cur, t, uv, tri = jax.lax.while_loop(cond, body, state0)
    valid = tri >= 0
    return t, uv[:, 0], uv[:, 1], tri, valid


def ray_intersect(tracer: Tracer, xs: jnp.ndarray, ds: jnp.ndarray):
    """Reference-parity wrapper (utils/path_tracing.py:17-48).

    Args:
        xs: (B, 3) ray origins.  ds: (B, 3) ray directions.
    Returns:
        positions (B,3), normals (B,3) unit & viewer-facing, uvs (B,2),
        idx (B,) original face index (-1 = miss), valid (B,) bool.
    """
    t, u, v, packed, valid = ray_trace(tracer, xs, ds)
    safe = jnp.clip(packed, 0, tracer.v0.shape[0] - 1)
    e1 = tracer.e1[safe]
    e2 = tracer.e2[safe]
    n = normalize(jnp.cross(e1, e2))
    n = double_sided(-ds, n)
    n = jnp.where(valid[:, None], n, 0.0)
    pos = jnp.where(valid[:, None], xs + t[:, None] * ds, 0.0)
    idx = jnp.where(valid, tracer.tri_id[safe], -1)
    uv = jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0)
    return pos, n, uv, idx, valid


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
