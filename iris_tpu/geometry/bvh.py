"""BVH build (host, vectorized numpy) + flattened device arrays.

Replaces the reference's Mitsuba/OptiX BVH (utils/path_tracing.py:17-48,
the single native choke point) with our own acceleration structure:

- Triangles are Morton-sorted (21 bits/axis) and packed into leaves of
  `leaf_size`; the tree is a *complete binary tree* over the sorted order
  (an LBVH with median splits). Everything is O(F log F) vectorized numpy —
  no per-node Python loop — so million-face ScanNet++ meshes build in ~1s.
- The device representation is arrays only (a pytree), with *skip pointers*
  for stackless preorder traversal: node b (1-based heap index) descends to
  2b on AABB hit, otherwise jumps to skip[b]. Skip pointers have a closed
  form on complete trees (strip trailing one-bits of b), precomputed here.

This favors XLA/TPU: traversal state is one int per ray, all control flow is
a single `lax.while_loop` over the whole ray batch (fixed shapes), and the
node/triangle fetches are plain gathers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

BIG = np.float32(3e38)


@jax.tree_util.register_dataclass
@dataclass
class Tracer:
    """Flattened BVH + triangle soup, ready for device traversal.

    Layout is tuned for TPU gathers: all device-side lookups are
    1-D-indexed rows of packed arrays (XLA lowers those to fast dynamic
    gathers; 2-D index arrays lower to slow generic gathers).
    """

    nodes: jax.Array         # (N, 8) f32: min.xyz, max.xyz, skip, desc
    tris: jax.Array          # (P, 12) f32: v0, e1, e2, orig_face_id, pad
    face_normals: jax.Array  # (F, 3) f32 unit geometric normals by face id
    n_nodes: int = field(metadata=dict(static=True))
    leaf_size: int = field(metadata=dict(static=True))
    n_faces: int = field(metadata=dict(static=True))     # original face count
    # node-array ordering: "preorder" (SAH builder: child = cur+1, node and
    # leaf-triangle indices are strictly increasing along any traversal —
    # streamable) or "heap" (Morton fallback: node b's children are 2b/2b+1,
    # indices jump around). The HBM-streamed Pallas kernel requires
    # "preorder".
    layout: str = field(default="heap", metadata=dict(static=True))
    # maximum node depth (root = 0), computed host-side at build time. The
    # stack-based traversal kernels size their SMEM stacks from this: stack
    # occupancy is bounded by depth+1 (each pop pushes at most far+near and
    # the near entry is popped next step), so a correctly sized stack makes
    # the overflow clamp in the kernels unreachable. 0 = unknown (legacy
    # tracers): kernels fall back to the old fixed 64, which silently
    # drops subtrees past 64 both-children-hit levels on skewed SAH trees.
    depth: int = field(default=0, metadata=dict(static=True))
    # nodes[:,6] skip: next 1-based node in preorder after this subtree,
    #                  0 = traversal done.
    # nodes[:,7] desc: >=1 -> internal, value is the 1-based first child;
    #                  <=0 -> leaf, -desc is the first padded-triangle row
    #                  (leaf_size consecutive rows are tested).

    # convenience views (host-side use)
    @property
    def node_min(self):
        return self.nodes[:, 0:3]

    @property
    def node_max(self):
        return self.nodes[:, 3:6]

    @property
    def skip(self):
        return self.nodes[:, 6].astype(jnp_int32())

    @property
    def v0(self):
        return self.tris[:, 0:3]

    @property
    def e1(self):
        return self.tris[:, 3:6]

    @property
    def e2(self):
        return self.tris[:, 6:9]

    @property
    def tri_id(self):
        return self.tris[:, 9].astype(jnp_int32())


def jnp_int32():
    import jax.numpy as jnp

    return jnp.int32


def _expand_bits(x: np.ndarray) -> np.ndarray:
    """Spread 21 bits of x so they occupy every 3rd bit (Morton helper)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton3d(points01: np.ndarray) -> np.ndarray:
    """63-bit Morton codes for points normalized to [0,1]^3."""
    q = np.clip(points01 * (1 << 21), 0, (1 << 21) - 1).astype(np.uint64)
    return (
        _expand_bits(q[:, 0])
        | (_expand_bits(q[:, 1]) << np.uint64(1))
        | (_expand_bits(q[:, 2]) << np.uint64(2))
    )


def _skip_pointers(n_nodes: int) -> np.ndarray:
    """1-based preorder skip pointer for every node of a complete binary tree.

    skip(b): strip trailing 1-bits of b; if the result is 0 the node closes
    the preorder walk (skip=0), else skip = stripped + 1 (its next sibling).
    """
    b = np.arange(1, n_nodes + 1, dtype=np.uint64)
    stripped = b.copy()
    ones = (stripped & np.uint64(1)).astype(bool)
    while ones.any():
        stripped[ones] >>= np.uint64(1)
        ones = (stripped & np.uint64(1)).astype(bool) & (stripped > 0)
    out = np.where(stripped == 0, 0, stripped + 1).astype(np.int64)
    return out.astype(np.int32)


def preorder_max_depth(nodes_np: np.ndarray) -> int:
    """Max node depth (root = 0) of a preorder-layout tree, vectorized
    from the skip pointers: node j's subtree spans rows [j, skip0_j), so
    depth[i] = #{j < i : skip0_j > i} — an interval-increment prefix sum.
    """
    n = nodes_np.shape[0]
    if n <= 1:
        return 0
    skip = nodes_np[:, 6].astype(np.int64)
    skip0 = np.where(skip <= 0, n, skip - 1)          # 0-based end-of-subtree
    idx = np.arange(n, dtype=np.int64)
    skip0 = np.maximum(skip0, idx + 1)
    delta = np.zeros(n + 1, np.int64)
    np.add.at(delta, idx + 1, 1)
    np.add.at(delta, skip0, -1)
    return int(np.cumsum(delta)[:n].max())


def build_bvh(triangles: np.ndarray, leaf_size: int = 4,
              method: str = "auto") -> Tracer:
    """Build the flat BVH from (F, 3, 3) triangle vertices.

    method: 'auto' prefers the native C++ binned-SAH builder (csrc/) —
    better tree quality -> fewer traversal steps — and falls back to the
    vectorized Morton median-split builder; 'morton' / 'sah' force one.
    """
    triangles = np.asarray(triangles, dtype=np.float32)
    n_faces = triangles.shape[0]
    assert n_faces > 0, "empty mesh"

    if method in ("auto", "sah"):
        from iris_tpu.geometry.bvh_native import build_sah_arrays

        built = build_sah_arrays(triangles, leaf_size)
        if built is not None:
            import jax.numpy as jnp

            nodes_np, tris_np = built
            cr = np.cross(triangles[:, 1] - triangles[:, 0],
                          triangles[:, 2] - triangles[:, 0])
            fn = cr / np.maximum(
                np.linalg.norm(cr, axis=-1, keepdims=True), 1e-20)
            return Tracer(
                nodes=jnp.asarray(nodes_np),
                tris=jnp.asarray(tris_np),
                face_normals=jnp.asarray(fn.astype(np.float32)),
                n_nodes=int(nodes_np.shape[0]),
                leaf_size=leaf_size,
                n_faces=n_faces,
                layout="preorder",
                depth=preorder_max_depth(nodes_np),
            )
        if method == "sah":
            raise RuntimeError("native SAH builder unavailable")

    centroid = triangles.mean(axis=1)
    lo, hi = centroid.min(0), centroid.max(0)
    extent = np.maximum(hi - lo, 1e-9)
    order = np.argsort(morton3d((centroid - lo) / extent), kind="stable")
    tris = triangles[order]

    n_leaves_needed = -(-n_faces // leaf_size)
    depth = max(int(np.ceil(np.log2(max(n_leaves_needed, 1)))), 0)
    n_leaves = 1 << depth
    n_nodes = 2 * n_leaves - 1
    first_leaf = n_leaves - 1
    pad_to = n_leaves * leaf_size

    v0 = np.zeros((pad_to, 3), np.float32)
    e1 = np.zeros((pad_to, 3), np.float32)
    e2 = np.zeros((pad_to, 3), np.float32)
    tri_id = np.full((pad_to,), -1, np.int32)
    v0[:n_faces] = tris[:, 0]
    e1[:n_faces] = tris[:, 1] - tris[:, 0]
    e2[:n_faces] = tris[:, 2] - tris[:, 0]
    tri_id[:n_faces] = order.astype(np.int32)

    # leaf AABBs (empty leaves get inverted boxes that never hit)
    tmin = np.minimum(np.minimum(tris.min(1), BIG), BIG)
    tmax = tris.max(1)
    leaf_min = np.full((n_leaves, leaf_size, 3), BIG, np.float32)
    leaf_max = np.full((n_leaves, leaf_size, 3), -BIG, np.float32)
    flat_min = leaf_min.reshape(-1, 3)
    flat_max = leaf_max.reshape(-1, 3)
    flat_min[:n_faces] = tmin
    flat_max[:n_faces] = tmax
    leaf_min = flat_min.reshape(n_leaves, leaf_size, 3).min(1)
    leaf_max = flat_max.reshape(n_leaves, leaf_size, 3).max(1)

    node_min = np.full((n_nodes, 3), BIG, np.float32)
    node_max = np.full((n_nodes, 3), -BIG, np.float32)
    node_min[first_leaf:] = leaf_min
    node_max[first_leaf:] = leaf_max
    # bottom-up union, one vectorized pass per level
    for level in range(depth - 1, -1, -1):
        s = (1 << level) - 1
        e = (1 << (level + 1)) - 1
        l, r = 2 * np.arange(s, e) + 1, 2 * np.arange(s, e) + 2
        node_min[s:e] = np.minimum(node_min[l], node_min[r])
        node_max[s:e] = np.maximum(node_max[l], node_max[r])

    import jax.numpy as jnp

    skip = _skip_pointers(n_nodes).astype(np.float32)
    idx0 = np.arange(n_nodes)
    desc = np.where(idx0 >= first_leaf,
                    -((idx0 - first_leaf) * leaf_size).astype(np.float32),
                    (2 * (idx0 + 1)).astype(np.float32))
    nodes = np.concatenate([
        node_min, node_max, skip[:, None], desc[:, None],
    ], axis=1)
    tris_packed = np.concatenate([
        v0, e1, e2, tri_id[:, None].astype(np.float32),
        np.zeros((pad_to, 2), np.float32),
    ], axis=1)

    cr = np.cross(triangles[:, 1] - triangles[:, 0],
                  triangles[:, 2] - triangles[:, 0])
    face_normals = cr / np.maximum(
        np.linalg.norm(cr, axis=-1, keepdims=True), 1e-20)

    return Tracer(
        nodes=jnp.asarray(nodes),
        tris=jnp.asarray(tris_packed),
        face_normals=jnp.asarray(face_normals.astype(np.float32)),
        n_nodes=n_nodes,
        leaf_size=leaf_size,
        n_faces=n_faces,
        depth=depth,                  # complete tree: leaves at this level
    )


def build_tracer(mesh) -> Tracer:
    """Convenience: mesh -> Tracer."""
    return build_bvh(mesh.triangles())
