"""Pallas traversal kernel vs brute force (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.intersect import ray_intersect_brute
from iris_tpu.geometry.pallas_intersect import pallas_ray_trace
from iris_tpu.geometry.procedural import make_box_scene, random_rays


def test_pallas_kernel_matches_brute_interpret():
    mesh, _ = make_box_scene(n_clutter=4, seed=0)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    o, d = random_rays(256, seed=9)
    t, u, v, face, valid = pallas_ray_trace(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_chunked_matches_unchunked():
    """The lax.map super-chunk path (VMEM cap workaround) returns the same
    hits as a single call, including the dummy-ray padding tail."""
    import jax.numpy as jnp
    import numpy as np

    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.pallas_intersect import pallas_ray_trace
    from iris_tpu.geometry.procedural import camera_rays, make_box_scene

    mesh, _ = make_box_scene(n_clutter=4, seed=1)
    tracer = build_bvh(mesh.triangles())
    o, d, *_ = camera_rays(30)   # 900 rays -> pads to 1024 at tile 128
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace(tracer, o, d, tile=128, interpret=True,
                         max_rays_per_call=256)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_streamed_matches_brute_interpret():
    """HBM-streamed kernel (windowed node/tri DMA) vs brute force, with
    tiny windows so many window crossings are exercised. Needs the SAH
    (preorder) builder."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (pallas_ray_trace_streamed,
                                                    pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=3)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(256, seed=11)
    t, u, v, face, valid = pallas_ray_trace_streamed(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True,
        node_win=64, tri_win=64)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_streamed_matches_resident_interpret():
    """Streamed and VMEM-resident kernels agree bit-exactly on the same
    SAH tree (same traversal order, same arithmetic)."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (pallas_ray_trace_streamed,
                                                    pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=4)
    tracer = build_bvh(mesh.triangles())
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=12)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace_streamed(tracer, o, d, tile=128, interpret=True,
                                  node_win=128, tri_win=128)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_paired_matches_brute_interpret():
    """Packed sibling-pair kernel vs brute force (different memory layout
    AND traversal order; results must not differ)."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (pallas_ray_trace_paired,
                                                    pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=6)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=14)
    t, u, v, face, valid = pallas_ray_trace_paired(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True,
        stack_depth=32)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_paired_matches_ordered_interpret():
    """Paired and ordered kernels agree on a scene with partial leaves
    (fid=-1 pad rows) and chunked super-calls; the paired VMEM gate is
    ~3x looser than the row-per-node one."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (
        paired_vmem_bytes, pallas_ray_trace_ordered, pallas_ray_trace_paired,
        pallas_streamable, vmem_bytes)

    mesh, _ = make_box_scene(n_clutter=23, seed=7)
    tracer = build_bvh(mesh.triangles())
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    assert paired_vmem_bytes(tracer) * 2 < vmem_bytes(tracer)
    o, d = random_rays(700, seed=15)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace_ordered(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace_paired(tracer, o, d, tile=128, interpret=True,
                                max_rays_per_call=256)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_pallas_ordered_matches_brute_interpret():
    """Near-first + pruned kernel vs brute force (traversal ORDER differs
    from the other kernels, results must not)."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (pallas_ray_trace_ordered,
                                                    pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=5)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=13)
    t, u, v, face, valid = pallas_ray_trace_ordered(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True,
        stack_depth=32)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_dense_matches_brute_interpret():
    """Lane-dense kernel (8 pairs + 2 leaves per 128-lane row, dynamic
    slot selection) vs brute force."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (pallas_ray_trace_dense,
                                                    pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=8)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=16)
    t, u, v, face, valid = pallas_ray_trace_dense(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True,
        stack_depth=32)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_dense_matches_ordered_interpret():
    """Dense and ordered kernels agree on a scene with partial leaves
    (fid=-1 pad rows), an ODD pair/leaf count (exercises the slot-pad
    tails), and chunked super-calls; the dense VMEM gate is ~10x looser
    than the row-per-node one."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (
        dense_vmem_bytes, pallas_ray_trace_dense, pallas_ray_trace_ordered,
        pallas_streamable, vmem_bytes)

    mesh, _ = make_box_scene(n_clutter=23, seed=9)
    tracer = build_bvh(mesh.triangles())
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    assert dense_vmem_bytes(tracer) * 6 < vmem_bytes(tracer)
    o, d = random_rays(700, seed=17)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace_ordered(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace_dense(tracer, o, d, tile=128, interpret=True,
                               max_rays_per_call=256)
    for x, y in zip(a, b):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_pallas_paired_streamed_matches_brute_interpret():
    """HBM-windowed paired kernel vs brute force, with tiny windows so
    pair AND leaf window crossings (including two-leaf visits spanning
    windows) are exercised."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (
        pallas_ray_trace_paired_streamed, pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=5)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(256, seed=13)
    t, u, v, face, valid = pallas_ray_trace_paired_streamed(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, interpret=True,
        pair_win=16, leaf_win=16)
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                           jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_paired_streamed_matches_paired_interpret():
    """Windowed and VMEM-resident paired kernels agree bit-exactly on the
    same SAH tree (same traversal order, same arithmetic — only the
    memory path differs)."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (
        pallas_ray_trace_paired, pallas_ray_trace_paired_streamed,
        pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=6)
    tracer = build_bvh(mesh.triangles())
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=14)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace_paired(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace_paired_streamed(tracer, o, d, tile=128,
                                         interpret=True, pair_win=32,
                                         leaf_win=32)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def _deep_caterpillar_tracer(depth: int):
    """Hand-built preorder tree whose near-first traversal DEFERS one far
    INTERNAL child per level, so stack occupancy grows to ~depth+1 — the
    regime where a fixed 64-deep stack silently drops subtrees (false
    misses). Leaf children are processed inline by the paired kernels, so
    a plain leaf-caterpillar never grows the stack; this tree gives every
    chain node I_k TWO internal children: a stub S_k (two leaf triangles
    at LARGE x = far) and I_{k+1} (subtree box starting at x=1 = near).
    Stub boxes are deliberately LOOSE in y (a valid conservative BVH) so
    every 128-lane tile union-hits both children at every level and
    defers all depth+1 stubs. Binned SAH caps skew too well to reach
    depth>64 with a buildable mesh (~30 at 2000 exponentially-spaced
    faces), hence hand-built.

    Preorder: I_0, S_0, A_0, B_0, I_1, S_1, ... I_{D-1}, S_{D-1}, A, B,
    S_D, A_D, B_D. Each ray lane targets one triangle's private y slot.
    """
    import jax.numpy as jnp

    from iris_tpu.geometry.bvh import Tracer

    d = depth
    n_nodes = 4 * d + 3
    n_faces = 2 * d + 2
    # stub S_k triangles at x = d+2-k (k<d); final stub S_d at x = 1
    stub_x = np.empty(d + 1, np.float32)
    stub_x[:d] = d + 2 - np.arange(d)
    stub_x[d] = 1.0
    face_x = np.repeat(stub_x, 2)
    face_y = 4.0 * np.arange(n_faces, dtype=np.float32)

    tris = np.zeros((n_faces, 3, 3), np.float32)
    tris[:, :, 0] = face_x[:, None]
    tris[:, 0, 1] = face_y - 1.0
    tris[:, 1, 1] = face_y + 2.0
    tris[:, 2, 1] = face_y - 1.0
    tris[:, 0, 2] = -1.0
    tris[:, 1, 2] = -1.0
    tris[:, 2, 2] = 2.0

    y_lo, y_hi = -1.0, face_y[-1] + 2.0
    nodes = np.zeros((n_nodes, 8), np.float32)

    def set_box(i, x0, x1):
        nodes[i, 0], nodes[i, 3] = x0 - 1e-3, x1 + 1e-3
        nodes[i, 1], nodes[i, 4] = y_lo, y_hi
        nodes[i, 2], nodes[i, 5] = -1.0, 2.0

    for k in range(d + 1):
        i_s = 4 * k + (1 if k < d else 0)        # S_k; S_d sits at 4d
        set_box(i_s, stub_x[k], stub_x[k])
        nodes[i_s, 6] = 4 * k + 5 if k < d else 0.0   # skip -> I_{k+1}
        nodes[i_s, 7] = float(i_s + 2)                 # first child = A_k
        for j, leaf_row in ((0, 2 * k), (1, 2 * k + 1)):   # A_k, B_k
            i_l = i_s + 1 + j
            set_box(i_l, stub_x[k], stub_x[k])
            nodes[i_l, 1], nodes[i_l, 4] = (face_y[leaf_row] - 1.0,
                                            face_y[leaf_row] + 2.0)
            nodes[i_l, 6] = (i_l + 2) if (j == 0 or k < d) else 0.0
            nodes[i_l, 7] = -float(leaf_row)           # leaf row (L=1)
    for k in range(d):
        i = 4 * k                                      # I_k
        set_box(i, 1.0, stub_x[k])
        nodes[i, 6] = 0.0                              # subtree runs to end
        nodes[i, 7] = float(4 * k + 2)                 # first child = S_k

    rows = np.zeros((n_faces, 12), np.float32)
    rows[:, 0:3] = tris[:, 0]
    rows[:, 3:6] = tris[:, 1] - tris[:, 0]
    rows[:, 6:9] = tris[:, 2] - tris[:, 0]
    rows[:, 9] = np.arange(n_faces)
    normals = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32),
                      (n_faces, 1))
    tracer = Tracer(
        nodes=jnp.asarray(nodes), tris=jnp.asarray(rows),
        face_normals=jnp.asarray(normals), n_nodes=n_nodes, leaf_size=1,
        n_faces=n_faces, layout="preorder", depth=depth + 1)
    # one ray lane per triangle y slot, all marching +x
    o = np.zeros((128, 3), np.float32)
    o[:, 1] = face_y[np.arange(128) % n_faces] + 0.25
    o[:, 2] = 0.1
    dr = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (128, 1))
    return tracer, tris, o, dr


def test_deep_tree_stack_sized_from_depth():
    """>64-deep trees (real ScanNet++ SAH regime) must not drop subtrees:
    every stack kernel + the XLA fallback, auto-sized from tracer.depth,
    matches brute force; the old fixed 64-deep stack provably does not."""
    from iris_tpu.geometry.bvh import preorder_max_depth
    from iris_tpu.geometry.intersect import ray_trace_tiled_ordered
    from iris_tpu.geometry.pallas_intersect import (
        pallas_ray_trace_dense, pallas_ray_trace_ordered,
        pallas_ray_trace_paired, pallas_ray_trace_paired_streamed)

    tracer, tris, o, d = _deep_caterpillar_tracer(96)
    assert tracer.depth == 97          # leaves sit 2 below each chain node
    assert preorder_max_depth(np.asarray(tracer.nodes)) == tracer.depth
    o, d = jnp.asarray(o), jnp.asarray(d)
    _, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris), o, d)
    t2 = np.asarray(o)[:, 0] * 0  # brute positions unused; compare t below
    assert np.asarray(v2).all()

    runs = {
        "paired": pallas_ray_trace_paired(tracer, o, d, tile=128,
                                          interpret=True),
        "paired_streamed": pallas_ray_trace_paired_streamed(
            tracer, o, d, tile=128, interpret=True, pair_win=16,
            leaf_win=16),
        "dense": pallas_ray_trace_dense(tracer, o, d, tile=128,
                                        interpret=True),
        "ordered": pallas_ray_trace_ordered(tracer, o, d, tile=128,
                                            interpret=True),
        "xla_tiled": ray_trace_tiled_ordered(tracer, o, d, tile=128),
    }
    for name, (t, u, v, face, valid) in runs.items():
        assert np.asarray(valid).all(), f"{name}: dropped hits"
        assert np.array_equal(np.asarray(face), np.asarray(i2)), \
            f"{name}: wrong faces on the deep tree"

    # the pre-fix behavior: a forced 64-deep stack DOES drop subtrees here
    _, _, _, f_old, v_old = pallas_ray_trace_paired(
        tracer, o, d, tile=128, interpret=True, stack_depth=64)
    assert not np.array_equal(np.asarray(f_old), np.asarray(i2)), \
        "64-deep stack unexpectedly exact — test scene no longer stresses it"


def test_pallas_dense_streamed_matches_dense_interpret():
    """HBM-windowed dense kernel vs the VMEM-resident dense kernel:
    bit-exact on the same tree (same traversal + arithmetic, only the
    memory path differs), with tiny windows to exercise crossings."""
    import pytest

    from iris_tpu.geometry.pallas_intersect import (
        pallas_ray_trace_dense, pallas_ray_trace_dense_streamed,
        pallas_streamable)

    mesh, _ = make_box_scene(n_clutter=12, seed=7)
    tracer = build_bvh(mesh.triangles())
    if not pallas_streamable(tracer):
        pytest.skip("native SAH builder unavailable (heap layout)")
    o, d = random_rays(512, seed=15)
    o, d = jnp.asarray(o), jnp.asarray(d)
    a = pallas_ray_trace_dense(tracer, o, d, tile=128, interpret=True)
    b = pallas_ray_trace_dense_streamed(tracer, o, d, tile=128,
                                        interpret=True, pair_win=8,
                                        leaf_win=8)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_dense_streamed_matches_brute_interpret():
    """Dense-streamed kernel vs brute force, including the deep-tree
    stack regime (auto-sized from tracer.depth)."""
    from iris_tpu.geometry.pallas_intersect import (
        pallas_ray_trace_dense_streamed)

    tracer, tris, o, d = _deep_caterpillar_tracer(96)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t, u, v, face, valid = pallas_ray_trace_dense_streamed(
        tracer, o, d, tile=128, interpret=True, pair_win=8, leaf_win=8)
    _, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris), o, d)
    assert np.asarray(valid).all()
    assert np.array_equal(np.asarray(face), np.asarray(i2))
