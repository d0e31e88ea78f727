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
