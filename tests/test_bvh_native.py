import jax.numpy as jnp
import numpy as np
import pytest

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.bvh_native import build_sah_arrays, get_lib
from iris_tpu.geometry.intersect import ray_intersect, ray_intersect_brute
from iris_tpu.geometry.procedural import make_box_scene, random_rays


@pytest.fixture(scope="module")
def have_native():
    if get_lib() is None:
        pytest.skip("no C++ toolchain / native builder")
    return True


def test_sah_arrays_wellformed(have_native):
    mesh, _ = make_box_scene(n_clutter=5, seed=2)
    tris = mesh.triangles()
    nodes, rows = build_sah_arrays(tris, leaf_size=4)
    n = len(nodes)
    # skip pointers in range, root skip == 0
    assert nodes[0, 6] == 0
    assert np.all(nodes[:, 6] >= 0) and np.all(nodes[:, 6] <= n)
    # descend pointers: internal in range, leaves point into rows
    desc = nodes[:, 7]
    internal = desc >= 1
    assert np.all(desc[internal] <= n)
    leaf_starts = -desc[~internal]
    assert np.all(leaf_starts >= 0) and np.all(leaf_starts + 4 <= len(rows))
    # every original face appears exactly once among non-padding rows
    ids = rows[:, 9].astype(int)
    real = ids[ids >= 0]
    assert sorted(real.tolist()) == list(range(len(tris)))


def test_sah_traversal_matches_brute(have_native):
    mesh, _ = make_box_scene(n_clutter=6, seed=0)
    tris = mesh.triangles()
    tracer = build_bvh(tris, method="sah")
    o, d = random_rays(512, seed=4)
    p1, n1, uv1, i1, v1 = ray_intersect(tracer, jnp.asarray(o),
                                        jnp.asarray(d))
    p2, n2, uv2, i2, v2 = ray_intersect_brute(jnp.asarray(tris),
                                              jnp.asarray(o),
                                              jnp.asarray(d))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    pv = np.asarray(v1)
    assert np.allclose(np.asarray(p1)[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(i1) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_sbvh_spatial_splits_match_brute(have_native):
    """Spatial-split trees (alpha >= 0) duplicate references with clipped
    node bounds; closest-hit results must be identical to brute force
    (duplicate leaf entries are idempotent under the min-reduction)."""
    mesh, _ = make_box_scene(n_clutter=12, seed=3)
    tris = mesh.triangles()
    nodes, rows = build_sah_arrays(tris, leaf_size=4, spatial_alpha=1e-3)
    ids = rows[:, 9].astype(int)
    real = ids[ids >= 0]
    # every face still reachable; duplication happens but stays capped
    assert set(real.tolist()) == set(range(len(tris)))
    assert len(real) <= 1.8 * len(tris) + 1

    import os

    os.environ["IRIS_TPU_BVH_ALPHA"] = "1e-3"
    try:
        tracer = build_bvh(tris, method="sah")
    finally:
        del os.environ["IRIS_TPU_BVH_ALPHA"]
    o, d = random_rays(512, seed=9)
    p1, _, _, i1, v1 = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris), jnp.asarray(o),
                                           jnp.asarray(d))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    pv = np.asarray(v1)
    assert np.allclose(np.asarray(p1)[pv], np.asarray(p2)[pv], atol=1e-3)


def test_sah_bigger_leaves_match_brute(have_native):
    """leaf_size dial (tile-walk cost lever, probes/leafsize_ab.py):
    traversal must stay exact at any leaf_size the kernels accept."""
    mesh, _ = make_box_scene(n_clutter=8, seed=5)
    tris = mesh.triangles()
    for ls in (8, 10):
        tracer = build_bvh(tris, method="sah", leaf_size=ls)
        o, d = random_rays(256, seed=ls)
        p1, _, _, _, v1 = ray_intersect(tracer, jnp.asarray(o),
                                        jnp.asarray(d))
        p2, _, _, _, v2 = ray_intersect_brute(jnp.asarray(tris),
                                              jnp.asarray(o), jnp.asarray(d))
        assert np.array_equal(np.asarray(v1), np.asarray(v2))
        pv = np.asarray(v1)
        assert np.allclose(np.asarray(p1)[pv], np.asarray(p2)[pv],
                           atol=1e-3)


def test_sah_random_soup(have_native):
    rng = np.random.default_rng(11)
    tris = rng.uniform(-1, 1, size=(777, 3, 3)).astype(np.float32)
    tracer = build_bvh(tris, method="sah")
    o = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p1, _, _, i1, v1 = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    p2, _, _, i2, v2 = ray_intersect_brute(jnp.asarray(tris), jnp.asarray(o),
                                           jnp.asarray(d))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    pv = np.asarray(v1)
    assert np.allclose(np.asarray(p1)[pv], np.asarray(p2)[pv], atol=1e-3)
