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
