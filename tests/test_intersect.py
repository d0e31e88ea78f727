import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.intersect import ray_intersect, ray_intersect_brute
from iris_tpu.geometry.procedural import make_box_scene, random_rays


def _compare(tracer, tris, o, d):
    p1, n1, uv1, i1, v1 = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    p2, n2, uv2, i2, v2 = ray_intersect_brute(
        jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d)
    )
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    # identical hit triangle except where two triangles are coplanar-adjacent
    # (equal t): compare hit distance instead of index.
    same = np.asarray(i1) == np.asarray(i2)
    pv = np.asarray(v1)
    assert np.allclose(np.asarray(p1)[pv], np.asarray(p2)[pv], atol=1e-3)
    frac_same = same[pv].mean() if pv.any() else 1.0
    assert frac_same > 0.99, frac_same
    assert np.allclose(np.asarray(n1)[pv & same], np.asarray(n2)[pv & same],
                       atol=1e-4)
    assert np.allclose(np.asarray(uv1)[pv & same], np.asarray(uv2)[pv & same],
                       atol=1e-3)


def test_bvh_matches_brute_force_box_scene():
    mesh, _ = make_box_scene(n_clutter=6, seed=0)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    o, d = random_rays(512, seed=1)
    _compare(tracer, tris, o, d)


def test_bvh_matches_brute_force_random_soup():
    rng = np.random.default_rng(7)
    tris = rng.uniform(-1, 1, size=(333, 3, 3)).astype(np.float32)
    tracer = build_bvh(tris)
    o = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _compare(tracer, tris, o, d)


def test_single_triangle():
    tris = np.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float32
    )
    tracer = build_bvh(tris)
    o = np.asarray([[0.2, 0.2, 1.0], [2.0, 2.0, 1.0]], np.float32)
    d = np.asarray([[0, 0, -1], [0, 0, -1]], np.float32)
    p, n, uv, i, v = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    assert bool(v[0]) and not bool(v[1])
    assert np.allclose(p[0], [0.2, 0.2, 0.0], atol=1e-6)
    assert int(i[0]) == 0 and int(i[1]) == -1
    # normal faces the viewer (+z)
    assert np.allclose(n[0], [0, 0, 1], atol=1e-6)


def test_miss_outputs_are_clean():
    mesh, _ = make_box_scene()
    tracer = build_bvh(mesh.triangles())
    o = np.full((4, 3), 10.0, np.float32)  # outside the room
    d = np.tile(np.asarray([[1.0, 0, 0]], np.float32), (4, 1))
    p, n, uv, i, v = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    assert not np.any(np.asarray(v))
    assert np.all(np.asarray(i) == -1)
    assert np.all(np.isfinite(np.asarray(p)))


def test_normals_are_viewer_facing():
    mesh, _ = make_box_scene()
    tracer = build_bvh(mesh.triangles())
    o, d = random_rays(256, seed=3)
    p, n, uv, i, v = ray_intersect(tracer, jnp.asarray(o), jnp.asarray(d))
    nov = np.sum(np.asarray(n) * -np.asarray(d), axis=-1)
    assert np.all(nov[np.asarray(v)] > 0)


def test_ordered_tiled_matches_brute():
    from iris_tpu.geometry.intersect import ray_trace_tiled_ordered
    mesh, _ = make_box_scene(n_clutter=6, seed=0)
    tris = mesh.triangles()
    tracer = build_bvh(tris)
    o, d = random_rays(512, seed=5)
    t, u, v, face, valid = ray_trace_tiled_ordered(
        tracer, jnp.asarray(o), jnp.asarray(d), tile=128, stack_depth=32)
    p2, n2, uv2, i2, v2 = ray_intersect_brute(
        jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(valid), np.asarray(v2))
    pv = np.asarray(valid)
    p1 = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    assert np.allclose(p1[pv], np.asarray(p2)[pv], atol=1e-3)
    same = (np.asarray(face) == np.asarray(i2))[pv]
    assert same.mean() > 0.99


def test_pallas_mode_policy_cpu():
    """Kernel auto-selection: CPU-pinned runs must always take the XLA
    path; the escape hatch and the ray-count floor gate the TPU path."""
    import os

    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.geometry.intersect import _pallas_mode
    from iris_tpu.geometry.procedural import make_box_scene

    mesh, _ = make_box_scene(n_clutter=4, seed=0)
    tracer = build_bvh(mesh.triangles())
    # tests pin jax_default_device to CPU (conftest) -> always None
    assert _pallas_mode(tracer, 1 << 18) is None
    assert _pallas_mode(tracer, 16) is None
    os.environ["IRIS_TPU_NO_PALLAS"] = "1"
    try:
        assert _pallas_mode(tracer, 1 << 18) is None
    finally:
        del os.environ["IRIS_TPU_NO_PALLAS"]


def test_kernel_gates_round5_policy():
    """Locks the round-5 auto-policy outcome at ~102K faces: the 3-axis
    binned-SAH tree (tighter than the round-4 single-axis one — its
    dense staging now fits the 10 MB gate) must still STREAM, because
    the same-timer device A/Bs say paired_streamed beats dense-resident
    at every measured size in the window (42K/72K:
    records/window_policy_r5.log; 102K: records/policy102k_scan_r4.log)
    — the round-5 policy fix ranks paired_streamed above dense whenever
    the paired-resident gate rejects the tracer."""
    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry import pallas_intersect as pi

    tracer, *_ = make_demo_scene(n_clutter=8500, slf_res=8, hash_levels=2,
                                 log2_table=8)
    assert tracer.n_faces > 100_000
    assert not pi.paired_available(tracer)          # too big to stage
    assert pi.dense_available(tracer)               # fits, but loses A/Bs
    # the selected regime: near-first paired traversal through HBM windows
    assert pi.paired_streamed_available(tracer)


def test_policy_order_paired_streamed_over_dense(monkeypatch):
    """Round-5 policy fix (VERDICT r4 item 3): in auto mode,
    paired_streamed must outrank the lane-dense resident kernel whenever
    the paired-resident gate rejects the tracer — dense lost every
    same-timer device A/B in the 30-102K-face window (records/
    window_policy_r5.log, records/policy102k_scan_r4.log). Simulated on
    CPU by faking a TPU backend and pinning the availability gates."""
    import jax

    from iris_tpu.demo import make_demo_scene
    from iris_tpu.geometry import intersect as I
    from iris_tpu.geometry import pallas_intersect as pi

    tracer, *_ = make_demo_scene(n_clutter=8500, slf_res=8, hash_levels=2,
                                 log2_table=8)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", None)
    try:
        # gate truth at this size: paired rejects, dense fits, ps streams
        assert not pi.paired_available(tracer)
        assert pi.dense_available(tracer)
        assert pi.paired_streamed_available(tracer)
        assert I._pallas_mode(tracer, 1 << 18) == "paired_streamed"
        # explicit escape hatches still reachable
        monkeypatch.setenv("IRIS_TPU_DENSE", "1")
        assert I._pallas_mode(tracer, 1 << 18) == "dense"
        monkeypatch.setenv("IRIS_TPU_DENSE", "auto")
        monkeypatch.setenv("IRIS_TPU_PAIRED_STREAMED", "0")
        assert I._pallas_mode(tracer, 1 << 18) == "dense"
    finally:
        jax.config.update("jax_default_device", prev)
