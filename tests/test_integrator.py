import functools

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.geometry.procedural import make_box_scene
from iris_tpu.models import brdf as B
from iris_tpu.models import emitter as E
from iris_tpu.models import slf as S
from iris_tpu.render import integrator as I


def _setup(radiance=8.0, n_clutter=0, with_slf=False, slf_value=0.0):
    mesh, is_em = make_box_scene(n_clutter=n_clutter)
    tracer = build_bvh(mesh.triangles())
    slf = None
    if with_slf:
        mask = np.ones((4, 4, 4), bool)
        slf = S.init_voxel_slf(mask, 0.0, 2.0)
        if slf_value:
            slf = S.VoxelSLF(slf.inds,
                             jnp.full_like(slf.radiance, slf_value),
                             slf.count, slf.voxel_min, slf.voxel_max, slf.H)
    em = E.make_emitter(is_em, mesh.triangles(),
                        radiance=np.full((2, 3), radiance, np.float32),
                        slf=slf)
    mat = B.ConstantBRDF(
        albedo=jnp.asarray([0.6, 0.5, 0.4]),
        roughness=jnp.asarray([0.8]),
        metallic=jnp.asarray([0.0]),
    )
    mat_fn = functools.partial(B.constant_brdf_apply, mat)
    return mesh, tracer, em, mat_fn, mat


def _floor_ray():
    """A camera ray hitting the floor near the room center."""
    o = np.asarray([[1.0, 1.0, 0.6]], np.float32)
    d = np.asarray([[0.05, 0.02, -1.0]], np.float32)
    d /= np.linalg.norm(d)
    z = np.zeros((1, 3), np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(z), jnp.asarray(z)


def _reference_direct_mc(tracer, em, mat_fn, o, d, n=400_000, seed=5):
    """Independent direct-lighting estimator: uniform-hemisphere sampling of
    eval_brdf * visible Le — validates NEE+MIS against plain MC."""
    pos, nrm, _, tri, valid = ray_intersect(tracer, o, d)
    assert bool(valid[0])
    le0, _, _ = E.eval_emitter(em, pos, d, tri)
    p = jnp.broadcast_to(pos, (n, 3))
    nvec = np.asarray(nrm[0])
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (n,))
    phi = jax.random.uniform(k2, (n,)) * 2 * np.pi
    s = jnp.sqrt(1 - z * z)
    # local hemisphere around normal
    t = np.cross([1.0, 0, 0] if abs(nvec[0]) < 0.9 else [0, 1.0, 0], nvec)
    t /= np.linalg.norm(t)
    bt = np.cross(nvec, t)
    wi = (s * jnp.cos(phi))[:, None] * t + (s * jnp.sin(phi))[:, None] * bt \
        + z[:, None] * nvec
    wi = wi.astype(jnp.float32)
    from iris_tpu.const import RAY_EPS
    hit_pos, _, _, hit_tri, _ = ray_intersect(tracer, p + RAY_EPS * wi, wi)
    le, _, _ = E.eval_emitter(em, hit_pos, wi, hit_tri)
    mat = mat_fn(p)
    wo = jnp.broadcast_to(-d, (n, 3))
    nb = jnp.broadcast_to(nrm, (n, 3))
    brdf, _ = B.eval_brdf(wi, wo, nb, mat)
    # pdf = 1/(2pi)
    return np.asarray(le0[0]) + np.asarray(
        jnp.mean(brdf * le, axis=0) * 2 * np.pi
    )


def test_single_bounce_matches_plain_mc():
    _, tracer, em, mat_fn, _ = _setup(radiance=8.0, with_slf=True)
    o, d, dx, dy = _floor_ray()
    out = I.path_tracing_single(jax.random.PRNGKey(0), tracer, em, mat_fn,
                                o, d, dx, dy, spp=4096)
    ref = _reference_direct_mc(tracer, em, mat_fn, o, d)
    assert np.allclose(np.asarray(out[0]), ref, rtol=0.06, atol=5e-3), (
        np.asarray(out[0]), ref)


def test_single_bounce_linear_in_radiance():
    _, tracer, em, mat_fn, _ = _setup(radiance=4.0, with_slf=True)
    o, d, dx, dy = _floor_ray()
    key = jax.random.PRNGKey(1)
    l1 = I.path_tracing_single(key, tracer, em, mat_fn, o, d, dx, dy, 512)
    em2 = E.Emitter(em.is_emitter, em.emitter_idx, em.triangle_idx,
                    em.emitter_vertices, em.emitter_area, em.radiance * 2,
                    em.emitter_pdf, em.emitter_cdf, em.slf)
    l2 = I.path_tracing_single(key, tracer, em2, mat_fn, o, d, dx, dy, 512)
    assert np.allclose(np.asarray(l2), 2 * np.asarray(l1), rtol=1e-4)


def test_full_exceeds_single_with_indirect():
    """Full path tracing adds indirect energy over direct-only in a closed
    room with zero cache."""
    _, tracer, em, mat_fn, _ = _setup(radiance=8.0, with_slf=True)
    o, d, dx, dy = _floor_ray()
    key = jax.random.PRNGKey(2)
    l_single = I.path_tracing_single(key, tracer, em, mat_fn, o, d, dx, dy,
                                     2048)
    l_full = I.path_tracing(key, tracer, em, mat_fn, o, d, dx, dy, 2048,
                            indir_depth=3)
    assert float(l_full.sum()) > float(l_single.sum()) * 1.02
    assert np.all(np.isfinite(np.asarray(l_full)))


def test_gradients_flow_to_emitter_radiance():
    _, tracer, em, mat_fn, _ = _setup(radiance=4.0, with_slf=True)
    o, d, dx, dy = _floor_ray()

    def loss(rad):
        em2 = E.Emitter(em.is_emitter, em.emitter_idx, em.triangle_idx,
                        em.emitter_vertices, em.emitter_area, rad,
                        em.emitter_pdf, em.emitter_cdf, em.slf)
        out = I.path_tracing_single(jax.random.PRNGKey(3), tracer, em2,
                                    mat_fn, o, d, dx, dy, 256)
        return out.sum()

    g = jax.grad(loss)(em.radiance)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
    # linearity: grad * radiance == rendered value (emission term linear)
    val = loss(em.radiance)
    assert np.isclose(float(jnp.sum(g * em.radiance)), float(val), rtol=1e-3)


def test_gradients_flow_to_ngp_material():
    mesh, is_em = make_box_scene(n_clutter=0)
    tracer = build_bvh(mesh.triangles())
    mask = np.ones((4, 4, 4), bool)
    slf = S.init_voxel_slf(mask, 0.0, 2.0)
    em = E.make_emitter(is_em, mesh.triangles(),
                        radiance=np.full((2, 3), 8.0, np.float32), slf=slf)
    from iris_tpu.models.hashgrid import HashGridConfig
    params = B.init_ngp_brdf(jax.random.PRNGKey(0), 0.0, 2.0,
                             HashGridConfig(n_levels=4, log2_table_size=10))
    o, d, dx, dy = _floor_ray()

    def loss(p):
        mat_fn = functools.partial(B.ngp_brdf_apply, p)
        out = I.path_tracing_single(jax.random.PRNGKey(4), tracer, em,
                                    mat_fn, o, d, dx, dy, 128)
        return out.sum()

    g = jax.grad(loss)(params)
    table_g = float(jnp.abs(g.table).sum())
    mlp_g = float(sum(jnp.abs(w).sum() for w in g.mlp["w"]))
    assert np.isfinite(table_g) and table_g > 0
    assert np.isfinite(mlp_g) and mlp_g > 0


def test_radiance_cache_terminates_paths():
    """With a saturated SLF cache, single-bounce picks up cache values on the
    second hit (trace_roughness=0)."""
    _, tracer, em, mat_fn, _ = _setup(radiance=0.0, with_slf=True,
                                      slf_value=1.0)
    o, d, dx, dy = _floor_ray()
    out = I.path_tracing_single(jax.random.PRNGKey(5), tracer, em, mat_fn,
                                o, d, dx, dy, 1024)
    # pure cache bounce: L = integral brdf * 1 ~ albedo reflectance
    val = np.asarray(out[0])
    assert np.all(val > 0.1) and np.all(val < 1.0)


def test_det_diff_bake_matches_cache_integral():
    """Diffuse bake over a constant radiance cache L=1 returns ~1 (the
    cosine-weighted integral of constant incident light)."""
    _, tracer, em, mat_fn, _ = _setup(radiance=0.0, with_slf=True,
                                      slf_value=1.0)
    o, d, dx, dy = _floor_ray()
    pos, nrm, uv, tri, valid = ray_intersect(tracer, o, d)
    wis = jnp.broadcast_to(d, pos.shape)
    out = I.path_tracing_det_diff(jax.random.PRNGKey(6), tracer, em, mat_fn,
                                  pos, wis, nrm, uv, tri, spp=512,
                                  indir_depth=2)
    # ~5% of the cosine-weighted hemisphere sees the (black) emitter quad,
    # which returns its radiance (0) instead of the cache.
    val = np.asarray(out[0])
    assert np.all(val > 0.90) and np.all(val <= 1.0 + 1e-4), val


def test_det_spec_bake_finite_and_reasonable():
    _, tracer, em, mat_fn, _ = _setup(radiance=8.0, with_slf=True)
    o, d, dx, dy = _floor_ray()
    pos, nrm, uv, tri, valid = ray_intersect(tracer, o, d)
    wis = jnp.broadcast_to(d, pos.shape)
    l0, l1 = I.path_tracing_det_spec(jax.random.PRNGKey(7), tracer, em,
                                     mat_fn, 0.5, pos, wis, nrm, uv, tri,
                                     spp=256, indir_depth=2)
    assert np.all(np.isfinite(np.asarray(l0)))
    assert np.all(np.isfinite(np.asarray(l1)))
    assert float(l0.sum()) > 0


def test_integrators_jit_compile():
    _, tracer, em, mat_fn, _ = _setup(radiance=8.0, with_slf=True)
    o, d, dx, dy = _floor_ray()
    f = jax.jit(lambda k: I.path_tracing_single(k, tracer, em, mat_fn, o, d,
                                                dx, dy, 64))
    a = f(jax.random.PRNGKey(8))
    b = f(jax.random.PRNGKey(8))
    assert np.allclose(np.asarray(a), np.asarray(b))
