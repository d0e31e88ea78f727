import functools
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.procedural import camera_rays, make_box_scene
from iris_tpu.models.brdf import init_ngp_brdf
from iris_tpu.models.hashgrid import HashGridConfig
from iris_tpu.render import relight as R


def _scene(with_spots=False, ngp=None):
    mesh, is_em = make_box_scene(n_clutter=2, seed=0)
    shapes = [
        {"kind": "mesh", "tris": mesh.triangles(),
         "bsdf": {"type": "fipt"}},
        {"kind": "sphere", "subdiv": 1,
         "to_world": [{"type": "translate", "value": [0.6, 0.6, 0.5]},
                      {"type": "scale", "value": 0.1}],
         "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
         "emitter": {"radiance": [30.0, 25.0, 20.0]}},
        {"kind": "sphere", "subdiv": 1,
         "to_world": [{"type": "translate", "value": [1.4, 1.0, 0.3]},
                      {"type": "scale", "value": 0.15}],
         "bsdf": {"type": "conductor"}},
        {"kind": "sphere", "subdiv": 1,
         "to_world": [{"type": "translate", "value": [1.0, 1.4, 0.25]},
                      {"type": "scale", "value": 0.12}],
         "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.25, 0.7]}},
    ]
    rad = np.full((int(is_em.sum()), 3), 4.0, np.float32)
    scene = R.build_relight_scene(shapes, ngp=ngp, main_is_emitter=is_em,
                                  main_emitter_radiance=rad)
    if with_spots:
        spots = R.SpotLights(
            position=jnp.asarray([[1.0, 1.0, 0.9]]),
            direction=jnp.asarray([[0.0, 0.0, -1.0]]),
            intensity=jnp.asarray([[50.0, 10.0, 10.0]]),
            cutoff_cos=jnp.asarray([np.cos(np.radians(25.0))]),
            beam_cos=jnp.asarray([np.cos(np.radians(18.0))]),
        )
        scene = dc_replace(scene, spots=spots)
    return scene


def test_icosphere_unit():
    tris = R.icosphere(2)
    r = np.linalg.norm(tris.reshape(-1, 3), axis=-1)
    assert np.allclose(r, 1.0, atol=1e-6)


def test_apply_to_world_order():
    tris = R.icosphere(0)
    out = R.apply_to_world(tris, [{"type": "translate", "value": [5, 0, 0]},
                                  {"type": "scale", "value": 2.0}])
    c = out.reshape(-1, 3).mean(0)
    r = np.linalg.norm(out.reshape(-1, 3) - c, axis=-1)
    assert np.allclose(c, [5, 0, 0], atol=1e-2)
    assert 1.8 < r.mean() < 2.05  # scale applied before translate


def test_relight_render_finite_and_lit():
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    scene = _scene(ngp=ngp)
    o, d, dxdu, dydv = camera_rays(16)
    img = R.relight_path_tracing(
        jax.random.PRNGKey(1), scene, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(dxdu), jnp.asarray(dydv), spp=8, max_depth=3)
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    assert img.max() > 1e-3  # light reaches the camera


def test_spot_lights_add_energy():
    ngp = init_ngp_brdf(jax.random.PRNGKey(0), -0.1, 2.1,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    o, d, dxdu, dydv = camera_rays(12, origin=(1.0, 0.4, 0.6),
                                   look=(0.0, 1.0, -0.3))
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(dxdu),
            jnp.asarray(dydv))
    key = jax.random.PRNGKey(2)
    base = np.asarray(R.relight_path_tracing(
        key, _scene(False, ngp), *args, spp=8, max_depth=2))
    lit = np.asarray(R.relight_path_tracing(
        key, _scene(True, ngp), *args, spp=8, max_depth=2))
    assert lit.sum() > base.sum() * 1.01
    assert np.all(np.isfinite(lit))


def test_disco_ball_build():
    shapes, spots = R.make_disco_ball([1.0, 1.0, 0.7], 0.15, 20.0,
                                      light_num=6)
    assert len(shapes) == 7  # center ball + 6 lights
    assert spots.position.shape == (6, 3)
    n_em = sum(1 for s in shapes if "emitter" in s)
    assert n_em == 6
    # fibonacci points are on the unit sphere
    pts = R.fibonacci_sphere(32)
    assert np.allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-6)


def test_dynamic_subscene_matches_merged_build():
    """scene_intersect over static BVH + identity-rotation dynamic BVH must
    equal a single merged-soup build (same hits, same global face ids)."""
    mesh, is_em = make_box_scene(n_clutter=2, seed=0)
    rad = np.full((int(is_em.sum()), 3), 4.0, np.float32)
    main = {"kind": "mesh", "tris": mesh.triangles(),
            "bsdf": {"type": "fipt"}}
    ball = {"kind": "sphere", "subdiv": 1,
            "to_world": [{"type": "translate", "value": [1.0, 1.0, 0.5]},
                         {"type": "scale", "value": 0.2}],
            "bsdf": {"type": "diffuse", "reflectance": [0.3, 0.3, 0.3]}}
    merged = R.build_relight_scene([main, ball], main_is_emitter=is_em,
                                   main_emitter_radiance=rad)
    split = R.build_relight_scene([main], main_is_emitter=is_em,
                                  main_emitter_radiance=rad,
                                  dynamic_shapes=[ball],
                                  dynamic_center=[1.0, 1.0, 0.5])
    o, d, *_ = camera_rays(24, origin=(1.0, 0.3, 0.5), look=(0.0, 1.0, 0.0))
    o, d = jnp.asarray(o), jnp.asarray(d)
    pm, nm, _, tm, vm = R.scene_intersect(merged, o, d)
    ps, ns, _, ts, vs = R.scene_intersect(split, o, d)
    assert np.array_equal(np.asarray(vm), np.asarray(vs))
    assert np.array_equal(np.asarray(tm), np.asarray(ts))
    assert np.allclose(np.asarray(pm), np.asarray(ps), atol=1e-5)
    assert np.allclose(np.asarray(nm), np.asarray(ns), atol=1e-5)
    # ball faces resolve into the dynamic id range
    hit_ball = np.asarray(ts) >= split.dyn_face_offset
    assert hit_ball.any() and not hit_ball.all()


def test_disco_phase_rotates_without_recompile():
    """set_disco_phase moves the lights by pure data updates: the jitted
    renderer compiles ONCE across phases, and a half-turn visibly moves
    energy between the two sides of the room."""
    mesh, is_em = make_box_scene(n_clutter=0, seed=0)
    rad = np.zeros((int(is_em.sum()), 3), np.float32)  # kill room lights
    main = {"kind": "mesh", "tris": mesh.triangles(),
            "bsdf": {"type": "diffuse", "reflectance": [0.6, 0.6, 0.6]}}
    disco_shapes, spots = R.make_disco_ball([1.0, 1.0, 0.6], 0.12, 120.0,
                                            light_num=4,
                                            spot_intensity=50.0)
    scene0 = R.build_relight_scene([main], main_is_emitter=is_em,
                                   main_emitter_radiance=rad,
                                   dynamic_shapes=disco_shapes,
                                   dynamic_center=[1.0, 1.0, 0.6])
    o, d, dxdu, dydv = camera_rays(16, origin=(1.0, 0.3, 0.8),
                                   look=(0.0, 0.7, -0.5))
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(dxdu),
            jnp.asarray(dydv))

    import functools as ft
    render = jax.jit(ft.partial(R.relight_path_tracing, spp=16, max_depth=2))
    key = jax.random.PRNGKey(3)
    imgs = []
    for phase in (0.0, np.pi / 2, np.pi):
        scene = R.set_disco_phase(scene0, spots, phase)
        imgs.append(np.asarray(render(key, scene, *args)))
    assert render._cache_size() == 1, "recompiled across phases"
    for img in imgs:
        assert np.all(np.isfinite(img)) and img.sum() > 0
    # rotation changes the lighting pattern
    assert not np.allclose(imgs[0], imgs[2], atol=1e-3)
