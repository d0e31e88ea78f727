"""General scene integrator for relighting / object insertion.

TPU-native replacement for the reference's Mitsuba-driven relight path
(render_relight.py + model/fipt_bsdf.py): the reference embeds the learned
BRDF as a Mitsuba plugin and lets Mitsuba's wavefront path tracer drive;
here the whole scene — main mesh with the learned FIPT BSDF, inserted
objects, analytic sphere emitters — is merged into ONE triangle soup + BVH
with per-face material records, and a lax.scan NEE+MIS path tracer renders
it end-to-end under jit.

Unification trick: every surface maps onto the (albedo, roughness,
metallic) GGX+Lambert model already used for training —
  diffuse     -> (reflectance, 1.0, 0)
  conductor   -> (tint, 0.05, 1)   (mitsuba 'none' = bare mirror)
  fipt        -> hash-grid BRDF output, selected per-lane by a use_ngp flag
so material dispatch is a masked select, not control flow. Spheres are
icosphere-tessellated (triangles ride the same BVH). Spot lights are delta
emitters handled by a dedicated NEE term each bounce
(mitsuba spot semantics: full intensity inside beam_width, smooth falloff
to cutoff_angle).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.const import RAY_EPS
from iris_tpu.core.vecmath import dot, normalize
from iris_tpu.geometry.bvh import Tracer, build_bvh
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models import brdf as B
from iris_tpu.models.brdf import NGPBRDF, ngp_brdf_apply
from iris_tpu.models.emitter import Emitter, eval_emitter, make_emitter
from iris_tpu.render.integrator import _mis_power2


# ------------------------------------------------------------- geometry

def icosphere(subdiv: int = 2) -> np.ndarray:
    """Unit icosphere triangles (F, 3, 3)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.asarray([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.asarray([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int64)
    tris = verts[faces]
    for _ in range(subdiv):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab = a + b
        bc = b + c
        ca = c + a
        ab /= np.linalg.norm(ab, axis=-1, keepdims=True)
        bc /= np.linalg.norm(bc, axis=-1, keepdims=True)
        ca /= np.linalg.norm(ca, axis=-1, keepdims=True)
        tris = np.concatenate([
            np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
            np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1),
        ], 0)
    return tris.astype(np.float32)


def apply_to_world(tris: np.ndarray, transforms: list[dict]) -> np.ndarray:
    """Mitsuba-style to_world list: translate/scale/rotate applied in
    REVERSE list order (T1.translate(a).scale(b) scales first)."""
    m = np.eye(4)
    for tr in transforms:
        t = np.eye(4)
        if tr["type"] == "translate":
            t[:3, 3] = tr["value"]
        elif tr["type"] == "scale":
            v = tr["value"]
            v = [v, v, v] if np.isscalar(v) else v
            t[0, 0], t[1, 1], t[2, 2] = v
        elif tr["type"] == "rotate":
            axis = np.asarray(tr["axis"], np.float64)
            axis = axis / np.linalg.norm(axis)
            ang = np.radians(tr["angle"])
            k = np.asarray([[0, -axis[2], axis[1]],
                            [axis[2], 0, -axis[0]],
                            [-axis[1], axis[0], 0]])
            t[:3, :3] = (np.eye(3) + np.sin(ang) * k
                         + (1 - np.cos(ang)) * k @ k)
        m = m @ t
    p = tris.reshape(-1, 3)
    p = p @ m[:3, :3].T + m[:3, 3]
    return p.reshape(-1, 3, 3).astype(np.float32)


# ------------------------------------------------------ scene container

@jax.tree_util.register_dataclass
@dataclass
class SpotLights:
    position: jnp.ndarray      # (S, 3)
    direction: jnp.ndarray     # (S, 3) unit
    intensity: jnp.ndarray     # (S, 3)
    cutoff_cos: jnp.ndarray    # (S,)
    beam_cos: jnp.ndarray      # (S,)


@jax.tree_util.register_dataclass
@dataclass
class RelightScene:
    tracer: Tracer
    emitter: Emitter              # merged area emitters (mesh + spheres)
    face_albedo: jnp.ndarray      # (F, 3)
    face_roughness: jnp.ndarray   # (F, 1)
    face_metallic: jnp.ndarray    # (F, 1)
    face_use_ngp: jnp.ndarray     # (F,) bool
    ngp: NGPBRDF | None
    spots: SpotLights | None
    # Optional rigid-animated sub-scene (e.g. the disco ball): its own small
    # BVH built ONCE at phase 0; per-frame motion is a rotation applied to
    # the RAYS (world->local) instead of rebuilding any BVH. Face ids of the
    # dynamic soup live at [dyn_face_offset, F) in the per-face arrays.
    dyn_tracer: Tracer | None = None
    dyn_center: jnp.ndarray | None = None   # (3,) rotation pivot
    dyn_rot: jnp.ndarray | None = None      # (3,3) local->world rotation
    dyn_face_offset: int = field(default=0, metadata=dict(static=True))


def scene_intersect(scene: RelightScene, o, d):
    """Nearest hit over static + (optionally) rigid-animated geometry.

    The dynamic soup is intersected in its local frame by transforming the
    rays (local = R^T(world - c) + c) — zero per-frame BVH work — and hit
    position/normal are rotated back to world."""
    pos, nrm, uv, tri, valid = ray_intersect(scene.tracer, o, d)
    if scene.dyn_tracer is None:
        return pos, nrm, uv, tri, valid
    c, r = scene.dyn_center, scene.dyn_rot
    o_l = (o - c) @ r + c
    d_l = d @ r
    p2, n2, uv2, t2, v2 = ray_intersect(scene.dyn_tracer, o_l, d_l)
    p2 = (p2 - c) @ r.T + c
    n2 = n2 @ r.T
    d1 = jnp.sum((pos - o) ** 2, -1)
    d2 = jnp.sum((p2 - o) ** 2, -1)
    use2 = v2 & ((~valid) | (d2 < d1))
    u2 = use2[:, None]
    return (jnp.where(u2, p2, pos), jnp.where(u2, n2, nrm),
            jnp.where(u2, uv2, uv),
            jnp.where(use2, t2 + scene.dyn_face_offset, tri),
            valid | v2)


def _rot_z(phase):
    c, s = jnp.cos(phase), jnp.sin(phase)
    return jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def set_disco_phase(base: RelightScene, base_spots: SpotLights | None,
                    phase) -> RelightScene:
    """Per-frame disco-ball pose: rotate the dynamic sub-scene by `phase`
    about its center (pure data updates — same pytree structure, so the
    jitted renderer never recompiles; reference disco_ball.py regenerates
    the lattice per frame instead)."""
    assert base.dyn_tracer is not None
    rot = _rot_z(jnp.asarray(phase, jnp.float32))
    c = base.dyn_center
    em = base.emitter
    dyn = (em.triangle_idx >= base.dyn_face_offset)[:, None, None]
    v = em.emitter_vertices
    v_w = jnp.where(dyn, (v - c) @ rot.T + c, v)
    em = Emitter(em.is_emitter, em.emitter_idx, em.triangle_idx,
                 v_w, em.emitter_area, em.radiance, em.emitter_pdf,
                 em.emitter_cdf, em.slf)
    spots = None
    if base_spots is not None and base_spots.position.shape[0] > 0:
        spots = SpotLights(
            position=(base_spots.position - c) @ rot.T + c,
            direction=base_spots.direction @ rot.T,
            intensity=base_spots.intensity,
            cutoff_cos=base_spots.cutoff_cos,
            beam_cos=base_spots.beam_cos,
        )
    from dataclasses import replace as dc_replace
    return dc_replace(base, emitter=em, spots=spots, dyn_rot=rot)


def empty_spots() -> SpotLights:
    z3 = jnp.zeros((0, 3))
    z1 = jnp.zeros((0,))
    return SpotLights(z3, z3, z3, z1, z1)


def build_relight_scene(
    shapes: list[dict],
    ngp: NGPBRDF | None = None,
    main_is_emitter: np.ndarray | None = None,
    main_emitter_radiance: np.ndarray | None = None,
    dynamic_shapes: list[dict] | None = None,
    dynamic_center=None,
) -> RelightScene:
    """shapes: list of dicts with keys
      kind: 'mesh'|'sphere', tris (mesh) or to_world (sphere),
      bsdf: {'type': 'fipt'|'diffuse'|'conductor', 'reflectance': rgb,
             'roughness': float}
      emitter: None | {'radiance': rgb}
    Spot lights are passed separately via add-on (see load_scene_yaml).

    dynamic_shapes (e.g. the disco ball at phase 0) get their OWN small BVH
    and are animated per frame by set_disco_phase — the main-scene BVH is
    built exactly once per run.
    """
    all_tris, alb, rough, metal, use_ngp = [], [], [], [], []
    is_em, radiance = [], []
    n_static_shapes = len(shapes)
    shapes = list(shapes) + list(dynamic_shapes or [])
    n_static_faces = 0
    for shape_i, sh in enumerate(shapes):
        tris = sh["tris"] if sh["kind"] == "mesh" else apply_to_world(
            icosphere(sh.get("subdiv", 2)), sh["to_world"])
        f = len(tris)
        all_tris.append(tris)
        if shape_i < n_static_shapes:
            n_static_faces += f
        bsdf = sh.get("bsdf", {"type": "diffuse", "reflectance": [0, 0, 0]})
        kind = bsdf.get("type", "diffuse")
        if kind == "fipt":
            alb.append(np.zeros((f, 3), np.float32))
            rough.append(np.ones((f, 1), np.float32))
            metal.append(np.zeros((f, 1), np.float32))
            use_ngp.append(np.ones(f, bool))
        elif kind == "conductor":
            tint = np.asarray(bsdf.get("reflectance", [1.0, 1.0, 1.0]),
                              np.float32)
            alb.append(np.tile(tint, (f, 1)))
            rough.append(np.full((f, 1), bsdf.get("roughness", 0.05),
                                 np.float32))
            metal.append(np.ones((f, 1), np.float32))
            use_ngp.append(np.zeros(f, bool))
        else:  # diffuse
            refl = np.asarray(bsdf.get("reflectance", [0.5, 0.5, 0.5]),
                              np.float32)
            alb.append(np.tile(refl, (f, 1)))
            rough.append(np.ones((f, 1), np.float32))
            metal.append(np.zeros((f, 1), np.float32))
            use_ngp.append(np.zeros(f, bool))
        em_cfg = sh.get("emitter")
        if sh["kind"] == "mesh" and main_is_emitter is not None and \
                kind == "fipt":
            is_em.append(np.asarray(main_is_emitter, bool))
            r = np.zeros((f, 3), np.float32)
            r[np.asarray(main_is_emitter, bool)] = main_emitter_radiance
            radiance.append(r)
        elif em_cfg is not None:
            is_em.append(np.ones(f, bool))
            radiance.append(np.tile(np.asarray(em_cfg["radiance"],
                                               np.float32), (f, 1)))
        else:
            is_em.append(np.zeros(f, bool))
            radiance.append(np.zeros((f, 3), np.float32))

    tris = np.concatenate(all_tris, 0)
    is_em = np.concatenate(is_em)
    rad_per_face = np.concatenate(radiance, 0)
    emitter = make_emitter(is_em, tris, radiance=rad_per_face[is_em]
                           if is_em.any() else None)
    dyn_tracer = dyn_center = None
    if dynamic_shapes:
        dyn_tris = tris[n_static_faces:]
        dyn_tracer = build_bvh(dyn_tris)
        if dynamic_center is None:
            dynamic_center = dyn_tris.reshape(-1, 3).mean(0)
        dyn_center = jnp.asarray(dynamic_center, jnp.float32)
    return RelightScene(
        tracer=build_bvh(tris[:n_static_faces]),
        emitter=emitter,
        face_albedo=jnp.asarray(np.concatenate(alb, 0)),
        face_roughness=jnp.asarray(np.concatenate(rough, 0)),
        face_metallic=jnp.asarray(np.concatenate(metal, 0)),
        face_use_ngp=jnp.asarray(np.concatenate(use_ngp)),
        ngp=ngp,
        spots=None,
        dyn_tracer=dyn_tracer,
        dyn_center=dyn_center,
        dyn_rot=jnp.eye(3) if dyn_tracer is not None else None,
        dyn_face_offset=n_static_faces,
    )


def _surface_mat(scene: RelightScene, position, tri_idx):
    """Per-lane material: NGP output where the face says so, else the
    per-face constants."""
    safe = jnp.maximum(tri_idx, 0)
    alb = scene.face_albedo[safe]
    rough = scene.face_roughness[safe]
    metal = scene.face_metallic[safe]
    if scene.ngp is not None:
        ngp_mat = ngp_brdf_apply(scene.ngp, position)
        use = scene.face_use_ngp[safe][:, None]
        alb = jnp.where(use, ngp_mat["albedo"], alb)
        rough = jnp.where(use, ngp_mat["roughness"], rough)
        metal = jnp.where(use, ngp_mat["metallic"], metal)
    return {"albedo": alb, "roughness": rough, "metallic": metal}


def _spot_nee(scene: RelightScene, position, wo, normal, mat, active):
    """Delta spot-light NEE: ALL spot shadow rays batched into ONE
    (S*B)-ray traversal (keeps the union-traversal tiles fed; the naive
    per-spot loop costs S full launches per bounce)."""
    spots = scene.spots
    if spots is None or spots.position.shape[0] == 0:
        return jnp.zeros_like(position)
    b = position.shape[0]
    s = spots.position.shape[0]
    delta = spots.position[None] - position[:, None]        # (B, S, 3)
    dist2 = jnp.maximum(jnp.sum(delta ** 2, -1), 1e-8)       # (B, S)
    wi = delta / jnp.sqrt(dist2)[..., None]
    # spot cone falloff
    cos_d = jnp.sum(-wi * spots.direction[None], -1)         # (B, S)
    t = (cos_d - spots.cutoff_cos[None]) / jnp.maximum(
        spots.beam_cos[None] - spots.cutoff_cos[None], 1e-6)
    falloff = jnp.clip(t, 0.0, 1.0)

    w_flat = wi.transpose(1, 0, 2).reshape(-1, 3)            # (S*B, 3)
    pos_flat = jnp.tile(position, (s, 1))
    hit_pos, _, _, _, hit_valid = scene_intersect(
        scene, pos_flat + RAY_EPS * w_flat, w_flat)
    hit_d2 = jnp.sum((hit_pos - pos_flat) ** 2, -1)
    d2_flat = dist2.T.reshape(-1)
    visible = (~hit_valid) | (hit_d2 >= d2_flat - 1e-4)      # (S*B,)

    brdf, _ = B.eval_brdf(w_flat, jnp.tile(wo, (s, 1)),
                          jnp.tile(normal, (s, 1)),
                          {k: jnp.tile(v, (s, 1)) for k, v in mat.items()})
    li = jnp.repeat(spots.intensity, b, axis=0) \
        * falloff.T.reshape(-1, 1) / d2_flat[:, None]
    gate = (jnp.tile(active, (s,)) & visible)[:, None]
    contrib = jnp.where(gate, brdf * li, 0.0)
    return contrib.reshape(s, b, 3).sum(0)


def relight_path_tracing(
    key, scene: RelightScene, rays_o, rays_d, dx_du, dy_dv,
    spp: int, max_depth: int,
):
    """Full-throughput NEE+MIS path tracer over the merged scene.
    Returns (B, 3). Unlike the training integrators, every bounce
    contributes through the running throughput (no radiance cache)."""
    b = rays_o.shape[0]
    k_jit, k_loop = jax.random.split(key)
    du, dv = jax.random.uniform(k_jit, (2, b, spp, 1), minval=-0.5,
                                maxval=0.5)
    wi = normalize(rays_d[:, None] + dx_du[:, None] * du
                   + dy_dv[:, None] * dv).reshape(-1, 3)
    position = jnp.repeat(rays_o, spp, axis=0)
    n = position.shape[0]

    position, normal, _, tri, valid = scene_intersect(scene, position, wi)
    le0, _, valid_next = eval_emitter(scene.emitter, position, wi, tri)
    l = le0
    active = valid_next
    wo = -wi
    throughput = jnp.ones((n, 3))
    mat = _surface_mat(scene, position, tri)

    def body(state, k):
        position, wo, normal, tri, mat, throughput, active, l = state
        k1, k2, k3, k4 = jax.random.split(k, 4)

        # NEE on area emitters
        s1 = jax.random.uniform(k1, (n,))
        s2 = jax.random.uniform(k2, (n, 2))
        from iris_tpu.models.emitter import sample_emitter
        wi_e, e_pdf, e_tri = sample_emitter(scene.emitter, s1, s2, position)
        e_pos, e_nrm, _, hit_tri, e_valid = scene_intersect(
            scene, position + RAY_EPS * wi_e, wi_e)
        e_vis = (~e_valid) | (e_tri == hit_tri)
        e_weight, _, _ = eval_emitter(scene.emitter, e_pos, wi_e, hit_tri)
        g = jnp.abs(dot(-wi_e, e_nrm, keepdims=False)) / jnp.maximum(
            jnp.sum((e_pos - position) ** 2, -1), 1e-8)
        g = jnp.where(e_valid, g, 1.0)[:, None]
        e_weight = e_weight * e_vis[:, None] * g / jnp.maximum(e_pdf, 1e-8)
        e_brdf, b_pdf = B.eval_brdf(wi_e, wo, normal, mat)
        w_mis = _mis_power2(e_pdf, b_pdf * g, 0.0)
        dl = throughput * e_brdf * e_weight * w_mis
        l = l + jnp.where(active[:, None] & jnp.isfinite(dl).all(-1)[:, None],
                          dl, 0.0)

        # spot lights (delta): no MIS partner
        l = l + throughput * _spot_nee(scene, position, wo, normal, mat,
                                       active)

        # BRDF bounce
        s1b = jax.random.uniform(k3, (n,))
        s2b = jax.random.uniform(k4, (n, 2))
        wi_b, b_pdf2, b_weight = B.sample_brdf(s1b, s2b, wo, normal, mat)
        p_next, nrm_next, _, tri_next, _ = scene_intersect(
            scene, position + RAY_EPS * wi_b, wi_b)
        le, e_pdf2, valid_next = eval_emitter(scene.emitter, p_next, wi_b,
                                              tri_next)
        g2 = jnp.abs(dot(-nrm_next, wi_b, keepdims=False)) / jnp.maximum(
            jnp.sum((position - p_next) ** 2, -1), 1e-8)
        g2 = jnp.where(valid_next, g2, 1.0)
        w_mis2 = _mis_power2(b_pdf2 * g2[:, None], e_pdf2, 0.0)
        throughput_n = throughput * b_weight
        dl = throughput_n * le * w_mis2
        l = l + jnp.where(active[:, None] & jnp.isfinite(dl).all(-1)[:, None],
                          dl, 0.0)

        mat_next = _surface_mat(scene, p_next, tri_next)
        active_n = active & valid_next
        return (p_next, -wi_b, nrm_next, tri_next, mat_next, throughput_n,
                active_n, l), None

    keys = jax.random.split(k_loop, max_depth)
    state = (position, wo, normal, tri, mat, throughput, active, l)
    (_, _, _, _, _, _, _, l), _ = jax.lax.scan(body, state, keys)
    return l.reshape(b, spp, 3).mean(1)


# ----------------------------------------------------------- disco ball

def fibonacci_sphere(n: int, phase: float = 0.0) -> np.ndarray:
    """Fibonacci-lattice points on the unit sphere (disco_ball.py:10-24)."""
    phi = (1 + 5 ** 0.5) / 2
    i = np.arange(n)
    theta = 2 * np.pi * i / phi
    z = 1 - (2 * i + 1) / n
    r = np.sqrt(np.maximum(1 - z * z, 0.0))
    return np.stack([r * np.cos(theta + phase), r * np.sin(theta + phase),
                     z], -1)


DISCO_COLORS = np.asarray([
    [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
], np.float32)


def make_disco_ball(position, radius, light_intensity, light_num=20,
                    light_radius_rate=0.1, spot_intensity=10,
                    spot_cutoff_angle=20.0, phase=0.0):
    """Returns (shape dicts, SpotLights) — the reference's procedural disco
    ball (utils/disco_ball.py:26-108) as native scene elements."""
    position = np.asarray(position, np.float64)
    pts = fibonacci_sphere(light_num, phase)
    light_r = radius * light_radius_rate
    dist = radius - light_r * 0.6
    shapes = [{
        "kind": "sphere", "subdiv": 2,
        "to_world": [{"type": "translate", "value": position.tolist()},
                     {"type": "scale", "value": radius}],
        "bsdf": {"type": "diffuse", "reflectance": [0.2, 0.2, 0.2]},
    }]
    for i in range(light_num):
        color = DISCO_COLORS[i % len(DISCO_COLORS)]
        shapes.append({
            "kind": "sphere", "subdiv": 1,
            "to_world": [
                {"type": "translate",
                 "value": (pts[i] * dist + position).tolist()},
                {"type": "scale", "value": light_r}],
            "bsdf": {"type": "diffuse", "reflectance": [0, 0, 0]},
            "emitter": {"radiance": (color * light_intensity).tolist()},
        })
    spot_o = pts * (radius + light_r) + position
    cutoff = np.cos(np.radians(spot_cutoff_angle))
    beam = np.cos(np.radians(spot_cutoff_angle * 0.75))
    spots = SpotLights(
        position=jnp.asarray(spot_o, jnp.float32),
        direction=jnp.asarray(pts, jnp.float32),
        intensity=jnp.asarray(
            DISCO_COLORS[np.arange(light_num) % len(DISCO_COLORS)]
            * spot_intensity, jnp.float32),
        cutoff_cos=jnp.full((light_num,), cutoff, jnp.float32),
        beam_cos=jnp.full((light_num,), beam, jnp.float32),
    )
    return shapes, spots
