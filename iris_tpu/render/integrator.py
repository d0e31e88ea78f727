"""Path-tracing integrators (L4), fixed-shape and jit-compilable end to end.

Semantics parity with reference utils/path_tracing.py:
  path_tracing_single (:320)  — differentiable 1-bounce forward (training)
  path_tracing        (:214)  — MIS direct + no-grad indirect tail
  trace_indirect      (:409)  — depth-D loop; here a lax.scan with masks
  path_tracing_det_diff (:50) / path_tracing_det_spec (:127) — shading bakes

Key structural translation for TPU (SURVEY.md §7): the reference physically
compacts the ray set each bounce; we instead carry a boolean `active` lane
mask through fixed-shape state — every lane computes, contributions are
gated. MIS weights, pdf clamps, geometry terms, and the radiance-cache
early-termination all follow the reference formulas line by line.

RNG: explicit threefry keys (fold_in per decision site) instead of the
reference's global torch seed — deterministic under jit and sharding.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from iris_tpu.const import RAY_EPS
from iris_tpu.core.vecmath import dot, normalize
from iris_tpu.geometry.bvh import Tracer
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models import brdf as B
from iris_tpu.models.emitter import Emitter, eval_emitter, sample_emitter

MatFn = Callable[[jnp.ndarray], dict]

# Mark secondary (NEE + bounce) rays as spatially incoherent when tracing.
# This is a HINT: ray_intersect decides per path whether to actually sort
# (device-measured, PERF.md round 2 — Pallas on big trees: yes, 4.6x; XLA
# ordered walk and small trees: no, net loss). Module flag so benches can
# A/B the hint itself.
SORT_SECONDARY = True


def _jitter_rays(key, rays_o, rays_d, dx_du, dy_dv, spp, dudv=None):
    """Pixel-jittered camera rays replicated spp times (reference :232-234).

    dudv overrides the (2, B, spp, 1) uniform draws in [-0.5, 0.5) —
    test hook for common-random-number differential oracles."""
    b = rays_o.shape[0]
    if dudv is None:
        dudv = jax.random.uniform(key, (2, b, spp, 1),
                                  minval=-0.5, maxval=0.5)
    du, dv = dudv
    wi = normalize(rays_d[:, None] + dx_du[:, None] * du + dy_dv[:, None] * dv)
    wi = wi.reshape(-1, 3)
    position = jnp.repeat(rays_o, spp, axis=0)
    return position, wi


def _mis_power2(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray, clamp_denom: float
                ) -> jnp.ndarray:
    """Power-2 MIS weight for strategy a vs b with the reference's inf/0
    guards (:274-275): weight=0 unless pdf_a>0 and pdf_b finite; weight=1
    when pdf_a is inf or pdf_b == 0."""
    denom = pdf_a * pdf_a + pdf_b * pdf_b
    if clamp_denom > 0:
        denom = jnp.maximum(denom, clamp_denom)
    w = jnp.where(
        (pdf_a > 0) & (~jnp.isinf(pdf_b)),
        pdf_a * pdf_a / denom,
        0.0,
    )
    return jnp.where(jnp.isinf(pdf_a) | (pdf_b == 0), 1.0, w)


def _nee_and_bounce(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    position, wo, normal, mat, active, g_clamp: float, mis_clamp: float,
    trace_roughness: float | None, samples: dict | None = None,
):
    """One bounce worth of light transport: NEE direct term (reference
    :253-276) + BRDF-sampled term (:279-299), with the shadow ray and the
    bounce ray fused into ONE 2N-ray traversal (same results, half the
    traversal launches; bigger batches keep the union tiles fed).

    `samples` overrides the uniform draws — keys 's1' (n,), 's2' (n, 2)
    for the emitter sample and 's1b'/'s2b' for the BRDF sample. Test hook
    for common-random-number differential oracles (tests/ref_oracle.py).

    Returns (nee_contrib, bounce_contrib, next_position, next_normal,
    next_wo, next_mat, next_active, brdf_weight)."""
    n = position.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if samples is None:
        s1 = jax.random.uniform(k1, (n,))
        s2 = jax.random.uniform(k2, (n, 2))
        s1b = jax.random.uniform(k3, (n,))
        s2b = jax.random.uniform(k4, (n, 2))
    else:
        s1, s2 = samples["s1"], samples["s2"]
        s1b, s2b = samples["s1b"], samples["s2b"]
    wi_e, emit_pdf, emit_tri = sample_emitter(em, s1, s2, position)

    wi_b, brdf_pdf_b, brdf_weight = B.sample_brdf(s1b, s2b, wo, normal, mat)

    o2 = jnp.concatenate([position + RAY_EPS * wi_e,
                          position + RAY_EPS * wi_b], 0)
    d2 = jnp.concatenate([wi_e, wi_b], 0)
    # Dead-lane neutralization: inactive lanes would otherwise trace their
    # STALE rays, forcing spurious node visits in the union traversal (a
    # tile walks every node ANY of its lanes hits). Parking dead rays far
    # above the scene pointing +z makes them root-miss in one step, and
    # the spatial sort then clusters them into all-dead tiles that exit
    # immediately — free active-set compaction at fixed shapes (deep
    # bounces in trace_indirect/refine accumulate many dead lanes).
    act2 = jnp.concatenate([active, active], 0)[:, None]
    o2 = jnp.where(act2, o2, 1e7)
    d2 = jnp.where(act2, d2, jnp.asarray([0.0, 0.0, 1.0]))
    pos2, nrm2, _, tri2, valid2 = ray_intersect(tracer, o2, d2,
                                                sort=SORT_SECONDARY)
    emit_pos, pos_next = pos2[:n], pos2[n:]
    emit_nrm, nrm_next = nrm2[:n], nrm2[n:]
    tri_e, tri_b = tri2[:n], tri2[n:]
    emit_valid, _ = valid2[:n], valid2[n:]

    # ---- NEE half
    emit_vis = (~emit_valid) | (emit_tri == tri_e)
    emit_weight, _, _ = eval_emitter(em, emit_pos, wi_e, tri_e)
    g = jnp.abs(dot(-wi_e, emit_nrm, keepdims=False)) / jnp.maximum(
        jnp.sum((emit_pos - position) ** 2, -1), g_clamp
    )
    g = jnp.where(emit_valid, g, 1.0)[:, None]
    emit_weight = emit_weight * emit_vis[:, None] * g / jnp.maximum(
        emit_pdf, g_clamp
    )
    emit_brdf, nee_brdf_pdf = B.eval_brdf(wi_e, wo, normal, mat)
    nee_brdf_pdf = nee_brdf_pdf * g
    w_mis = _mis_power2(emit_pdf, nee_brdf_pdf, mis_clamp)
    nee_contrib = jnp.where(active[:, None],
                            emit_brdf * emit_weight * w_mis, 0.0)

    # ---- BRDF-sampled half
    if trace_roughness == 0.0:
        # The bounce-hit material feeds ONLY the `roughness > trace_
        # roughness` cache gate here, and NGPBRDF roughness is clamped to
        # [0.02, 1] (models/brdf.py:188) — at trace_roughness=0.0 the gate
        # is vacuously true and no gradient flows through a boolean, so
        # the whole second hash-grid encode (~25% of the flagship train
        # step, PERF.md) is dead: skip it. Callers on this path
        # (path_tracing_single) terminate every lane into the SLF cache
        # and never consume mat_next.
        mat_next = None
        le, emit_pdf2, valid_next = eval_emitter(
            em, pos_next, wi_b, tri_b,
            jnp.ones((pos_next.shape[0], 1)), 0.0
        )
    elif trace_roughness is None:
        mat_next = mat_fn(pos_next)
        le, emit_pdf2, valid_next = eval_emitter(
            em, pos_next, wi_b, tri_b, mat_next["roughness"]
        )
    else:
        mat_next = mat_fn(pos_next)
        le, emit_pdf2, valid_next = eval_emitter(
            em, pos_next, wi_b, tri_b, mat_next["roughness"],
            trace_roughness
        )
    g2 = jnp.abs(dot(-nrm_next, wi_b, keepdims=False)) / jnp.maximum(
        jnp.sum((position - pos_next) ** 2, -1), g_clamp
    )
    g2 = jnp.where(valid_next, g2, 1.0)
    brdf_pdf_b = brdf_pdf_b * g2[:, None]
    w_mis2 = _mis_power2(brdf_pdf_b, emit_pdf2, 0.0)
    bounce_contrib = jnp.where(active[:, None],
                               brdf_weight * le * w_mis2, 0.0)
    active_next = active & valid_next
    return (nee_contrib, bounce_contrib, pos_next, nrm_next, -wi_b,
            mat_next, active_next, brdf_weight)


def path_tracing_single(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    rays_o, rays_d, dx_du, dy_dv, spp: int, samples: dict | None = None,
):
    """Differentiable single-bounce estimator (training forward).

    Reference utils/path_tracing.py:320-407 with trace_roughness=0.0:
    first-hit emission + MIS direct light, with the second bounce always
    falling back to the SLF radiance cache. Returns (B, 3).

    `samples` overrides every uniform draw (keys: 'dudv' (2, B, spp, 1)
    pixel jitter in [-0.5, 0.5), plus _nee_and_bounce's 's1'/'s2'/'s1b'/
    's2b' per flat lane) — the common-random-number hook used by the
    reference-transcription differential oracle (tests/ref_oracle.py)."""
    b = rays_o.shape[0]
    k_jit, k_b = jax.random.split(key)
    position, wi = _jitter_rays(k_jit, rays_o, rays_d, dx_du, dy_dv, spp,
                                None if samples is None
                                else samples["dudv"])

    position, normal, _, tri, _ = ray_intersect(tracer, position, wi)
    l, _, valid_next = eval_emitter(em, position, wi, tri)
    active = valid_next
    wo = -wi
    mat = mat_fn(position)

    nee, bounce, *_ = _nee_and_bounce(
        k_b, tracer, em, mat_fn, position, wo, normal, mat, active,
        1e-6, 1e-6, trace_roughness=0.0, samples=samples)
    l = l + nee + bounce
    return l.reshape(b, spp, 3).mean(1)


def trace_indirect(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    position, wo, normal, active, indir_depth: int,
    samples: dict | None = None,
):
    """No-grad multi-bounce indirect tail (reference :409-502).

    lax.scan over depth with masked fixed-shape state; the radiance cache
    (trace_roughness default 0.6) terminates lanes as in the reference.

    `samples` (CRN test hook): per-depth stacked draws — 's1' (D, n),
    's2' (D, n, 2), 's1b', 's2b' — consumed in place of the key stream.
    """
    n = position.shape[0]
    mat0 = mat_fn(position)
    throughput = jnp.ones((n, 3))
    l0 = jnp.zeros((n, 3))

    def body(state, xs):
        k, smp = xs
        position, wo, normal, mat, throughput, active, l = state
        (nee, bounce, pos_n, nrm_n, wo_n, mat_n, active_n,
         brdf_w) = _nee_and_bounce(
            k, tracer, em, mat_fn, position, wo, normal, mat, active,
            1e-12, 0.0, trace_roughness=None, samples=smp,
        )
        dl = throughput * nee
        l = l + jnp.where(jnp.isnan(dl), 0.0, dl)
        throughput_n = throughput * brdf_w
        dl = throughput * bounce
        l = l + jnp.where(jnp.isnan(dl), 0.0, dl)
        return (pos_n, wo_n, nrm_n, mat_n, throughput_n, active_n, l), None

    keys = jax.random.split(key, indir_depth)
    state = (position, wo, normal, mat0, throughput, active, l0)
    state = jax.lax.stop_gradient(state)
    (_, _, _, _, _, _, l), _ = jax.lax.scan(body, state, (keys, samples))
    return jax.lax.stop_gradient(l)


def path_tracing(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    rays_o, rays_d, dx_du, dy_dv, spp: int, indir_depth: int,
    samples: dict | None = None,
):
    """Full estimator: differentiable first bounce + no-grad indirect tail
    (reference :214-318). Returns (B, 3).

    `samples` (CRN test hook): 'dudv' + first-bounce 's1'/'s2'/'s1b'/'s2b'
    as in path_tracing_single, plus 'indirect' = trace_indirect's stacked
    per-depth draws."""
    b = rays_o.shape[0]
    k_jit, k_b, k_ind = jax.random.split(key, 3)
    position, wi = _jitter_rays(k_jit, rays_o, rays_d, dx_du, dy_dv, spp,
                                None if samples is None
                                else samples["dudv"])

    position, normal, _, tri, _ = ray_intersect(tracer, position, wi)
    l, _, valid_next = eval_emitter(em, position, wi, tri)
    active = valid_next
    wo = -wi
    mat = mat_fn(position)

    (nee, bounce, pos_n, nrm_n, wo_n, mat_n, active_n,
     brdf_w) = _nee_and_bounce(
        k_b, tracer, em, mat_fn, position, wo, normal, mat, active,
        1e-6, 0.0, trace_roughness=None, samples=samples,
    )
    l = l + nee + bounce

    l_indir = trace_indirect(k_ind, tracer, em, mat_fn, pos_n, wo_n, nrm_n,
                             active_n, indir_depth,
                             samples=None if samples is None
                             else samples["indirect"])
    l = l + jnp.where(active_n[:, None], brdf_w * l_indir, 0.0)
    return l.reshape(b, spp, 3).mean(1)


def _det_common(key, tracer, em, mat_fn, positions, wis, normals,
                triangle_idxs, spp, indir_depth, sample_fn,
                samples: dict | None = None):
    """Shared deterministic-first-hit bake driver. sample_fn(key, wo, normal,
    mat, s2) -> (wi, weights list). Returns per-weight shaded results.

    `samples` (CRN test hook): 'det_s2' (n, 2) lobe draws + 'indirect'
    stacked per-depth draws for trace_indirect."""
    emit_mask = triangle_idxs != -1
    n = positions.shape[0] * spp
    position = jnp.repeat(positions, spp, axis=0)
    normal = jnp.repeat(normals, spp, axis=0)
    wo = jnp.repeat(-wis, spp, axis=0)
    active = jnp.repeat(emit_mask, spp, axis=0)

    k_s, k_ind = jax.random.split(key)
    wi, weights = sample_fn(k_s, wo, normal, None,
                            None if samples is None
                            else samples["det_s2"])

    pos_next, nrm_next, _, tri, _ = ray_intersect(
        tracer, position + RAY_EPS * wi, wi
    )
    mat_next = mat_fn(pos_next)
    le, _, valid_next = eval_emitter(em, pos_next, wi, tri,
                                     mat_next["roughness"])
    results = [jnp.where(active[:, None], w * le, 0.0) for w in weights]

    active_next = active & valid_next
    l_indir = trace_indirect(k_ind, tracer, em, mat_fn, pos_next, -wi,
                             nrm_next, active_next, indir_depth,
                             samples=None if samples is None
                             else samples["indirect"])
    results = [
        r + jnp.where(active_next[:, None], w * l_indir, 0.0)
        for r, w in zip(results, weights)
    ]
    b = positions.shape[0]
    results = [r.reshape(b, spp, 3).mean(1) for r in results]
    results = [jnp.where(emit_mask[:, None], r, 0.0) for r in results]
    return results


def path_tracing_det_diff(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    positions, wis, normals, uvs, triangle_idxs, spp: int, indir_depth: int,
    samples: dict | None = None,
):
    """Diffuse shading bake from deterministic first hits (reference :50-124).
    Returns (B, 3) cosine-importance-sampled incident diffuse shading."""

    def sample(k, wo, normal, mat, s2=None):
        if s2 is None:
            s2 = jax.random.uniform(k, (normal.shape[0], 2))
        wi, _, w = B.sample_diffuse(s2, normal)
        return wi, [w]

    (out,) = _det_common(key, tracer, em, mat_fn, positions, wis, normals,
                         triangle_idxs, spp, indir_depth, sample,
                         samples=samples)
    return out


def path_tracing_det_spec(
    key, tracer: Tracer, em: Emitter, mat_fn: MatFn,
    roughness_level, positions, wis, normals, uvs, triangle_idxs,
    spp: int, indir_depth: int, samples: dict | None = None,
):
    """Specular shading bake at a fixed roughness level (reference :127-212).
    Returns (L0, L1): the two Fresnel-split components, each (B, 3)."""

    def sample(k, wo, normal, mat, s2=None):
        if s2 is None:
            s2 = jax.random.uniform(k, (normal.shape[0], 2))
        wi, _, w0, w1 = B.sample_specular(s2, wo, normal, roughness_level)
        return wi, [w0, w1]

    l0, l1 = _det_common(key, tracer, em, mat_fn, positions, wis, normals,
                         triangle_idxs, spp, indir_depth, sample,
                         samples=samples)
    return l0, l1
