"""Emitter models: triangle area lights + optional SLF radiance cache.

Parity with reference model/emitter.py: AreaEmitter (:15), SLFEmitter
(:134), SLFEmitterLearn (:257). One dataclass covers all three: `slf=None`
gives AreaEmitter behavior; radiance is just a leaf so "Learn" is a matter
of which leaves the optimizer updates.

eval_emitter's radiance-cache early termination (roughness > trace_roughness
on non-emissive surfaces returns the cached SLF value and kills the path,
reference :210-219) is implemented with masks — fixed shapes, no gathers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.core.vecmath import normalize
from iris_tpu.models.slf import VoxelSLF, slf_query


@jax.custom_vjp
def _radiance_rows(radiance: jnp.ndarray, e_idx: jnp.ndarray) -> jnp.ndarray:
    """radiance[e_idx] with an MXU backward.

    The autodiff adjoint of a row gather is a (B,3)->(K,3) scatter-add —
    latency-bound at ~8.5 ns/element on this backend (~6.7 ms/step of the
    flagship budget across the 3 eval_emitter calls, PERF.md round-2e).
    K (emitter triangles) is small, so the adjoint is computed instead as
    onehot(e_idx)^T @ g — a skinny matmul the MXU does in ~0.3 ms of pure
    HBM traffic. Falls back to the explicit .at[].add scatter for large K
    where the (B, K) one-hot would dominate traffic."""
    return radiance[e_idx]


def _radiance_rows_fwd(radiance, e_idx):
    return radiance[e_idx], (e_idx, radiance.shape[0])


def _radiance_rows_bwd(res, g):
    e_idx, k = res
    if k <= 256:
        onehot = (e_idx[:, None] == jnp.arange(k)).astype(g.dtype)
        g_rad = jnp.einsum("bk,bc->kc", onehot, g,
                           preferred_element_type=jnp.float32)
    else:
        g_rad = jnp.zeros((k, g.shape[-1]), g.dtype).at[e_idx].add(g)
    return g_rad, jnp.zeros(e_idx.shape, jax.dtypes.float0)


_radiance_rows.defvjp(_radiance_rows_fwd, _radiance_rows_bwd)


@jax.tree_util.register_dataclass
@dataclass
class Emitter:
    is_emitter: jnp.ndarray         # (F,) bool per mesh face
    emitter_idx: jnp.ndarray        # (F,) int32 face -> emitter id, -1
    triangle_idx: jnp.ndarray       # (K,) int32 emitter id -> face
    emitter_vertices: jnp.ndarray   # (K, 3, 3)
    emitter_area: jnp.ndarray       # (K,)
    radiance: jnp.ndarray           # (K, 3) learnable in the Learn variant
    emitter_pdf: jnp.ndarray        # (K,)
    emitter_cdf: jnp.ndarray        # (K,)
    slf: VoxelSLF | None = None


def make_emitter(
    is_emitter: np.ndarray,
    triangles: np.ndarray,
    radiance: np.ndarray | None = None,
    slf: VoxelSLF | None = None,
) -> Emitter:
    """Build emitter state from a face mask + (F,3,3) mesh triangles.

    Uniform emitter selection pdf/cdf as in the reference (:48-51).
    """
    is_emitter = np.asarray(is_emitter, bool)
    f = len(is_emitter)
    k = max(int(is_emitter.sum()), 1)
    emitter_idx = np.full(f, -1, np.int64)
    emitter_idx[is_emitter] = np.arange(is_emitter.sum())
    tri_idx = np.flatnonzero(is_emitter)
    if len(tri_idx) == 0:
        tri_idx = np.zeros(1, np.int64)
    verts = np.asarray(triangles, np.float32)[tri_idx]
    c = np.cross(verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0])
    area = np.linalg.norm(c, axis=-1) / 2.0
    pdf = np.full(k, 1.0 / k, np.float32)
    cdf = np.cumsum(pdf)
    if radiance is None:
        radiance = np.zeros((k, 3), np.float32)
    return Emitter(
        is_emitter=jnp.asarray(is_emitter),
        emitter_idx=jnp.asarray(emitter_idx, jnp.int32),
        triangle_idx=jnp.asarray(tri_idx, jnp.int32),
        emitter_vertices=jnp.asarray(verts),
        emitter_area=jnp.asarray(area, jnp.float32),
        radiance=jnp.asarray(radiance, jnp.float32),
        emitter_pdf=jnp.asarray(pdf),
        emitter_cdf=jnp.asarray(cdf, jnp.float32),
        slf=slf,
    )


def eval_emitter(
    em: Emitter,
    position: jnp.ndarray,
    light_dir: jnp.ndarray,
    triangle_idx: jnp.ndarray,
    roughness: jnp.ndarray | None = None,
    trace_roughness: float = 0.6,
):
    """Surface emission + pdf at hit points.

    Returns (Le (B,3), emit_pdf (B,1), valid_next (B,)). When `roughness` is
    given and exceeds `trace_roughness` on a non-emissive surface with a
    non-empty cache entry, Le includes the SLF value and valid_next goes
    False (path termination) — reference model/emitter.py:180-221.
    """
    vis = triangle_idx != -1
    safe_tri = jnp.maximum(triangle_idx, 0)
    # ONE per-sample gather decides both membership and emitter id:
    # emitter_idx is -1 exactly where is_emitter is False (make_emitter),
    # and pdf/area collapse to one pre-divided (K,) ratio — per-element
    # gathers are latency-bound (~11 ns each, PERF.md), so at 262K samples
    # x 3 eval calls per train step every dropped gather is ~3 ms/step.
    eid = em.emitter_idx[safe_tri]
    is_area = (eid >= 0) & vis
    e_idx = jnp.maximum(eid, 0)

    pdf_over_area = em.emitter_pdf / jnp.maximum(em.emitter_area, 1e-12)
    emit_pdf = jnp.where(is_area, pdf_over_area[e_idx], 0.0)
    le = jnp.where(is_area[:, None], _radiance_rows(em.radiance, e_idx), 0.0)
    le = le * vis[:, None]
    valid_next = (~is_area) & vis

    if roughness is not None and em.slf is not None:
        is_diffuse = (~is_area) & vis & (roughness[..., 0] > trace_roughness)
        cache = slf_query(em.slf, position)
        le = le + jnp.where(is_diffuse[:, None], cache, 0.0)
        terminate = is_diffuse & (jnp.sum(cache, -1) > 0)
        valid_next = valid_next & (~terminate)

    return le, emit_pdf[:, None], valid_next


def sample_emitter(
    em: Emitter,
    sample1: jnp.ndarray,
    sample2: jnp.ndarray,
    position: jnp.ndarray,
):
    """Pick an emitter by cdf, sample a uniform point on its triangle.

    Returns (wi (B,3), pdf (B,1) area-space, triangle_idx (B,)) —
    reference model/emitter.py:100-131.
    """
    k = em.emitter_cdf.shape[0]
    e = jnp.clip(
        jnp.searchsorted(em.emitter_cdf, jnp.maximum(sample1, 1e-12)),
        0, k - 1,
    )
    xi1 = jnp.sqrt(sample2[..., 0])
    u = (1.0 - xi1)[:, None]
    v = (xi1 * sample2[..., 1])[:, None]
    w = 1.0 - u - v
    p = em.emitter_vertices[e]
    point = p[:, 0] * u + p[:, 1] * v + p[:, 2] * w
    wi = normalize(point - position)
    tri = em.triangle_idx[e]
    # pdf/area pre-divided into one (K,) ratio: one gather, not two
    pdf_over_area = em.emitter_pdf / jnp.maximum(em.emitter_area, 1e-12)
    pdf = pdf_over_area[e]
    return wi, pdf[:, None], tri


def slf_forward(em: Emitter, position: jnp.ndarray) -> jnp.ndarray:
    """Radiance-cache lookup (reference SLFEmitter.forward :175-178)."""
    assert em.slf is not None
    return slf_query(em.slf, position)
