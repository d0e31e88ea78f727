"""Self-contained flagship setup on the procedural box scene.

Used by __graft_entry__ (driver compile checks), bench.py, and smoke tests:
builds the full model stack — BVH tracer, SLF-emitter, hash-grid BRDF,
EMoR CRF — without any dataset on disk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.geometry.bvh import build_bvh
from iris_tpu.geometry.procedural import camera_rays, make_box_scene
from iris_tpu.models.brdf import init_ngp_brdf, ngp_brdf_apply
from iris_tpu.models.crf import init_emor_crf
from iris_tpu.models.emitter import make_emitter
from iris_tpu.models.hashgrid import HashGridConfig
from iris_tpu.models.slf import init_voxel_slf


def make_demo_scene(
    n_clutter: int = 8,
    slf_res: int = 32,
    hash_levels: int = 16,
    log2_table: int = 15,
    seed: int = 0,
    hash_features: int = 2,
    per_level_scale: float = 1.3,
    leaf_size: int = 4,
):
    """Returns (tracer, emitter, ngp_params, crf, mesh).

    hash_features > 2 selects the row-gather grid layout (the production
    default parameterization, pipeline/config.py hash_levels/hash_features);
    per_level_scale -1 = auto: span the reference 32-level resolution range
    (16 .. 16*1.3^31, model/brdf.py:227) at any level count. The default
    1.3 keeps the historical demo-scene resolutions (golden tests).
    leaf_size: BVH triangles per leaf (tile-walk cost dial — bigger leaves
    trade pair-pop iterations for vectorized MT folds, probes/leafsize_ab)."""
    mesh, is_em = make_box_scene(n_clutter=n_clutter, seed=seed)
    tracer = build_bvh(mesh.triangles(), leaf_size=leaf_size)
    mask = np.ones((slf_res,) * 3, bool)
    slf = init_voxel_slf(mask, -0.1, 2.1)
    em = make_emitter(
        is_em, mesh.triangles(),
        radiance=np.full((int(is_em.sum()), 3), 10.0, np.float32),
        slf=slf,
    )
    if per_level_scale <= 0:
        per_level_scale = 1.3 ** (31.0 / max(hash_levels - 1, 1))
    ngp = init_ngp_brdf(
        jax.random.PRNGKey(seed), -0.1, 2.1,
        HashGridConfig(n_levels=hash_levels, log2_table_size=log2_table,
                       n_features=hash_features,
                       per_level_scale=per_level_scale,
                       row_gather=hash_features > 2),
    )
    crf = init_emor_crf(dim=3)
    return tracer, em, ngp, crf, mesh


def make_demo_batch(n_side: int = 64, seg_grid: int = 8):
    """A pixel batch shaped like the dataset wire format: rays (B,12),
    rgbs, segmentation, int_albedo, exposure."""
    o, d, dxdu, dydv = camera_rays(n_side)
    b = o.shape[0]
    rays = np.concatenate([o, d, dxdu, dydv], -1).astype(np.float32)
    rng = np.random.default_rng(0)
    seg = (np.arange(b) // max(b // seg_grid, 1)).astype(np.float32)
    return {
        "rays": jnp.asarray(rays),
        "rgbs": jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
        "segmentation": jnp.asarray(seg),
        "int_albedo": jnp.asarray(
            rng.uniform(0, 1, (b, 3)).astype(np.float32)),
        "exposure": jnp.ones((b, 1), jnp.float32),
    }


def demo_mat_fn(ngp_params):
    return functools.partial(ngp_brdf_apply, ngp_params)
