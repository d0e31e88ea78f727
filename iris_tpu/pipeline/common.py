"""Shared stage plumbing: scene/mesh resolution, artifact IO, model assembly.

Cross-stage artifacts keep the reference's filenames and roles (SURVEY.md §5
checkpoint row): vslf.npz (SLF bake), emitter.npz (emitter extraction,
role of the reference's emitter.pth), ckpt .pkl files (role of last.ckpt).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from iris_tpu.data.datasets import load_dataset
from iris_tpu.geometry.bvh import Tracer, build_bvh
from iris_tpu.geometry.mesh import Mesh, load_mesh
from iris_tpu.models.brdf import NGPBRDF, init_ngp_brdf
from iris_tpu.models.emitter import Emitter, make_emitter
from iris_tpu.models.hashgrid import HashGridConfig
from iris_tpu.models.slf import VoxelSLF, init_voxel_slf


def mesh_batch_size(batch_size: int, mesh, name: str = "train") -> int:
    """Round a requested ray-batch size DOWN to a positive multiple of the
    data-mesh width (GSPMD shards batch axis 0 evenly; an odd batch like
    13x17=221 pixels from an odd-resolution real scene would otherwise
    fail sharding at dispatch)."""
    n = int(np.prod(mesh.devices.shape))
    b = max((batch_size // n) * n, n)
    if b != batch_size:
        print(f"[{name}] batch_size {batch_size} -> {b} "
              f"(multiple of the {n}-device mesh)")
    return b


def resolve_mesh_path(dataset: str, dataset_root: str, scene: str = "") -> str:
    """Reference mesh layout (train_brdf_crf.py:52-58)."""
    if dataset in ("synthetic", "real"):
        return os.path.join(dataset_root, "scene.obj")
    if dataset == "scannetpp":
        return os.path.join(dataset_root, "data", scene, "scans", "scene.ply")
    raise ValueError(dataset)


def load_scene(dataset: str, dataset_root: str, scene: str = ""
               ) -> tuple[Mesh, Tracer]:
    mesh_path = resolve_mesh_path(dataset, dataset_root, scene)
    assert os.path.exists(mesh_path), f"mesh not found: {mesh_path}"
    mesh = load_mesh(mesh_path)
    return mesh, build_bvh(mesh.triangles())


def make_dataset(args, split: str, **kw):
    ds_name, ds_path = args.dataset
    common = dict(res_scale=args.res_scale)
    if ds_name in ("synthetic", "real"):
        common["img_dir"] = args.ldr_img_dir
    common.update(kw)
    return load_dataset(ds_name, ds_path, scene=args.scene, split=split,
                        **common)


# ----------------------------------------------------------- artifacts

def save_vslf(path: str, slf: VoxelSLF, mask: np.ndarray) -> None:
    np.savez_compressed(
        path, mask=np.asarray(mask),
        voxel_min=float(slf.voxel_min), voxel_max=float(slf.voxel_max),
        radiance=np.asarray(slf.radiance), count=np.asarray(slf.count),
    )


def load_vslf(path: str) -> tuple[VoxelSLF, np.ndarray]:
    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    slf = init_voxel_slf(z["mask"], float(z["voxel_min"]),
                         float(z["voxel_max"]))
    import jax.numpy as jnp
    slf = VoxelSLF(slf.inds, jnp.asarray(z["radiance"]),
                   jnp.asarray(z["count"]), slf.voxel_min, slf.voxel_max,
                   slf.H)
    return slf, z["mask"]


def save_emitter(path: str, is_emitter, vertices, area, normal, radiance):
    np.savez_compressed(path, is_emitter=np.asarray(is_emitter),
                        emitter_vertices=np.asarray(vertices),
                        emitter_area=np.asarray(area),
                        emitter_normal=np.asarray(normal),
                        emitter_radiance=np.asarray(radiance))


def load_emitter(path: str, mesh: Mesh, slf: VoxelSLF | None = None
                 ) -> Emitter:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    return make_emitter(z["is_emitter"], mesh.triangles(),
                        radiance=z["emitter_radiance"], slf=slf)


def _estimator_fields(args, n_levels: int) -> dict:
    from iris_tpu.models.hashgrid import auto_bwd_level_sample

    bls = int(getattr(args, "bwd_level_sample", -1))
    if bls < 0:   # -1 = auto: ~4x scatter reduction (quality-validated)
        bls = auto_bwd_level_sample(n_levels)
    return dict(stochastic_bwd=bool(getattr(args, "stochastic_bwd", 1)),
                stochastic_fwd=bool(getattr(args, "stochastic_fwd", 1)),
                bwd_level_sample=bls,
                fwd_level_sample=int(getattr(args, "fwd_level_sample", 0)))


def build_material(args, voxel_min, voxel_max, key=None) -> NGPBRDF:
    feats = int(getattr(args, "hash_features", 2))
    row = int(getattr(args, "hash_row_gather", -1))
    row = (feats > 2) if row < 0 else bool(row)
    pls = float(getattr(args, "per_level_scale", -1.0))
    if pls <= 0:
        # span the reference 32-level range (16 .. 16*1.3^31) at any L
        pls = 1.3 ** (31.0 / max(args.hash_levels - 1, 1))
    cfg = HashGridConfig(n_levels=args.hash_levels,
                         n_features=feats,
                         log2_table_size=args.log2_hashmap_size,
                         per_level_scale=pls,
                         row_gather=row,
                         **_estimator_fields(args, args.hash_levels))
    key = key if key is not None else jax.random.PRNGKey(0)
    return init_ngp_brdf(key, voxel_min, voxel_max, cfg)


def adopt_estimator_cfg(tree, args):
    """Re-attach the CURRENT stage's estimator policy to a warm-started
    material (or to any pytree containing NGPBRDF nodes, e.g. a restored
    optimizer state whose Adam moments mirror the params structure).
    Checkpoints carry the static HashGridConfig they were saved with; the
    model-defining fields (levels, table size, resolutions) must stay with
    the weights, but the training-policy fields (stochastic_*,
    *_level_sample) belong to the stage's flags — without this, a warm
    start silently ignores them (found by an A/B whose arms were
    bit-identical), and a resumed opt_state with a stale cfg breaks jit
    pytree matching."""
    from dataclasses import replace

    def adopt_one(m: NGPBRDF) -> NGPBRDF:
        new_cfg = replace(m.cfg, **_estimator_fields(args, m.cfg.n_levels))
        return replace(m, cfg=new_cfg)

    if isinstance(tree, NGPBRDF):
        return adopt_one(tree)
    return jax.tree_util.tree_map(
        lambda x: adopt_one(x) if isinstance(x, NGPBRDF) else x,
        tree, is_leaf=lambda x: isinstance(x, NGPBRDF))


def ckpt_path(checkpoint_root: str, experiment: str, name: str = "last.pkl"
              ) -> str:
    d = os.path.join(checkpoint_root, experiment)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)
