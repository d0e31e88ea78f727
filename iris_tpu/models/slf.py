"""Voxel surface-light-field (radiance cache).

Parity with reference model/slf.py VoxelSLF (:16-70): a dense H^3 int index
grid maps occupied voxels to a compact (K,3) radiance table; queries outside
occupied voxels return 0. The bake-time scatter_add becomes a deterministic
`.at[].add` segment accumulation (a determinism upgrade over CUDA atomics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class VoxelSLF:
    inds: jnp.ndarray      # (H^3,) int32: flat voxel -> compact idx, -1 empty
    radiance: jnp.ndarray  # (K, 3) float32
    count: jnp.ndarray     # (K,) float32 entry counts (bake-time mean pooling)
    voxel_min: jnp.ndarray  # scalar f32 (isotropic bbox, like the reference)
    voxel_max: jnp.ndarray
    H: int = field(metadata=dict(static=True))


def init_voxel_slf(mask: np.ndarray, voxel_min: float, voxel_max: float) -> VoxelSLF:
    """mask: (H,H,H) bool occupancy, indexed [z,y,x] (flat = x + y*H + z*H^2)."""
    H = mask.shape[0]
    flat = np.asarray(mask, bool).reshape(-1)
    k = int(flat.sum())
    inds = np.full(H * H * H, -1, np.int32)
    inds[np.flatnonzero(flat)] = np.arange(k, dtype=np.int32)
    return VoxelSLF(
        inds=jnp.asarray(inds),
        radiance=jnp.zeros((max(k, 1), 3), jnp.float32),
        count=jnp.zeros((max(k, 1),), jnp.float32),
        voxel_min=jnp.asarray(voxel_min, jnp.float32),
        voxel_max=jnp.asarray(voxel_max, jnp.float32),
        H=H,
    )


def spatial_idx(slf: VoxelSLF, x: jnp.ndarray) -> jnp.ndarray:
    """Compact voxel index for positions (B,3); -1 where voxel is empty."""
    h = slf.H
    xn = (x - slf.voxel_min) / (slf.voxel_max - slf.voxel_min)
    xi = jnp.clip((xn * h).astype(jnp.int32), 0, h - 1)
    flat = xi[..., 0] + xi[..., 1] * h + xi[..., 2] * h * h
    return slf.inds[flat]


def slf_query(slf: VoxelSLF, x: jnp.ndarray) -> jnp.ndarray:
    """Radiance at positions (B,3); zeros for empty voxels."""
    idx = spatial_idx(slf, x)
    rgb = slf.radiance[jnp.maximum(idx, 0)]
    return jnp.where((idx >= 0)[..., None], rgb, 0.0)


def slf_scatter_add(
    slf: VoxelSLF, x: jnp.ndarray, radiance: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> VoxelSLF:
    """Accumulate radiance into voxels; returns updated SLF (functional)."""
    idx = spatial_idx(slf, x)
    ok = idx >= 0
    if mask is not None:
        ok = ok & mask
    safe = jnp.maximum(idx, 0)
    contrib = jnp.where(ok[..., None], radiance, 0.0)
    new_rad = slf.radiance.at[safe].add(contrib)
    new_cnt = slf.count.at[safe].add(ok.astype(jnp.float32))
    return VoxelSLF(slf.inds, new_rad, new_cnt, slf.voxel_min, slf.voxel_max,
                    slf.H)


def slf_finalize_mean(slf: VoxelSLF) -> VoxelSLF:
    """Mean-pool accumulated radiance (reference slf_bake.py:138)."""
    rad = slf.radiance / jnp.maximum(slf.count, 1.0)[:, None]
    return VoxelSLF(slf.inds, rad, slf.count, slf.voxel_min, slf.voxel_max,
                    slf.H)
