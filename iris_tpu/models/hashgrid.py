"""Multi-resolution hash-grid encoding (instant-NGP style), pure JAX.

TPU-native replacement for tiny-cuda-nn's HashGrid used by the reference
BRDF field (model/brdf.py:222-229: 32 levels x 2 features, 2^19 table,
base resolution 16, per-level scale 1.3). Levels whose dense grid fits the
table are indexed densely; larger levels use the standard spatial hash
(pi1=1, pi2=2654435761, pi3=805459861).

All levels share one flattened (L*T, F) table so the per-query lookup is a
single gather of (B, L, 8, F) — XLA fuses the trilinear lerp around it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@jax.tree_util.register_dataclass
@dataclass
class HashGridConfig:
    n_levels: int = field(default=32, metadata=dict(static=True))
    n_features: int = field(default=2, metadata=dict(static=True))
    log2_table_size: int = field(default=19, metadata=dict(static=True))
    base_resolution: int = field(default=16, metadata=dict(static=True))
    per_level_scale: float = field(default=1.3, metadata=dict(static=True))

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    def resolutions(self) -> np.ndarray:
        l = np.arange(self.n_levels)
        return np.floor(
            self.base_resolution * self.per_level_scale ** l
        ).astype(np.int64)


def init_hashgrid(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """Table params (L*T, F), uniform(-1e-4, 1e-4) like tcnn's default."""
    shape = (cfg.n_levels * cfg.table_size, cfg.n_features)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


def _corner_indices(cfg: HashGridConfig, cell: jnp.ndarray) -> jnp.ndarray:
    """cell: (B, L, 8, 3) int32 lattice coords -> (B, L, 8) table indices."""
    res_np = cfg.resolutions() + 1  # vertices per axis
    dense_ok = jnp.asarray((res_np.astype(np.int64) ** 3) <= cfg.table_size)
    res = jnp.asarray(res_np)
    cx = cell[..., 0].astype(jnp.uint32)
    cy = cell[..., 1].astype(jnp.uint32)
    cz = cell[..., 2].astype(jnp.uint32)
    r = res.astype(jnp.uint32)[None, :, None]
    dense = cx + r * (cy + r * cz)
    mask = jnp.uint32(cfg.table_size - 1)
    hashed = (
        cx * jnp.uint32(_PRIMES[0])
        ^ cy * jnp.uint32(_PRIMES[1])
        ^ cz * jnp.uint32(_PRIMES[2])
    ) & mask
    idx = jnp.where(dense_ok[None, :, None], dense, hashed).astype(jnp.int32)
    level_off = (jnp.arange(cfg.n_levels, dtype=jnp.int32) * cfg.table_size)
    return idx + level_off[None, :, None]


def hashgrid_encode(
    table: jnp.ndarray, cfg: HashGridConfig, x: jnp.ndarray
) -> jnp.ndarray:
    """Encode positions x (B, 3) in [0,1]^3 -> features (B, L*F)."""
    x = jnp.clip(x, 0.0, 1.0)
    res = jnp.asarray(cfg.resolutions(), jnp.float32)  # (L,)
    pos = x[:, None, :] * res[None, :, None]           # (B, L, 3)
    cell0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - cell0.astype(jnp.float32)

    offs = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )  # (8, 3)
    corners = cell0[:, :, None, :] + offs[None, None]   # (B, L, 8, 3)
    idx = _corner_indices(cfg, corners)                  # (B, L, 8)
    feats = table[idx]                                   # (B, L, 8, F)

    w = jnp.where(offs[None, None].astype(bool), frac[:, :, None, :],
                  1.0 - frac[:, :, None, :])
    weight = jnp.prod(w, axis=-1)                        # (B, L, 8)
    out = jnp.sum(feats * weight[..., None], axis=2)     # (B, L, F)
    return out.reshape(x.shape[0], cfg.n_levels * cfg.n_features)
