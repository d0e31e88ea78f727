"""Data-parallel sharding over rays (SURVEY.md §2.6 design).

The workload is embarrassingly parallel over the ray batch: every integrator
maps (B, ...) -> (B, ...). We shard axis 0 over a 1-D device mesh ('data',),
replicate all model parameters, and let XLA/GSPMD insert the gradient psum
over ICI when `jax.jit` differentiates a loss of (replicated params, sharded
batch). This replaces both the reference's single-GPU ray-chunk loops
(bake_shading.py:105) and its absent distributed support.

Multi-host: each host feeds its own batch shard (jax.process_index-strided);
the same jit program runs SPMD across hosts with collectives over ICI/DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ('data',). Prefers the default backend's devices; falls
    back to CPU devices (virtual) when more are requested than exist."""
    if devices is None:
        default = jax.config.jax_default_device
        if default is not None:
            devices = jax.devices(default.platform)
        else:
            devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            cpus = jax.devices("cpu")
            if len(cpus) >= n_devices:
                devices = cpus
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(mesh: Mesh, x):
    """Place array with axis-0 sharded over 'data'."""
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def shard_pytree_batch(mesh: Mesh, tree):
    return jax.tree_util.tree_map(lambda x: shard_batch(mesh, x), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a parameter pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, m: int, axis: int = 0):
    """Pad axis to a multiple of m (batch divisibility for sharding).
    Returns (padded, original_size)."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths, mode="edge"), n


def host_shard_indices(n_total: int, batch_size: int, key, step: int):
    """Per-host strided permutation indices for multi-host input pipelines
    (replaces the reference's global torch.randperm resample,
    synthetic_ldr.py:388-390)."""
    import jax.random as jr

    perm = jr.permutation(jr.fold_in(key, step), n_total)
    pc, pi = jax.process_count(), jax.process_index()
    per_host = batch_size // pc
    start = pi * per_host
    return perm[start : start + per_host]
