"""Scale/shift-invariant losses + masked segment statistics.

Parity: reference utils/loss.py (compute_scale :14, compute_scale_shift :22,
scale_invariant_mse :33, scale_shift_invariant_mse :39). The segment helpers
replace torch_scatter with jax.ops.segment_sum (deterministic on TPU) and a
static segment count — see train stages for usage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_scale(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Least-squares scalar s minimizing ||s*source - target||^2."""
    s, t = source.reshape(-1), target.reshape(-1)
    return jnp.dot(s, t) / jnp.maximum(jnp.dot(s, s), 1e-12)


def compute_scale_shift(source: jnp.ndarray, target: jnp.ndarray):
    """Least-squares (scale, shift): target ~ scale*source + shift."""
    s, t = source.reshape(-1), target.reshape(-1)
    n = s.shape[0]
    sx = jnp.sum(s)
    sxx = jnp.dot(s, s)
    sxt = jnp.dot(s, t)
    st = jnp.sum(t)
    det = sxx * n - sx * sx
    scale = (sxt * n - sx * st) / jnp.maximum(det, 1e-12)
    shift = (sxx * st - sx * sxt) / jnp.maximum(det, 1e-12)
    return scale, shift


def scale_invariant_mse(source, target):
    scale = jax.lax.stop_gradient(compute_scale(source, target))
    return jnp.mean((source * scale - target) ** 2)


def scale_shift_invariant_mse(source, target):
    scale, shift = compute_scale_shift(source, target)
    scale = jax.lax.stop_gradient(scale)
    shift = jax.lax.stop_gradient(shift)
    return jnp.mean((source * scale + shift - target) ** 2)


def segment_mean(
    values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int,
    weights: jnp.ndarray | None = None,
):
    """Weighted per-segment mean, returned per segment AND gathered back to
    elements. values (B, C) or (B,), seg_ids (B,) int in [0, num_segments).

    Replaces the reference's torch_scatter mean patterns
    (train_brdf_crf.py:225-238)."""
    v = values if values.ndim > 1 else values[:, None]
    if weights is None:
        weights = jnp.ones(v.shape[0], v.dtype)
    wsum = jax.ops.segment_sum(weights, seg_ids, num_segments)
    vsum = jax.ops.segment_sum(v * weights[:, None], seg_ids, num_segments)
    mean = vsum / jnp.maximum(wsum, 1e-8)[:, None]
    per_elem = mean[seg_ids]
    if values.ndim == 1:
        return mean[:, 0], per_elem[:, 0]
    return mean, per_elem


def mse(a, b):
    return jnp.mean((a - b) ** 2)
