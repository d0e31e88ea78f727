"""Vector math primitives (functional, batched over leading axes).

Semantics match reference utils/ops.py (get_normal_space :12, angle2xyz :32,
double_sided :85) but are written mask-based for XLA: no boolean indexing,
no in-place mutation.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe L2-normalize along the last axis (matches F.normalize eps-clamp)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, EPS)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def get_normal_space(normal: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal tangent frame (..., 3, 3) with columns (tangent, bitangent, normal).

    Branch rule follows reference utils/ops.py:12-30: when |x·n| <= 0.1 the
    tangent is normalize(cross(x_axis, n)); otherwise normalize(cross(y_axis, n)).
    """
    x_axis = jnp.zeros_like(normal).at[..., 0].set(1.0)
    y_axis = jnp.zeros_like(normal).at[..., 1].set(1.0)

    near_x = jnp.abs(normal[..., 0:1]) <= 1e-1
    t = jnp.where(near_x, cross(x_axis, normal), cross(y_axis, normal))
    tangent = normalize(t)
    bitangent = cross(normal, tangent)
    return jnp.stack([tangent, bitangent, normal], axis=-1)


def to_world(frame: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Transform local direction v (..., 3) by frame (..., 3, 3) columns (t,b,n)."""
    return (
        frame[..., 0] * v[..., 0:1]
        + frame[..., 1] * v[..., 1:2]
        + frame[..., 2] * v[..., 2:3]
    )


def angle2xyz(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Spherical (theta from +z, phi around z) to unit euclidean (..., 3)."""
    sin_t = jnp.sin(theta)
    v = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)], axis=-1)
    return normalize(v)


def double_sided(view: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Flip normals to face the viewer (reference utils/ops.py:85)."""
    nov = dot(normal, view)
    return jnp.where(nov < 0, -normal, normal)


def reflect(wo: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Mirror wo about h."""
    return 2.0 * dot(wo, h) * h - wo


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)
