"""GGX microfacet BRDF math.

Formula parity with reference utils/ops.py: G1_GGX_Schlick (:46),
G_Smith (:56), fresnelSchlick (:64), fresnelSchlick_sep (:69), D_GGX (:74),
lerp_specular (:99). All functions broadcast over leading axes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi


def g1_ggx_schlick(nov: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Schlick-GGX G1 term, pre-divided by NoV (matches reference :46-54)."""
    k = (roughness + 1.0)
    k = k * k / 8.0
    denom = nov * (1.0 - k) + k
    return 1.0 / denom


def g_smith(nov: jnp.ndarray, nol: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Smith shadow-masking divided by (NoV*NoL)."""
    return g1_ggx_schlick(nol, roughness) * g1_ggx_schlick(nov, roughness)


def fresnel_schlick(voh: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
    x = (1.0 - voh) ** 5
    return f0 + (1.0 - f0) * x


def fresnel_schlick_sep(voh: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split F = F0*(1-x) + x into its two weights (x = (1-VoH)^5)."""
    x = (1.0 - voh) ** 5
    return 1.0 - x, x


def d_ggx(noh: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """GGX normal distribution with alpha = roughness^2."""
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    denom = noh * noh * (alpha2 - 1.0) + 1.0
    return alpha2 / (PI * denom * denom)


def lerp_specular(specular: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Interpolate (..., R, 3) cached specular shadings at given roughness (..., 1).

    Roughness is remapped from [0.02, 1.0] to the R cached levels
    (reference utils/ops.py:99-119).
    """
    r_min, r_max = 0.02, 1.0
    r_num = specular.shape[-2]
    r = (roughness - r_min) / (r_max - r_min) * (r_num - 1)
    r = jnp.clip(r, 0.0, float(r_num - 1))

    r0 = jnp.floor(r).astype(jnp.int32)
    r1 = jnp.ceil(r).astype(jnp.int32)
    frac = r - r0.astype(r.dtype)

    s0 = jnp.take_along_axis(specular, r0[..., None].astype(jnp.int32), axis=-2)[..., 0, :]
    s1 = jnp.take_along_axis(specular, r1[..., None].astype(jnp.int32), axis=-2)[..., 0, :]
    return s0 * (1.0 - frac) + s1 * frac
