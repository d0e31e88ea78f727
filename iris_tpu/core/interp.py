"""Differentiable 1-D regular-grid interpolation + monotone projection.

Replaces torch_interpolations.RegularGridInterpolator used by the reference
CRF model (crf/model_crf.py:51,82,102). jnp.interp is already differentiable
w.r.t. both query points and (via grad through gather/lerp) the table values.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp1d(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of fp sampled at xp, queried at x.

    Differentiable w.r.t. x and fp (clamped at the boundary like the
    reference's RegularGridInterpolator).
    """
    return jnp.interp(x, xp, fp)


def interp1d_uniform(x: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Interpolate fp defined on a uniform grid over [0,1]; faster than interp1d.

    Used for the CRF forward (hdr -> ldr) where the sample grid is
    linspace(0,1,N) (crf/model_crf.py:77).
    """
    n = fp.shape[-1]
    xi = jnp.clip(x, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, n - 2)
    frac = xi - i0.astype(xi.dtype)
    f0 = jnp.take(fp, i0, axis=-1)
    f1 = jnp.take(fp, i0 + 1, axis=-1)
    return f0 * (1.0 - frac) + f1 * frac


def mono_increase_constraint(crf: jnp.ndarray) -> jnp.ndarray:
    """Project a curve to a monotone-increasing one normalized to [0,1].

    Mirrors crf/model_crf.py:22-30: shift all finite differences by the most
    negative one, renormalize to sum 1, cumulative-sum, prepend 0.
    """
    diff = crf[1:] - crf[:-1]
    gap = jnp.maximum(-jnp.min(diff), 0.0)
    diff = diff + gap
    diff = diff / jnp.sum(diff)
    out = jnp.cumsum(diff)
    return jnp.concatenate([jnp.zeros((1,), dtype=crf.dtype), out])
