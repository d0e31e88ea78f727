"""Edge-aware à-trous denoiser (JAX).

Substitute for the closed-source OptixDenoiser the reference applies to
Monte-Carlo renders outside the gradient path (bake_shading.py:81,
render.py:151; see SURVEY.md §7 "Denoiser gap"). A multi-pass à-trous
wavelet filter with color-range bilateral weights — deterministic,
differentiable if ever needed, and runs on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_OFFSETS = [(-2, -2), (-2, 0), (-2, 2), (0, -2), (0, 0), (0, 2), (2, -2),
            (2, 0), (2, 2), (-1, -1), (-1, 1), (1, -1), (1, 1), (-1, 0),
            (1, 0), (0, -1), (0, 1)]
_KW = {0: 3.0 / 8.0, 1: 1.0 / 4.0, 2: 1.0 / 16.0}


@functools.partial(jax.jit, static_argnames=("n_passes",))
def atrous_denoise(
    img: jnp.ndarray, n_passes: int = 3, sigma_color: float = 0.25,
) -> jnp.ndarray:
    """img: (H, W, 3) HDR radiance -> denoised (H, W, 3)."""

    def one_pass(x, step):
        h, w, _ = x.shape
        acc = jnp.zeros_like(x)
        wacc = jnp.zeros((h, w, 1), x.dtype)
        center = x
        for dy, dx in _OFFSETS:
            k = _KW[max(abs(dy), abs(dx))]
            shifted = jnp.roll(x, (dy * step, dx * step), axis=(0, 1))
            d2 = jnp.sum((shifted - center) ** 2, -1, keepdims=True)
            wgt = k * jnp.exp(-d2 / (2.0 * sigma_color ** 2))
            acc = acc + shifted * wgt
            wacc = wacc + wgt
        return acc / jnp.maximum(wacc, 1e-8)

    out = img
    for p in range(n_passes):
        out = one_pass(out, 1 << p)
    return out


def denoise_hdr(img, n_passes: int = 3, sigma_color: float = 0.25):
    """Numpy in/out convenience wrapper used by the bake/render stages."""
    import numpy as np

    return np.asarray(atrous_denoise(jnp.asarray(img, jnp.float32),
                                     n_passes, sigma_color))
