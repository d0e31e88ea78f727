"""Edge-aware à-trous denoiser with aux-buffer guides (JAX).

Substitute for the closed-source OptixDenoiser the reference applies to
Monte-Carlo renders outside the gradient path (bake_shading.py:81,
render.py:151; see SURVEY.md §7 "Denoiser gap"). A multi-pass à-trous
wavelet filter with color-range bilateral weights, optionally joint-
bilateral on first-hit NORMAL and ALBEDO guides — the same aux buffers the
OptiX denoiser consumes, already computed in every bake/render pass.

Two measured pitfalls shape the implementation:
- invalid (miss) pixels are stored as zeros; filtering across them bleeds
  black into valid regions (23% mean loss on a small bake) -> the `mask`
  argument zero-weights invalid taps and passes invalid pixels through;
- a fixed color sigma either refuses to smooth (HDR noise >> sigma) or
  destroys signal (sigma >> noise) -> the wrapper scales sigma to a
  spike-aware (95th-percentile) noise estimate.
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
    normal: jnp.ndarray | None = None, albedo: jnp.ndarray | None = None,
    sigma_normal: float = 0.2, sigma_albedo: float = 0.15,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """img: (H, W, 3) HDR radiance -> denoised (H, W, 3).

    normal/albedo: optional (H, W, 3) first-hit guides — guide weights are
    computed against the ORIGINAL buffers every pass so geometric/texture
    edges survive aggressive color smoothing. mask: (H, W) bool validity;
    invalid taps get zero weight and invalid pixels pass through."""

    mask_w = None if mask is None else mask.astype(img.dtype)[..., None]

    def one_pass(x, step):
        h, w, _ = x.shape
        acc = jnp.zeros_like(x)
        wacc = jnp.zeros((h, w, 1), x.dtype)
        center = x
        for dy, dx in _OFFSETS:
            k = _KW[max(abs(dy), abs(dx))]
            sh = (dy * step, dx * step)
            shifted = jnp.roll(x, sh, axis=(0, 1))
            d2 = jnp.sum((shifted - center) ** 2, -1, keepdims=True)
            wgt = k * jnp.exp(-d2 / (2.0 * sigma_color ** 2))
            if normal is not None:
                dn = jnp.sum(
                    (jnp.roll(normal, sh, axis=(0, 1)) - normal) ** 2, -1,
                    keepdims=True)
                wgt = wgt * jnp.exp(-dn / (2.0 * sigma_normal ** 2))
            if albedo is not None:
                da = jnp.sum(
                    (jnp.roll(albedo, sh, axis=(0, 1)) - albedo) ** 2, -1,
                    keepdims=True)
                wgt = wgt * jnp.exp(-da / (2.0 * sigma_albedo ** 2))
            if mask_w is not None:
                wgt = wgt * jnp.roll(mask_w, sh, axis=(0, 1))
            acc = acc + shifted * wgt
            wacc = wacc + wgt
        out = acc / jnp.maximum(wacc, 1e-8)
        if mask_w is not None:
            out = jnp.where(mask_w > 0, out, x)
        return out

    out = img
    for p in range(n_passes):
        out = one_pass(out, 1 << p)
    return out


def estimate_noise_sigma(img, mask=None) -> float:
    """MC-noise scale for bilateral sigmas: the 95th percentile of
    |img - 3x3 median| over valid pixels. Low-spp Monte Carlo noise is
    spike-dominated (rare bright samples), so a median/MAD estimate
    collapses (measured 0.02 vs true ~0.7); the filter must open its
    range to the SPIKE magnitude to average them away."""
    import numpy as np
    from scipy.ndimage import median_filter

    img = np.asarray(img, np.float32)
    lum = img.mean(-1)
    dev = np.abs(lum - median_filter(lum, size=3))
    if mask is not None:
        dev = dev[np.asarray(mask, bool)]
    if dev.size == 0:
        return 0.0
    return float(np.quantile(dev, 0.95))


def denoise_hdr(img, n_passes: int = 3, sigma_color: float | None = None,
                normal=None, albedo=None, mask=None):
    """Numpy in/out convenience wrapper used by the bake/render stages.
    Pass first-hit `normal`/`albedo` (H, W, 3) guides and a validity
    `mask` (H, W).

    sigma_color default: noise-proportional — 2x the q95 spike estimate
    (see estimate_noise_sigma), floored at the legacy 0.25 without guides
    (guides carry the edge-stopping otherwise).

    IRIS_TPU_NO_DENOISE=1 turns the wrapper into an identity — the A/B
    switch quantifying what denoised shading caches buy the BRDF fit
    (reference applies OptiX before writing caches, bake_shading.py:81;
    receipt in PERF.md round-4)."""
    import numpy as np

    img = np.asarray(img, np.float32)
    import os
    if os.environ.get("IRIS_TPU_NO_DENOISE"):
        return img
    if mask is not None:
        mask = np.asarray(mask, bool).reshape(img.shape[:2])
    if sigma_color is None:
        s_noise = estimate_noise_sigma(img, mask)
        if normal is None and albedo is None:
            sigma_color = max(2.0 * s_noise, 0.25)
        else:
            sigma_color = max(2.0 * s_noise, 0.05)
    nrm = None if normal is None else jnp.asarray(
        np.asarray(normal).reshape(img.shape[:2] + (-1,)), jnp.float32)
    alb = None if albedo is None else jnp.asarray(
        np.asarray(albedo).reshape(img.shape[:2] + (-1,)), jnp.float32)
    mk = None if mask is None else jnp.asarray(mask)
    return np.asarray(atrous_denoise(jnp.asarray(img), n_passes,
                                     sigma_color, nrm, alb, mask=mk))
