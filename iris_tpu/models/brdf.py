"""BRDF model: analytic GGX+Lambert lobes and the neural (hash-grid) field.

Functional parity with reference model/brdf.py:
  diffuse_sampler (:20), specular_sampler (:36), BaseBRDF.eval_diffuse (:70),
  sample_diffuse (:78), eval_specular (:90), sample_specular (:112),
  eval_brdf (:138), sample_brdf (:177), NGPBRDF (:213).

Gradient policy matches the reference's `.data` detach points: the GGX NDF
inside sampling pdfs is wrapped in stop_gradient, as is the alpha used by
the half-vector sampler (model/brdf.py:46,101,127,160).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from iris_tpu.core.ggx import (
    d_ggx, fresnel_schlick, fresnel_schlick_sep, g_smith,
)
from iris_tpu.core.vecmath import (
    angle2xyz, dot, get_normal_space, normalize, reflect, to_world,
)
from iris_tpu.models.hashgrid import (
    HashGridConfig, hashgrid_encode, init_hashgrid,
)
from iris_tpu.models.mlp import apply_mlp, init_mlp

PI = math.pi


# ---------------------------------------------------------------- samplers

def diffuse_sampler(sample2: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Cosine-hemisphere sample around normal: wi ~ NoL/pi."""
    theta = jnp.arcsin(jnp.sqrt(sample2[..., 0]))
    phi = 2.0 * PI * sample2[..., 1]
    wi = angle2xyz(theta, phi)
    return to_world(get_normal_space(normal), wi)


def specular_sampler(
    sample2: jnp.ndarray, roughness: jnp.ndarray,
    wo: jnp.ndarray, normal: jnp.ndarray,
) -> jnp.ndarray:
    """GGX NDF half-vector sample, reflected to wi (h ~ D*NoH)."""
    alpha = jax.lax.stop_gradient(
        (roughness * roughness).reshape(roughness.shape[0])
    )
    c2 = (1.0 - sample2[..., 0]) / (sample2[..., 0] * (alpha * alpha - 1.0) + 1.0)
    theta = jnp.arccos(jnp.sqrt(jnp.clip(c2, 0.0, 1.0)))
    phi = 2.0 * PI * sample2[..., 1]
    wh = angle2xyz(theta, phi)
    wh = to_world(get_normal_space(normal), wh)
    return normalize(reflect(wo, wh))


# ------------------------------------------------------------ eval / sample

def eval_diffuse(wi, normal):
    pdf = jax.nn.relu(dot(normal, wi)) / PI
    brdf = jnp.broadcast_to(pdf, (*pdf.shape[:-1], 3))
    return brdf, pdf


def sample_diffuse(sample2, normal):
    wi = diffuse_sampler(sample2, normal)
    brdf_weight = jnp.ones_like(normal)
    pdf = jax.nn.relu(dot(normal, wi)) / PI
    return wi, pdf, brdf_weight


def _half_products(wi, wo, normal):
    h = normalize(wi + wo)
    nol = jax.nn.relu(dot(wi, normal))
    nov = jax.nn.relu(dot(wo, normal))
    voh = jax.nn.relu(dot(wo, h))
    noh = jax.nn.relu(dot(normal, h))
    return nol, nov, voh, noh


def eval_specular(wi, wo, normal, roughness):
    """Two Fresnel-split specular lobes + the (detached-D) sampling pdf."""
    nol, nov, voh, noh = _half_products(wi, wo, normal)
    d = d_ggx(noh, roughness)
    pdf = jax.lax.stop_gradient(d) / (4.0 * jnp.maximum(voh, 1e-4)) * noh
    g = g_smith(nov, nol, roughness)
    f0, f1 = fresnel_schlick_sep(voh)
    spec0 = d * g * f0 / 4.0 * nol
    spec1 = d * g * f1 / 4.0 * nol
    return spec0, spec1, pdf


def sample_specular(sample2, wo, normal, roughness):
    """Sample GGX lobe; weights are brdf/pdf for the two Fresnel terms."""
    roughness = jnp.broadcast_to(jnp.asarray(roughness, wo.dtype).reshape(-1, 1)
                                 if jnp.ndim(roughness) <= 1 else roughness,
                                 (wo.shape[0], 1))
    wi = specular_sampler(sample2, roughness, wo, normal)
    nol, nov, voh, noh = _half_products(wi, wo, normal)
    d = d_ggx(noh, roughness)
    pdf = jax.lax.stop_gradient(d) / (4.0 * jnp.maximum(voh, 1e-4)) * noh
    g = g_smith(nov, nol, roughness)
    f0, f1 = fresnel_schlick_sep(voh)
    fac = g * voh * nol / jnp.maximum(noh, 1e-4)
    return wi, pdf, f0 * fac, f1 * fac


def eval_brdf(wi, wo, normal, mat):
    """Full BRDF (Lambert kd + GGX ks) * NoL, plus mixed sampling pdf."""
    albedo, roughness, metallic = mat["albedo"], mat["roughness"], mat["metallic"]
    nol, nov, voh, noh = _half_products(wi, wo, normal)

    d = d_ggx(noh, roughness)
    pdf_spec = jax.lax.stop_gradient(d) / (4.0 * jnp.maximum(voh, 1e-4)) * noh
    pdf_diff = nol / PI
    pdf = 0.5 * pdf_spec + 0.5 * pdf_diff

    kd = albedo * (1.0 - metallic)
    ks = 0.04 * (1.0 - metallic) + albedo * metallic
    g = g_smith(nov, nol, roughness)
    f = fresnel_schlick(voh, ks)
    brdf = kd / PI * nol + d * g * f / 4.0 * nol
    return brdf, pdf


def sample_brdf(sample1, sample2, wo, normal, mat):
    """50/50 lobe-mixed importance sample; returns (wi, pdf, brdf/pdf)."""
    wi_d = diffuse_sampler(sample2, normal)
    wi_s = specular_sampler(sample2, mat["roughness"], wo, normal)
    pick_diffuse = (sample1 > 0.5)[..., None]
    wi = jnp.where(pick_diffuse, wi_d, wi_s)
    brdf, pdf = eval_brdf(wi, wo, normal, mat)
    w = jnp.where(pdf > 0, brdf / jnp.where(pdf > 0, pdf, 1.0), 0.0)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    return wi, pdf, w


# -------------------------------------------------------------- NGP field

@jax.tree_util.register_dataclass
@dataclass
class NGPBRDF:
    """Hash-grid + MLP BRDF parameter field (reference NGPBRDF :213-260)."""

    table: jnp.ndarray
    mlp: dict
    voxel_min: jnp.ndarray  # scalar or (3,)
    voxel_max: jnp.ndarray
    cfg: HashGridConfig = field(metadata=dict(static=True))


def init_ngp_brdf(
    key: jax.Array, voxel_min, voxel_max, cfg: HashGridConfig | None = None,
    hidden: int = 64, n_hidden: int = 2,
) -> NGPBRDF:
    cfg = cfg or HashGridConfig()
    k1, k2 = jax.random.split(key)
    feat = cfg.n_levels * cfg.n_features
    return NGPBRDF(
        table=init_hashgrid(k1, cfg),
        mlp=init_mlp(k2, [feat] + [hidden] * n_hidden + [5]),
        voxel_min=jnp.asarray(voxel_min, jnp.float32),
        voxel_max=jnp.asarray(voxel_max, jnp.float32),
        cfg=cfg,
    )


def ngp_brdf_apply(params: NGPBRDF, position: jnp.ndarray,
                   key: jax.Array | None = None) -> dict:
    """Query BRDF parameters at positions (B,3).

    Returns dict(albedo (B,3), roughness (B,1) in [0.02,1], metallic (B,1)),
    same output mapping as reference model/brdf.py:243-260.

    `key` enables the hash grid's unbiased stochastic-corner estimators
    (training hot path; see HashGridConfig). Without a key the encode is
    exact and fully deterministic (eval/render path).
    """
    x = (position - params.voxel_min) / (params.voxel_max - params.voxel_min)
    feat = hashgrid_encode(params.table, params.cfg, x, key)
    out = jax.nn.sigmoid(apply_mlp(params.mlp, feat))
    return {
        "albedo": out[..., 0:3],
        "roughness": out[..., 3:4] * 0.98 + 0.02,
        "metallic": out[..., 4:5],
    }


@jax.tree_util.register_dataclass
@dataclass
class ConstantBRDF:
    """Fixed material for tests / shading bakes (reference BaseBRDF role)."""

    albedo: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray


def constant_brdf_apply(params: ConstantBRDF, position: jnp.ndarray) -> dict:
    b = position.shape[0]
    return {
        "albedo": jnp.broadcast_to(params.albedo, (b, 3)),
        "roughness": jnp.broadcast_to(params.roughness, (b, 1)),
        "metallic": jnp.broadcast_to(params.metallic, (b, 1)),
    }
