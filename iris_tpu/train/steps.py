"""Stage training-step loss builders (L5 cores).

Losses mirror the three reference trainers:
  make_initialize_loss     — initialize.py:150-225 (joint BRDF+emitter init:
      rendered MSE with material frozen in the render + segment-mean albedo
      anchor on the live material)
  make_brdf_crf_loss       — train_brdf_crf.py:163-314 (cached-shading
      re-render + CRF + diffuse/propagation/albedo/CRF regularizers)
  make_train_emitter_loss  — train_emitter.py (rendered MSE only; material
      and CRF frozen)

torch_scatter segment reductions become jax.ops.segment_sum with a static
`max_segments`; boolean pixel filtering becomes valid-mask weighting. The
semantic-segmentation propagation loss samples a fixed number of partner
pixels per pixel (gated by same-segment indicators) instead of the
reference's per-segment 1024-pair python loop (train_brdf_crf.py:249-261) —
same estimator, fixed shapes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace as dc_replace

import jax
import jax.numpy as jnp

from iris_tpu.core.ggx import lerp_specular
from iris_tpu.core.vecmath import normalize
from iris_tpu.geometry.intersect import ray_intersect
from iris_tpu.models.brdf import ngp_brdf_apply
from iris_tpu.models.crf import (
    EmorCRF, crf_forward, reg_monotonically_increasing, reg_weight,
)
from iris_tpu.render.integrator import path_tracing_single
from iris_tpu.utils.losses import mse, scale_invariant_mse, segment_mean


@dataclass
class LossConfig:
    """Hyperparameters, defaults per reference configs/config.py."""
    spp: int = 8
    n_spp_rounds: int = 1          # SPP // spp accumulation rounds
    ld: float = 5e-4               # diffuse regularization
    lp: float = 5e-3               # part-segmentation propagation
    ls: float = 1e-3               # semantic-segmentation propagation
    la: float = 0.0                # albedo anchor
    sigma_albedo: float = 0.05 / 3.0
    sigma_pos: float = 0.3 / 3.0
    l_crf_increasing: float = 0.1
    l_crf_weight: float = 0.001
    max_segments: int = 128        # static segment-id bound
    has_part: bool = True
    n_pairs: int = 1024            # within-segment partner samples for the
                                   # semantic propagation loss — reference
                                   # parity (train_brdf_crf.py:249). 256 is
                                   # measurably noisier (grad cos 0.69 vs
                                   # 0.88; PERF.md round-4e) and is the
                                   # opt-in perf dial, not the default.
    radiance_log_space: bool = False  # opt-in: train softplus^-1(radiance)
                                   # so Adam moves radiance multiplicatively
                                   # (raw radiance crawls at ~lr/step from a
                                   # dark init — reference behavior too)


_RAD_EPS = 1e-4


def radiance_to_param(radiance, log_space: bool = True):
    """Stored emitter radiance -> trainable leaf. With log_space the leaf
    is log(max(r, eps)): Adam's per-step motion of ~lr in param space then
    MULTIPLIES radiance by ~e^lr instead of adding lr, so a bright emitter
    is reached from a dark init in O(log(target/init)/lr) steps instead of
    target/lr (softplus would not help — it is linear above ~1)."""
    if not log_space:
        return radiance
    return jnp.log(jnp.maximum(jnp.asarray(radiance, jnp.float32),
                               _RAD_EPS))


def param_to_radiance(param, log_space: bool = True):
    """Trainable leaf -> positive radiance (exp in log-space)."""
    if not log_space:
        return param
    return jnp.exp(param)


def _seg_ids(segmentation, max_segments):
    return jnp.clip(segmentation.astype(jnp.int32), 0, max_segments - 1)


def check_max_segments(segmentation, max_segments: int):
    """Host-side guard: ids beyond max_segments would silently alias into
    bucket max_segments-1 inside the jitted losses, corrupting every
    segment-propagation term. Call once per dataset before training."""
    import numpy as np

    top = int(np.asarray(segmentation).max()) if len(segmentation) else 0
    if top >= max_segments:
        raise ValueError(
            f"dataset has segment id {top} >= max_segments={max_segments}; "
            f"raise --max_segments to at least {top + 1}")


@jax.custom_vjp
def _gather1d(x, idx):
    """x[idx] for 1-D x and flat idx, with an explicit `.at[].add` scatter
    backward (the hashgrid.py pattern — JAX's automatic gather-VJP lowers
    to a pathological scatter on TPU, PERF.md)."""
    return x[idx]


def _gather1d_fwd(x, idx):
    return x[idx], (idx, x.shape[0])


def _gather1d_bwd(res, g):
    idx, n = res
    return (jnp.zeros((n,), g.dtype).at[idx].add(g),
            jnp.zeros(idx.shape, jax.dtypes.float0))


_gather1d.defvjp(_gather1d_fwd, _gather1d_bwd)


def propagation_loss(key, seg, valid, pos_n, albedo_d, roughness, metallic,
                     cfg: "LossConfig"):
    """Reference train_brdf_crf.py:240-290 as a fixed-shape estimator.

    Per pixel: cfg.n_pairs partners drawn uniformly (with replacement) from
    the VALID pixels of the SAME segment, bilateral weights
    exp(-|da|^2/2sa^2)*exp(-|dp|^2/2sp^2), weighted roughness/metallic
    means (denominator floor 1e-4 like the reference init), per-pixel L1 to
    the mean, per-segment mean, summed.

    Within-segment sampling with static shapes: sort pixels by segment id
    (invalid pixels get a sentinel id so they sort last and are never
    sampled), then each pixel's segment is the contiguous run
    [searchsorted-left, searchsorted-right) of the sorted keys — a partner
    is start + floor(u * count).
    """
    b = seg.shape[0]
    sentinel = cfg.max_segments
    sort_key = jnp.where(valid, seg, sentinel)
    order = jnp.argsort(sort_key)
    sorted_key = sort_key[order]
    start = jnp.searchsorted(sorted_key, sort_key, side="left")
    count = jnp.searchsorted(sorted_key, sort_key, side="right") - start

    u = jax.random.uniform(key, (b, cfg.n_pairs))
    j_sorted = start[:, None] + jnp.minimum(
        (u * count[:, None]).astype(jnp.int32),
        jnp.maximum(count[:, None] - 1, 0))
    # all partner lookups below are FLAT 1-D gathers of 1-D operands,
    # component-wise (CLAUDE.md TPU rules: (B,P,3) gather results get
    # (8,128)-tile padding; 2-D-index gathers of 2-D operands are slow)
    jf = order[j_sorted.reshape(-1)]                      # (B*P,) originals

    d2a = jnp.zeros((b, cfg.n_pairs))
    d2p = jnp.zeros((b, cfg.n_pairs))
    for c in range(3):
        ac = albedo_d[:, c]
        d2a = d2a + (ac[jf].reshape(b, -1) - ac[:, None]) ** 2
        pc = pos_n[:, c]
        d2p = d2p + (pc[jf].reshape(b, -1) - pc[:, None]) ** 2
    wij = jnp.exp(-d2a / cfg.sigma_albedo ** 2 / 2.0) \
        * jnp.exp(-d2p / cfg.sigma_pos ** 2 / 2.0)
    denom = jnp.sum(wij, -1) + 1e-4
    # partner roughness/metallic DO carry gradients (reference scatter_add
    # over roughness[jj]); route them through the explicit-scatter VJP —
    # JAX's automatic gather-VJP emits a pathological TPU scatter
    r_j = _gather1d(roughness, jf).reshape(b, -1)
    m_j = _gather1d(metallic, jf).reshape(b, -1)
    mean_r = jnp.sum(wij * r_j, -1) / denom
    mean_m = jnp.sum(wij * m_j, -1) / denom
    per_pix = jnp.abs(mean_r - roughness) + jnp.abs(mean_m - metallic)
    w = valid.astype(jnp.float32)
    seg_loss, _ = segment_mean(per_pix, _seg_ids(seg, cfg.max_segments),
                               cfg.max_segments, w)
    return jnp.sum(seg_loss)


def make_initialize_loss(tracer, em_template, crf: EmorCRF, cfg: LossConfig):
    """params = {"material": NGPBRDF, "radiance": (K,3)}. batch keys:
    rays (B,12), rgbs (B,3), exposure (B,1)|None, segmentation (B,),
    int_albedo (B,3).

    Reference initialize.py:150-202. Documented deviation: the albedo
    anchor here is masked to VALID first hits (both the segment means and
    the per-pixel MSE), whereas the reference anchors the field at the
    garbage positions of missed rays too (initialize.py:160-201 never
    compacts by `valid`) — anchoring noise we choose not to replicate.
    The render term and its material-frozen gradient flow (only
    emitter/CRF receive render gradients) match the reference exactly
    (requires_grad toggling :170-186 = stop_gradient here; pinned by
    tests/test_ref_differential.py::test_initialize_material_grad_is_anchor_only)."""

    def loss_fn(params, batch, key):
        rays, rgbs_gt = batch["rays"], batch["rgbs"]
        xs, ds = rays[..., 0:3], normalize(rays[..., 3:6])
        dxdu, dydv = rays[..., 6:9], rays[..., 9:12]
        exposure = batch.get("exposure")

        em = dc_replace(em_template, radiance=param_to_radiance(
            params["radiance"], cfg.radiance_log_space))
        # render with material detached: only the emitter takes render grads
        # (reference initialize.py:170-186 requires_grad toggling)
        mat_frozen = jax.lax.stop_gradient(params["material"])
        mat_fn_frozen = functools.partial(ngp_brdf_apply, mat_frozen)
        k_render, k_jit = jax.random.split(key)
        l = jnp.zeros_like(xs)
        for r in range(cfg.n_spp_rounds):
            l = l + path_tracing_single(
                jax.random.fold_in(k_render, r), tracer, em, mat_fn_frozen,
                xs, ds, dxdu, dydv, cfg.spp,
            )
        l = l / cfg.n_spp_rounds
        ldr = crf_forward(crf, l, exposure)
        loss_c = mse(ldr, rgbs_gt)

        # albedo anchor against segment-mean pseudo albedo, live material
        k_jit, k_mat = jax.random.split(k_jit)
        du, dv = jax.random.uniform(k_jit, (2, xs.shape[0], 1),
                                    minval=-0.5, maxval=0.5)
        wi = normalize(ds + dxdu * du + dydv * dv)
        positions, _, _, _, valid = ray_intersect(tracer, xs, wi)
        # key => unbiased stochastic-corner hash-grid gradients (hot path)
        mat = ngp_brdf_apply(params["material"], positions, k_mat)
        seg = _seg_ids(batch["segmentation"], cfg.max_segments)
        w = valid.astype(jnp.float32)
        _, mean_albedo = segment_mean(batch["int_albedo"], seg,
                                      cfg.max_segments, weights=w)
        diff = (mat["albedo"] - mean_albedo) ** 2
        loss_a = jnp.sum(diff * w[:, None]) / jnp.maximum(jnp.sum(w) * 3, 1.0)

        loss = loss_c + loss_a
        return loss, {"loss_c": loss_c, "loss_a": loss_a}

    return loss_fn


def make_train_emitter_loss(tracer, em_template, material_params,
                            crf: EmorCRF, cfg: LossConfig):
    """params = {"radiance": (K,3)}; rendered-MSE only (train_emitter.py)."""
    mat_fn = functools.partial(ngp_brdf_apply,
                               jax.lax.stop_gradient(material_params))

    def loss_fn(params, batch, key):
        rays, rgbs_gt = batch["rays"], batch["rgbs"]
        xs, ds = rays[..., 0:3], normalize(rays[..., 3:6])
        dxdu, dydv = rays[..., 6:9], rays[..., 9:12]
        em = dc_replace(em_template, radiance=param_to_radiance(
            params["radiance"], cfg.radiance_log_space))
        l = jnp.zeros_like(xs)
        for r in range(cfg.n_spp_rounds):
            l = l + path_tracing_single(
                jax.random.fold_in(key, r), tracer, em, mat_fn,
                xs, ds, dxdu, dydv, cfg.spp,
            )
        l = l / cfg.n_spp_rounds
        ldr = crf_forward(crf, l, batch.get("exposure"))
        loss_c = mse(ldr, rgbs_gt)
        return loss_c, {"loss_c": loss_c}

    return loss_fn


def make_brdf_crf_loss(tracer, crf_template: EmorCRF, cfg: LossConfig,
                       voxel_min, voxel_max, mat_fn=None):
    """params = {"material": NGPBRDF, "crf_weight": (3,dim)}.

    batch keys: rays (B,12), rgbs, exposure, diffuse (B,3),
    specular0/1 (B,R,3), segmentation (B,), int_albedo (B,3).
    Reference train_brdf_crf.py:163-314.

    mat_fn(params, positions, key) overrides the NGP material query —
    used by the reference-semantics differential oracle to pin the LOSS
    semantics with an analytic material (tests/test_ref_differential)."""

    def loss_fn(params, batch, key):
        rays, rgbs_gt = batch["rays"], batch["rgbs"]
        xs, ds = rays[..., 0:3], normalize(rays[..., 3:6])
        positions, _, _, _, valid = ray_intersect(tracer, xs, ds)
        w = valid.astype(jnp.float32)

        key, k_mat = jax.random.split(key)
        # key => unbiased stochastic-corner hash-grid gradients (hot path)
        mat = (ngp_brdf_apply(params["material"], positions, k_mat)
               if mat_fn is None else mat_fn(params, positions, k_mat))
        albedo, metallic, roughness = (mat["albedo"], mat["metallic"],
                                       mat["roughness"])
        kd = albedo * (1.0 - metallic)
        ks = 0.04 * (1.0 - metallic) + albedo * metallic

        ld_shade = kd * batch["diffuse"]
        ls_shade = ks * lerp_specular(batch["specular0"], roughness) \
            + lerp_specular(batch["specular1"], roughness)
        l = ld_shade + ls_shade

        crf = dc_replace(crf_template, weight=params["crf_weight"])
        ldr = crf_forward(crf, l, batch.get("exposure"))
        loss_c = jnp.sum(((ldr - rgbs_gt) ** 2) * w[:, None]) / jnp.maximum(
            jnp.sum(w) * 3, 1.0)

        # diffuse prior (reference :210)
        loss_d = cfg.ld * (
            _wmean(jnp.abs(roughness - 1.0), w) + _wmean(metallic, w)
        )

        seg = _seg_ids(batch["segmentation"], cfg.max_segments)
        if cfg.has_part:
            # weighted per-part means, weight = (1-roughness) detached (:223)
            ws = jax.lax.stop_gradient(1.0 - roughness[:, 0]) + 1e-4
            ws = ws * w
            _, mean_m = segment_mean(metallic[:, 0], seg, cfg.max_segments, ws)
            _, mean_r = segment_mean(roughness[:, 0], seg, cfg.max_segments, ws)
            loss_seg = cfg.lp * (
                _wmean(jnp.abs(metallic[:, 0] - mean_m), w)
                + _wmean(jnp.abs(roughness[:, 0] - mean_r), w)
            )
        else:
            # semantic propagation: bilateral-weighted WITHIN-SEGMENT means
            # via segment-sorted partner sampling (reference :240-290 samples
            # 1024 partners inside each segment; the round-1 uniform-batch
            # sampler wasted almost all pairs on the same-segment gate).
            pos_n = (positions - voxel_min) / (voxel_max - voxel_min) * 2 - 1
            loss_seg = cfg.ls * propagation_loss(
                key, seg, valid, pos_n, jax.lax.stop_gradient(albedo),
                roughness[:, 0], metallic[:, 0], cfg)

        # albedo anchor (:292-306)
        if cfg.la > 0:
            _, mean_tgt = segment_mean(batch["int_albedo"], seg,
                                       cfg.max_segments, w)
            loss_a = cfg.la * scale_invariant_mse(mean_tgt, albedo)
        else:
            loss_a = 0.0

        reg_crf = cfg.l_crf_increasing * reg_monotonically_increasing(crf) \
            + cfg.l_crf_weight * reg_weight(crf)

        loss = loss_c + loss_d + loss_seg + loss_a + reg_crf
        return loss, {"loss_c": loss_c, "loss_d": loss_d,
                      "loss_seg": loss_seg, "reg_crf": reg_crf}

    return loss_fn


def _wmean(x, w):
    wb = jnp.broadcast_to(w[:, None] if x.ndim > 1 else w, x.shape)
    return jnp.sum(x * wb) / jnp.maximum(jnp.sum(wb), 1.0)
