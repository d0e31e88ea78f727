"""Reference-semantics differential oracle (round-4 verdict item 5).

A torch-free float64 NUMPY transcription of the reference implementation's
estimator semantics — NOT of iris_tpu's code — used to pin numerical
agreement (renders AND gradients) between the TPU-native framework and the
reference under common random numbers. Transcribed, torch -> numpy, from:

  /root/reference/utils/ops.py:12-118          (GGX / Fresnel / frames)
  /root/reference/model/brdf.py:20-211         (samplers, eval/sample BRDF)
  /root/reference/model/emitter.py:134-255     (SLFEmitter eval/sample)
  /root/reference/model/slf.py:16-68           (VoxelSLF)
  /root/reference/utils/path_tracing.py:320-407 (path_tracing_single)
  /root/reference/crf/model_crf.py:32-121      (EmorCRF forward)

Design notes:
- Ray intersection is a brute-force Moller-Trumbore sweep over every
  triangle (the reference delegates to Mitsuba/OptiX, path_tracing.py:17)
  — independent of iris_tpu's BVH, so the comparison also validates the
  traversal stack.
- torch `.data` detach points become explicit SHADOW parameters: every
  function that the reference evaluates on detached values takes the
  shadow copy (specular_sampler's alpha, the D term inside sampling pdfs
  — model/brdf.py:47,101,127,160-162). Finite differences over the LIVE
  parameters with the shadow held fixed therefore reproduce torch
  autograd's gradient exactly (up to FD truncation error).
- The reference physically compacts the sample set at each masking point
  (boolean indexing); this transcription keeps that structure verbatim.
  Common random numbers are injected PER LANE (lane = camera sample) and
  subset by the same masks, so a compacted element consumes the same
  uniform in both implementations.
"""

from __future__ import annotations

import math

import numpy as np

PI = math.pi


# ----------------------------------------------------------- ops.py :12-45

def normalize(v, axis=-1):
    n = np.linalg.norm(v, axis=axis, keepdims=True)
    return v / np.maximum(n, 1e-12)


def get_normal_space(normal):
    """ops.py:12-30 — [tangent, bitangent, normal] columns, (B, 3, 3)."""
    v1 = np.zeros_like(normal)
    tangent = np.zeros_like(normal)
    v1[..., 0] = 1.0
    tangent[..., 1] = 1.0
    mask = np.abs((v1 * normal).sum(-1)) <= 1e-1
    tangent[mask] = normalize(np.cross(v1[mask], normal[mask]))
    tangent[~mask] = normalize(np.cross(tangent[~mask], normal[~mask]))
    bitangent = np.cross(normal, tangent)
    return np.stack([tangent, bitangent, normal], axis=-1)


def angle2xyz(theta, phi):
    """ops.py:32-44."""
    st = np.sin(theta)
    ret = np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], -1)
    return normalize(ret)


def g1_ggx_schlick(nov, eta):
    """ops.py:46-54."""
    k = (eta + 1.0)
    k = k * k / 8.0
    return 1.0 / (nov * (1.0 - k) + k)


def g_smith(nov, nol, eta):
    """ops.py:56-62."""
    return g1_ggx_schlick(nol, eta) * g1_ggx_schlick(nov, eta)


def fresnel_schlick(voh, f0):
    """ops.py:64-67."""
    x = (1.0 - voh) ** 5
    return f0 + (1.0 - f0) * x


def fresnel_schlick_sep(voh):
    """ops.py:69-72."""
    x = (1.0 - voh) ** 5
    return 1.0 - x, x


def d_ggx(cos_h, eta):
    """ops.py:74-82."""
    alpha = eta * eta
    alpha2 = alpha * alpha
    denom = cos_h * cos_h * (alpha2 - 1.0) + 1.0
    return alpha2 / (PI * denom * denom)


def double_sided(v, n):
    """ops.py:85-96 — flip normals facing away from v."""
    n = n.copy()
    flipped = (n * v).sum(-1) < 0
    n[flipped] = -n[flipped]
    return n


# --------------------------------------------- brute-force ray intersection
# (stands in for Mitsuba's scene.ray_intersect, path_tracing.py:17-48)

def ray_intersect_brute(tris, xs, ds):
    """First-hit over (F, 3, 3) triangles for rays (B, 3)+(B, 3).

    Returns (positions, normals (double-sided vs -ds), uvs, idx, valid) —
    the wrapper contract of path_tracing.py:17-48. Watertight enough for
    test scenes: plain Moller-Trumbore with a 1e-9 parallel guard, t > 0.
    """
    b = xs.shape[0]
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    best_t = np.full(b, np.inf)
    best_idx = np.full(b, -1, np.int64)
    best_u = np.zeros(b)
    best_v = np.zeros(b)
    for f in range(tris.shape[0]):
        p = np.cross(ds, e2[f])
        det = (e1[f] * p).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = 1.0 / np.where(ok, det, 1.0)
        s = xs - v0[f]
        u = (s * p).sum(-1) * inv
        q = np.cross(s, e1[f])
        v = (ds * q).sum(-1) * inv
        t = (e2[f] * q).sum(-1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-9) \
            & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_idx = np.where(hit, f, best_idx)
        best_u = np.where(hit, u, best_u)
        best_v = np.where(hit, v, best_v)
    valid = best_idx >= 0
    positions = xs + ds * np.where(valid, best_t, 0.0)[:, None]
    normals = np.zeros_like(xs)
    gn = normalize(np.cross(e1, e2))
    normals[valid] = gn[best_idx[valid]]
    normals = double_sided(-ds, normals)
    uvs = np.stack([best_u, best_v], -1)
    return positions, normals, uvs, best_idx, valid


# ------------------------------------------------------------ VoxelSLF :16-68

class OracleSLF:
    def __init__(self, mask, voxel_min, voxel_max, radiance):
        h = mask.shape[0]
        self.H = h
        self.voxel_min = voxel_min
        self.voxel_max = voxel_max
        kk, jj, ii = np.where(mask)
        inds = -np.ones((h, h, h), np.int64)
        inds[kk, jj, ii] = np.arange(len(ii))
        self.inds = inds
        self.radiance = np.asarray(radiance, np.float64)

    def spatial_idx(self, x):
        """slf.py:44-56 (indexing [z, y, x])."""
        xn = (x - self.voxel_min) / (self.voxel_max - self.voxel_min)
        xi = np.clip((xn * self.H).astype(np.int64), 0, self.H - 1)
        return self.inds[xi[..., 2], xi[..., 1], xi[..., 0]]

    def forward(self, x):
        """slf.py:63-70 — zero radiance for empty voxels."""
        idx = self.spatial_idx(x)
        r = self.radiance[np.maximum(idx, 0)].copy()
        r[idx == -1] = 0.0
        return r


# ----------------------------------------------------- SLFEmitter :134-255

class OracleEmitter:
    """SLFEmitter transcription; `radiance` is the LIVE (K, 3) parameter
    (SLFEmitterLearn makes it an nn.Parameter, emitter.py:258-272)."""

    def __init__(self, is_emitter, tris, radiance, slf: OracleSLF):
        is_emitter = np.asarray(is_emitter, bool)
        self.is_emitter = is_emitter
        self.slf = slf
        k = int(is_emitter.sum())
        emitter_idx = np.full(len(is_emitter), -1, np.int64)
        emitter_idx[is_emitter] = np.arange(k)
        self.emitter_idx = emitter_idx
        self.triangle_idx = np.flatnonzero(is_emitter)
        verts = np.asarray(tris, np.float64)[self.triangle_idx]
        self.emitter_vertices = verts
        c = np.cross(verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0])
        self.emitter_area = np.linalg.norm(c, axis=-1) / 2.0
        # uniform selection pdf/cdf (emitter.py:170-174)
        self.emitter_pdf = np.full(k, 1.0 / k)
        self.emitter_cdf = np.cumsum(self.emitter_pdf)
        self.radiance = np.asarray(radiance, np.float64)

    def eval_emitter(self, position, light_dir, triangle_idx,
                     roughness=None, trace_roughness=0.6):
        """emitter.py:182-225."""
        vis = triangle_idx != -1
        le = np.zeros((position.shape[0], 3))
        emit_pdf = np.zeros(position.shape[0])
        is_area = self.is_emitter[triangle_idx] & vis
        if is_area.any():
            e_idx = self.emitter_idx[triangle_idx[is_area]]
            emit_pdf[is_area] = self.emitter_pdf[e_idx] / np.maximum(
                self.emitter_area[e_idx], 1e-12)
            le[is_area] = self.radiance[e_idx]
        le = le * vis[:, None]
        valid_next = (~is_area) & vis
        if roughness is not None:
            is_diffuse = (~is_area) & vis \
                & (roughness.squeeze(-1) > trace_roughness)
            if is_diffuse.any():
                diffuse_slf = self.slf.forward(position[is_diffuse])
                l_diffuse = np.zeros_like(le)
                l_diffuse[is_diffuse] = diffuse_slf
                le = le + l_diffuse
                nz = diffuse_slf.sum(-1) > 0
                is_diffuse = is_diffuse.copy()
                is_diffuse[is_diffuse.copy()] = nz
                valid_next &= ~is_diffuse
        return le, emit_pdf[:, None], valid_next

    def sample_emitter(self, sample1, sample2, position):
        """emitter.py:227-255."""
        e = np.searchsorted(self.emitter_cdf,
                            np.maximum(sample1, 1e-12))
        e = np.clip(e, 0, len(self.emitter_cdf) - 1)
        pdf0 = self.emitter_pdf[e]
        xi1 = np.sqrt(sample2[..., 0])
        u = (1.0 - xi1)[:, None]
        v = (xi1 * sample2[..., 1])[:, None]
        w = 1.0 - u - v
        a1 = self.emitter_area[e]
        p1 = self.emitter_vertices[e]
        p1 = p1[:, 0] * u + p1[:, 1] * v + p1[:, 2] * w
        wi = normalize(p1 - position)
        tri = self.triangle_idx[e]
        pdf = pdf0 / np.maximum(a1, 1e-12)
        return wi, pdf[:, None], tri


# ------------------------------------------------- BRDF (brdf.py :20-211)
# Every `mat` is {'albedo' (N,3), 'roughness' (N,1), 'metallic' (N,1)};
# `mat_shadow` carries the values used at the reference's `.data` sites.

def diffuse_sampler(sample2, normal):
    """brdf.py:20-34."""
    theta = np.arcsin(np.sqrt(sample2[..., 0]))
    phi = 2.0 * PI * sample2[..., 1]
    wi = angle2xyz(theta, phi)
    nmat = get_normal_space(normal)
    return np.einsum("bij,bj->bi", nmat, wi)


def specular_sampler(sample2, roughness_shadow, wo, normal):
    """brdf.py:36-59 — alpha comes from the DETACHED roughness (:47)."""
    alpha = (roughness_shadow * roughness_shadow).squeeze(-1)
    c2 = (1.0 - sample2[..., 0]) \
        / (sample2[..., 0] * (alpha * alpha - 1.0) + 1.0)
    theta = np.arccos(np.sqrt(np.clip(c2, 0.0, 1.0)))
    phi = 2.0 * PI * sample2[..., 1]
    wh = angle2xyz(theta, phi)
    nmat = get_normal_space(normal)
    wh = np.einsum("bij,bj->bi", nmat, wh)
    wi = 2.0 * (wo * wh).sum(-1, keepdims=True) * wh - wo
    return normalize(wi)


def relu(x):
    return np.maximum(x, 0.0)


def eval_brdf(wi, wo, normal, mat, mat_shadow):
    """brdf.py:138-176 — pdf_spec uses D.data (:160), everything else live."""
    albedo, roughness, metallic = (mat["albedo"], mat["roughness"],
                                   mat["metallic"])
    h = normalize(wi + wo)
    nol = relu((wi * normal).sum(-1, keepdims=True))
    nov = relu((wo * normal).sum(-1, keepdims=True))
    voh = relu((wo * h).sum(-1, keepdims=True))
    noh = relu((normal * h).sum(-1, keepdims=True))

    d_detached = d_ggx(noh, mat_shadow["roughness"])
    pdf_spec = d_detached / (4.0 * np.maximum(voh, 1e-4)) * noh
    pdf_diff = nol / PI
    pdf = 0.5 * pdf_spec + 0.5 * pdf_diff

    kd = albedo * (1.0 - metallic)
    ks = 0.04 * (1.0 - metallic) + albedo * metallic
    d = d_ggx(noh, roughness)
    g = g_smith(nov, nol, roughness)
    f = fresnel_schlick(voh, ks)
    brdf = kd / PI * nol + d * g * f / 4.0 * nol
    return brdf, pdf


def sample_brdf(sample1, sample2, wo, normal, mat, mat_shadow):
    """brdf.py:177-211 — 50/50 lobe pick on sample1, NaN-guarded weight."""
    b = sample1.shape[0]
    wi = np.zeros((b, 3))
    mask = sample1 > 0.5
    if mask.any():
        wi[mask] = diffuse_sampler(sample2[mask], normal[mask])
    if (~mask).any():
        wi[~mask] = specular_sampler(
            sample2[~mask], mat_shadow["roughness"][~mask],
            wo[~mask], normal[~mask])
    brdf, pdf = eval_brdf(wi, wo, normal, mat, mat_shadow)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(pdf > 0, brdf / pdf, 0.0)
    w[np.isnan(w)] = 0.0
    return wi, pdf, w


# --------------------------------------- path_tracing_single (:320-407)

def path_tracing_single(tris, emitter: OracleEmitter, mat_of, mat_shadow_of,
                        rays_o, rays_d, dx_du, dy_dv, spp, uniforms,
                        ray_eps):
    """Literal transcription of utils/path_tracing.py:320-407
    (trace_roughness = 0.0, as set at :334).

    mat_of(position) / mat_shadow_of(position) return the live / detached
    material dicts (the reference queries material_net at :353 and :391).
    `uniforms` carries per-LANE draws: dudv (2, B, spp, 1) in [-0.5, 0.5),
    and s1 (B*spp,), s2 (B*spp, 2), s1b, s2b — subset by the compaction
    masks exactly where the reference draws torch.rand on the compacted
    set (:357-360, :385-388)."""
    b = len(rays_o)
    trace_roughness = 0.0

    # sample camera ray (:336-339)
    du, dv = uniforms["dudv"]
    wi = normalize(rays_d[:, None] + dx_du[:, None] * du
                   + dy_dv[:, None] * dv).reshape(-1, 3)
    position = np.repeat(rays_o, spp, axis=0)

    # first intersection (:341-343)
    position, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position, wi)
    l, _, valid_next = emitter.eval_emitter(position, wi, triangle_idx)

    if not valid_next.any():
        return l.reshape(b, spp, 3).mean(1)
    lane = np.arange(b * spp)
    position = position[valid_next]
    normal = normal[valid_next]
    wo = -wi[valid_next]
    active_next = valid_next.copy()
    lane = lane[valid_next]

    mat = mat_of(position)
    mat_shadow = mat_shadow_of(position)

    # ---- direct illumination with MIS: sample emitter (:356-361)
    wi, emit_pdf, emit_triangle_idx = emitter.sample_emitter(
        uniforms["s1"][lane], uniforms["s2"][lane], position)

    # visibility test (:363-366)
    emit_position, emit_normal, _, triangle_idx, emit_valid = \
        ray_intersect_brute(tris, position + ray_eps * wi, wi)
    emit_vis = (~emit_valid) | (emit_triangle_idx == triangle_idx)
    emit_weight, _, _ = emitter.eval_emitter(emit_position, wi,
                                             triangle_idx)

    # geometry term (:368-372)
    g = np.abs((-wi * emit_normal).sum(-1)) / np.maximum(
        ((emit_position - position) ** 2).sum(-1), 1e-6)
    g = np.where(emit_valid, g, 1.0)[:, None]
    emit_weight = emit_weight * emit_vis[:, None] * g \
        / np.maximum(emit_pdf, 1e-6)

    # emit brdf + MIS weight (:375-381)
    emit_brdf, brdf_pdf = eval_brdf(wi, wo, normal, mat, mat_shadow)
    brdf_pdf = brdf_pdf * g
    denom = np.maximum(emit_pdf * emit_pdf + brdf_pdf * brdf_pdf, 1e-6)
    w_mis = np.where((emit_pdf > 0) & (~np.isinf(brdf_pdf)),
                     emit_pdf * emit_pdf / denom, 0.0)
    w_mis[np.isinf(emit_pdf) | (brdf_pdf == 0)] = 1.0
    l[active_next] += emit_brdf * emit_weight * w_mis

    # ---- sample brdf (:384-388)
    wi, brdf_pdf, brdf_weight = sample_brdf(
        uniforms["s1b"][lane], uniforms["s2b"][lane], wo, normal,
        mat, mat_shadow)

    # next intersection (:390-391)
    position_next, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position + ray_eps * wi, wi)
    mat_next = mat_of(position_next)

    # evaluate Le against the radiance cache (:393-399)
    le, emit_pdf, valid_next = emitter.eval_emitter(
        position_next, wi, triangle_idx, mat_next["roughness"],
        trace_roughness)
    g = np.abs((-normal * wi).sum(-1)) / np.maximum(
        ((position - position_next) ** 2).sum(-1), 1e-6)
    g = np.where(valid_next, g, 1.0)
    brdf_pdf = brdf_pdf * g[:, None]

    # MIS weight (:401-403); note: NO clamp on this denominator
    with np.errstate(divide="ignore", invalid="ignore"):
        w_mis = np.where(
            (brdf_pdf > 0) & (~np.isinf(emit_pdf)),
            brdf_pdf * brdf_pdf
            / (emit_pdf * emit_pdf + brdf_pdf * brdf_pdf), 0.0)
    w_mis[np.isinf(brdf_pdf) | (emit_pdf == 0)] = 1.0
    l[active_next] += brdf_weight * le * w_mis

    return l.reshape(b, spp, 3).mean(1)


# ------------------------------------------------ EmorCRF forward (:69-87)

def crf_forward(weight, f0, basis, hdr, exposure):
    """crf/model_crf.py:69-87: clip to [0,1], per-channel linear interp of
    the (3, 1024) response curve on a uniform grid."""
    hdr = np.clip(hdr * exposure, 0.0, 1.0)
    crf = f0[None] + weight @ basis
    n = crf.shape[1]
    ldr = []
    for i in range(3):
        xi = hdr[:, i] * (n - 1)
        i0 = np.clip(np.floor(xi).astype(np.int64), 0, n - 2)
        frac = xi - i0
        ldr.append(crf[i, i0] * (1.0 - frac) + crf[i, i0 + 1] * frac)
    return np.stack(ldr, -1)

# ------------------------------------------- EmorCRF inverse (:22-30, :45-56, :89-108)

def mono_increase_constraint(crf):
    """crf/model_crf.py:22-30: shift finite differences by the most
    negative one, renormalize to sum 1, cumsum, prepend 0."""
    diff = crf[1:] - crf[:-1]
    dmin = diff.min()
    gap = -dmin if dmin < 0 else 0.0
    diff = diff + gap
    diff = diff / diff.sum()
    out = np.cumsum(diff)
    return np.concatenate([np.zeros(1), out])


def _interp_nonuniform(q, xp, fp):
    """Linear interp of fp at knots xp (ascending), queried at q, clamped
    at the ends — RegularGridInterpolator([xp], fp)([q]) semantics."""
    i1 = np.clip(np.searchsorted(xp, q), 1, len(xp) - 1)
    x0, x1 = xp[i1 - 1], xp[i1]
    f0, f1 = fp[i1 - 1], fp[i1]
    w = np.where(x1 > x0, (q - x0) / np.where(x1 > x0, x1 - x0, 1.0), 0.0)
    w = np.clip(w, 0.0, 1.0)
    return f0 * (1.0 - w) + f1 * w


def crf_inverse(weight, f0, basis, ldr, exposure):
    """crf/model_crf.py:45-56 (get_inv_crf) + :89-108 (inverse): mono-
    project each channel curve, tabulate its inverse on the uniform grid,
    then linearly interpolate the queries."""
    ldr = np.clip(ldr, 0.0, 1.0)
    crf = f0[None] + weight @ basis
    n = crf.shape[1]
    x = np.linspace(0.0, 1.0, n)
    hdr = []
    for i in range(3):
        c_mono = mono_increase_constraint(crf[i])
        inv_tab = _interp_nonuniform(x, c_mono, x)    # get_inv_crf row
        xi = ldr[:, i] * (n - 1)                       # uniform-grid interp
        i0 = np.clip(np.floor(xi).astype(np.int64), 0, n - 2)
        frac = xi - i0
        hdr.append(inv_tab[i0] * (1.0 - frac) + inv_tab[i0 + 1] * frac)
    return np.stack(hdr, -1) / exposure


# -------------------------------- diffuse/specular bake samplers (:78-136)

def sample_diffuse(sample2, normal):
    """brdf.py:78-88: cosine sample, weight 1, pdf NoL/pi."""
    wi = diffuse_sampler(sample2, normal)
    brdf_weight = np.ones(normal.shape)
    pdf = relu((normal * wi).sum(-1, keepdims=True)) / PI
    return wi, pdf, brdf_weight


def sample_specular(sample2, wo, normal, roughness):
    """brdf.py:112-136: GGX sample at a FIXED roughness level; returns the
    two Fresnel-split weights (the level is a constant, so live==shadow)."""
    b = wo.shape[0]
    r = np.full((b, 1), roughness)
    wi = specular_sampler(sample2, r, wo, normal)
    h = normalize(wi + wo)
    nol = relu((wi * normal).sum(-1, keepdims=True))
    nov = relu((wo * normal).sum(-1, keepdims=True))
    voh = relu((wo * h).sum(-1, keepdims=True))
    noh = relu((normal * h).sum(-1, keepdims=True))
    d = d_ggx(noh, r)
    pdf = d / (4.0 * np.maximum(voh, 1e-4)) * noh
    g = g_smith(nov, nol, r)
    f0, f1 = fresnel_schlick_sep(voh)
    fac = g * voh * nol / np.maximum(noh, 1e-4)
    return wi, pdf, f0 * fac, f1 * fac


# ------------------------------------------- trace_indirect (:409-502)

def trace_indirect(tris, emitter, mat_of, mat_shadow_of, position, wo,
                   normal, lane, uniforms, ray_eps, indir_depth):
    """Literal transcription of utils/path_tracing.py:409-502. `lane`
    maps the compacted rows to original lane ids; `uniforms['indirect']`
    carries per-depth per-lane draws (s1 (D, n), s2 (D, n, 2), s1b,
    s2b)."""
    b = position.shape[0]
    active_next = np.ones(b, bool)
    throughput = np.ones((b, 3))
    l = np.zeros((b, 3))
    ind = uniforms["indirect"]
    mat = None
    mat_shadow = None

    for depth in range(indir_depth):
        if not active_next.any():
            break
        if depth == 0:
            mat = mat_of(position)
            mat_shadow = mat_shadow_of(position)

        # sample emitter (:436-440)
        wi, emit_pdf, emit_triangle_idx = emitter.sample_emitter(
            ind["s1"][depth][lane], ind["s2"][depth][lane], position)

        # visibility (:442-445)
        emit_position, emit_normal, _, triangle_idx, emit_valid = \
            ray_intersect_brute(tris, position + ray_eps * wi, wi)
        emit_vis = (~emit_valid) | (emit_triangle_idx == triangle_idx)
        emit_weight, _, _ = emitter.eval_emitter(emit_position, wi,
                                                 triangle_idx)

        # geometry term (:447-452); NOTE the 1e-12 clamp here vs the
        # 1e-6 in path_tracing_single
        g = np.abs((-wi * emit_normal).sum(-1)) / np.maximum(
            ((emit_position - position) ** 2).sum(-1), 1e-12)
        g = np.where(emit_valid, g, 1.0)[:, None]
        emit_weight = emit_weight * emit_vis[:, None] * g \
            / np.maximum(emit_pdf, 1e-12)

        # emit brdf + MIS (:454-459); NO denominator clamp
        emit_brdf, brdf_pdf = eval_brdf(wi, wo, normal, mat, mat_shadow)
        brdf_pdf = brdf_pdf * g
        with np.errstate(divide="ignore", invalid="ignore"):
            w_mis = np.where(
                (emit_pdf > 0) & (~np.isinf(brdf_pdf)),
                emit_pdf * emit_pdf
                / (emit_pdf * emit_pdf + brdf_pdf * brdf_pdf), 0.0)
        w_mis[np.isinf(emit_pdf) | (brdf_pdf == 0)] = 1.0
        dl = throughput * emit_brdf * emit_weight * w_mis
        dl[np.isnan(dl)] = 0.0
        l[active_next] += dl

        # sample brdf (:462-467)
        wi, brdf_pdf, brdf_weight = sample_brdf(
            ind["s1b"][depth][lane], ind["s2b"][depth][lane], wo, normal,
            mat, mat_shadow)
        throughput = throughput * brdf_weight

        position_next, normal, _, triangle_idx, vis = ray_intersect_brute(
            tris, position + ray_eps * wi, wi)
        mat_next = mat_of(position_next)
        mat_next_shadow = mat_shadow_of(position_next)

        # Le vs the cache at default trace_roughness (:475-489)
        le, emit_pdf, valid_next = emitter.eval_emitter(
            position_next, wi, triangle_idx, mat_next["roughness"])
        g = np.abs((-normal * wi).sum(-1)) / np.maximum(
            ((position - position_next) ** 2).sum(-1), 1e-12)
        g = np.where(valid_next, g, 1.0)
        brdf_pdf = brdf_pdf * g[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            w_mis = np.where(
                (brdf_pdf > 0) & (~np.isinf(emit_pdf)),
                brdf_pdf * brdf_pdf
                / (emit_pdf * emit_pdf + brdf_pdf * brdf_pdf), 0.0)
        w_mis[np.isinf(brdf_pdf) | (emit_pdf == 0)] = 1.0
        dl = throughput * le * w_mis
        dl[np.isnan(dl)] = 0.0
        l[active_next] += dl

        wo = -wi
        position = position_next

        # compaction (:492-501)
        active_next = active_next.copy()
        active_next[active_next.copy()] = valid_next
        position = position[valid_next]
        wo = wo[valid_next]
        normal = normal[valid_next]
        throughput = throughput[valid_next]
        lane = lane[valid_next]
        mat = {k: mat_next[k][valid_next] for k in mat_next}
        mat_shadow = {k: mat_next_shadow[k][valid_next]
                      for k in mat_next_shadow}
    return l


# ------------------------------------------------ path_tracing (:214-318)

def path_tracing(tris, emitter, mat_of, mat_shadow_of, rays_o, rays_d,
                 dx_du, dy_dv, spp, uniforms, ray_eps, indir_depth):
    """Literal transcription of utils/path_tracing.py:214-318: MIS direct
    bounce (cache at default trace_roughness 0.6) + no-grad indirect
    tail scaled by the bounce throughput."""
    b = len(rays_o)
    du, dv = uniforms["dudv"]
    wi = normalize(rays_d[:, None] + dx_du[:, None] * du
                   + dy_dv[:, None] * dv).reshape(-1, 3)
    position = np.repeat(rays_o, spp, axis=0)

    position, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position, wi)
    l, _, valid_next = emitter.eval_emitter(position, wi, triangle_idx)
    if not valid_next.any():
        return l.reshape(b, spp, 3).mean(1)
    lane = np.arange(b * spp)
    position = position[valid_next]
    normal = normal[valid_next]
    wo = -wi[valid_next]
    active_next = valid_next.copy()
    lane = lane[valid_next]

    mat = mat_of(position)
    mat_shadow = mat_shadow_of(position)

    # direct MIS: sample emitter (:253-258)
    wi, emit_pdf, emit_triangle_idx = emitter.sample_emitter(
        uniforms["s1"][lane], uniforms["s2"][lane], position)
    emit_position, emit_normal, _, triangle_idx, emit_valid = \
        ray_intersect_brute(tris, position + ray_eps * wi, wi)
    emit_vis = (~emit_valid) | (emit_triangle_idx == triangle_idx)
    emit_weight, _, _ = emitter.eval_emitter(emit_position, wi,
                                             triangle_idx)
    g = np.abs((-wi * emit_normal).sum(-1)) / np.maximum(
        ((emit_position - position) ** 2).sum(-1), 1e-6)
    g = np.where(emit_valid, g, 1.0)[:, None]
    emit_weight = emit_weight * emit_vis[:, None] * g \
        / np.maximum(emit_pdf, 1e-6)
    emit_brdf, brdf_pdf = eval_brdf(wi, wo, normal, mat, mat_shadow)
    brdf_pdf = brdf_pdf * g
    with np.errstate(divide="ignore", invalid="ignore"):
        w_mis = np.where((emit_pdf > 0) & (~np.isinf(brdf_pdf)),
                         emit_pdf * emit_pdf
                         / (emit_pdf * emit_pdf + brdf_pdf * brdf_pdf),
                         0.0)
    w_mis[np.isinf(emit_pdf) | (brdf_pdf == 0)] = 1.0
    l[active_next] += emit_brdf * emit_weight * w_mis

    # sample brdf (:280-285)
    wi, brdf_pdf, brdf_weight = sample_brdf(
        uniforms["s1b"][lane], uniforms["s2b"][lane], wo, normal,
        mat, mat_shadow)
    position_next, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position + ray_eps * wi, wi)
    mat_next = mat_of(position_next)
    le, emit_pdf, valid_next = emitter.eval_emitter(
        position_next, wi, triangle_idx, mat_next["roughness"])
    g = np.abs((-normal * wi).sum(-1)) / np.maximum(
        ((position - position_next) ** 2).sum(-1), 1e-6)
    g = np.where(valid_next, g, 1.0)
    brdf_pdf = brdf_pdf * g[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        w_mis = np.where((brdf_pdf > 0) & (~np.isinf(emit_pdf)),
                         brdf_pdf * brdf_pdf
                         / (emit_pdf * emit_pdf + brdf_pdf * brdf_pdf),
                         0.0)
    w_mis[np.isinf(brdf_pdf) | (emit_pdf == 0)] = 1.0
    l[active_next] += brdf_weight * le * w_mis

    # indirect tail (:300-317)
    wo = -wi
    position = position_next
    active_next = active_next.copy()
    active_next[active_next.copy()] = valid_next
    position = position[valid_next]
    wo = wo[valid_next]
    normal = normal[valid_next]
    brdf_weight = brdf_weight[valid_next]
    lane = lane[valid_next]
    l_indir = trace_indirect(tris, emitter, mat_of, mat_shadow_of,
                             position, wo, normal, lane, uniforms,
                             ray_eps, indir_depth)
    l[active_next] += brdf_weight * l_indir
    return l.reshape(b, spp, 3).mean(1)


# --------------------------------------- det bakes (:50-124 and :127-212)

def path_tracing_det_diff(tris, emitter, mat_of, mat_shadow_of, positions,
                          wis, normals, uvs, triangle_idxs, spp, uniforms,
                          ray_eps, indir_depth):
    """utils/path_tracing.py:50-124 (diffuse shading bake)."""
    emit_mask = triangle_idxs != -1
    l_out = np.zeros_like(positions)
    if not emit_mask.any():
        return l_out
    position = np.repeat(positions[emit_mask], spp, axis=0)
    normal = np.repeat(normals[emit_mask], spp, axis=0)
    wo = np.repeat(-wis[emit_mask], spp, axis=0)
    # lane ids of the repeat_interleave'd compacted rows, for CRN subsets
    lane_all = np.repeat(np.flatnonzero(emit_mask), spp) * spp \
        + np.tile(np.arange(spp), int(emit_mask.sum()))
    bsz = int(emit_mask.sum())
    l = np.zeros((bsz * spp, 3))
    active_next = np.ones(bsz * spp, bool)

    wi, brdf_pdf, brdf_weight = sample_diffuse(
        uniforms["det_s2"][lane_all], normal)

    position_next, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position + ray_eps * wi, wi)
    mat_next = mat_of(position_next)
    le, emit_pdf, valid_next = emitter.eval_emitter(
        position_next, wi, triangle_idx, mat_next["roughness"])
    l[active_next] += brdf_weight * le

    wo = -wi
    position = position_next
    active_next = active_next.copy()
    active_next[active_next.copy()] = valid_next
    position = position[valid_next]
    wo = wo[valid_next]
    normal = normal[valid_next]
    brdf_weight = brdf_weight[valid_next]
    lane = lane_all[valid_next]
    l_indir = trace_indirect(tris, emitter, mat_of, mat_shadow_of,
                             position, wo, normal, lane, uniforms,
                             ray_eps, indir_depth)
    l[active_next] += brdf_weight * l_indir
    l = l.reshape(bsz, spp, 3).mean(1)
    l_out[emit_mask] = l
    return l_out


def path_tracing_det_spec(tris, emitter, mat_of, mat_shadow_of,
                          roughness_level, positions, wis, normals, uvs,
                          triangle_idxs, spp, uniforms, ray_eps,
                          indir_depth):
    """utils/path_tracing.py:127-212 (Fresnel-split specular bake)."""
    emit_mask = triangle_idxs != -1
    l0_out = np.zeros_like(positions)
    l1_out = np.zeros_like(positions)
    if not emit_mask.any():
        return l0_out, l1_out
    position = np.repeat(positions[emit_mask], spp, axis=0)
    normal = np.repeat(normals[emit_mask], spp, axis=0)
    wo = np.repeat(-wis[emit_mask], spp, axis=0)
    lane_all = np.repeat(np.flatnonzero(emit_mask), spp) * spp \
        + np.tile(np.arange(spp), int(emit_mask.sum()))
    bsz = int(emit_mask.sum())
    l0 = np.zeros((bsz * spp, 3))
    l1 = np.zeros((bsz * spp, 3))
    active_next = np.ones(bsz * spp, bool)

    wi, _, w0, w1 = sample_specular(uniforms["det_s2"][lane_all], wo,
                                    normal, roughness_level)
    position_next, normal, _, triangle_idx, vis = ray_intersect_brute(
        tris, position + ray_eps * wi, wi)
    mat_next = mat_of(position_next)
    le, _, valid_next = emitter.eval_emitter(
        position_next, wi, triangle_idx, mat_next["roughness"])
    l0[active_next] += w0 * le
    l1[active_next] += w1 * le

    wo = -wi
    position = position_next
    active_next = active_next.copy()
    active_next[active_next.copy()] = valid_next
    position = position[valid_next]
    wo = wo[valid_next]
    normal = normal[valid_next]
    w0 = w0[valid_next]
    w1 = w1[valid_next]
    lane = lane_all[valid_next]
    l_indir = trace_indirect(tris, emitter, mat_of, mat_shadow_of,
                             position, wo, normal, lane, uniforms,
                             ray_eps, indir_depth)
    l0[active_next] += w0 * l_indir
    l1[active_next] += w1 * l_indir
    l0 = l0.reshape(bsz, spp, 3).mean(1)
    l1 = l1.reshape(bsz, spp, 3).mean(1)
    l0_out[emit_mask] = l0
    l1_out[emit_mask] = l1
    return l0_out, l1_out


# -------------------------- cached-shading BRDF/CRF loss (train_brdf_crf)

def lerp_specular(specular, roughness):
    """ops.py:99-119: pick/interp the (B, R, 3) cached specular levels at
    roughness (B, 1) remapped from [0.02, 1.0]."""
    r_min, r_max = 0.02, 1.0
    r_num = specular.shape[-2]
    r = (roughness - r_min) / (r_max - r_min) * (r_num - 1)
    r1 = np.ceil(r).astype(np.int64)
    r0 = np.floor(r).astype(np.int64)
    r_ = r - r0
    b = np.arange(specular.shape[0])
    s0 = specular[b, r0[:, 0]]
    s1 = specular[b, r1[:, 0]]
    return s0 * (1.0 - r_) + s1 * r_


def brdf_crf_loss(tris, batch, mat_of, mat_shadow_of, crf_w, f0, basis,
                  ld, lp):
    """Transcription of the stage-6 cached-shading training step
    (train_brdf_crf.py:162-240, part-segmentation branch): re-render from
    diffuse/specular caches via kd/ks + lerp_specular, CRF to LDR, MSE on
    VALID pixels + diffuse prior + (1-roughness).detach()-weighted
    per-part mean propagation."""
    rays, rgbs_gt = batch["rays"], batch["rgbs"]
    xs, ds = rays[:, 0:3], normalize(rays[:, 3:6])
    positions, _, _, tri, valid = ray_intersect_brute(tris, xs, ds)

    normalsless = None  # unused
    rgbs_gt = rgbs_gt[valid]
    positions = positions[valid]
    diffuse = batch["diffuse"][valid]
    specular0 = batch["specular0"][valid]
    specular1 = batch["specular1"][valid]
    segmentation = batch["segmentation"][valid].astype(np.int64)
    exposure = batch["exposure"][valid]

    mat = mat_of(positions)
    mat_shadow = mat_shadow_of(positions)
    albedo, metallic, roughness = (mat["albedo"], mat["metallic"],
                                   mat["roughness"])
    kd = albedo * (1.0 - metallic)
    ks = 0.04 * (1.0 - metallic) + albedo * metallic
    ld_shade = kd * diffuse
    ls_shade = ks * lerp_specular(specular0, roughness) \
        + lerp_specular(specular1, roughness)
    l = ld_shade + ls_shade

    ldr = crf_forward(crf_w, f0, basis, l, exposure)
    loss_c = np.mean((ldr - rgbs_gt) ** 2)

    loss_d = ld * (np.abs(roughness - 1.0).mean() + metallic.mean())

    # part propagation (:216-238); the weight is DETACHED roughness
    seg_idxs, inv_idxs = np.unique(segmentation, return_inverse=True)
    w_ = (1.0 - mat_shadow["roughness"]).squeeze(-1) + 1e-4
    sums_m = np.zeros(len(seg_idxs))
    sums_r = np.zeros(len(seg_idxs))
    sums_w = np.zeros(len(seg_idxs))
    np.add.at(sums_m, inv_idxs, metallic.squeeze(-1) * w_)
    np.add.at(sums_r, inv_idxs, roughness.squeeze(-1) * w_)
    np.add.at(sums_w, inv_idxs, w_)
    mean_m = (sums_m / sums_w)[inv_idxs][:, None]
    mean_r = (sums_r / sums_w)[inv_idxs][:, None]
    loss_seg = lp * (np.abs(metallic - mean_m).mean()
                     + np.abs(roughness - mean_r).mean())
    return loss_c + loss_d + loss_seg
