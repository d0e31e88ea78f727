"""Differential test vs the reference-semantics oracle (verdict item 5).

Drives iris_tpu's `path_tracing_single` + `crf_forward` AND the torch-free
numpy transcription of the reference estimator (tests/ref_oracle.py,
transcribed from utils/path_tracing.py:320-407, model/brdf.py, ops.py,
model/emitter.py, crf/model_crf.py) with COMMON RANDOM NUMBERS on a small
closed scene, and asserts:

  1. renders allclose (pins MIS weights, pdf clamps, geometry terms,
     double-sided normals, radiance-cache fallback, CRF interpolation);
  2. gradients wrt material / emitter radiance / CRF weights allclose
     against central finite differences of the oracle — with the
     reference's `.data` detach points held FIXED during perturbation,
     so the FD reproduces torch autograd semantics exactly.

The oracle intersects by brute force (no BVH), so agreement also validates
the Pallas/XLA traversal stack end to end.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import ref_oracle as O  # noqa: N812


# --------------------------------------------------------------- test scene

def _quad(p0, p1, p2, p3):
    """Two CCW triangles for the quad p0-p1-p2-p3."""
    return [[p0, p1, p2], [p0, p2, p3]]


def make_scene():
    """A small closed box section: floor, back wall, a tilted blocker and
    a 2-triangle area light near the ceiling. Geometry avoids grazing
    incidence so f32 (BVH) and f64 (brute-force) tracing agree lane-for-
    lane."""
    tris = []
    # floor z=0, x/y in [0, 2]
    tris += _quad([0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0])
    # back wall y=2
    tris += _quad([0, 2, 0], [2, 2, 0], [2, 2, 2], [0, 2, 2])
    # left wall x=0
    tris += _quad([0, 0, 0], [0, 2, 0], [0, 2, 2], [0, 0, 2])
    # tilted blocker above the floor
    tris += [[[0.4, 0.6, 0.9], [1.1, 0.7, 1.0], [0.7, 1.3, 1.15]]]
    # area light near the ceiling (last two faces)
    tris += _quad([0.7, 0.7, 1.9], [1.3, 0.7, 1.9],
                  [1.3, 1.3, 1.9], [0.7, 1.3, 1.9])
    tris = np.asarray(tris, np.float64)
    is_emitter = np.zeros(len(tris), bool)
    is_emitter[-2:] = True
    return tris, is_emitter


def make_rays(b=64):
    """Rays from a point inside the box fanning down/forward."""
    rng = np.random.default_rng(7)
    o = np.tile(np.asarray([1.0, 0.45, 1.45]), (b, 1))
    # directions spread over floor/walls/blocker/light
    tx = rng.uniform(0.15, 1.85, b)
    ty = rng.uniform(0.3, 1.9, b)
    tz = rng.uniform(0.0, 1.9, b)
    d = np.stack([tx, ty, tz], -1) - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    dx_du = np.tile(np.asarray([2e-3, 0.0, 0.0]), (b, 1))
    dy_dv = np.tile(np.asarray([0.0, 2e-3, 0.0]), (b, 1))
    return o, d, dx_du, dy_dv


SPP = 4
H_SLF = 8
VMIN, VMAX = -0.1, 2.1


def _slf_field(h):
    """Smooth positive radiance field on the voxel grid, filled into the
    compact slot ordering shared by both implementations (slot s <->
    voxel (x, y, z) = (s % H, s//H % H, s//H^2) for an all-True mask)."""
    s = np.arange(h * h * h)
    x, y, z = s % h, (s // h) % h, s // (h * h)
    centers = (np.stack([x, y, z], -1) + 0.5) / h
    base = 0.05 + 0.2 * np.stack([
        centers[:, 0], centers[:, 1], centers[:, 2]], -1)
    return base


def base_params():
    return {
        "albedo": np.asarray([0.55, 0.4, 0.3]),
        "roughness": np.asarray([0.45]),
        "metallic": np.asarray([0.3]),
        "radiance": np.full((2, 3), 9.0),
        "crf_w": np.asarray([[0.12, -0.05, 0.02],
                             [0.02, 0.06, -0.03],
                             [-0.04, 0.02, 0.05]]),
    }


def make_uniforms(b):
    rng = np.random.default_rng(42)
    n = b * SPP
    return {
        "dudv": rng.uniform(-0.5, 0.5, (2, b, SPP, 1)),
        "s1": rng.uniform(0.0, 1.0, n),
        "s2": rng.uniform(0.0, 1.0, (n, 2)),
        "s1b": rng.uniform(0.0, 1.0, n),
        "s2b": rng.uniform(0.0, 1.0, (n, 2)),
    }


# ------------------------------------------------------------- oracle side

def oracle_render(tris, is_emitter, p, p_shadow, uniforms, o, d, dxdu, dydv):
    slf = O.OracleSLF(np.ones((H_SLF,) * 3, bool), VMIN, VMAX,
                      _slf_field(H_SLF))
    em = O.OracleEmitter(is_emitter, tris, p["radiance"], slf)

    def mat_of(pos):
        n = pos.shape[0]
        return {"albedo": np.tile(p["albedo"], (n, 1)),
                "roughness": np.tile(p["roughness"], (n, 1)),
                "metallic": np.tile(p["metallic"], (n, 1))}

    def mat_shadow_of(pos):
        n = pos.shape[0]
        return {"albedo": np.tile(p_shadow["albedo"], (n, 1)),
                "roughness": np.tile(p_shadow["roughness"], (n, 1)),
                "metallic": np.tile(p_shadow["metallic"], (n, 1))}

    from iris_tpu.const import RAY_EPS
    return O.path_tracing_single(tris, em, mat_of, mat_shadow_of,
                                 o, d, dxdu, dydv, SPP, uniforms, RAY_EPS)


def oracle_loss(tris, is_emitter, p, p_shadow, uniforms, o, d, dxdu, dydv,
                f0, basis, target):
    l = oracle_render(tris, is_emitter, p, p_shadow, uniforms,
                      o, d, dxdu, dydv)
    ldr = O.crf_forward(p["crf_w"], f0, basis, l, 1.0)
    return np.mean((ldr - target) ** 2)


# --------------------------------------------------------------- mine side

def build_mine(tris, is_emitter, radiance):
    from iris_tpu.geometry.bvh import build_bvh
    from iris_tpu.models.crf import init_emor_crf
    from iris_tpu.models.emitter import make_emitter
    from iris_tpu.models.slf import init_voxel_slf

    tracer = build_bvh(np.asarray(tris, np.float32))
    slf = init_voxel_slf(np.ones((H_SLF,) * 3, bool), VMIN, VMAX)
    slf = replace(slf, radiance=jnp.asarray(_slf_field(H_SLF), jnp.float32))
    em = make_emitter(is_emitter, np.asarray(tris, np.float32),
                      radiance=np.asarray(radiance, np.float32), slf=slf)
    crf = init_emor_crf(dim=3)
    return tracer, em, crf


def mine_loss_fn(tracer, em, crf, uniforms, o, d, dxdu, dydv, target):
    from iris_tpu.models.crf import crf_forward
    from iris_tpu.render.integrator import path_tracing_single

    samples = {k: jnp.asarray(v, jnp.float32) for k, v in uniforms.items()}
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    dxdu, dydv = jnp.asarray(dxdu, jnp.float32), jnp.asarray(dydv,
                                                             jnp.float32)
    target = jnp.asarray(target, jnp.float32)

    def render(p):
        em2 = replace(em, radiance=p["radiance"])

        def mat_fn(pos):
            n = pos.shape[0]
            return {
                "albedo": jnp.tile(p["albedo"][None], (n, 1)),
                "roughness": jnp.tile(p["roughness"][None], (n, 1)),
                "metallic": jnp.tile(p["metallic"][None], (n, 1)),
            }

        return path_tracing_single(
            jax.random.PRNGKey(0), tracer, em2, mat_fn, o, d, dxdu, dydv,
            SPP, samples=samples)

    def loss(p):
        crf2 = replace(crf, weight=p["crf_w"])
        from iris_tpu.models.crf import crf_forward as cf
        ldr = cf(crf2, render(p), 1.0)
        return jnp.mean((ldr - target) ** 2)

    return render, loss


def jparams(p):
    return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}


# -------------------------------------------------------------------- tests

@pytest.fixture(scope="module")
def setup():
    tris, is_emitter = make_scene()
    o, d, dxdu, dydv = make_rays()
    uniforms = make_uniforms(len(o))
    p = base_params()
    tracer, em, crf = build_mine(tris, is_emitter, p["radiance"])
    f0 = np.asarray(crf.f0, np.float64)
    basis = np.asarray(crf.basis, np.float64)
    target = np.full((len(o), 3), 0.35)
    return dict(tris=tris, is_emitter=is_emitter, o=o, d=d, dxdu=dxdu,
                dydv=dydv, uniforms=uniforms, p=p, tracer=tracer, em=em,
                crf=crf, f0=f0, basis=basis, target=target)


def test_render_allclose(setup):
    s = setup
    l_oracle = oracle_render(s["tris"], s["is_emitter"], s["p"], s["p"],
                             s["uniforms"], s["o"], s["d"], s["dxdu"],
                             s["dydv"])
    render, _ = mine_loss_fn(s["tracer"], s["em"], s["crf"], s["uniforms"],
                             s["o"], s["d"], s["dxdu"], s["dydv"],
                             s["target"])
    l_mine = np.asarray(render(jparams(s["p"])), np.float64)
    assert np.isfinite(l_oracle).all() and np.isfinite(l_mine).all()
    # f32 vs f64 on matched estimators: agreement far below any semantic
    # difference (a wrong MIS branch or clamp shifts whole-lane values)
    np.testing.assert_allclose(l_mine, l_oracle, rtol=2e-3, atol=2e-3)
    # the scene exercises the branches being pinned
    assert (l_oracle.sum(-1) > 0).mean() > 0.5   # lit pixels
    assert (l_oracle == 0).all(-1).any()          # background/missed


def test_ldr_allclose(setup):
    s = setup
    l_oracle = oracle_render(s["tris"], s["is_emitter"], s["p"], s["p"],
                             s["uniforms"], s["o"], s["d"], s["dxdu"],
                             s["dydv"])
    ldr_oracle = O.crf_forward(s["p"]["crf_w"], s["f0"], s["basis"],
                               l_oracle, 1.0)
    from iris_tpu.models.crf import crf_forward
    crf2 = replace(s["crf"], weight=jnp.asarray(s["p"]["crf_w"],
                                                jnp.float32))
    ldr_mine = np.asarray(
        crf_forward(crf2, jnp.asarray(l_oracle, jnp.float32), 1.0))
    np.testing.assert_allclose(ldr_mine, ldr_oracle, rtol=1e-4, atol=1e-4)


def test_grads_allclose(setup):
    s = setup
    _, loss = mine_loss_fn(s["tracer"], s["em"], s["crf"], s["uniforms"],
                           s["o"], s["d"], s["dxdu"], s["dydv"],
                           s["target"])
    g = jax.grad(loss)(jparams(s["p"]))
    g = {k: np.asarray(v, np.float64) for k, v in g.items()}

    p0 = s["p"]

    def f(p):
        return oracle_loss(s["tris"], s["is_emitter"], p, p0,
                           s["uniforms"], s["o"], s["d"], s["dxdu"],
                           s["dydv"], s["f0"], s["basis"], s["target"])

    h = 1e-5
    for name in ("albedo", "roughness", "metallic", "radiance", "crf_w"):
        base = p0[name]
        fd = np.zeros_like(base, np.float64)
        it = np.ndindex(base.shape)
        for idx in it:
            pp = {k: v.copy() for k, v in p0.items()}
            pp[name][idx] = base[idx] + h
            up = f(pp)
            pp[name][idx] = base[idx] - h
            dn = f(pp)
            fd[idx] = (up - dn) / (2 * h)
        scale = max(np.abs(fd).max(), 1e-6)
        np.testing.assert_allclose(
            g[name], fd, rtol=0, atol=5e-3 * scale,
            err_msg=f"gradient mismatch vs reference semantics: {name}")
        # the test is vacuous if a gradient never flows
        assert np.abs(fd).max() > 0, f"zero oracle gradient for {name}"


def test_crf_inverse_allclose(setup):
    """Inverse CRF path: mono-projection + non-uniform inverse tabulation
    + query interp (reference get_inv_crf/inverse, model_crf.py:45-108).
    Uses a deliberately NON-monotone weighted curve so the projection
    branch is exercised."""
    s = setup
    w = np.asarray([[0.5, -1.2, 0.9],
                    [0.2, 0.8, -1.1],
                    [-0.6, 0.4, 0.7]])   # strong: makes diffs negative
    rng = np.random.default_rng(3)
    ldr = rng.uniform(0.0, 1.0, (257, 3))
    ldr[0] = 0.0
    ldr[1] = 1.0                 # edge queries
    hdr_oracle = O.crf_inverse(w, s["f0"], s["basis"], ldr, 1.0)

    from iris_tpu.models.crf import crf_inverse, get_crf
    crf2 = replace(s["crf"], weight=jnp.asarray(w, jnp.float32))
    # precondition for the test to bite: the raw curve must be non-monotone
    curves = np.asarray(get_crf(crf2))
    assert (np.diff(curves, axis=1) < 0).any()
    hdr_mine = np.asarray(crf_inverse(crf2, jnp.asarray(ldr, jnp.float32),
                                      1.0), np.float64)
    np.testing.assert_allclose(hdr_mine, hdr_oracle, rtol=2e-3, atol=2e-3)


# --------------------- multi-bounce + det-bake forward differentials


def _varmat_np(pos):
    """Position-varying material (numpy): roughness crosses the 0.6
    radiance-cache gate so BOTH cache-terminate and continue branches of
    trace_indirect are exercised."""
    n = pos.shape[0]
    r = 0.4 + 0.2 * np.clip(pos[:, 0:1] / 2.0, 0.0, 1.0) * 2.0  # 0.4..0.8
    return {"albedo": np.tile(np.asarray([0.55, 0.4, 0.3]), (n, 1)),
            "roughness": r,
            "metallic": np.full((n, 1), 0.3)}


def _varmat_jnp(pos):
    n = pos.shape[0]
    r = 0.4 + 0.2 * jnp.clip(pos[:, 0:1] / 2.0, 0.0, 1.0) * 2.0
    return {"albedo": jnp.tile(jnp.asarray([0.55, 0.4, 0.3]), (n, 1)),
            "roughness": r,
            "metallic": jnp.full((n, 1), 0.3)}


INDIR_DEPTH = 2


def make_uniforms_multi(b):
    rng = np.random.default_rng(11)
    n = b * SPP
    return {
        "dudv": rng.uniform(-0.5, 0.5, (2, b, SPP, 1)),
        "s1": rng.uniform(0.0, 1.0, n),
        "s2": rng.uniform(0.0, 1.0, (n, 2)),
        "s1b": rng.uniform(0.0, 1.0, n),
        "s2b": rng.uniform(0.0, 1.0, (n, 2)),
        "det_s2": rng.uniform(0.0, 1.0, (n, 2)),
        "indirect": {
            "s1": rng.uniform(0.0, 1.0, (INDIR_DEPTH, n)),
            "s2": rng.uniform(0.0, 1.0, (INDIR_DEPTH, n, 2)),
            "s1b": rng.uniform(0.0, 1.0, (INDIR_DEPTH, n)),
            "s2b": rng.uniform(0.0, 1.0, (INDIR_DEPTH, n, 2)),
        },
    }


def _to_jnp(u):
    if isinstance(u, dict):
        return {k: _to_jnp(v) for k, v in u.items()}
    return jnp.asarray(u, jnp.float32)


def test_path_tracing_multibounce_allclose(setup):
    """Full estimator (MIS direct + depth-2 no-grad indirect tail,
    reference utils/path_tracing.py:214-318 + :409-502), including the
    0.6-roughness radiance-cache termination on a position-varying
    material."""
    s = setup
    u = make_uniforms_multi(len(s["o"]))
    from iris_tpu.const import RAY_EPS
    slf = O.OracleSLF(np.ones((H_SLF,) * 3, bool), VMIN, VMAX,
                      _slf_field(H_SLF))
    em_o = O.OracleEmitter(s["is_emitter"], s["tris"], s["p"]["radiance"],
                           slf)
    l_oracle = O.path_tracing(s["tris"], em_o, _varmat_np, _varmat_np,
                              s["o"], s["d"], s["dxdu"], s["dydv"], SPP,
                              u, RAY_EPS, INDIR_DEPTH)

    from iris_tpu.render.integrator import path_tracing
    l_mine = np.asarray(path_tracing(
        jax.random.PRNGKey(0), s["tracer"], s["em"], _varmat_jnp,
        jnp.asarray(s["o"], jnp.float32), jnp.asarray(s["d"], jnp.float32),
        jnp.asarray(s["dxdu"], jnp.float32),
        jnp.asarray(s["dydv"], jnp.float32), SPP, INDIR_DEPTH,
        samples=_to_jnp(u)), np.float64)
    assert np.isfinite(l_mine).all()
    np.testing.assert_allclose(l_mine, l_oracle, rtol=5e-3, atol=5e-3)
    # the varying-roughness material must actually split the cache gate
    hits = O.ray_intersect_brute(
        s["tris"], np.repeat(s["o"], SPP, 0),
        np.repeat(s["d"], SPP, 0))[0]
    r = _varmat_np(hits)["roughness"]
    assert (r > 0.6).any() and (r < 0.6).any()


def test_det_bakes_allclose(setup):
    """Deterministic-first-hit shading bakes (reference :50-124 diffuse,
    :127-212 Fresnel-split specular) vs the transcription — the
    estimators that write every shading cache."""
    s = setup
    u = make_uniforms_multi(len(s["o"]))
    from iris_tpu.const import RAY_EPS

    # deterministic first hits from pixel centers (shared input)
    pos, nrm, uv, tri, valid = O.ray_intersect_brute(s["tris"], s["o"],
                                                     s["d"])
    assert (~valid).any() and valid.any()
    slf = O.OracleSLF(np.ones((H_SLF,) * 3, bool), VMIN, VMAX,
                      _slf_field(H_SLF))
    em_o = O.OracleEmitter(s["is_emitter"], s["tris"], s["p"]["radiance"],
                           slf)

    ld_oracle = O.path_tracing_det_diff(
        s["tris"], em_o, _varmat_np, _varmat_np, pos, s["d"], nrm, uv,
        tri, SPP, u, RAY_EPS, INDIR_DEPTH)
    l0_oracle, l1_oracle = O.path_tracing_det_spec(
        s["tris"], em_o, _varmat_np, _varmat_np, 0.32, pos, s["d"], nrm,
        uv, tri, SPP, u, RAY_EPS, INDIR_DEPTH)

    from iris_tpu.render.integrator import (
        path_tracing_det_diff, path_tracing_det_spec,
    )
    args32 = [jnp.asarray(x, jnp.float32) for x in (pos, s["d"], nrm, uv)]
    tri32 = jnp.asarray(tri, jnp.int32)
    ld_mine = np.asarray(path_tracing_det_diff(
        jax.random.PRNGKey(0), s["tracer"], s["em"], _varmat_jnp,
        *args32, tri32, SPP, INDIR_DEPTH, samples=_to_jnp(u)), np.float64)
    l0_mine, l1_mine = path_tracing_det_spec(
        jax.random.PRNGKey(0), s["tracer"], s["em"], _varmat_jnp, 0.32,
        *args32, tri32, SPP, INDIR_DEPTH, samples=_to_jnp(u))
    np.testing.assert_allclose(ld_mine, ld_oracle, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(l0_mine, np.float64), l0_oracle,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(l1_mine, np.float64), l1_oracle,
                               rtol=5e-3, atol=5e-3)
    assert ld_oracle.max() > 0 and l0_oracle.max() > 0


def test_near_mirror_material_edges(setup):
    """Near-singular regime: roughness at the 0.02 floor + metallic 0.9
    drives D_GGX/pdf_spec toward the inf/0 MIS guard branches
    (reference :374-381,:401-403) — the edge cases the round-3 verdict
    called out. Looser tolerance (f32 vs f64 near-singular), but both
    sides must stay finite and agree to ~1%."""
    s = setup
    p = dict(s["p"])
    p["roughness"] = np.asarray([0.02])
    p["metallic"] = np.asarray([0.9])
    l_oracle = oracle_render(s["tris"], s["is_emitter"], p, p,
                             s["uniforms"], s["o"], s["d"], s["dxdu"],
                             s["dydv"])
    render, _ = mine_loss_fn(s["tracer"], s["em"], s["crf"], s["uniforms"],
                             s["o"], s["d"], s["dxdu"], s["dydv"],
                             s["target"])
    l_mine = np.asarray(render(jparams(p)), np.float64)
    assert np.isfinite(l_oracle).all() and np.isfinite(l_mine).all()
    np.testing.assert_allclose(l_mine, l_oracle, rtol=1e-2, atol=1e-2)
    # the singular pdf actually occurred: some specular pdf values huge
    hits = O.ray_intersect_brute(
        s["tris"], np.repeat(s["o"], SPP, 0), np.repeat(s["d"], SPP, 0))
    pos, nrm, _, tri, valid = hits
    mat = {k: np.tile(v, (valid.sum(), 1)) for k, v in
           (("albedo", p["albedo"]), ("roughness", p["roughness"]),
            ("metallic", p["metallic"]))}
    wi, pdf, w = O.sample_brdf(s["uniforms"]["s1b"][valid],
                               s["uniforms"]["s2b"][valid],
                               -np.repeat(s["d"], SPP, 0)[valid],
                               nrm[valid], mat, mat)
    assert pdf.max() > 1e3   # near-mirror: the D spike is in play


def test_brdf_crf_cached_loss_allclose(setup):
    """Stage-6 cached-shading training loss (reference train_brdf_crf.py:
    162-240, part branch): kd/ks re-render via lerp_specular, CRF with
    exposure, valid-masked MSE, diffuse prior, detached-(1-roughness)-
    weighted per-part propagation — value AND gradients vs the
    transcription (FD with the detach held fixed)."""
    from iris_tpu.train.steps import LossConfig, make_brdf_crf_loss

    s = setup
    b = len(s["o"])
    rng = np.random.default_rng(5)
    rays = np.concatenate([s["o"], s["d"], s["dxdu"], s["dydv"]],
                          -1).astype(np.float64)
    batch_np = {
        "rays": rays,
        "rgbs": rng.uniform(0.0, 1.0, (b, 3)),
        "diffuse": rng.uniform(0.0, 2.0, (b, 3)),
        "specular0": rng.uniform(0.0, 1.5, (b, 6, 3)),
        "specular1": rng.uniform(0.0, 0.5, (b, 6, 3)),
        "segmentation": (np.arange(b) // 16).astype(np.float64),
        "exposure": np.full((b, 1), 1.2),
        "int_albedo": rng.uniform(0, 1, (b, 3)),
    }
    p0 = {k: v for k, v in base_params().items() if k != "radiance"}
    ld, lp = 5e-4, 5e-3

    # ---- oracle: value + FD grads (shadow = detached copies fixed)
    def mat_of_from(p):
        def mat_of(pos):
            n = pos.shape[0]
            return {"albedo": np.tile(p["albedo"], (n, 1)),
                    "roughness": np.tile(p["roughness"], (n, 1)),
                    "metallic": np.tile(p["metallic"], (n, 1))}
        return mat_of

    def f(p):
        return O.brdf_crf_loss(s["tris"], batch_np, mat_of_from(p),
                               mat_of_from(p0), p["crf_w"], s["f0"],
                               s["basis"], ld, lp)

    # ---- mine: injected analytic material, same params
    cfg = LossConfig(ld=ld, lp=lp, max_segments=16, has_part=True,
                     l_crf_increasing=0.0, l_crf_weight=0.0)

    def mat_fn(params, pos, key):
        n = pos.shape[0]
        return {"albedo": jnp.tile(params["albedo"][None], (n, 1)),
                "roughness": jnp.tile(params["roughness"][None], (n, 1)),
                "metallic": jnp.tile(params["metallic"][None], (n, 1))}

    loss_mine = make_brdf_crf_loss(s["tracer"], s["crf"], cfg, VMIN, VMAX,
                                   mat_fn=mat_fn)
    batch_j = {k: jnp.asarray(v, jnp.float32) for k, v in batch_np.items()}

    def loss_of(p):
        params = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
        params["crf_weight"] = params.pop("crf_w")
        l, _aux = loss_mine(params, batch_j, jax.random.PRNGKey(0))
        return l

    v_mine = float(loss_of(p0))
    v_oracle = f(p0)
    np.testing.assert_allclose(v_mine, v_oracle, rtol=2e-4, atol=2e-5)

    g = jax.grad(lambda p: loss_of(p))(
        {k: jnp.asarray(v, jnp.float32) for k, v in p0.items()})
    h = 1e-5
    for name in ("albedo", "roughness", "metallic", "crf_w"):
        base = p0[name]
        fd = np.zeros_like(base, np.float64)
        for idx in np.ndindex(base.shape):
            pp = {k: v.copy() for k, v in p0.items()}
            pp[name][idx] = base[idx] + h
            up = f(pp)
            pp[name][idx] = base[idx] - h
            dn = f(pp)
            fd[idx] = (up - dn) / (2 * h)
        scale = max(np.abs(fd).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(g[name], np.float64), fd, rtol=0,
            atol=5e-3 * scale,
            err_msg=f"cached-loss gradient mismatch: {name}")
        assert np.abs(fd).max() > 0, f"zero oracle gradient for {name}"


def test_initialize_material_grad_is_anchor_only(setup):
    """The initialize stage renders with the material FROZEN (reference
    initialize.py:170-186 requires_grad toggling): the material gradient
    of the full loss must equal the gradient of the albedo-anchor term
    alone — zero render leakage — while the radiance gradient must be
    nonzero (it flows ONLY through the render)."""
    from iris_tpu.demo import make_demo_batch, make_demo_scene
    from iris_tpu.train.steps import LossConfig, make_initialize_loss

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=4, slf_res=8, hash_levels=2, hash_features=4,
        log2_table=8)
    cfg = LossConfig(spp=2, max_segments=8)
    loss_fn = make_initialize_loss(tracer, em, crf, cfg)
    batch = make_demo_batch(n_side=16)
    params = {"material": ngp, "radiance": em.radiance}

    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0))[0])(
        params)
    g_anchor = jax.grad(lambda p: loss_fn(
        p, batch, jax.random.PRNGKey(0))[1]["loss_a"])(params)
    for leaf, leaf_a in zip(
            jax.tree_util.tree_leaves(g["material"]),
            jax.tree_util.tree_leaves(g_anchor["material"])):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(leaf_a),
                                   rtol=0, atol=1e-7)
    assert float(jnp.abs(g["radiance"]).max()) > 0
    assert float(jnp.abs(g_anchor["radiance"]).max()) == 0
