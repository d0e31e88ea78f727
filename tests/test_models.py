import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.models import brdf as B
from iris_tpu.models import crf as C
from iris_tpu.models import emitter as E
from iris_tpu.models import slf as S
from iris_tpu.models.emor import parse_emor_file
from iris_tpu.models.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from iris_tpu.geometry.procedural import make_box_scene


# ------------------------------------------------------------- hash grid

def test_hashgrid_shapes_and_grad():
    cfg = HashGridConfig(n_levels=4, log2_table_size=8, base_resolution=4)
    key = jax.random.PRNGKey(0)
    table = init_hashgrid(key, cfg)
    x = jax.random.uniform(key, (16, 3))
    out = hashgrid_encode(table, cfg, x)
    assert out.shape == (16, 8)

    g = jax.grad(lambda t: hashgrid_encode(t, cfg, x).sum())(table)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_hashgrid_is_continuous():
    cfg = HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4)
    table = init_hashgrid(jax.random.PRNGKey(1), cfg)
    x0 = jnp.asarray([[0.3, 0.4, 0.5]])
    f0 = hashgrid_encode(table, cfg, x0)
    f1 = hashgrid_encode(table, cfg, x0 + 1e-5)
    assert np.allclose(f0, f1, atol=1e-4)


def test_ngp_brdf_output_ranges():
    p = B.init_ngp_brdf(jax.random.PRNGKey(0), 0.0, 2.0,
                        HashGridConfig(n_levels=4, log2_table_size=8))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3)) * 2
    mat = B.ngp_brdf_apply(p, pos)
    assert mat["albedo"].shape == (32, 3)
    assert np.all(np.asarray(mat["roughness"]) >= 0.02 - 1e-6)
    assert np.all(np.asarray(mat["roughness"]) <= 1.0 + 1e-6)
    assert np.all((np.asarray(mat["metallic"]) >= 0)
                  & (np.asarray(mat["metallic"]) <= 1))


# --------------------------------------------------------------- samplers

def _up_normals(n):
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))


def test_cosine_sampler_statistics():
    n = 200_000
    key = jax.random.PRNGKey(0)
    s2 = jax.random.uniform(key, (n, 2))
    wi = B.diffuse_sampler(s2, _up_normals(n))
    nol = np.asarray(wi[:, 2])
    assert np.all(nol > -1e-6)
    # E[cos theta] = 2/3 under pdf = cos/pi
    assert abs(nol.mean() - 2.0 / 3.0) < 5e-3


def test_specular_sampler_matches_pdf():
    """The sampler's empirical distribution must match the analytic pdf it
    reports (the contract MIS relies on): compare a cos-theta histogram of
    sampled wi against the pdf integrated per bin by uniform-sphere MC."""
    n = 400_000
    key = jax.random.PRNGKey(1)
    normal = _up_normals(n)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    nbins = 8
    for rough in [0.4, 0.8]:
        r = jnp.full((n, 1), rough)
        # observed: histogram over wi_z of sampled directions
        s2 = jax.random.uniform(jax.random.fold_in(key, int(rough * 10)),
                                (n, 2))
        wi_s, pdf_s, _, _ = B.sample_specular(s2, wo, normal, r)
        obs, edges = np.histogram(np.asarray(wi_s[:, 2]), bins=nbins,
                                  range=(-1, 1))
        obs = obs / n
        # expected: uniform-sphere MC of the reported pdf per bin
        k1, k2 = jax.random.split(jax.random.fold_in(key, 99))
        z = jax.random.uniform(k1, (n,)) * 2 - 1
        phi = jax.random.uniform(k2, (n,)) * 2 * np.pi
        s = jnp.sqrt(1 - z * z)
        wi_u = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)
        _, _, pdf_u = B.eval_specular(wi_u, wo, normal, r)
        pdf_u = np.asarray(pdf_u[:, 0])
        zbin = np.clip(((np.asarray(z) + 1) / 2 * nbins).astype(int), 0,
                       nbins - 1)
        exp = np.zeros(nbins)
        np.add.at(exp, zbin, pdf_u)
        exp = exp / n * 4 * np.pi
        # compare where mass is non-negligible
        mask = exp > 1e-3
        assert np.allclose(obs[mask], exp[mask], rtol=0.08, atol=5e-3), (
            rough, obs, exp)


def test_sample_brdf_weight_is_brdf_over_pdf():
    n = 4096
    key = jax.random.PRNGKey(2)
    normal = _up_normals(n)
    wo = B.diffuse_sampler(jax.random.uniform(key, (n, 2)), normal)
    mat = {
        "albedo": jnp.full((n, 3), 0.5),
        "roughness": jnp.full((n, 1), 0.5),
        "metallic": jnp.full((n, 1), 0.2),
    }
    k1, k2 = jax.random.split(key)
    s1 = jax.random.uniform(k1, (n,))
    s2 = jax.random.uniform(k2, (n, 2))
    wi, pdf, w = B.sample_brdf(s1, s2, wo, normal, mat)
    brdf, pdf2 = B.eval_brdf(wi, wo, normal, mat)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-6)
    mask = np.asarray(pdf[:, 0]) > 1e-6
    assert np.allclose(np.asarray(w)[mask],
                       np.asarray(brdf / jnp.maximum(pdf, 1e-12))[mask],
                       rtol=1e-3)
    assert np.all(np.isfinite(np.asarray(w)))


def test_furnace_diffuse():
    """White Lambertian under uniform unit radiance: reflected = 1
    (energy conservation of eval_brdf diffuse part + sampler)."""
    n = 300_000
    key = jax.random.PRNGKey(3)
    normal = _up_normals(n)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    mat = {
        "albedo": jnp.ones((n, 3)),
        "roughness": jnp.ones((n, 1)),
        "metallic": jnp.zeros((n, 1)),
    }
    k1, k2 = jax.random.split(key)
    wi, pdf, w = B.sample_brdf(jax.random.uniform(k1, (n,)),
                               jax.random.uniform(k2, (n, 2)), wo, normal, mat)
    # E[brdf/pdf] = integral of brdf = albedo (diffuse) + specular 0.04 lobe
    refl = float(jnp.mean(w[:, 0]))
    assert 0.95 < refl < 1.15, refl


# ------------------------------------------------------------------ SLF

def test_slf_scatter_query_roundtrip():
    mask = np.zeros((8, 8, 8), bool)
    mask[2, 3, 4] = True   # [z,y,x]
    mask[5, 5, 5] = True
    slf = S.init_voxel_slf(mask, 0.0, 8.0)
    # point inside voxel x=4,y=3,z=2 -> position (4.5, 3.5, 2.5)
    x = jnp.asarray([[4.5, 3.5, 2.5], [5.5, 5.5, 5.5], [0.5, 0.5, 0.5]])
    rad = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [9.0, 9.0, 9.0]])
    slf = S.slf_scatter_add(slf, x, rad)
    slf = S.slf_finalize_mean(slf)
    out = np.asarray(S.slf_query(slf, x))
    assert np.allclose(out[0], [1, 2, 3])
    assert np.allclose(out[1], [4, 5, 6])
    assert np.allclose(out[2], 0.0)  # empty voxel -> 0


# --------------------------------------------------------------- emitter

def test_emitter_eval_and_sample():
    mesh, is_em = make_box_scene()
    em = E.make_emitter(is_em, mesh.triangles(),
                        radiance=np.full((2, 3), 5.0, np.float32))
    pos = jnp.zeros((4, 3))
    d = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    tri = jnp.asarray([len(is_em) - 1, len(is_em) - 2, 0, -1])
    le, pdf, valid_next = E.eval_emitter(em, pos, d, tri)
    assert np.allclose(le[0], 5.0) and np.allclose(le[1], 5.0)
    assert np.allclose(le[2], 0.0) and np.allclose(le[3], 0.0)
    assert np.asarray(pdf)[0, 0] > 0 and np.asarray(pdf)[2, 0] == 0
    assert list(np.asarray(valid_next)) == [False, False, True, False]

    key = jax.random.PRNGKey(0)
    n = 2048
    p = jnp.broadcast_to(jnp.asarray([1.0, 1.0, 0.2]), (n, 3))
    s1 = jax.random.uniform(key, (n,))
    s2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    wi, pdf, tri = E.sample_emitter(em, s1, s2, p)
    # all sampled directions point up toward the ceiling light
    assert np.all(np.asarray(wi[:, 2]) > 0)
    assert set(np.asarray(tri).tolist()) <= {len(is_em) - 2, len(is_em) - 1}
    # area pdf = (1/2) / area_tri
    areas = np.asarray(em.emitter_area)
    expect = 0.5 / areas
    got = np.asarray(pdf[:, 0])
    assert np.all(np.isin(np.round(got, 3),
                          np.round(expect, 3)))


def test_radiance_rows_grad_matches_plain_gather():
    """_radiance_rows' one-hot-matmul backward (and its large-K scatter
    fallback) must equal the autodiff adjoint of plain row indexing."""
    key = jax.random.PRNGKey(7)
    for k, b in ((5, 301), (300, 128)):     # matmul branch / scatter branch
        rad = jax.random.normal(key, (k, 3))
        idx = jax.random.randint(jax.random.PRNGKey(k), (b,), 0, k)
        w = jax.random.normal(jax.random.PRNGKey(b), (b, 3))

        g_fast = jax.grad(lambda r: jnp.sum(E._radiance_rows(r, idx) * w))(rad)
        g_ref = jax.grad(lambda r: jnp.sum(r[idx] * w))(rad)
        assert np.allclose(np.asarray(g_fast), np.asarray(g_ref),
                           atol=1e-5), (k, b)


def test_emitter_slf_cache_termination():
    mesh, is_em = make_box_scene()
    mask = np.ones((4, 4, 4), bool)
    slf = S.init_voxel_slf(mask, 0.0, 2.0)
    slf = S.slf_finalize_mean(
        S.slf_scatter_add(slf, jnp.asarray([[0.5, 0.5, 0.5]]),
                          jnp.asarray([[1.0, 1.0, 1.0]]))
    )
    em = E.make_emitter(is_em, mesh.triangles(),
                        radiance=np.full((2, 3), 5.0, np.float32), slf=slf)
    pos = jnp.asarray([[0.5, 0.5, 0.5], [1.8, 1.8, 1.8]])
    d = jnp.zeros((2, 3)).at[:, 2].set(1.0)
    tri = jnp.asarray([0, 0])
    rough = jnp.asarray([[0.9], [0.9]])
    le, pdf, valid_next = E.eval_emitter(em, pos, d, tri, rough, 0.6)
    # first point: cache nonzero -> returns cache, terminates
    assert np.allclose(le[0], 1.0)
    assert not bool(valid_next[0])
    # second point: cache zero -> keeps going
    assert np.allclose(le[1], 0.0)
    assert bool(valid_next[1])
    # low roughness -> no cache lookup
    le2, _, vn2 = E.eval_emitter(em, pos, d, tri, jnp.full((2, 1), 0.3), 0.6)
    assert np.allclose(le2, 0.0) and bool(vn2[0])


# ------------------------------------------------------------------- CRF

def test_emor_parse():
    names, vectors = parse_emor_file(inv=False)
    assert vectors.shape[1] == 1024
    assert vectors.shape[0] >= 13
    # f0 is monotone increasing from ~0 to ~1
    f0 = vectors[1]
    assert f0[0] < 0.01 and f0[-1] > 0.99
    assert np.all(np.diff(f0) >= -1e-6)


def test_crf_identity_weights_roundtrip():
    crf = C.init_emor_crf(dim=3)
    hdr = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (64, 3)),
                      jnp.float32)
    ldr = C.crf_forward(crf, hdr, 1.0)
    back = C.crf_inverse(crf, ldr, 1.0)
    assert np.allclose(back, hdr, atol=5e-3)


def test_crf_nonzero_weights_roundtrip_and_grad():
    crf = C.init_emor_crf(dim=3)
    crf = C.EmorCRF(
        weight=jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (3, 3)),
                           jnp.float32),
        f0=crf.f0, basis=crf.basis, dim=3,
    )
    hdr = jnp.asarray(np.random.default_rng(2).uniform(0.1, 0.9, (64, 3)),
                      jnp.float32)
    exposure = jnp.full((64, 1), 0.8)
    ldr = C.crf_forward(crf, hdr, exposure)
    back = C.crf_inverse(crf, ldr, exposure)
    assert np.allclose(back, hdr, atol=2e-2)

    def loss(w):
        c = C.EmorCRF(weight=w, f0=crf.f0, basis=crf.basis, dim=3)
        return jnp.sum(C.crf_forward(c, hdr, exposure) ** 2)

    g = jax.grad(loss)(crf.weight)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).sum()) > 0


def test_crf_regularizers_finite():
    crf = C.init_emor_crf(dim=3)
    assert float(C.reg_weight(crf)) == 0.0
    assert np.isfinite(float(C.reg_monotonically_increasing(crf)))
    assert np.isfinite(float(C.reg_smoothness(crf)))


def test_fit_weight_recovers_curves():
    crf = C.init_emor_crf(dim=5)
    w_true = np.random.default_rng(3).normal(0, 0.2, (3, 5)).astype(np.float32)
    target = np.asarray(crf.f0)[None] + w_true @ np.asarray(crf.basis)
    w_fit = C.fit_weight_to_crf(crf, target)
    assert np.allclose(w_fit, w_true, atol=1e-3)


def test_hashgrid_packed_matches_full_within_bf16():
    cfg_f = HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4)
    cfg_p = HashGridConfig(n_levels=4, log2_table_size=10, base_resolution=4,
                           packed_gather=True)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg_f) * 100
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    full = hashgrid_encode(table, cfg_f, x)
    packed = hashgrid_encode(table, cfg_p, x)
    assert np.allclose(full, packed, rtol=1e-2, atol=1e-2)
    # gradients agree (bwd path shared)
    g1 = jax.grad(lambda t: hashgrid_encode(t, cfg_f, x).sum())(table)
    g2 = jax.grad(lambda t: hashgrid_encode(t, cfg_p, x).sum())(table)
    assert np.allclose(g1, g2, atol=1e-5)


def test_hashgrid_row_mode_matches_flat():
    """row_gather=True (feature-minor rows, one gather per corner) is a
    re-layout of the same model: with the table permuted feature-major ->
    feature-minor, encode outputs and gradients match the flat path up to
    the documented column permutation (full (B, F*L) col j*L+l ==
    row (B, L*F) col l*F+j)."""
    from dataclasses import replace

    L, F, T = 3, 4, 1 << 8
    cfg_flat = HashGridConfig(n_levels=L, n_features=F, log2_table_size=8,
                              base_resolution=4, per_level_scale=1.5,
                              packed_gather=False)
    cfg_row = replace(cfg_flat, row_gather=True)
    table_f = init_hashgrid(jax.random.PRNGKey(0), cfg_flat) * 1e4
    # feature-major [j, l*T+t] -> feature-minor [(l*T+t), j]
    table_r = jnp.asarray(np.asarray(table_f).reshape(F, L * T).T.reshape(-1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    full = np.asarray(hashgrid_encode(table_f, cfg_flat, x))
    row = np.asarray(hashgrid_encode(table_r, cfg_row, x))
    perm = np.asarray([l * F + j for j in range(F) for l in range(L)])
    assert np.allclose(full, row[:, perm], atol=1e-4)

    # gradients: same permutation on the cotangent, inverse re-layout on
    # the table cotangent
    co = jax.random.normal(jax.random.PRNGKey(2), (64, L * F))
    g_f = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(t, cfg_flat, x) * co))(table_f)
    g_r = jax.grad(lambda t: jnp.sum(
        hashgrid_encode(t, cfg_row, x)[:, perm] * co))(table_r)
    g_r_as_flat = np.asarray(g_r).reshape(L * T, F).T.reshape(-1)
    assert np.allclose(np.asarray(g_f), g_r_as_flat, atol=1e-4)


def test_hashgrid_row_mode_stochastic_unbiased():
    """Row-mode stochastic-corner fwd/bwd and level-block-subsampled bwd
    are unbiased, and a single bwd_level_sample draw touches only the
    sampled level rows."""
    from dataclasses import replace

    L, F, T = 4, 4, 1 << 8
    cfg0 = HashGridConfig(n_levels=L, n_features=F, log2_table_size=8,
                          base_resolution=4, per_level_scale=1.5,
                          packed_gather=False, row_gather=True)
    cfg_exact = replace(cfg0, stochastic_bwd=False)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg0) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    co = jax.random.normal(jax.random.PRNGKey(2), (32, L * F))

    def loss(t, k, c):
        return jnp.sum(hashgrid_encode(t, c, x, k) * co)

    g_exact = jax.grad(loss)(table, None, cfg_exact)
    scale = jnp.abs(g_exact).max()
    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    for cfg in (cfg0,                                   # stoch bwd
                replace(cfg0, stochastic_fwd=True),     # stoch fwd+bwd
                replace(cfg0, bwd_level_sample=2)):     # + level subsample
        gs = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg)))(keys)
        err = jnp.abs(jnp.mean(gs, 0) - g_exact).max() / scale
        assert err < 0.15, (cfg.stochastic_fwd, cfg.bwd_level_sample,
                            float(err))

    # stochastic fwd encode unbiased
    f_exact = hashgrid_encode(table, replace(cfg0, stochastic_bwd=False), x)
    cfg_sf = replace(cfg0, stochastic_fwd=True)
    fs = jax.jit(jax.vmap(lambda k: hashgrid_encode(table, cfg_sf, x, k)))(
        keys)
    assert jnp.abs(jnp.mean(fs, 0) - f_exact).max() \
        < 0.12 * jnp.abs(f_exact).max() + 0.05

    # single bwd_level_sample draw: only 2 of 4 level row-blocks nonzero
    g1 = jax.grad(loss)(table, keys[0], replace(cfg0, bwd_level_sample=2))
    per_level = np.abs(np.asarray(g1)).reshape(L, T * F).sum(-1)
    assert (per_level > 0).sum() <= 2, per_level


def test_hashgrid_stochastic_bwd_unbiased():
    """E over corner keys of the stochastic-corner backward == exact grad.

    The separable Bernoulli corner selection picks each corner with exactly
    its trilinear weight, importance weight 1, so the single-corner scatter
    is an unbiased estimator of the 8-corner cotangent."""
    from dataclasses import replace

    cfg = HashGridConfig(n_levels=3, log2_table_size=8, base_resolution=4,
                         per_level_scale=1.5)
    cfg_exact = replace(cfg, stochastic_bwd=False)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    co = jax.random.normal(jax.random.PRNGKey(2),
                           (32, cfg.n_levels * cfg.n_features))

    def loss(t, k, c):
        return jnp.sum(hashgrid_encode(t, c, x, k) * co)

    g_exact = jax.grad(loss)(table, None, cfg_exact)
    # exact cfg with a key must also stay exact
    assert np.allclose(
        jax.grad(loss)(table, jax.random.PRNGKey(9), cfg_exact), g_exact)

    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    gs = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg)))(keys)
    g_mean = jnp.mean(gs, 0)
    scale = jnp.abs(g_exact).max()
    assert jnp.abs(g_mean - g_exact).max() / scale < 0.12  # ~1/sqrt(512) MC


def test_hashgrid_stochastic_fwd_unbiased():
    """E over corner keys of the stochastic-corner forward == exact encode,
    and its VJP scatters to the gathered corner (self-consistent)."""
    from dataclasses import replace

    cfg = HashGridConfig(n_levels=3, log2_table_size=8, base_resolution=4,
                         per_level_scale=1.5, stochastic_fwd=True)
    cfg_exact = replace(cfg, stochastic_fwd=False, stochastic_bwd=False)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    f_exact = hashgrid_encode(table, cfg_exact, x)
    keys = jax.random.split(jax.random.PRNGKey(3), 512)
    fs = jax.jit(jax.vmap(lambda k: hashgrid_encode(table, cfg, x, k)))(keys)
    f_mean = jnp.mean(fs, 0)
    assert jnp.abs(f_mean - f_exact).max() < 0.12 * jnp.abs(f_exact).max() \
        + 0.05

    # gradient of the stochastic fwd: unbiased for a linear functional
    co = jax.random.normal(jax.random.PRNGKey(2), f_exact.shape)

    def loss(t, k, c):
        return jnp.sum(hashgrid_encode(t, c, x, k) * co)

    g_exact = jax.grad(loss)(table, None, cfg_exact)
    gs = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg)))(keys)
    g_mean = jnp.mean(gs, 0)
    scale = jnp.abs(g_exact).max()
    assert jnp.abs(g_mean - g_exact).max() / scale < 0.12


def test_hashgrid_bwd_level_sample_unbiased():
    """E over keys of the strided level-block-subsampled backward == exact
    grad (phase uniform over strides, kept levels scaled by stride), for
    both the exact-fwd and stochastic-fwd estimator variants."""
    from dataclasses import replace

    cfg0 = HashGridConfig(n_levels=4, log2_table_size=8, base_resolution=4,
                          per_level_scale=1.5)
    cfg_exact = replace(cfg0, stochastic_bwd=False)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg0) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    co = jax.random.normal(jax.random.PRNGKey(2),
                           (32, cfg0.n_levels * cfg0.n_features))

    def loss(t, k, c):
        return jnp.sum(hashgrid_encode(t, c, x, k) * co)

    g_exact = jax.grad(loss)(table, None, cfg_exact)
    keys = jax.random.split(jax.random.PRNGKey(3), 1024)
    scale = jnp.abs(g_exact).max()
    for cfg in (replace(cfg0, bwd_level_sample=2),
                replace(cfg0, bwd_level_sample=2, stochastic_fwd=True)):
        gs = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg)))(keys)
        err = jnp.abs(jnp.mean(gs, 0) - g_exact).max() / scale
        assert err < 0.15, (cfg.stochastic_fwd, float(err))
        # a single draw must only touch bwd_level_sample of n_levels levels
        g1 = jax.grad(loss)(table, keys[0], cfg)
        per_level = np.abs(np.asarray(g1)).reshape(
            cfg.n_features, cfg.n_levels, -1).sum(-1).sum(0)
        assert (per_level > 0).sum() <= cfg.bwd_level_sample, per_level

    import pytest
    with pytest.raises(ValueError, match="bwd_level_sample"):
        hashgrid_encode(table, replace(cfg0, bwd_level_sample=3), x,
                        jax.random.PRNGKey(0))


def test_hashgrid_fwd_level_sample_unbiased():
    """E over keys of the fwd level-block-subsampled ENCODE == exact encode
    (kept levels scaled by stride, others zero; phase uniform), and a
    single draw touches exactly fwd_level_sample levels."""
    from dataclasses import replace

    cfg0 = HashGridConfig(n_levels=4, log2_table_size=8, base_resolution=4,
                          per_level_scale=1.5, stochastic_fwd=True,
                          fwd_level_sample=2)
    cfg_exact = replace(cfg0, stochastic_fwd=False, stochastic_bwd=False,
                        fwd_level_sample=0)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg0) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    e_exact = hashgrid_encode(table, cfg_exact, x)
    keys = jax.random.split(jax.random.PRNGKey(3), 2048)
    es = jax.jit(jax.vmap(lambda k: hashgrid_encode(table, cfg0, x, k)))(keys)
    scale = jnp.abs(e_exact).max()
    err = jnp.abs(jnp.mean(es, 0) - e_exact).max() / scale
    assert err < 0.1, float(err)

    # one draw: exactly K of L level blocks nonzero, each a strided set
    e1 = np.asarray(hashgrid_encode(table, cfg0, x, keys[0]))
    per_level = np.abs(e1).reshape(32, cfg0.n_features,
                                   cfg0.n_levels).sum((0, 1))
    assert (per_level > 0).sum() == cfg0.fwd_level_sample, per_level
    nz = np.nonzero(per_level)[0]
    assert nz[1] - nz[0] == cfg0.n_levels // cfg0.fwd_level_sample

    # gradient over keys is unbiased for a linear functional of the encode
    co = jax.random.normal(jax.random.PRNGKey(2),
                           (32, cfg0.n_levels * cfg0.n_features))

    def loss(t, k, c):
        return jnp.sum(hashgrid_encode(t, c, x, k) * co)

    g_exact = jax.grad(loss)(table, None, cfg_exact)
    gs = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg0)))(keys)
    gerr = jnp.abs(jnp.mean(gs, 0) - g_exact).max() / jnp.abs(g_exact).max()
    assert gerr < 0.15, float(gerr)

    # composes with bwd_level_sample nested inside the sampled levels
    cfg_both = replace(cfg0, bwd_level_sample=1)
    g1 = jax.grad(loss)(table, keys[0], cfg_both)
    per_level_g = np.abs(np.asarray(g1)).reshape(
        cfg0.n_features, cfg0.n_levels, -1).sum(-1).sum(0)
    assert (per_level_g > 0).sum() <= 1, per_level_g
    gs2 = jax.jit(jax.vmap(lambda k: jax.grad(loss)(table, k, cfg_both)))(keys)
    gerr2 = (jnp.abs(jnp.mean(gs2, 0) - g_exact).max()
             / jnp.abs(g_exact).max())
    assert gerr2 < 0.25, float(gerr2)

    import pytest
    with pytest.raises(ValueError, match="fwd_level_sample"):
        hashgrid_encode(table, replace(cfg0, fwd_level_sample=3), x,
                        jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="stochastic_fwd"):
        hashgrid_encode(table, replace(cfg0, stochastic_fwd=False), x,
                        jax.random.PRNGKey(0))


def test_row_native_layout_equivalence():
    """row_native_layout stores the row-mode table as (L*T, F) natively;
    outputs and gradients must be bit-equal to the flat layout holding
    the same values (the layouts differ only by a reshape)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from iris_tpu.models.hashgrid import (
        HashGridConfig, hashgrid_encode, init_hashgrid,
    )

    base = HashGridConfig(n_levels=4, n_features=8, log2_table_size=10,
                          per_level_scale=2.0, row_gather=True,
                          stochastic_fwd=True, stochastic_bwd=True,
                          bwd_level_sample=2)
    native = replace(base, row_native_layout=True)
    t_flat = init_hashgrid(jax.random.PRNGKey(0), base)
    t_rows = t_flat.reshape(base.n_levels * base.table_size,
                            base.n_features)
    assert init_hashgrid(jax.random.PRNGKey(0), native).shape == \
        t_rows.shape

    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    for key in (None, jax.random.PRNGKey(2)):
        cfg_f = base if key is not None else replace(
            base, stochastic_fwd=False, stochastic_bwd=False)
        cfg_n = replace(cfg_f, row_native_layout=True)
        out_f = hashgrid_encode(t_flat, cfg_f, x, key)
        out_n = hashgrid_encode(t_rows, cfg_n, x, key)
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_n))
        g_f = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cfg_f, x, key) ** 2))(t_flat)
        g_n = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cfg_n, x, key) ** 2))(t_rows)
        np.testing.assert_array_equal(
            np.asarray(g_f).reshape(g_n.shape), np.asarray(g_n))


def test_hashgrid_compact_scatter_equivalence():
    """bwd_compact_scatter reformulates the row-mode gradient scatter as
    per-level-block (T, F) buffer scatters + dynamic_update_slice placement
    (scatter cost is set by target working-set size — PERF.md round 5,
    records/scatter_size_r5.log). float32 compact must match the full-table
    scatter to fp-reassociation tolerance; bfloat16 compact (the production
    default, 8 MB buffers) must match to bf16 rounding; and a compact draw
    must touch exactly the sampled level blocks."""
    from dataclasses import replace

    base = HashGridConfig(n_levels=4, n_features=8, log2_table_size=8,
                          base_resolution=4, per_level_scale=1.7,
                          row_gather=True, stochastic_fwd=True,
                          stochastic_bwd=True, bwd_level_sample=2,
                          bwd_compact_scatter=False)
    c_f32 = replace(base, bwd_compact_scatter=True,
                    bwd_scatter_dtype="float32")
    c_bf16 = replace(base, bwd_compact_scatter=True,
                     bwd_scatter_dtype="bfloat16")
    table = init_hashgrid(jax.random.PRNGKey(0), base) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

    def grad_of(cfg, key, stoch_fwd=True):
        cfg = cfg if stoch_fwd else replace(cfg, stochastic_fwd=False)
        return jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cfg, x, key) ** 2))(table)

    for stoch_fwd in (True, False):   # _row_stoch_p and _row_stoch_bwd_p
        key = jax.random.PRNGKey(2 + stoch_fwd)
        g_ref = grad_of(base, key, stoch_fwd)
        g_f32 = grad_of(c_f32, key, stoch_fwd)
        g_bf = grad_of(c_bf16, key, stoch_fwd)
        scale = float(jnp.abs(g_ref).max())
        assert np.allclose(g_f32, g_ref, atol=1e-5 * scale)
        assert np.allclose(g_bf, g_ref, atol=1.2e-2 * scale)
        # grad cosine: bf16 rounding must not steer the update direction
        cos = float(jnp.vdot(g_bf, g_ref)
                    / (jnp.linalg.norm(g_bf) * jnp.linalg.norm(g_ref)))
        assert cos > 0.999, cos
        # compact draw touches exactly the bwd_k sampled level blocks
        L, T, F = base.n_levels, base.table_size, base.n_features
        per_level = np.abs(np.asarray(g_bf)).reshape(L, T * F).sum(-1)
        assert (per_level > 0).sum() <= base.bwd_level_sample, per_level

    # bwd_k=0 (all levels) compact path: slot-per-level structure
    full = replace(c_bf16, bwd_level_sample=0)
    full_ref = replace(base, bwd_level_sample=0)
    key = jax.random.PRNGKey(9)
    g_ref = grad_of(full_ref, key)
    g_bf = grad_of(full, key)
    scale = float(jnp.abs(g_ref).max())
    assert np.allclose(g_bf, g_ref, atol=1.2e-2 * scale)


def test_hashgrid_compact_scatter_flat_path():
    """The flat-table (reference 32x2 parameterization) stochastic backward
    gets the same per-(feature, level-block) compact treatment, f32 buffers
    (2 MB tier). Must match the full-table scatter to fp-reassociation
    tolerance on both the packed and unpacked paths, with and without
    level subsampling."""
    from dataclasses import replace

    base = HashGridConfig(n_levels=4, n_features=2, log2_table_size=8,
                          base_resolution=4, per_level_scale=1.7,
                          stochastic_fwd=False, stochastic_bwd=True,
                          bwd_compact_scatter=False)
    table = init_hashgrid(jax.random.PRNGKey(0), base) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

    for packed in (True, False):
        for bwd_k, stoch_fwd in ((2, False), (0, False), (2, True)):
            cfg_ref = replace(base, packed_gather=packed,
                              bwd_level_sample=bwd_k,
                              stochastic_fwd=stoch_fwd)
            cfg_c = replace(cfg_ref, bwd_compact_scatter=True)
            key = jax.random.PRNGKey(3 + bwd_k)
            g_ref, g_c = (jax.grad(lambda t, c=c: jnp.sum(
                hashgrid_encode(t, c, x, key) ** 2))(table)
                for c in (cfg_ref, cfg_c))
            scale = float(jnp.abs(g_ref).max())
            assert np.allclose(g_c, g_ref, atol=1e-5 * scale), (
                packed, bwd_k, stoch_fwd)


def test_hashgrid_fwd_gather_dtype_and_block_gather():
    """Round-5 forward-gather levers (records/gather_block_r5.log):

    1. fwd_gather_dtype='bfloat16' (row mode, stochastic paths): features
       and gradients must match the f32 read to bf16 rounding, with grad
       cosine > 0.999 — and eval paths (no key) must stay EXACT f32.
    2. fwd_block_gather (flat packed mode): per-level-block gathers must
       be BIT-EXACT vs the global gather.
    3. bad fwd_gather_dtype strings hard-fail (no silent f32 fallback).
    """
    from dataclasses import replace

    import pytest as _pytest

    base = HashGridConfig(n_levels=4, n_features=8, log2_table_size=8,
                          base_resolution=4, per_level_scale=1.7,
                          row_gather=True, stochastic_fwd=True,
                          stochastic_bwd=True, bwd_level_sample=2,
                          fwd_gather_dtype="bfloat16")
    c_f32 = replace(base, fwd_gather_dtype="float32")
    table = init_hashgrid(jax.random.PRNGKey(0), base) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

    for stoch_fwd in (True, False):   # _row_stoch_p and _row_stoch_bwd_p
        key = jax.random.PRNGKey(3 + stoch_fwd)
        cb = replace(base, stochastic_fwd=stoch_fwd)
        cf = replace(c_f32, stochastic_fwd=stoch_fwd)
        f_bf = hashgrid_encode(table, cb, x, key)
        f_f32 = hashgrid_encode(table, cf, x, key)
        scale = float(jnp.abs(f_f32).max())
        assert np.allclose(f_bf, f_f32, atol=1.2e-2 * scale)
        g_bf = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cb, x, key) ** 2))(table)
        g_f = jax.grad(lambda t: jnp.sum(
            hashgrid_encode(t, cf, x, key) ** 2))(table)
        cos = float(jnp.vdot(g_bf, g_f)
                    / (jnp.linalg.norm(g_bf) * jnp.linalg.norm(g_f)
                       + 1e-20))
        assert cos > 0.999, cos

    # eval path (no key): bit-exact f32 regardless of fwd_gather_dtype
    e_bf = hashgrid_encode(table, base, x, None)
    e_f32 = hashgrid_encode(table, c_f32, x, None)
    np.testing.assert_array_equal(np.asarray(e_bf), np.asarray(e_f32))

    # flat packed blocked gather: BIT-exact vs global
    flat = HashGridConfig(n_levels=4, n_features=2, log2_table_size=8,
                          base_resolution=4, per_level_scale=1.7,
                          stochastic_fwd=True, stochastic_bwd=True,
                          fwd_block_gather=True)
    flat_g = replace(flat, fwd_block_gather=False)
    t2 = init_hashgrid(jax.random.PRNGKey(5), flat) * 1e4
    key = jax.random.PRNGKey(6)
    np.testing.assert_array_equal(
        np.asarray(hashgrid_encode(t2, flat, x, key)),
        np.asarray(hashgrid_encode(t2, flat_g, x, key)))
    # and with fwd level subsampling active (columns at strided levels)
    fls = replace(flat, fwd_level_sample=2, bwd_level_sample=2)
    fls_g = replace(flat_g, fwd_level_sample=2, bwd_level_sample=2)
    np.testing.assert_array_equal(
        np.asarray(hashgrid_encode(t2, fls, x, key)),
        np.asarray(hashgrid_encode(t2, fls_g, x, key)))

    with _pytest.raises(ValueError, match="fwd_gather_dtype"):
        hashgrid_encode(table, replace(base, fwd_gather_dtype="bf16"), x,
                        jax.random.PRNGKey(0))
