import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.core import vecmath as vm
from iris_tpu.core import ggx


def test_normal_space_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(256, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    frame = vm.get_normal_space(jnp.asarray(n, jnp.float32))
    # columns orthonormal, third column is the normal
    eye = jnp.einsum("bij,bik->bjk", frame, frame,
                     precision=jax.lax.Precision.HIGHEST)
    assert np.allclose(eye, np.eye(3)[None], atol=1e-4)
    assert np.allclose(frame[..., 2], n, atol=1e-5)


def test_to_world_matches_matmul():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    frame = vm.get_normal_space(jnp.asarray(n, jnp.float32))
    out = vm.to_world(frame, jnp.asarray(v))
    ref = np.einsum("bij,bj->bi", np.asarray(frame), v)
    assert np.allclose(out, ref, atol=1e-5)


def test_angle2xyz_unit_and_z():
    theta = jnp.asarray([0.0, np.pi / 2, np.pi])
    phi = jnp.zeros(3)
    v = vm.angle2xyz(theta, phi)
    assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)
    assert np.allclose(v[0], [0, 0, 1], atol=1e-6)
    assert np.allclose(v[2], [0, 0, -1], atol=1e-6)


def test_double_sided_flips():
    n = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    view = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = vm.double_sided(view, n)
    assert np.allclose(out[0], [0, 0, 1])
    assert np.allclose(out[1], [0, 0, -1])


def test_d_ggx_normalization():
    """Integral of D(h) NoH dOmega over hemisphere ~ 1 (NDF normalization)."""
    rng = np.random.default_rng(2)
    n = 200_000
    # uniform hemisphere sampling
    u = rng.uniform(size=(n, 2))
    cos_t = u[:, 0]
    noh = jnp.asarray(cos_t, jnp.float32)
    for rough in [0.3, 0.6, 1.0]:
        d = ggx.d_ggx(noh, rough)
        # pdf of uniform hemisphere = 1/(2pi)
        integral = float(jnp.mean(d * noh) * 2 * np.pi)
        assert abs(integral - 1.0) < 0.05, (rough, integral)


def test_fresnel_sep_consistency():
    voh = jnp.linspace(0, 1, 32)
    f0 = 0.2
    a, b = ggx.fresnel_schlick_sep(voh)
    full = ggx.fresnel_schlick(voh, f0)
    assert np.allclose(f0 * a + b, full, atol=1e-6)


def test_lerp_specular_endpoints_and_mid():
    B, R = 8, 6
    spec = jnp.asarray(np.random.default_rng(3).uniform(size=(B, R, 3)),
                       jnp.float32)
    lo = ggx.lerp_specular(spec, jnp.full((B, 1), 0.02))
    hi = ggx.lerp_specular(spec, jnp.full((B, 1), 1.0))
    assert np.allclose(lo, spec[:, 0], atol=1e-5)
    assert np.allclose(hi, spec[:, -1], atol=1e-5)
    # midpoint between level 2 and 3
    r = 0.02 + (1.0 - 0.02) * 2.5 / (R - 1)
    mid = ggx.lerp_specular(spec, jnp.full((B, 1), r))
    assert np.allclose(mid, 0.5 * (spec[:, 2] + spec[:, 3]), atol=1e-4)


def test_lerp_specular_grad_flows():
    spec = jnp.ones((4, 6, 3))
    r = jnp.full((4, 1), 0.5)
    g = jax.grad(lambda rr: ggx.lerp_specular(spec, rr).sum())(r)
    assert np.all(np.isfinite(np.asarray(g)))
