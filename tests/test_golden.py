"""Golden-value regression tests.

Small fixed-key renders + gradients on the demo scene, compared against
committed reference values (regenerate with
`python -m tests.test_golden` after intentional semantic changes).
These pin the integrator semantics the way BASELINE.json's bit-match
configs pin the reference: any change to MIS weights, sampler mappings,
clamps, or RNG layout shows up here.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_render.npz")


def _compute():
    from iris_tpu.demo import demo_mat_fn, make_demo_scene
    from iris_tpu.geometry.procedural import camera_rays
    from iris_tpu.models.brdf import ngp_brdf_apply
    from iris_tpu.render.integrator import path_tracing, path_tracing_single

    tracer, em, ngp, crf, _ = make_demo_scene(
        n_clutter=4, slf_res=8, hash_levels=4, log2_table=10, seed=0)
    o, d, dxdu, dydv = camera_rays(8)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(dxdu),
            jnp.asarray(dydv))

    key = jax.random.PRNGKey(7)
    l_single = path_tracing_single(key, tracer, em, demo_mat_fn(ngp),
                                   *args, spp=16)
    l_full = path_tracing(key, tracer, em, demo_mat_fn(ngp), *args,
                          spp=8, indir_depth=2)

    def loss(p):
        out = path_tracing_single(key, tracer, em,
                                  functools.partial(ngp_brdf_apply, p),
                                  *args, spp=4)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(ngp)
    grad_stats = np.asarray([
        float(jnp.sum(jnp.abs(g.table))),
        float(sum(jnp.sum(jnp.abs(w)) for w in g.mlp["w"])),
    ])
    return (np.asarray(l_single), np.asarray(l_full), grad_stats)


def test_golden_render_matches():
    regen = os.environ.get("REGEN_GOLDEN") == "1"
    if regen or not os.path.exists(GOLDEN):
        l_single, l_full, grad_stats = _compute()
        if regen:
            np.savez(GOLDEN, l_single=l_single, l_full=l_full,
                     grad_stats=grad_stats)
            print("regenerated", GOLDEN)
            return
        import pytest

        pytest.skip("no golden file committed")
    z = np.load(GOLDEN)
    l_single, l_full, grad_stats = _compute()
    assert np.allclose(l_single, z["l_single"], rtol=2e-4, atol=2e-5), (
        np.abs(l_single - z["l_single"]).max())
    assert np.allclose(l_full, z["l_full"], rtol=2e-4, atol=2e-5)
    assert np.allclose(grad_stats, z["grad_stats"], rtol=1e-3)


# Regenerate after intentional semantic changes:
#   REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -s
