"""EMoR-basis camera response function (CRF) model.

Parity with reference crf/model_crf.py EmorCRF: per-channel weights over the
first `dim` EMoR basis vectors on top of the mean curve f0 (:32-43);
forward = clip(hdr*exposure,0,1) -> per-channel curve lookup (:68-86);
inverse via monotone projection + numeric curve inversion (:45-55, :88-106);
regularizers (:108-122). torch_interpolations is replaced by jnp.interp —
already differentiable w.r.t. the curve values.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from iris_tpu.core.interp import interp1d_uniform, mono_increase_constraint
from iris_tpu.models.emor import emor_mean_and_basis


@jax.tree_util.register_dataclass
@dataclass
class EmorCRF:
    weight: jnp.ndarray   # (3, dim) learnable
    f0: jnp.ndarray       # (1024,) buffer
    basis: jnp.ndarray    # (dim, 1024) buffer
    dim: int = field(metadata=dict(static=True))


def init_emor_crf(dim: int = 3) -> EmorCRF:
    f0, basis = emor_mean_and_basis(dim)
    return EmorCRF(
        weight=jnp.zeros((3, dim), jnp.float32),
        f0=jnp.asarray(f0),
        basis=jnp.asarray(basis),
        dim=dim,
    )


def get_crf(crf: EmorCRF) -> jnp.ndarray:
    """(3, 1024) response curves."""
    return crf.f0[None] + crf.weight @ crf.basis


def get_inv_crf(crf: EmorCRF) -> jnp.ndarray:
    """(3, 1024) inverse curves on a uniform grid (mono-projected)."""
    curves = get_crf(crf)
    n = curves.shape[-1]
    x = jnp.linspace(0.0, 1.0, n)

    def invert(c):
        c_mono = mono_increase_constraint(c)
        return jnp.interp(x, c_mono, x)

    return jax.vmap(invert)(curves)


def crf_forward(crf: EmorCRF, hdr: jnp.ndarray, exposure=None) -> jnp.ndarray:
    """hdr (B,3) -> ldr (B,3). exposure broadcasts (scalar or (B,1))."""
    if exposure is None:
        exposure = 1.0
    h = jnp.clip(hdr * exposure, 0.0, 1.0)
    curves = get_crf(crf)
    ldr = [interp1d_uniform(h[:, i], curves[i]) for i in range(3)]
    return jnp.stack(ldr, axis=-1)


def crf_inverse(crf: EmorCRF, ldr: jnp.ndarray, exposure=None) -> jnp.ndarray:
    """ldr (B,3) -> hdr (B,3)."""
    if exposure is None:
        exposure = 1.0
    l = jnp.clip(ldr, 0.0, 1.0)
    inv = get_inv_crf(crf)
    hdr = [interp1d_uniform(l[:, i], inv[i]) for i in range(3)]
    return jnp.stack(hdr, axis=-1) / exposure


def reg_weight(crf: EmorCRF) -> jnp.ndarray:
    return jnp.mean(crf.weight ** 2)


def reg_monotonically_increasing(crf: EmorCRF) -> jnp.ndarray:
    curves = get_crf(crf)
    diff = curves[:, 1:] - curves[:, :-1]
    return jnp.sum(jax.nn.relu(-diff))


def reg_smoothness(crf: EmorCRF) -> jnp.ndarray:
    curves = get_crf(crf)
    s = curves[:, :-2] + curves[:, 2:] - 2.0 * curves[:, 1:-1]
    return jnp.mean(s ** 2)


def fit_weight_to_crf(crf: EmorCRF, target: np.ndarray) -> np.ndarray:
    """Least-squares weights reproducing target curves (3, 1024)
    (reference cal_weight_fitting_crf :61-66)."""
    f0 = np.asarray(crf.f0)
    basis = np.asarray(crf.basis).T  # (1024, dim)
    pinv = np.linalg.inv(basis.T @ basis) @ basis.T
    return (pinv @ (np.asarray(target) - f0[None]).T).T
