"""Generic MLP building blocks (parity: reference model/mlps.py).

The reference keeps a NeRF-style positional encoding + skip MLP that its
trainers import but never instantiate (model/mlps.py:15-89,
train_brdf_crf.py:35); provided here for the same API surface and for
experiments that swap the hash grid for a frequency encoding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from iris_tpu.models.mlp import apply_mlp, init_mlp


def positional_encoding(x: jnp.ndarray, n_freqs: int = 10,
                        include_input: bool = True) -> jnp.ndarray:
    """NeRF frequency encoding: [x, sin(2^k pi x), cos(2^k pi x)]."""
    outs = [x] if include_input else []
    for k in range(n_freqs):
        f = (2.0 ** k) * math.pi
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)


def init_implicit_mlp(key: jax.Array, in_dim: int = 3, out_dim: int = 5,
                      width: int = 256, depth: int = 8, skip_at: int = 4,
                      n_freqs: int = 10) -> dict:
    """NeRF-style skip MLP over positional-encoded input."""
    enc_dim = in_dim * (1 + 2 * n_freqs)
    k1, k2 = jax.random.split(key)
    trunk = init_mlp(k1, [enc_dim] + [width] * skip_at)
    head = init_mlp(k2, [width + enc_dim] + [width] * (depth - skip_at)
                    + [out_dim])
    return {"trunk": trunk, "head": head, "n_freqs": n_freqs}


def apply_implicit_mlp(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    enc = positional_encoding(x, params["n_freqs"])
    h = apply_mlp(params["trunk"], enc, bf16=False)
    h = jax.nn.relu(h)
    return apply_mlp(params["head"], jnp.concatenate([h, enc], -1),
                     bf16=False)
