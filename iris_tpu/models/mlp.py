"""Small fused-style MLP (pure JAX pytree).

Replacement for tcnn FullyFusedMLP (reference model/brdf.py:231-237:
2 hidden layers of 64, ReLU, linear output). On TPU the whole stack of
64-wide matmuls maps onto the MXU as one fused chain under jit; bf16
compute with f32 params/accumulation is used on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp(key: jax.Array, sizes: list[int]) -> dict:
    """sizes = [in, hidden..., out]. He-uniform init like tcnn."""
    params = {"w": [], "b": []}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in = sizes[i]
        bound = (6.0 / fan_in) ** 0.5
        params["w"].append(
            jax.random.uniform(k, (sizes[i], sizes[i + 1]), jnp.float32,
                               -bound, bound)
        )
        params["b"].append(jnp.zeros((sizes[i + 1],), jnp.float32))
    return params


def apply_mlp(params: dict, x: jnp.ndarray, bf16: bool = True) -> jnp.ndarray:
    """Forward pass; hidden activations ReLU, linear head."""
    n = len(params["w"])
    h = x
    for i in range(n):
        w = params["w"][i]
        b = params["b"][i]
        if bf16:
            h = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b
        else:
            h = jnp.dot(h, w) + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return h
