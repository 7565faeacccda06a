"""Tiny functional MLPs (parity with reference nerf/network.py:10-54).

Plain pytree params + pure apply functions: the model is three 2-3 layer MLPs,
so a module framework would add indirection without benefit, and raw pytrees
compose directly with optax/orbax/shard_map.

Matmuls run on the MXU; under mixed precision we cast activations and weights
to bf16 and keep fp32 accumulation (preferred_element_type), replacing the
reference's fp16 autocast + GradScaler (SURVEY.md §7 hard part 4 — no scaler is
needed for bf16).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.activation import softplus_b100


def init_mlp(
    key: jax.Array,
    dim_in: int,
    dim_out: int,
    dim_hidden: int,
    num_layers: int,
    bias: bool = False,
    geom_init: bool = False,
) -> List[Dict[str, jax.Array]]:
    """Kaiming-uniform (torch Linear default) or SDF geometric init
    (reference network.py:27-39)."""
    layers = []
    keys = jax.random.split(key, num_layers)
    for l in range(num_layers):
        in_dim = dim_in if l == 0 else dim_hidden
        out_dim = dim_out if l == num_layers - 1 else dim_hidden
        wkey, bkey = jax.random.split(keys[l])
        if geom_init:
            if l == num_layers - 1:
                w = (
                    jax.random.normal(wkey, (in_dim, out_dim)) * 1e-4
                    + math.sqrt(math.pi) / math.sqrt(in_dim)
                )
            elif l == 0:
                w = jnp.zeros((in_dim, out_dim))
                w = w.at[:3, :].set(
                    jax.random.normal(wkey, (3, out_dim))
                    * (math.sqrt(2) / math.sqrt(out_dim))
                )
            else:
                w = jax.random.normal(wkey, (in_dim, out_dim)) * (
                    math.sqrt(2) / math.sqrt(out_dim)
                )
        else:
            bound_w = 1.0 / math.sqrt(in_dim)
            w = jax.random.uniform(wkey, (in_dim, out_dim), minval=-bound_w, maxval=bound_w)
        layer = {"w": w.astype(jnp.float32)}
        if bias:
            if geom_init and l == num_layers - 1:
                b = jnp.full((out_dim,), -0.5)  # sphere init (network.py:30)
            elif geom_init:
                b = jnp.zeros((out_dim,))
            else:
                bound_b = 1.0 / math.sqrt(in_dim)
                b = jax.random.uniform(bkey, (out_dim,), minval=-bound_b, maxval=bound_b)
            layer["b"] = b.astype(jnp.float32)
        layers.append(layer)
    return layers


def apply_mlp(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    geom_init: bool = False,
    compute_dtype: Any = jnp.float32,
) -> jax.Array:
    """Forward; hidden activation is relu (or softplus beta=100 for geom_init,
    network.py:50-53). Output is raw (caller applies head activation)."""
    n = len(params)
    h = x.astype(compute_dtype)
    for l, layer in enumerate(params):
        w = layer["w"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"]
        if l != n - 1:
            h = softplus_b100(h) if geom_init else jax.nn.relu(h)
            h = h.astype(compute_dtype)
    return h.astype(jnp.float32)
