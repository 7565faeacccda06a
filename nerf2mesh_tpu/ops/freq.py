"""NeRF positional (sin/cos) frequency encoding.

Parity target: the reference freqencoder CUDA extension
(/root/reference/freqencoder/src/freqencoder.cu:30-58) and its pure-torch
fallback (/root/reference/encoding.py:8-46): output is
[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(2^{F-1} x)] per input dim,
output_dim = D + D * 2 * F.  Autodiff supplies the backward
(freqencoder.cu:63-94).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * 2 * degree


@partial(jax.jit, static_argnames=("degree",))
def freq_encode(x: jax.Array, degree: int = 4) -> jax.Array:
    """x: [N, D] -> [N, D * (1 + 2*degree)]."""
    outs = [x]
    for f in range(degree):
        xf = x * (2.0 ** f)
        outs.append(jnp.sin(xf))
        outs.append(jnp.cos(xf))
    return jnp.concatenate(outs, axis=-1)
