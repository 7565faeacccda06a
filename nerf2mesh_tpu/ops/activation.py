"""Activations with custom gradients.

`trunc_exp` is exp with the *gradient's* input clamped to [-15, 15], matching the
reference density activation (reference activation.py:6-17).  The forward is an
un-clamped exp; only the backward clamps, which keeps fp16/bf16 training stable.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def softplus_b100(x):
    """softplus with beta=100 used by the SDF geometric-init MLP
    (reference network.py:51)."""
    b = 100.0
    return jnp.where(x * b > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x * b, 20.0))) / b)
