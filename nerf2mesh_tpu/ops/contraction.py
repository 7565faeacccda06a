"""L-infinity scene contraction for unbounded scenes.

Maps world space onto [-2, 2]^3: identity inside the unit box, and
x * (2 - 1/|x|_inf) / |x|_inf outside (reference nerf/renderer.py:25-41,
raymarching.cu:411-419).
"""

import jax.numpy as jnp
import numpy as np


def contract(xyzs):
    mag = jnp.max(jnp.abs(xyzs), axis=-1, keepdims=True)
    return jnp.where(mag <= 1, xyzs, xyzs * (2 - 1 / mag) / mag)


def uncontract(xyzs):
    mag = jnp.max(jnp.abs(xyzs), axis=-1, keepdims=True)
    return jnp.where(mag <= 1, xyzs, xyzs / (2 * mag - mag * mag))


def contract_np(xyzs: np.ndarray) -> np.ndarray:
    mag = np.max(np.abs(xyzs), axis=-1, keepdims=True)
    return np.where(mag <= 1, xyzs, xyzs * (2 - 1 / mag) / mag)


def uncontract_np(xyzs: np.ndarray) -> np.ndarray:
    mag = np.max(np.abs(xyzs), axis=-1, keepdims=True)
    return np.where(mag <= 1, xyzs, xyzs / (2 * mag - mag * mag))
