"""Transmittance compositing on the dense [N_rays, K_samples] layout.

Replaces the reference's per-ray sequential compositing CUDA kernels
(/root/reference/raymarching/src/raymarching.cu:500-705) with lane-parallel
math on the dense sample grid produced by `ops.sampling.sample_rays`:

  alpha_i = 1 - exp(-sigma_i * dt_i)        (alpha_i = sigma_i in alpha_mode,
                                             for NeuS/SDF, raymarching.cu:543)
  T_i     = prod_{j<i} (1 - alpha_j)        (exclusive, along the sample axis)
  w_i     = alpha_i * T_i
  image/depth/weights_sum = weighted sums over the sample axis.

The exclusive product is an exclusive cumsum of log(1-alpha) along the minor
(lane) dimension — no segment bookkeeping, no gathers.  The reference's early
stop at T < T_thresh (raymarching.cu:556-557) becomes a mask on samples whose
incoming transmittance is below threshold; XLA autodiff reproduces the
hand-derived backward (raymarching.cu:604-694) for surviving samples.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("alpha_mode",))
def composite_rays(
    sigmas: jax.Array,      # [N, K] density (or alpha in alpha_mode)
    rgbs: jax.Array,        # [N, K, 3]
    ts: jax.Array,          # [N, K]
    dts: jax.Array,         # [N, K]
    valid: jax.Array,       # [N, K] bool
    *,
    T_thresh: float = 1e-4,
    alpha_mode: bool = False,
) -> Dict[str, jax.Array]:
    """Returns dict(weights [N,K], weights_sum [N], depth [N], image [N,3])."""
    sigmas = sigmas.astype(jnp.float32)
    rgbs = rgbs.astype(jnp.float32)

    if alpha_mode:
        alpha = jnp.clip(sigmas, 0.0, 1.0 - 1e-7)
    else:
        alpha = 1.0 - jnp.exp(-sigmas * dts)
    alpha = jnp.where(valid, alpha, 0.0)

    log1m = jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-7))
    logT = jnp.cumsum(log1m, axis=-1) - log1m        # exclusive
    T = jnp.exp(jnp.minimum(logT, 0.0))

    live = T >= T_thresh
    weights = jnp.where(valid & live, alpha * T, 0.0)

    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * ts, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)

    return {
        "weights": weights,
        "weights_sum": weights_sum,
        "depth": depth,
        "image": image,
    }
