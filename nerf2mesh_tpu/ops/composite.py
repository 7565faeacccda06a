"""Transmittance compositing over compacted ray segments — TPU-native.

Replaces the reference's per-ray sequential compositing CUDA kernels
(/root/reference/raymarching/src/raymarching.cu:500-705
``kernel_composite_rays_train_forward/backward``) with vectorized segment math
over the ray-major point pool produced by `ops.marching.march_rays`:

  alpha_i = 1 - exp(-sigma_i * dt_i)        (or alpha_i = sigma_i in alpha_mode
                                             for NeuS/SDF, raymarching.cu:543)
  T_i     = prod_{j<i in segment} (1 - alpha_j)   (exclusive transmittance)
  w_i     = alpha_i * T_i
  image   = sum w_i rgb_i ;  depth = sum w_i t_i ;  weights_sum = sum w_i

The exclusive per-segment product is computed in log space with a global cumsum
minus the segment-start prefix (no scan per ray), and the reference's early
stop at T < T_thresh (raymarching.cu:556-557) becomes a mask on samples whose
*incoming* transmittance is already below threshold.  The hand-derived backward
(raymarching.cu:604-694) is replaced by XLA autodiff of this formulation, which
yields the same gradients for the surviving samples.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_rays", "alpha_mode"))
def composite_rays(
    sigmas: jax.Array,      # [P] density (or alpha in alpha_mode)
    rgbs: jax.Array,        # [P, 3]
    ts: jax.Array,          # [P] t at segment end
    dts: jax.Array,         # [P]
    ray_idx: jax.Array,     # [P] int32
    valid: jax.Array,       # [P] bool
    *,
    num_rays: int,
    T_thresh: float = 1e-4,
    alpha_mode: bool = False,
) -> Dict[str, jax.Array]:
    """Returns dict(weights [P], weights_sum [N], depth [N], image [N, 3])."""
    P = sigmas.shape[0]
    sigmas = sigmas.astype(jnp.float32)
    rgbs = rgbs.astype(jnp.float32)

    if alpha_mode:
        alpha = jnp.clip(sigmas, 0.0, 1.0 - 1e-7)
    else:
        alpha = 1.0 - jnp.exp(-sigmas * dts)
    alpha = jnp.where(valid, alpha, 0.0)

    # exclusive per-segment cumprod of (1 - alpha) in log space
    log1m = jnp.log1p(-jnp.clip(alpha, 0.0, 1.0 - 1e-7))
    csum = jnp.cumsum(log1m)                                  # inclusive, global
    excl = csum - log1m                                       # exclusive, global

    # subtract each segment's starting prefix: prefix value at the first sample
    # of the segment. Segment starts are where ray_idx changes.
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), ray_idx[1:] != ray_idx[:-1]]
    ) & valid
    # per-ray prefix via scatter of start prefixes then gather by ray_idx
    # (each ray has at most one segment start, so scatter-add is exact; padded
    # samples add 0 to ray 0)
    start_prefix = jnp.zeros(num_rays, jnp.float32).at[
        jnp.where(is_start, ray_idx, 0)
    ].add(jnp.where(is_start, excl, 0.0))

    logT = excl - jnp.take(start_prefix, ray_idx)
    T = jnp.exp(jnp.minimum(logT, 0.0))

    # early-termination parity: zero samples whose incoming T already < thresh
    live = T >= T_thresh
    weights = jnp.where(valid & live, alpha * T, 0.0)          # [P]

    seg = lambda x: jax.ops.segment_sum(x, ray_idx, num_segments=num_rays)
    weights_sum = seg(weights)
    depth = seg(weights * ts)
    image = jax.ops.segment_sum(weights[:, None] * rgbs, ray_idx, num_segments=num_rays)

    return {
        "weights": weights,
        "weights_sum": weights_sum,
        "depth": depth,
        "image": image,
    }
