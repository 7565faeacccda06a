"""Encoder factory (parity target: reference encoding.py get_encoder).

Maps encoder names to (encode_fn, init_fn-or-None, output_dim); the default
nerf2mesh model uses hashgrid for positions and the identity for directions
(reference network.py:66-74), but the reference keeps sh/frequency encoders
available for user configs — so do we.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .freq import freq_encode, freq_output_dim
from .hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from .sh import sh_encode, sh_output_dim


def get_encoder(name: str, input_dim: int = 3, degree: int = 4,
                num_levels: int = 16, level_dim: int = 2,
                base_resolution: int = 16, log2_hashmap_size: int = 19,
                desired_resolution: Optional[int] = 2048,
                interpolation: str = "linear",
                align_corners: bool = False):
    """Returns (encode_fn(params, x) -> feats, init_fn(key) -> params | None,
    output_dim).  Parametric encoders (hash/tiled grids) have params; the
    analytic ones (identity, frequency, sh) pass params=None.
    """
    name = (name or "None").lower()

    if name in ("none", "identity"):
        return (lambda params, x: x), None, input_dim

    if name in ("frequency", "freq", "frequency_torch"):
        return (lambda params, x: freq_encode(x, degree)), None, \
            freq_output_dim(input_dim, degree)

    if name in ("sphere_harmonics", "sh"):
        return (lambda params, x: sh_encode(x, degree)), None, \
            sh_output_dim(degree)

    if name in ("hashgrid", "tiledgrid", "hashgrid_tcnn"):
        spec = HashGridSpec(
            num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="tiled" if name == "tiledgrid" else "hash",
            interpolation=interpolation, align_corners=align_corners,
            input_dim=input_dim,
        )

        def encode(params, x, bound: float = 1.0, max_level=None):
            x01 = (x + bound) / (2 * bound)
            return hashgrid_encode(params, x01, spec, max_level)

        return encode, (lambda key: init_hashgrid(key, spec)), spec.output_dim

    raise ValueError(f"unknown encoder: {name}")
