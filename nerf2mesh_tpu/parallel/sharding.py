"""Device-mesh utilities for data-parallel training.

The reference has only vestigial DDP scaffolding (SURVEY.md §2.3); here data
parallelism is first-class: the per-step ray batch is sharded across a
`jax.sharding.Mesh` axis ("data"), parameters and occupancy state are
replicated, and gradients are reduced with `psum` over ICI inside a
`shard_map`-wrapped train step.  Rays are embarrassingly parallel — this is
the natural axis, and the tiny MLPs/hash tables make TP pointless (hash tables
are ~2*2^19 entries, cheap to replicate).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,), axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Create a device mesh; -1 in shape absorbs all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    dev_arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_arr, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def num_data_shards(mesh: Optional[Mesh], axis: str = "data") -> int:
    if mesh is None:
        return 1
    return int(mesh.shape[axis])
