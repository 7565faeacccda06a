"""Multiresolution hash/tiled grid encoding (instant-NGP) — TPU-native.

Re-implements the behavior of the reference CUDA gridencoder
(/root/reference/gridencoder/src/gridencoder.cu:87-244, grid.py:101-135) as a
vectorized JAX op:

  * L levels; level l has scale_l = 2^(l*S) * H - 1 and resolution
    R_l = ceil(scale_l) + 1 (gridencoder.cu:138-140).
  * per-level table slice of size min(2^log2_hashmap_size, (R_l+!align)^D)
    rounded up to a multiple of 8 (grid.py:122-130); coarse levels index
    directly, fine levels use the xor-of-primes hash (gridencoder.cu:50-63).
  * trilinear (or smoothstep) interpolation of the 2^D corners; inputs outside
    [0, 1]^D produce zeros (gridencoder.cu:112-135).
  * `max_level` masks out fine levels for progressive training (grid.py:41-52).

The backward (scatter-add of gradients into the table, gridencoder.cu:247-339)
comes from XLA autodiff of the gather — on TPU this lowers to a deterministic
scatter-add, no atomics needed.  Gradients w.r.t. the *inputs* (needed when
stage-1 lets rgb gradients flow into vertex offsets) also fall out of autodiff,
replacing the hand-written dy_dx path (gridencoder.cu:342-368).

Total-variation regularization (gridencoder.cu:505-644) is implemented here as
a differentiable loss (`hashgrid_tv_loss`) instead of the reference's in-place
gradient injection — mathematically the same contribution to the update.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# xor-hash primes (instant-NGP): applied per input dimension.
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridSpec:
    """Static metadata for one encoder instance (shapes are compile-time).

    layout:
      "ref"      — reference indexing: dense row-major for levels whose grid
                   fits the table slice, xor-of-primes entry hash otherwise
                   (gridencoder.cu:50-63).
      "block512" — TPU window layout: the corner lattice is partitioned into
                   aligned 8^3 blocks; index = window*512 + row-major offset
                   within the block, where window is the dense block id
                   (coarse levels) or an xor-of-primes hash OF THE BLOCK
                   COORDS masked to a power-of-two window count (fine levels).
                   Collisions happen at block granularity — each table entry
                   still aliases the same number of lattice sites as "ref",
                   only spatially correlated — and every corner lookup of a
                   spatially-local chunk of points lands in <= 8 contiguous
                   512-entry windows, which is what makes a VMEM-windowed
                   Pallas gather possible (PERF.md roadmap).
    """
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: Optional[int] = None
    per_level_scale: float = 2.0
    gridtype: str = "hash"          # "hash" | "tiled"
    align_corners: bool = False
    interpolation: str = "linear"   # "linear" | "smoothstep"
    input_dim: int = 3
    layout: str = "ref"             # "ref" | "block512"

    def __post_init__(self):
        if self.desired_resolution is not None:
            s = math.exp2(
                math.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
            object.__setattr__(self, "per_level_scale", float(s))
        assert self.layout in ("ref", "block512")
        if self.layout == "block512":
            assert self.input_dim == 3, "block512 layout is 3-D only"

    # ---- derived static tables ----
    @property
    def log2_scale(self) -> float:
        return math.log2(self.per_level_scale)

    def level_scale(self, l: int) -> float:
        return math.exp2(l * self.log2_scale) * self.base_resolution - 1.0

    @property
    def resolutions(self) -> np.ndarray:
        return np.array(
            [int(math.ceil(self.level_scale(l))) + 1 for l in range(self.num_levels)],
            dtype=np.int64,
        )

    @property
    def block_counts(self) -> np.ndarray:
        """(block512) blocks per dim per level: ceil(corner_side / 8)."""
        side = self.resolutions + (0 if self.align_corners else 1)
        return ((side + 7) // 8).astype(np.int64)

    @property
    def level_sizes(self) -> np.ndarray:
        """Entries per level (ref: grid.py:122-130; block512: window multiples)."""
        max_params = 2 ** self.log2_hashmap_size
        sizes = []
        if self.layout == "block512":
            for nb in self.block_counts:
                dense = int(nb) ** self.input_dim * 512
                if self.gridtype == "hash" and dense > max_params:
                    sizes.append(max_params)        # 2^k windows of 512
                else:
                    sizes.append(dense)
            return np.array(sizes, dtype=np.int64)
        for r in self.resolutions:
            side = int(r) if self.align_corners else int(r) + 1
            n = min(max_params, side ** self.input_dim)
            sizes.append(int(math.ceil(n / 8) * 8))
        return np.array(sizes, dtype=np.int64)

    @property
    def offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.level_sizes)]).astype(np.int64)

    @property
    def table_size(self) -> int:
        return int(self.offsets[-1])

    @property
    def use_hash(self) -> np.ndarray:
        """True for levels whose dense grid exceeds the table slice."""
        if self.layout == "block512":
            dense = self.block_counts ** self.input_dim * 512
            return (self.gridtype == "hash") & (dense > self.level_sizes)
        side = self.resolutions + (0 if self.align_corners else 1)
        return (self.gridtype == "hash") & (side ** self.input_dim > self.level_sizes)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_hashgrid(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jax.Array:
    """Uniform(-1e-4, 1e-4) table init (grid.py:141-144)."""
    return jax.random.uniform(
        key, (spec.table_size, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_indices_block(pos_grid, spec: HashGridSpec):
    """block512 layout: index = win*512 + row-major offset in the 8^3 block;
    win = dense block id (coarse) or xor-prime hash of block coords (fine)."""
    sizes = jnp.asarray(spec.level_sizes.astype(np.uint32))          # [L]
    n_win = sizes // jnp.uint32(512)
    use_hash = jnp.asarray(spec.use_hash)                            # [L]
    nb = jnp.asarray(spec.block_counts.astype(np.uint32))            # [L]

    b = pos_grid >> jnp.uint32(3)                                    # [N, L, 8, D]
    loc = pos_grid & jnp.uint32(7)
    local_off = loc[..., 0] + loc[..., 1] * jnp.uint32(8) \
        + loc[..., 2] * jnp.uint32(64)                               # [N, L, 8]

    nb_ = nb[None, :, None]
    dense_win = (b[..., 0] + b[..., 1] * nb_ + b[..., 2] * nb_ * nb_)
    hash_win = (b[..., 0] * jnp.uint32(_PRIMES[0])
                ^ b[..., 1] * jnp.uint32(_PRIMES[1])
                ^ b[..., 2] * jnp.uint32(_PRIMES[2]))
    win = jnp.where(use_hash[None, :, None], hash_win, dense_win)
    win = win % n_win[None, :, None]    # hashed counts are 2^k; dense: safety
    idx = win * jnp.uint32(512) + local_off
    offs = jnp.asarray(spec.offsets[:-1].astype(np.uint32))
    return (idx + offs[None, :, None]).astype(jnp.int32)             # [N, L, 8]


def _corner_indices(pos_grid, spec: HashGridSpec):
    """Table index for integer grid coords pos_grid [N, L, 8, D] (uint32)."""
    if spec.layout == "block512":
        return _corner_indices_block(pos_grid, spec)
    res = jnp.asarray(spec.resolutions.astype(np.uint32))            # [L]
    side = res if spec.align_corners else res + 1                    # [L]
    sizes = jnp.asarray(spec.level_sizes.astype(np.uint32))          # [L]
    use_hash = jnp.asarray(spec.use_hash)                            # [L] bool

    side = side[None, :, None]                                       # [1, L, 1]
    # direct (tiled) index: x + y*side + z*side^2, uint32 wraparound like CUDA
    stride = jnp.ones_like(pos_grid[..., 0])
    linear = jnp.zeros_like(pos_grid[..., 0])
    for d in range(spec.input_dim):
        linear = linear + pos_grid[..., d] * stride
        stride = stride * side

    hashed = jnp.zeros_like(linear)
    for d in range(spec.input_dim):
        hashed = hashed ^ (pos_grid[..., d] * jnp.uint32(_PRIMES[d]))

    idx = jnp.where(use_hash[None, :, None], hashed, linear)
    idx = idx % sizes[None, :, None]
    offs = jnp.asarray(spec.offsets[:-1].astype(np.uint32))
    return (idx + offs[None, :, None]).astype(jnp.int32)             # [N, L, 8]


# 8 corner bit patterns for D=3, matching gridencoder.cu:166-180 bit order.
def _corner_offsets(input_dim: int) -> np.ndarray:
    n = 1 << input_dim
    out = np.zeros((n, input_dim), dtype=np.uint32)
    for i in range(n):
        for d in range(input_dim):
            out[i, d] = (i >> d) & 1
    return out


@partial(jax.jit, static_argnames=("spec",))
def hashgrid_encode(
    table: jax.Array,
    x01: jax.Array,
    spec: HashGridSpec,
    max_level: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode points.

    table: [table_size, C] parameters.
    x01:   [N, D] positions already mapped to [0, 1] (caller applies
           (x + bound) / (2 bound), grid.py:156).
    max_level: optional scalar int — levels >= max_level output zeros.
    Returns [N, L*C] features (fp32).

    TPU layout note: all big intermediates are kept as [N, L*8] (minor dim a
    multiple of 128 when L=16) — shapes ending in a small minor dim (e.g.
    [N, L, 8, C]) suffer 16-128x tile padding on TPU and OOM at scale.  The
    corner reduction is a [N, L*8] @ [L*8, L] matmul (MXU) instead of a
    reshape+sum, for the same reason.
    """
    N = x01.shape[0]
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim

    x01 = x01.astype(jnp.float32)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)                # [N]

    scales = jnp.asarray(
        [spec.level_scale(l) for l in range(L)], dtype=jnp.float32
    )                                                                 # [L]
    shift = 0.0 if spec.align_corners else 0.5
    pos = x01[:, None, :] * scales[None, :, None] + shift             # [N, L, D]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    if spec.interpolation == "smoothstep":
        frac = frac * frac * (3.0 - 2.0 * frac)
    pos_grid = pos_grid.astype(jnp.uint32)                            # [N, L, D]

    corners = _corner_offsets(D)                                      # [8, D] np
    n_cor = corners.shape[0]

    corner_grid = (pos_grid[:, :, None, :]
                   + jnp.asarray(corners)[None, None, :, :])          # [N, L, 8, D]
    idx = _corner_indices(corner_grid, spec).reshape(N, L * n_cor)    # [N, L*8]

    cmask = jnp.asarray(corners.astype(np.float32))                   # [8, D]
    w = jnp.prod(
        cmask[None, None, :, :] * frac[:, :, None, :]
        + (1.0 - cmask[None, None, :, :]) * (1.0 - frac[:, :, None, :]),
        axis=-1,
    ).reshape(N, L * n_cor)                                           # [N, L*8]

    # per-channel 1-D gathers + MXU corner-reduction.  (A per-level gather of
    # multi-channel rows was tried and is SLOWER on this backend: the [rows, C]
    # output is tile-padded to [rows, 128], and the padded writes dominate.)
    R = np.zeros((L * n_cor, L), np.float32)
    for l in range(L):
        R[l * n_cor:(l + 1) * n_cor, l] = 1.0
    R = jnp.asarray(R)

    flat_idx = idx.reshape(-1).astype(jnp.int32)                      # [N*L*8]
    feats = []
    for c in range(C):
        vals = jnp.take(table[:, c], flat_idx, axis=0).reshape(N, L * n_cor)
        feats.append(jnp.dot(w * vals, R, preferred_element_type=jnp.float32))
    feat = jnp.stack(feats, axis=-1)                                  # [N, L, C]

    level_ids = jnp.arange(L)
    if max_level is not None:
        feat = jnp.where((level_ids < max_level)[None, :, None], feat, 0.0)
    feat = jnp.where(oob[:, None, None], 0.0, feat)
    return feat.reshape(N, L * C)


@partial(jax.jit, static_argnames=("spec", "channel"))
def hashgrid_tv_loss(table: jax.Array, x01: jax.Array, spec: HashGridSpec,
                     point_weight: Optional[jax.Array] = None,
                     channel: Optional[int] = 0) -> jax.Array:
    """Total-variation loss at sampled locations.

    The reference injects, for each sampled point's cell corner and each axis d,
    the gradient of (v[corner] - v[corner + e_d])^2 directly into the embedding
    grads (gridencoder.cu:505-644).  Here we return the summed squared
    difference as a loss; d(loss)/d(table) matches that injected gradient.
    """
    N = x01.shape[0]
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim
    x01 = x01.astype(jnp.float32)
    inb = jnp.all((x01 >= 0.0) & (x01 <= 1.0), axis=-1).astype(jnp.float32)
    if point_weight is not None:
        # e.g. 10x weight for out-of-unit-box points (reference
        # utils.py:813-820 applies lambda_tv*10 to outer points)
        inb = inb * point_weight

    scales = jnp.asarray([spec.level_scale(l) for l in range(L)], dtype=jnp.float32)
    shift = 0.0 if spec.align_corners else 0.5
    pos_grid = jnp.floor(x01[:, None, :] * scales[None, :, None] + shift).astype(jnp.uint32)

    # the reference applies TV only to the DENSITY encoder (utils.py:801-823);
    # with the merged table that is channel 0.  channel=None diffs all C.
    channels = range(C) if channel is None else [channel]

    base_idx = _corner_indices(pos_grid[:, :, None, :], spec)[..., 0]   # [N, L]
    loss = jnp.zeros((), dtype=jnp.float32)
    eye = np.eye(D, dtype=np.uint32)
    for c in channels:
        flat = lambda i: jnp.take(table[:, c], i.reshape(-1), axis=0).reshape(N, L)
        v0 = flat(base_idx)
        for d in range(D):
            nb = pos_grid + jnp.asarray(eye[d])[None, None, :]
            nb_idx = _corner_indices(nb[:, :, None, :], spec)[..., 0]
            diff = v0 - flat(nb_idx)
            loss = loss + jnp.sum(diff * diff * inb[:, None])
    return loss / jnp.maximum(N, 1)
