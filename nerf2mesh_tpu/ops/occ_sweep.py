"""Bit-packed occupancy lookup as a VMEM vreg sweep (Pallas).

The sampler tests one occupancy cell per coarse candidate
(ops/sampling.py occupancy_lookup); as an XLA gather that is ~10ns/row
serial (PERF.md) and becomes the step bottleneck once ray counts scale.
The whole grid fits VMEM as BITS: CAS x 128^3 cells = CAS x 256 KB packed
into int32 words laid out [CAS*512, 128].  Arbitrary lookup within a
[1,128] word row = broadcast + lane-wise dynamic gather + row select —
the vreg-local composition Mosaic supports (see ops/pallas_encode.py) —
so a full sweep costs ~2 vector ops per sample per cascade instead of a
serial HBM gather.

Replaces the performance role of the reference's Morton bitfield +
`packbits` (raymarching.cu:267-300) whose point was the same: make the
occupancy test memory-trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024           # points per grid step ([8, 128] index tile)


def sweep_supported(cascades: int, grid_size: int) -> bool:
    bits = cascades * grid_size ** 3
    return bits % (32 * 128 * 8) == 0 and bits // 32 <= 128 * 4096


def pack_bits(occ_grid: jax.Array) -> jax.Array:
    """[CAS, H, H, H] uint8 -> [CAS*H^3/32/128, 128] int32 words.

    Bit i of word w holds cell n = 32*w + i with n the row-major linear
    index ((cas*H + x)*H + y)*H + z — matching occupancy_lookup's flat
    index.
    """
    bits = (occ_grid.reshape(-1) > 0).astype(jnp.int32).reshape(-1, 32)
    weights = jnp.asarray((np.uint32(1) << np.arange(32)).astype(np.int64)
                          % (1 << 32), jnp.uint32)
    words = jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1,
                    dtype=jnp.uint32)
    return words.astype(jnp.int32).reshape(-1, 128)


def _kernel(n_rows: int, idx_ref, bits_ref, out_ref):
    n = idx_ref[0]                                   # [8,128] linear cell idx
    word = n >> 5
    bit = n & 31
    row = word >> 7
    lane = word & 127
    acc = jnp.zeros((8, 128), jnp.int32)
    for r in range(n_rows):
        trb = jnp.broadcast_to(bits_ref[r:r + 1, :], (8, 128))
        got = jnp.take_along_axis(trb, lane, axis=1)
        acc = jnp.where(row == r, got, acc)
    out_ref[0] = (acc >> bit) & 1


def occ_lookup_sweep(occ_words: jax.Array, flat_idx: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """occ_words: pack_bits output [R, 128]; flat_idx: [...] int32 linear
    cell indices (must be in range).  Returns int32 0/1 of flat_idx shape."""
    shape = flat_idx.shape
    n = int(np.prod(shape))
    pad = (-n) % _BLOCK
    fi = jnp.pad(flat_idx.reshape(-1), (0, pad)).reshape(-1, 8, 128)
    R = occ_words.shape[0]
    n_blocks = fi.shape[0]
    out = pl.pallas_call(
        partial(_kernel, R),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32),
        interpret=interpret,
    )(fi, occ_words)
    return out.reshape(-1)[:n].reshape(shape)
