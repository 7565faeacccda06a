"""Pallas TPU kernel: multiresolution hash encoding via VMEM block sweep.

Why: XLA lowers random gathers on this backend to ~10 ns/element scalar loops
(PERF.md), making the NGP table lookup the entire training bottleneck.  This
kernel keeps the whole (small-table) encoder in VMEM and performs lookups with
vreg-local `tpu.dynamic_gather` ops — no HBM random access at all.

Design:
  * tables are stored PADDED per level: [L, S, C] with S = 2^log2_hashmap_size
    (dense coarse levels occupy a prefix; the modulo keeps indices in range);
    the whole tensor lives in VMEM (S <= 2^14, C <= 4 -> <= 4 MB).
  * queries are laid out corner-major: one [8, 128] tile = 8 corners x 128
    points, so the trilinear corner reduction is a sublane-axis sum.
  * a 1024-entry table block is one f32 vreg [8, 128]; arbitrary lookup within
    it = broadcast each of its 8 rows and lane-gather (axis-1 dynamic_gather,
    the only general form Mosaic supports), select by row id.  A level of S
    entries is a sweep over S/1024 blocks; cost ~ 32 vector ops per block per
    tile, so this is profitable for S <= 2^14 (16 blocks).
  * forward only — the backward (table gradients) currently falls back to the
    XLA scatter formulation via custom_vjp; an in-kernel MXU-histogram
    backward is the round-2 follow-up (see PERF.md roadmap).

Gated: `sweep_supported(spec)` says whether a HashGridSpec qualifies
(3-D inputs, S <= 2^14, linear interpolation).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import HashGridSpec, _PRIMES

MAX_SWEEP_SIZE = 2 ** 14
_TILE_PTS = 128          # points per query tile (lane dim)


def sweep_supported(spec: HashGridSpec) -> bool:
    return (spec.input_dim == 3
            and spec.interpolation == "linear"
            and 2 ** spec.log2_hashmap_size <= MAX_SWEEP_SIZE)


def pad_table(table: jax.Array, spec: HashGridSpec) -> jax.Array:
    """[total, C] ragged-level layout -> [L*C, S] channel-major padded rows.

    The minor dim must be S (a multiple of 128): a [L, S, C] layout would be
    tile-padded C->128 (64 MB VMEM) and read with stride C."""
    L, C = spec.num_levels, spec.level_dim
    S = 2 ** spec.log2_hashmap_size
    offs = spec.offsets
    sizes = spec.level_sizes
    rows = []
    for l in range(L):
        part = table[offs[l]:offs[l + 1]]            # [size_l, C]
        part = jnp.pad(part, ((0, S - int(sizes[l])), (0, 0)))
        rows.append(part.T)                          # [C, S]
    return jnp.concatenate(rows, axis=0)             # [L*C, S]


def _kernel(spec: HashGridSpec, S: int, x_ref, table_ref, out_ref):
    """One program encodes _TILE_PTS points across all levels/channels.

    x_ref:    [8, 128]  (xyz in sublanes 0..2, rest padding; in [0,1])
    table_ref: [L*C, S] channel-major padded table (VMEM resident)
    out_ref:  [L*C, 128] features, level-major rows
    """
    L, C = spec.num_levels, spec.level_dim
    n_blocks = S // 1024

    x = x_ref[0:1, :]                                          # [1, 128]
    y = x_ref[1:2, :]
    z = x_ref[2:3, :]
    oob = ((x < 0.0) | (x > 1.0) | (y < 0.0) | (y > 1.0)
           | (z < 0.0) | (z > 1.0))                            # [1, 128]

    # corner bit masks along sublanes: corner c has bits (cx, cy, cz)
    cb = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    bx = (cb & 1).astype(jnp.float32)
    by = ((cb >> 1) & 1).astype(jnp.float32)
    bz = ((cb >> 2) & 1).astype(jnp.float32)

    sizes = spec.level_sizes
    use_hash = spec.use_hash
    res = spec.resolutions

    for l in range(L):
        scale = spec.level_scale(l)
        shift = 0.0 if spec.align_corners else 0.5

        px = x * scale + shift                                 # [1, 128]
        py = y * scale + shift
        pz = z * scale + shift
        gx = jnp.floor(px); fx = px - gx
        gy = jnp.floor(py); fy = py - gy
        gz = jnp.floor(pz); fz = pz - gz

        # corner integer coords [8, 128]
        cx = gx + bx
        cy = gy + by
        cz = gz + bz
        w = ((bx * fx + (1 - bx) * (1 - fx))
             * (by * fy + (1 - by) * (1 - fy))
             * (bz * fz + (1 - bz) * (1 - fz)))                # [8, 128]

        # int32 arithmetic (Mosaic lacks f32->u32 casts); multiply/xor have
        # identical bit patterns to uint32, and hashed level sizes are powers
        # of two so the mod is a mask (dense levels never need the mod).
        ix = cx.astype(jnp.int32)
        iy = cy.astype(jnp.int32)
        iz = cz.astype(jnp.int32)
        size_l = int(sizes[l])
        if use_hash[l]:
            assert size_l & (size_l - 1) == 0, "hashed level size must be 2^k"
            idx = (ix * np.int32(np.uint32(_PRIMES[0]).view(np.int32))
                   ^ iy * np.int32(np.uint32(_PRIMES[1]).view(np.int32))
                   ^ iz * np.int32(np.uint32(_PRIMES[2]).view(np.int32))
                   ) & (size_l - 1)
        else:
            side = int(res[l]) + (0 if spec.align_corners else 1)
            idx = ix + iy * side + iz * side * side            # < size_l

        row = idx >> 7                                          # block-row id
        lane = idx & 127

        for c in range(C):
            # whole level-channel row as a VALUE, statically unrolled sweep:
            # an in-kernel fori_loop + dynamic-slice variant of this measured
            # ~1000x slower (per-iteration Mosaic overhead); this form runs at
            # ~12 us per 128-point tile.
            tab = table_ref[l * C + c, :].reshape(S // 128, 128)
            acc = jnp.zeros((8, 128), jnp.float32)
            for b in range(n_blocks):
                for r in range(8):
                    tr = tab[b * 8 + r:b * 8 + r + 1, :]
                    trb = jnp.broadcast_to(tr, (8, 128))
                    got = jnp.take_along_axis(trb, lane, axis=1)
                    acc = jnp.where(row == b * 8 + r, got, acc)
            feat = jnp.sum(w * acc, axis=0, keepdims=True)      # [1, 128]
            feat = jnp.where(oob, 0.0, feat)
            out_ref[l * C + c:l * C + c + 1, :] = feat


def _fwd_pallas(table_padded: jax.Array, x01: jax.Array,
                spec: HashGridSpec) -> jax.Array:
    """x01 [N, 3] -> [N, L*C]; N must be a multiple of 128 (caller pads)."""
    N = x01.shape[0]
    L, C = spec.num_levels, spec.level_dim
    S = table_padded.shape[1]
    n_tiles = N // _TILE_PTS

    xt = x01.astype(jnp.float32).T.reshape(3, n_tiles, _TILE_PTS)
    xt = xt.transpose(1, 0, 2)                                 # [tiles, 3, 128]
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, 0)))                 # sublane pad to 8
    xt = xt.reshape(n_tiles * 8, _TILE_PTS)

    out = pl.pallas_call(
        partial(_kernel, spec, S),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, _TILE_PTS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * C, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L * C, _TILE_PTS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * L * C, _TILE_PTS),
                                       jnp.float32),
    )(xt, table_padded)

    out = out.reshape(n_tiles, L * C, _TILE_PTS).transpose(0, 2, 1)
    return out.reshape(N, L * C)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sweep_encode(table: jax.Array, x01: jax.Array,
                 spec: HashGridSpec) -> jax.Array:
    """Drop-in for hashgrid_encode (without max_level masking) on qualifying
    specs.  table is the RAGGED [total, C] parameter tensor; padding to
    [L, S, C] happens here (cheap dense op, fused by XLA)."""
    return _sweep_fwd_impl(table, x01, spec)


_CHUNK = 32768   # keep each pallas output ~6 MB: XLA stack-allocates the
                 # custom-call result in VMEM when the call sits in a loop body


def _sweep_fwd_impl(table, x01, spec):
    N = x01.shape[0]
    pad = (-N) % _TILE_PTS
    xp = jnp.pad(x01, ((0, pad), (0, 0)))
    padded = pad_table(table, spec)
    outs = [
        _fwd_pallas(padded, xp[h:h + _CHUNK], spec)
        for h in range(0, xp.shape[0], _CHUNK)
    ]
    return jnp.concatenate(outs, axis=0)[:N] if len(outs) > 1 else outs[0][:N]


def _sweep_fwd(table, x01, spec):
    return _sweep_fwd_impl(table, x01, spec), (table, x01)


def _sweep_bwd(spec, res, g):
    """Manual backward: recompute corner indices/weights densely (cheap) and
    scatter-add gradients per channel.  Input grads use gathered corner values
    and are structured so XLA DCEs them when unused (stage 0 never consumes
    them; stage 1 does only under enable_offset_nerf_grad).
    Round-2: in-kernel MXU-histogram backward (PERF.md)."""
    from .hashgrid import _corner_indices, _corner_offsets
    table, x01 = res
    N = x01.shape[0]
    L, C, D = spec.num_levels, spec.level_dim, spec.input_dim
    n_cor = 1 << D

    x01f = x01.astype(jnp.float32)
    oob = jnp.any((x01f < 0.0) | (x01f > 1.0), axis=-1)
    scales = jnp.asarray([spec.level_scale(l) for l in range(L)], jnp.float32)
    shift = 0.0 if spec.align_corners else 0.5
    pos = x01f[:, None, :] * scales[None, :, None] + shift
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    corners = _corner_offsets(D)
    corner_grid = (pos_grid.astype(jnp.uint32)[:, :, None, :]
                   + jnp.asarray(corners)[None, None, :, :])
    idx = _corner_indices(corner_grid, spec).reshape(N, L * n_cor)
    cmask = jnp.asarray(corners.astype(np.float32))
    per_dim = (cmask[None, None, :, :] * frac[:, :, None, :]
               + (1.0 - cmask[None, None, :, :]) * (1.0 - frac[:, :, None, :]))
    w = jnp.prod(per_dim, axis=-1).reshape(N, L * n_cor)
    w = jnp.where(oob[:, None], 0.0, w)

    g3 = g.reshape(N, L, C)
    flat_idx = idx.reshape(-1).astype(jnp.int32)

    dcols = []
    for c in range(C):
        gc = jnp.repeat(g3[:, :, c], n_cor, axis=1)           # [N, L*8]
        contrib = (w * gc).reshape(-1)
        dcols.append(jnp.zeros((table.shape[0],), jnp.float32)
                     .at[flat_idx].add(contrib))
    dtable = jnp.stack(dcols, axis=-1)

    # input grads: dfeat/dx_d = scale_l * sum_corners v * dprod/dfrac_d
    vals = [jnp.take(table[:, c], flat_idx, axis=0).reshape(N, L, n_cor)
            for c in range(C)]
    sgn = (2.0 * cmask - 1.0)                                  # [8, D]
    dx = jnp.zeros_like(x01f)
    for d in range(D):
        others = [dd for dd in range(D) if dd != d]
        dw = sgn[None, None, :, d]
        for od in others:
            dw = dw * per_dim[:, :, :, od]
        acc = jnp.zeros((N, L), jnp.float32)
        for c in range(C):
            acc = acc + jnp.sum(vals[c] * dw, axis=-1) * g3[:, :, c]
        dx = dx.at[:, d].set(jnp.sum(acc * scales[None, :], axis=1))
    dx = jnp.where(oob[:, None], 0.0, dx)

    return dtable, dx.astype(x01.dtype)


sweep_encode.defvjp(_sweep_fwd, _sweep_bwd)
