"""Splat-contraction hash encoder: MXU matmuls instead of gathers.

The hash-table lookup dominates the stage-0 step on this backend (PERF.md:
XLA lowers random gather/scatter to ~10ns/row serial loops; 947 ms/step at the
default 2^19 tables).  This module replaces the per-corner gather with dense
MXU contractions over VMEM-resident table *windows*:

Trilinear interpolation is separable: with one-hot-ish per-axis weight vectors
wx/wy/wz (two nonzeros each: (1-f) at floor, f at floor+1),

    feat[c,p] = sum_{x,y,z} T[c,x,y,z] * wx[x,p] * wy[y,p] * wz[z,p].

For a tile of 128 points contained in a 2x2x2 neighborhood of 8^3 table
blocks (the "block512" layout of ops/hashgrid.py — hashing happens at block
granularity so spatially-local points share whole windows), the sum over the
16^3 virtual lattice becomes 4 matmuls per (tile, level):

    M[(sx,c,x), p]   = sum_{(sy,sz)} T_pair[(sx,c,x),(y,z)] @ W_pair[(y,z), p]
    feat[c,p]        = sum_{sx,x} M[(sx,c,x), p] * wx[8*sx+x, p]

Corners whose local coords fall outside the 16^3 neighborhood contribute zero
in-kernel (the one-hot weights vanish outside [0,16)) and are repaired EXACTLY
by a budgeted XLA residual gather — so the op equals `hashgrid_encode` to
float tolerance regardless of how local the points are; locality only moves
work between the fast kernel and the residual.

Replaces the performance role of the reference CUDA gridencoder
(/root/reference/gridencoder/src/gridencoder.cu:87-339); numerics match
ops/hashgrid.hashgrid_encode on layout="block512" specs.

Layouts:
  canonical table  [total, C]      (hashgrid.py block512: idx = off_l +
                                    win*512 + (x&7) + 8*(y&7) + 64*(z&7))
  splat table      [Wtot, 8*C, 64] window rows; row r = c*8 + x,
                                    lane j = 8*z + y.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import (HashGridSpec, _PRIMES, _corner_indices,
                       _corner_offsets, hashgrid_encode)

TILE = 128          # points per tile (lane dim)


# ---------------------------------------------------------------------------
# static helpers
# ---------------------------------------------------------------------------

def splat_supported(spec: HashGridSpec) -> bool:
    return (spec.layout == "block512" and spec.input_dim == 3
            and spec.interpolation == "linear")


def window_counts(spec: HashGridSpec) -> np.ndarray:
    return (spec.level_sizes // 512).astype(np.int64)


def window_offsets(spec: HashGridSpec) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(window_counts(spec))]).astype(np.int64)


# ---------------------------------------------------------------------------
# layout transforms (dense reshuffles — XLA transposes, no gathers)
# ---------------------------------------------------------------------------

def to_splat(table: jax.Array, spec: HashGridSpec) -> jax.Array:
    """[total, C] canonical block512 -> [Wtot, 8*C, 64] splat windows."""
    C = spec.level_dim
    # canonical in-window offset = x + 8y + 64z -> [win, z, y, x, C]
    t = table.reshape(-1, 8, 8, 8, C)
    # -> [win, C, x, z, y]; row r = c*8+x, lane j = 8z+y
    t = t.transpose(0, 4, 3, 1, 2)
    return t.reshape(-1, 8 * C, 64)


def from_splat(splat: jax.Array, spec: HashGridSpec) -> jax.Array:
    """[Wtot, 8*C, 64] -> [total, C] (inverse of to_splat)."""
    C = spec.level_dim
    t = splat.reshape(-1, C, 8, 8, 8)        # [win, c, x, z, y]
    t = t.transpose(0, 3, 4, 2, 1)           # [win, z, y, x, c]
    return t.reshape(-1, C)


# ---------------------------------------------------------------------------
# per-(tile, level) window metadata (XLA; feeds kernel SMEM inputs)
# ---------------------------------------------------------------------------

def _level_consts(spec: HashGridSpec, l: int):
    n_win = int(window_counts(spec)[l])
    woff = int(window_offsets(spec)[l])
    nb = int(spec.block_counts[l])
    use_hash = bool(spec.use_hash[l])
    scale = spec.level_scale(l)
    return n_win, woff, nb, use_hash, scale


def tile_meta(x_tiles: jax.Array, spec: HashGridSpec, l: int):
    """Per-tile base block + the 8 neighborhood window rows for level l.

    x_tiles: [n_tiles, TILE, 3] clipped positions in [0,1].
    Returns (base [n_tiles, 3] int32 block coords,
             rows [n_tiles, 8] int32 level-LOCAL window ids); slot bit order
    matches the corner bit order (bit0=x, bit1=y, bit2=z).
    """
    n_win, _, nb, use_hash, scale = _level_consts(spec, l)
    shift = 0.0 if spec.align_corners else 0.5
    pg = jnp.floor(x_tiles.astype(jnp.float32) * scale + shift)     # [T,128,3]
    base = (jnp.min(pg, axis=1).astype(jnp.int32) >> 3)             # [T,3]

    # slot bit order matches corners: slot s = sx + 2*sy + 4*sz
    slots = np.array([[s & 1, (s >> 1) & 1, (s >> 2) & 1] for s in range(8)])
    b = base[:, None, :] + jnp.asarray(slots, jnp.int32)[None]      # [T,8,3]
    bu = b.astype(jnp.uint32)
    if use_hash:
        win = (bu[..., 0] * jnp.uint32(_PRIMES[0])
               ^ bu[..., 1] * jnp.uint32(_PRIMES[1])
               ^ bu[..., 2] * jnp.uint32(_PRIMES[2]))
    else:
        win = bu[..., 0] + bu[..., 1] * jnp.uint32(nb) \
            + bu[..., 2] * jnp.uint32(nb * nb)
    win = (win % jnp.uint32(n_win)).astype(jnp.int32)
    return base, win


# ---------------------------------------------------------------------------
# XLA reference of the in-window contraction (exactness oracle for the kernel)
# ---------------------------------------------------------------------------

def _axis_weights(pg, frac, bb):
    """One-hot-ish [.., 16] weights on the local 16-lattice for one axis."""
    lg = pg - 8.0 * bb[..., None, :].astype(jnp.float32)            # local floor
    rows = jnp.arange(16, dtype=jnp.float32)
    # [T, P, 3] -> per axis [T, P, 16]
    def one(a):
        g = lg[..., a][..., None]
        f = frac[..., a][..., None]
        return (jnp.where(rows == g, 1.0 - f, 0.0)
                + jnp.where(rows == g + 1.0, f, 0.0))
    return one(0), one(1), one(2)


def windowed_reference(table: jax.Array, x_tiles: jax.Array,
                       spec: HashGridSpec) -> jax.Array:
    """In-window part of the encoding, computed the way the kernel does
    (gather windows, contract against separable weights).  [n_tiles, TILE,
    L, C].  Test-only oracle; O(n_tiles * 8 windows) row gathers."""
    L, C = spec.num_levels, spec.level_dim
    T = x_tiles.shape[0]
    splat = to_splat(table, spec)                                   # [W, 8C, 64]
    shift = 0.0 if spec.align_corners else 0.5
    out = []
    for l in range(L):
        _, woff, _, _, scale = _level_consts(spec, l)
        base, rows = tile_meta(x_tiles, spec, l)
        p = x_tiles.astype(jnp.float32) * scale + shift
        pg = jnp.floor(p)
        frac = p - pg
        wx, wy, wz = _axis_weights(pg, frac, base)                  # [T,P,16]
        wins = jnp.take(splat, rows + woff, axis=0)                 # [T,8,8C,64]
        wins = wins.reshape(T, 2, 2, 2, C, 8, 8, 8)                 # [T,sz,sy,sx,c,x,z,y]
        # slot s = sx + 2 sy + 4 sz -> reshape(2,2,2) unpacks (sz,sy,sx)
        wxs = wx.reshape(T, -1, 2, 8)                               # [T,P,sx,x]
        wys = wy.reshape(T, -1, 2, 8)
        wzs = wz.reshape(T, -1, 2, 8)
        feat = jnp.einsum("tZYXcxzy,tpXx,tpYy,tpZz->tpc",
                          wins, wxs, wys, wzs)
        out.append(feat)
    return jnp.stack(out, axis=2)                                   # [T,P,L,C]


def inwindow_mask(x_tiles: jax.Array, spec: HashGridSpec) -> jax.Array:
    """[n_tiles, TILE, L, 8corners] bool: corner handled by the kernel."""
    L = spec.num_levels
    shift = 0.0 if spec.align_corners else 0.5
    corners = np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)])
    masks = []
    for l in range(L):
        scale = _level_consts(spec, l)[4]
        p = x_tiles.astype(jnp.float32) * scale + shift
        pg = jnp.floor(p)
        base, _ = tile_meta(x_tiles, spec, l)
        cg = pg[:, :, None, :] + jnp.asarray(corners, jnp.float32)  # [T,P,8,3]
        local = cg - 8.0 * base[:, None, None, :].astype(jnp.float32)
        masks.append(jnp.all((local >= 0) & (local < 16), axis=-1))
    return jnp.stack(masks, axis=2)                                 # [T,P,L,8]


# ---------------------------------------------------------------------------
# Pallas kernels (one specialized call per level; static level constants)
# ---------------------------------------------------------------------------

def _axis_w(iota_rows, lg, f):
    """One-hot-ish weights on [R,128] from local floor lg and frac f [1,128]."""
    return (jnp.where(iota_rows == lg, 1.0 - f, 0.0)
            + jnp.where(iota_rows == lg + 1.0, f, 0.0))


def _local_fracs(x_ref, base_ref, t, scale, shift):
    """Shared fwd/bwd prologue: local floors + fracs for one tile."""
    px = x_ref[0:1, :] * scale + shift
    py = x_ref[1:2, :] * scale + shift
    pz = x_ref[2:3, :] * scale + shift
    gx = jnp.floor(px); fx = px - gx
    gy = jnp.floor(py); fy = py - gy
    gz = jnp.floor(pz); fz = pz - gz
    lgx = gx - 8.0 * base_ref[3 * t].astype(jnp.float32)
    lgy = gy - 8.0 * base_ref[3 * t + 1].astype(jnp.float32)
    lgz = gz - 8.0 * base_ref[3 * t + 2].astype(jnp.float32)
    return (lgx, fx), (lgy, fy), (lgz, fz)


def _iotas():
    """[64,128] row -> (y = j%8, z = j//8) site coords; [48,128] row -> x."""
    j = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    iy = (j & 7).astype(jnp.float32)
    iz = (j >> 3).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (48, 128), 0)
    ix = ((r & 7) + 8 * (r // 24)).astype(jnp.float32)  # row = sx*24+c*8+x
    return iy, iz, ix


def _fwd_kernel(scale, shift, base_ref, rows_ref, x_ref, tab_ref, out_ref):
    t = pl.program_id(0)
    (lgx, fx), (lgy, fy), (lgz, fz) = _local_fracs(x_ref, base_ref, t,
                                                   scale, shift)
    iy, iz, ix = _iotas()

    m = jnp.zeros((48, 128), jnp.float32)
    for sy in (0, 1):
        wyp = _axis_w(iy + 8.0 * sy, lgy, fy)                    # [64,128]
        for sz in (0, 1):
            wzp = _axis_w(iz + 8.0 * sz, lgz, fz)
            rhs = wyp * wzp
            s0 = 2 * sy + 4 * sz
            lhs = jnp.concatenate(
                [tab_ref[rows_ref[8 * t + s0]], tab_ref[rows_ref[8 * t + s0 + 1]]],
                axis=0)                                          # [48,64]
            m = m + jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    wx48 = _axis_w(ix, lgx, fx)                                  # [48,128]
    p = m * wx48
    for c in range(3):
        out_ref[c:c + 1, :] = jnp.sum(
            p[c * 8:(c + 1) * 8] + p[24 + c * 8:32 + c * 8],
            axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros((5, 128), jnp.float32)


def _bwd_kernel(scale, shift, base_ref, rows_ref, x_ref, g_ref, dtab_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    (lgx, fx), (lgy, fy), (lgz, fz) = _local_fracs(x_ref, base_ref, t,
                                                   scale, shift)
    iy, iz, ix = _iotas()

    g24 = jnp.concatenate(
        [jnp.broadcast_to(g_ref[c:c + 1, :], (8, 128)) for c in range(3)],
        axis=0)                                                  # rows c*8+x
    gx48 = jnp.concatenate([g24, g24], axis=0) * _axis_w(ix, lgx, fx)

    for sy in (0, 1):
        wyp = _axis_w(iy + 8.0 * sy, lgy, fy)
        for sz in (0, 1):
            wzp = _axis_w(iz + 8.0 * sz, lgz, fz)
            rhs = wyp * wzp                                      # [64,128]
            dt = jax.lax.dot_general(
                gx48, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [48,64]
            s0 = 2 * sy + 4 * sz
            r0 = rows_ref[8 * t + s0]
            r1 = rows_ref[8 * t + s0 + 1]
            # sequential read-modify-writes stay correct under window-id
            # collisions between the two sx slots
            dtab_ref[r0] = dtab_ref[r0] + dt[0:24]
            dtab_ref[r1] = dtab_ref[r1] + dt[24:48]


def _level_pallas_fwd(x_t, bases, rows, tab_l, spec, l, interpret=False):
    n_tiles = x_t.shape[0] // 8
    n_win = tab_l.shape[0]
    scale = _level_consts(spec, l)[4]
    shift = 0.0 if spec.align_corners else 0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # bases, rows (whole arrays in SMEM)
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, b, r: (t, 0)),
            pl.BlockSpec((n_win, 24, 64), lambda t, b, r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda t, b, r: (t, 0)),
    )
    return pl.pallas_call(
        partial(_fwd_kernel, scale, shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, TILE), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), rows.reshape(-1), x_t, tab_l)


def _level_pallas_bwd(x_t, bases, rows, g_t, n_win, spec, l, interpret=False):
    n_tiles = x_t.shape[0] // 8
    scale = _level_consts(spec, l)[4]
    shift = 0.0 if spec.align_corners else 0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, b, r: (t, 0)),
            pl.BlockSpec((8, TILE), lambda t, b, r: (t, 0)),
        ],
        out_specs=pl.BlockSpec((n_win, 24, 64), lambda t, b, r: (0, 0, 0)),
    )
    return pl.pallas_call(
        partial(_bwd_kernel, scale, shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, 24, 64), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), rows.reshape(-1), x_t, g_t)


# ---------------------------------------------------------------------------
# window-sorted single-block kernels for fine (hashed) levels
#
# Fine levels have no 128-point SPATIAL locality (PERF.md: mean
# nearest-neighbor distance ~12 cells at the finest level), but in the
# block512 layout a level has only table_size/512 windows (1024 at the 2^19
# default) — so sorting the points BY WINDOW ID makes 128-point tiles touch
# 1-2 windows, and the in-BLOCK part of each point's trilinear stencil
# becomes one [24,64]x[64,128] MXU matmul per (tile, window-slot).  Corners
# that cross into a neighbor block (~18% for uniformly placed points: the
# corner's block hashes elsewhere) are repaired exactly by a budgeted
# residual gather, like the kernel group's.
# ---------------------------------------------------------------------------


def _ws_geom(x_ref, scale, shift):
    """Per-point own-block local floors + fracs (no tile-shared base)."""
    def one(row):
        p = x_ref[row:row + 1, :] * scale + shift
        g = jnp.floor(p)
        f = p - g
        lg = g - 8.0 * jnp.floor(g * 0.125)          # g mod 8, exact in f32
        return lg, f
    return one(0), one(1), one(2)


def _ws_fwd_kernel(scale, shift, rows_ref, x_ref, tab_ref, out_ref):
    t = pl.program_id(0)
    (lgx, fx), (lgy, fy), (lgz, fz) = _ws_geom(x_ref, scale, shift)
    wp = x_ref[3:4, :]                                # point window id (float)

    j = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    iy = (j & 7).astype(jnp.float32)
    iz = (j >> 3).astype(jnp.float32)
    r24 = jax.lax.broadcasted_iota(jnp.int32, (24, 128), 0)
    ix24 = (r24 & 7).astype(jnp.float32)              # row = c*8 + x

    wyz = _axis_w(iy, lgy, fy) * _axis_w(iz, lgz, fz)             # [64,128]
    w0 = rows_ref[2 * t]
    w1 = rows_ref[2 * t + 1]
    m = jnp.zeros((24, 128), jnp.float32)
    for s in (0, 1):
        ws = rows_ref[2 * t + s]
        hit = (wp == ws.astype(jnp.float32))
        if s == 1:
            hit = jnp.logical_and(hit, w1 != w0)
        rhs = wyz * hit.astype(jnp.float32)
        m = m + jax.lax.dot_general(
            tab_ref[ws], rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    p = m * _axis_w(ix24, lgx, fx)
    for c in range(3):
        out_ref[c:c + 1, :] = jnp.sum(p[c * 8:(c + 1) * 8], axis=0,
                                      keepdims=True)
    out_ref[3:8, :] = jnp.zeros((5, 128), jnp.float32)


def _ws_bwd_kernel(scale, shift, rows_ref, x_ref, g_ref, dtab_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dtab_ref[...] = jnp.zeros_like(dtab_ref)

    (lgx, fx), (lgy, fy), (lgz, fz) = _ws_geom(x_ref, scale, shift)
    wp = x_ref[3:4, :]

    j = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    iy = (j & 7).astype(jnp.float32)
    iz = (j >> 3).astype(jnp.float32)
    r24 = jax.lax.broadcasted_iota(jnp.int32, (24, 128), 0)
    ix24 = (r24 & 7).astype(jnp.float32)

    wyz = _axis_w(iy, lgy, fy) * _axis_w(iz, lgz, fz)             # [64,128]
    g24 = jnp.concatenate(
        [jnp.broadcast_to(g_ref[c:c + 1, :], (8, 128)) for c in range(3)],
        axis=0)
    gx24 = g24 * _axis_w(ix24, lgx, fx)                           # [24,128]

    w0 = rows_ref[2 * t]
    w1 = rows_ref[2 * t + 1]
    for s in (0, 1):
        ws = rows_ref[2 * t + s]
        hit = (wp == ws.astype(jnp.float32))
        if s == 1:
            hit = jnp.logical_and(hit, w1 != w0)
        lhs = gx24 * hit.astype(jnp.float32)
        dt = jax.lax.dot_general(
            lhs, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [24,64]
        # sequential read-modify-write; correct when w0 == w1 too (masks
        # are then disjoint by construction)
        dtab_ref[ws] = dtab_ref[ws] + dt


def _ws_level_fwd(x_t, rows, tab_l, spec, l, interpret=False):
    n_tiles = x_t.shape[0] // 8
    n_win = tab_l.shape[0]
    scale = _level_consts(spec, l)[4]
    shift = 0.0 if spec.align_corners else 0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                        # rows [n_tiles*2] SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, r: (t, 0)),
            pl.BlockSpec((n_win, 24, 64), lambda t, r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, TILE), lambda t, r: (t, 0)),
    )
    return pl.pallas_call(
        partial(_ws_fwd_kernel, scale, shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, TILE), jnp.float32),
        interpret=interpret,
    )(rows.reshape(-1), x_t, tab_l)


def _ws_level_bwd(x_t, rows, g_t, n_win, spec, l, interpret=False):
    n_tiles = x_t.shape[0] // 8
    scale = _level_consts(spec, l)[4]
    shift = 0.0 if spec.align_corners else 0.5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, r: (t, 0)),
            pl.BlockSpec((8, TILE), lambda t, r: (t, 0)),
        ],
        out_specs=pl.BlockSpec((n_win, 24, 64), lambda t, r: (0, 0, 0)),
    )
    return pl.pallas_call(
        partial(_ws_bwd_kernel, scale, shift),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win, 24, 64), jnp.float32),
        interpret=interpret,
    )(rows.reshape(-1), x_t, g_t)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _inwin_ws(splat, x_ws, rows, spec, levels, interpret):
    return _inwin_ws_fwd_impl(splat, x_ws, rows, spec, levels, interpret)


def _inwin_ws_fwd_impl(splat, x_ws, rows, spec, levels, interpret):
    woffs = window_offsets(spec)
    outs = []
    for i, l in enumerate(levels):
        tab_l = jax.lax.slice_in_dim(splat, int(woffs[l]), int(woffs[l + 1]))
        outs.append(_ws_level_fwd(x_ws[i], rows[i], tab_l, spec, l, interpret))
    return jnp.stack(outs, axis=0)            # [len(levels), n_tiles*8, 128]


def _inwin_ws_fwd(splat, x_ws, rows, spec, levels, interpret):
    out = _inwin_ws_fwd_impl(splat, x_ws, rows, spec, levels, interpret)
    return out, (x_ws, rows)


def _inwin_ws_bwd(spec, levels, interpret, res, g):
    x_ws, rows = res
    wc = window_counts(spec)
    parts = {}
    for i, l in enumerate(levels):
        parts[l] = _ws_level_bwd(x_ws[i], rows[i], g[i], int(wc[l]),
                                 spec, l, interpret)
    dts = []
    for l in range(spec.num_levels):
        if l in parts:
            dts.append(parts[l])
        else:
            dts.append(jnp.zeros((int(wc[l]), 24, 64), jnp.float32))
    return jnp.concatenate(dts, axis=0), jnp.zeros_like(x_ws), None


_inwin_ws.defvjp(_inwin_ws_fwd, _inwin_ws_bwd)


def _point_windows(xc, oob, spec, l):
    """Level-local window id of each point's OWN block; -1 for oob points."""
    n_win, _, nb, use_hash, scale = _level_consts(spec, l)
    shift = 0.0 if spec.align_corners else 0.5
    g = jnp.floor(xc.astype(jnp.float32) * scale + shift)
    b = (g.astype(jnp.int32) >> 3).astype(jnp.uint32)
    if use_hash:
        win = (b[:, 0] * jnp.uint32(_PRIMES[0])
               ^ b[:, 1] * jnp.uint32(_PRIMES[1])
               ^ b[:, 2] * jnp.uint32(_PRIMES[2]))
    else:
        win = b[:, 0] + b[:, 1] * jnp.uint32(nb) \
            + b[:, 2] * jnp.uint32(nb * nb)
    win = (win % jnp.uint32(n_win)).astype(jnp.int32)
    return jnp.where(oob, jnp.int32(-1), win)


# ---------------------------------------------------------------------------
# custom-vjp in-window op (kernel fwd + kernel bwd); residual is plain JAX
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _inwin(splat, x_t, bases, rows, spec, levels, interpret):
    return _inwin_fwd_impl(splat, x_t, bases, rows, spec, levels, interpret)


def _inwin_fwd_impl(splat, x_t, bases, rows, spec, levels, interpret):
    woffs = window_offsets(spec)
    outs = []
    for i, l in enumerate(levels):
        tab_l = jax.lax.slice_in_dim(splat, int(woffs[l]), int(woffs[l + 1]))
        outs.append(_level_pallas_fwd(x_t, bases[i], rows[i], tab_l,
                                      spec, l, interpret))
    return jnp.stack(outs, axis=0)              # [len(levels), n_tiles*8, 128]


def _inwin_fwd(splat, x_t, bases, rows, spec, levels, interpret):
    out = _inwin_fwd_impl(splat, x_t, bases, rows, spec, levels, interpret)
    return out, (x_t, bases, rows)


def _inwin_bwd(spec, levels, interpret, res, g):
    x_t, bases, rows = res
    wc = window_counts(spec)
    woffs = window_offsets(spec)
    Wtot = int(woffs[-1])
    parts = {}
    for i, l in enumerate(levels):
        parts[l] = _level_pallas_bwd(x_t, bases[i], rows[i], g[i],
                                     int(wc[l]), spec, l, interpret)
    dts = []
    for l in range(spec.num_levels):
        if l in parts:
            dts.append(parts[l])
        else:
            dts.append(jnp.zeros((int(wc[l]), 24, 64), jnp.float32))
    dsplat = jnp.concatenate(dts, axis=0)
    assert dsplat.shape[0] == Wtot
    return dsplat, jnp.zeros_like(x_t), None, None


_inwin.defvjp(_inwin_fwd, _inwin_bwd)


# ---------------------------------------------------------------------------
# fine-level gather path with a scatter-controlled backward
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """take(table, idx, axis=0) whose backward is C separate width-1
    scatter-adds — measured ~2x faster than XLA's width-C scatter on this
    backend (workspace/ab/microbench_scatter.py)."""
    return jnp.take(table, idx, axis=0)


def _gather_rows_fwd(table, idx):
    return jnp.take(table, idx, axis=0), (idx, table.shape)


def _gather_rows_bwd(res, g):
    idx, tshape = res
    cols = [jnp.zeros((tshape[0],), g.dtype).at[idx].add(g[:, c])
            for c in range(tshape[1])]
    return jnp.stack(cols, axis=-1), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _corner_indices_level(cg, spec: HashGridSpec, l: int):
    """Canonical block512 table index for ONE level; cg [N, 8, 3] uint32.
    Same math as hashgrid._corner_indices_block restricted to level l."""
    n_win, woff_entries, nb, use_hash, _ = _level_consts(spec, l)
    b = cg >> jnp.uint32(3)
    loc = cg & jnp.uint32(7)
    local_off = loc[..., 0] + loc[..., 1] * jnp.uint32(8) \
        + loc[..., 2] * jnp.uint32(64)
    if use_hash:
        win = (b[..., 0] * jnp.uint32(_PRIMES[0])
               ^ b[..., 1] * jnp.uint32(_PRIMES[1])
               ^ b[..., 2] * jnp.uint32(_PRIMES[2]))
    else:
        win = b[..., 0] + b[..., 1] * jnp.uint32(nb) \
            + b[..., 2] * jnp.uint32(nb * nb)
    win = win % jnp.uint32(n_win)
    off = jnp.uint32(spec.offsets[l])
    return (win * jnp.uint32(512) + local_off + off).astype(jnp.int32)


def _corner_geometry(xc, spec, bases):
    """Canonical corner indices + weights + residual mask for clipped pts.

    xc: [N, 3] in [0,1]; bases: [L, T, 3] per-level tile base blocks.
    Returns (idx [N, L*8] int32, w_all [N, L*8], w_resid [N, L*8] — weights
    zeroed on in-window corners).
    """
    N = xc.shape[0]
    L = spec.num_levels
    shift = 0.0 if spec.align_corners else 0.5
    corners = _corner_offsets(3)
    cm = jnp.asarray(corners.astype(np.float32))

    # per-level loop: the all-level [N, L, 8, 3] corner grid is ~640 MB at
    # pool scale and HBM-OOMs the step; per-level intermediates are [N,8,3]
    # with short liveness
    idx_l, w_l, wr_l = [], [], []
    for l in range(L):
        pos = xc * jnp.float32(spec.level_scale(l)) + shift      # [N,3]
        pg = jnp.floor(pos)
        frac = pos - pg
        cgrid = pg.astype(jnp.uint32)[:, None, :] \
            + jnp.asarray(corners)[None]                         # [N,8,3]
        idx_l.append(_corner_indices_level(cgrid, spec, l))
        w = jnp.prod(cm[None] * frac[:, None, :]
                     + (1 - cm[None]) * (1 - frac[:, None, :]), -1)  # [N,8]
        w_l.append(w)
        basef = 8.0 * jnp.repeat(bases[l].astype(jnp.float32),
                                 TILE, axis=0)                   # [N,3]
        local = (pg[:, None, :] + jnp.asarray(corners, jnp.float32)[None]
                 - basef[:, None, :])                            # [N,8,3]
        inw = jnp.all((local >= 0) & (local < 16), axis=-1)      # [N,8]
        wr_l.append(jnp.where(inw, 0.0, w))

    idx = jnp.stack(idx_l, axis=1).reshape(N, L * 8)
    w = jnp.stack(w_l, axis=1).reshape(N, L * 8)
    wr = jnp.stack(wr_l, axis=1).reshape(N, L * 8)
    return idx, w, wr


def _fallback_feat(table, idx, w_all, oob, spec):
    """Full-gather encode reusing precomputed corner geometry (the old XLA
    path, taken only when the residual overflows its budget)."""
    N = idx.shape[0]
    L, C = spec.num_levels, spec.level_dim
    w = jnp.where(oob[:, None], 0.0, w_all)
    flat = idx.reshape(-1)
    feat = jnp.zeros((N, L, C))
    for c in range(C):
        v = jnp.take(table[:, c], flat, axis=0).reshape(N, L, 8)
        feat = feat.at[:, :, c].set(jnp.sum(w.reshape(N, L, 8) * v, -1))
    return feat


def splat_encode_raw(table: jax.Array, x01: jax.Array, spec: HashGridSpec,
                     resid_budget: int = 1 << 17,
                     gather_levels: Tuple[int, ...] = (),
                     stochastic: bool = False,
                     winsort_levels: Tuple[int, ...] = (),
                     winsort_budget: Optional[int] = None,
                     interpret: bool = False):
    """Exact hashgrid encode: splat kernels + budgeted residual, with
    per-level routing.

    Levels in `gather_levels` (static) skip the kernel entirely and use the
    plain gather — the right choice for fine levels whose lattice is too
    fine for 128-point window locality (the trainer probes per-level
    residual rates and picks the routing).  The remaining (kernel) levels
    share one budgeted residual; if their combined residual count exceeds
    `resid_budget`, the whole kernel group falls back (lax.cond) to the
    gather path — slow but never wrong.

    x01: [N, 3]; N must be a multiple of TILE (caller pads); caller is
    responsible for morton ordering (see splat_encode).

    Returns (feat [N, L*C], resid_counts [L] int32 per-level out-of-window
    corner counts — the routing probe signal; gather-routed levels report
    their full corner count).  No gradients flow to x01.
    """
    x01 = jax.lax.stop_gradient(x01)
    N = x01.shape[0]
    assert N % TILE == 0
    L, C = spec.num_levels, spec.level_dim
    T = N // TILE
    winsort_levels = tuple(l for l in winsort_levels if l in gather_levels)
    gather_levels = tuple(l for l in gather_levels
                          if l not in winsort_levels)
    k_levels = tuple(l for l in range(L)
                     if l not in gather_levels and l not in winsort_levels)

    xc = jnp.clip(x01.astype(jnp.float32), 0.0, 1.0)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)

    tiles = xc.reshape(T, TILE, 3)
    bases_all, rows_all = [], []
    for l in range(L):
        b, r = tile_meta(tiles, spec, l)
        bases_all.append(b)
        rows_all.append(r)

    idx, w_all, w = _corner_geometry(
        xc, spec, jnp.stack(bases_all))                          # [N, L*8]
    w = jnp.where(oob[:, None], 0.0, w)
    w_all = jnp.where(oob[:, None], 0.0, w_all)
    w3 = w.reshape(N, L, 8)
    # out-of-window corner counts for ALL levels (gather-routed included) —
    # the trainer's routing probe needs the hypothetical kernel residual
    resid_counts = jnp.sum(w3 != 0.0, axis=(0, 2), dtype=jnp.int32)  # [L]
    wa3 = w_all.reshape(N, L, 8)

    by_level = {}

    # --- gather-routed levels (one fused gather over their corners)
    if gather_levels and stochastic:
        # TRAIN-ONLY unbiased 1-corner estimator: sample ONE of the 8
        # trilinear corners per (point, level) with probability equal to its
        # weight; contribution = value * total_weight.  E[contrib] equals
        # full trilinear interpolation, and gather/scatter row counts drop
        # 8x on the random-access-bound fine levels (the step wall, PERF.md).
        # Randomness derives from the position bits: ray sampling re-jitters
        # positions every step, so the estimate decorrelates across steps.
        gl = list(gather_levels)
        xb = jax.lax.bitcast_convert_type(xc, jnp.uint32)         # [N, 3]
        hsh = (xb[:, 0] * jnp.uint32(_PRIMES[0])
               ^ xb[:, 1] * jnp.uint32(_PRIMES[1])
               ^ xb[:, 2] * jnp.uint32(_PRIMES[2]))
        idx1_l, w1_l = [], []
        for l in gl:
            hl = hsh ^ jnp.uint32((l * 0x9E3779B9) & 0xFFFFFFFF)
            u = ((hl >> 8) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
            w8 = wa3[:, l]                                        # [N, 8]
            cdf = jnp.cumsum(w8, axis=-1)
            total = cdf[:, -1]
            k = jnp.sum((u * total)[:, None] >= cdf, axis=-1)     # [N] in 0..7
            k = jnp.minimum(k, 7)
            onehot = (jnp.arange(8)[None] == k[:, None])
            idx8 = idx.reshape(N, L, 8)[:, l]
            idx1_l.append(jnp.sum(jnp.where(onehot, idx8, 0), axis=-1))
            w1_l.append(total)
        idx_g = jnp.stack(idx1_l, axis=1).reshape(-1)             # [N*G]
        w_g = jnp.stack(w1_l, axis=1).reshape(-1)
        vals = gather_rows(table, idx_g)                          # [N*G, C]
        contrib = (w_g[:, None] * vals).reshape(N, len(gl), C)
        for i, l in enumerate(gl):
            by_level[l] = contrib[:, i]
    elif gather_levels:
        gl = list(gather_levels)
        idx_g = jnp.concatenate(
            [idx.reshape(N, L, 8)[:, l] for l in gl], axis=1).reshape(-1)
        w_g = jnp.concatenate(
            [wa3[:, l] for l in gl], axis=1).reshape(-1)
        vals = gather_rows(table, idx_g)                         # [N*G*8, C]
        contrib = (w_g[:, None] * vals).reshape(N, len(gl), 8, C).sum(2)
        for i, l in enumerate(gl):
            by_level[l] = contrib[:, i]

    if winsort_levels:
        # --- window-sorted fine levels: per-level sort by own-block window
        # id -> 128-point tiles touch <=2 windows -> single-block splat
        # kernel; block-crossing corners + unslotted points ride a budgeted
        # exact residual (lax.cond full-gather fallback on overflow).
        wl = list(winsort_levels)
        Lw = len(wl)
        shift = 0.0 if spec.align_corners else 0.5
        corners_f = jnp.asarray(_corner_offsets(3).astype(np.float32))
        x_ws_l, rows_l, wres_l, perms = [], [], [], []
        for l in wl:
            scale_l = _level_consts(spec, l)[4]
            wp = _point_windows(xc, oob, spec, l)                 # [N]
            key_l = jnp.where(wp < 0, jnp.int32(0x7FFFFFFF), wp)
            perm = jnp.argsort(key_l)
            inv = jnp.zeros((N,), jnp.int32).at[perm].set(
                jnp.arange(N, dtype=jnp.int32))
            xs = jnp.take(xc, perm, axis=0)                       # [N,3]
            wsrt = jnp.take(wp, perm)                             # [N]
            tw = wsrt.reshape(T, TILE)
            s0 = jnp.maximum(tw[:, 0], 0)                         # clamped:
            s1 = jnp.maximum(tw[:, -1], 0)                        # kernel slots
            rows_l.append(jnp.stack([s0, s1], 1))                 # [T,2]
            # membership vs the CLAMPED slots (what the kernel matches on),
            # so clamp-created phantom slots never double-count
            in_slot_s = (tw == s0[:, None]) | (tw == s1[:, None])
            in_slot = jnp.take(in_slot_s.reshape(-1), inv)        # [N]
            xt = jnp.concatenate(
                [xs.reshape(T, TILE, 3).transpose(0, 2, 1),
                 tw[:, None, :].astype(jnp.float32)], axis=1)     # [T,4,128]
            x_ws_l.append(
                jnp.pad(xt, ((0, 0), (0, 4), (0, 0))).reshape(T * 8, TILE))
            perms.append((perm, inv))
            g = jnp.floor(xc.astype(jnp.float32) * scale_l + shift)
            lg = g - 8.0 * jnp.floor(g * 0.125)                   # [N,3]
            cross = jnp.any(
                (lg[:, None, :] == 7.0) & (corners_f[None] == 1.0), axis=-1)
            rmask = cross | (~in_slot)[:, None]                   # [N,8]
            wres_l.append(jnp.where(rmask, wa3[:, l], 0.0))

        k_ws = _inwin_ws(to_splat(table, spec), jnp.stack(x_ws_l),
                         jnp.stack(rows_l), spec, tuple(wl), interpret)
        kern_ws = []
        for i, l in enumerate(wl):
            kf_i = k_ws[i].reshape(T, 8, TILE)[:, :C]
            kf_i = kf_i.transpose(0, 2, 1).reshape(N, C)
            perm, inv = perms[i]
            kern_ws.append(permute(kf_i, inv, perm))
        kern_ws = jnp.stack(kern_ws, axis=1)                      # [N,Lw,C]

        w_ws = jnp.stack(wres_l, axis=1)                          # [N,Lw,8]
        ws_count = jnp.sum(w_ws != 0.0, dtype=jnp.int32)
        # default budget 0.25*corners: uniformly-placed points cross a block
        # edge on ~18% of corners (PERF.md); overflow falls back exactly
        Bw = (int(winsort_budget) if winsort_budget is not None
              else int(min(N * Lw * 8,
                           -(-int(0.25 * 8 * N * Lw) // TILE) * TILE)))
        idx_ws = jnp.stack(
            [idx.reshape(N, L, 8)[:, l] for l in wl], 1)          # [N,Lw,8]

        def ws_fast(table):
            wv = w_ws.reshape(-1)
            (ids,) = jnp.nonzero(wv != 0.0, size=Bw, fill_value=0)
            valid = (jnp.arange(Bw) < ws_count).astype(jnp.float32)
            w_r = jnp.take(wv, ids) * valid
            idx_r = jnp.take(idx_ws.reshape(-1), ids)
            p_r = ids // (Lw * 8)
            l_r = (ids // 8) % Lw
            vals = gather_rows(table, idx_r)                      # [Bw,C]
            return kern_ws.at[p_r, l_r].add(w_r[:, None] * vals)

        def ws_slow(table):
            # overflow fallback: full exact gather for these levels (the
            # kernel part is NOT added — this is the complete value)
            idx_f = idx_ws.reshape(-1)
            w_f = jnp.stack([wa3[:, l] for l in wl], 1).reshape(-1)
            vals = gather_rows(table, idx_f)
            return (w_f[:, None] * vals).reshape(N, Lw, 8, C).sum(2)

        full_ws = jax.lax.cond(ws_count <= Bw, ws_fast, ws_slow, table)
        for i, l in enumerate(wl):
            by_level[l] = full_ws[:, i]

    if k_levels and stochastic:
        # TRAIN-ONLY unbiased 1-corner residual for the kernel levels: the
        # in-window bulk stays exact (Pallas kernel), and the out-of-window
        # corners are estimated by sampling ONE of them per (point, level)
        # with probability proportional to its weight (contribution =
        # total_residual_weight * value; E[.] = exact residual).  This
        # removes the budget/cond/compaction machinery whose jnp.nonzero
        # over the [N, L, 8] mask lowers to a 33.5M-row serial scatter —
        # ~335 ms/step, the round-4 trace's dominant op — and whose
        # overflow fallback (taken for most of training, when residual
        # rates are high) costs a 14.7M-row gather fwd + 3 x 14.7M-row
        # scatter bwd.  Residual traffic drops to N*Lk rows each way.
        Lk = len(k_levels)
        x_t = tiles.transpose(0, 2, 1)                           # [T,3,128]
        x_t = jnp.pad(x_t, ((0, 0), (0, 5), (0, 0))).reshape(T * 8, TILE)
        bases = jnp.stack([bases_all[l] for l in k_levels])
        rows = jnp.stack([rows_all[l] for l in k_levels])
        k = _inwin(to_splat(table, spec), x_t, bases, rows, spec,
                   k_levels, interpret)
        kf = k.reshape(Lk, T, 8, TILE)[:, :, :C]
        kf = kf.transpose(1, 3, 0, 2).reshape(N, Lk, C)

        xb = jax.lax.bitcast_convert_type(xc, jnp.uint32)        # [N, 3]
        hsh = (xb[:, 0] * jnp.uint32(_PRIMES[0])
               ^ xb[:, 1] * jnp.uint32(_PRIMES[1])
               ^ xb[:, 2] * jnp.uint32(_PRIMES[2]))
        idx3 = idx.reshape(N, L, 8)
        idxr_l, wr_tot = [], []
        for i, l in enumerate(k_levels):
            # decorrelate from the gather-path picks via an extra xor salt
            hl = hsh ^ jnp.uint32(((l * 0x9E3779B9) ^ 0xA5A5A5A5)
                                  & 0xFFFFFFFF)
            u = ((hl >> 8) & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
            w8 = w3[:, l]                                        # residual w
            cdf = jnp.cumsum(w8, axis=-1)
            total = cdf[:, -1]
            kp = jnp.minimum(
                jnp.sum((u * total)[:, None] >= cdf, axis=-1), 7)
            onehot = (jnp.arange(8)[None] == kp[:, None])
            idxr_l.append(jnp.sum(jnp.where(onehot, idx3[:, l], 0), axis=-1))
            wr_tot.append(total)
        idx_r = jnp.stack(idxr_l, axis=1).reshape(-1)            # [N*Lk]
        w_r = jnp.stack(wr_tot, axis=1).reshape(-1)
        vals = gather_rows(table, idx_r)                         # [N*Lk, C]
        kf = kf + (w_r[:, None] * vals).reshape(N, Lk, C)
        for i, l in enumerate(k_levels):
            by_level[l] = kf[:, i]
    elif k_levels:
        Lk = len(k_levels)
        # k-level-stacked residual mask/indices: [N, Lk, 8] (NOT the full
        # [N, L, 8] — halves the compaction volume at the default routing)
        idx_k3 = jnp.stack([idx.reshape(N, L, 8)[:, l] for l in k_levels], 1)
        wk3 = jnp.stack([w3[:, l] for l in k_levels], 1)
        # compaction granularity is (point, level) ROWS, not corners: the
        # jnp.nonzero compaction lowers to one serial scatter row per MASK
        # element, so an [N, Lk] mask costs 8x less than [N, Lk, 8]; each
        # compacted row gathers all 8 of its corners (in-window corners
        # carry w=0 and add nothing — gathers are cheap, the scatter isn't).
        has_r = jnp.any(wk3 != 0.0, axis=-1)                     # [N, Lk]
        pl_count = jnp.sum(has_r)
        # per-corner budget -> row budget: residual rows average ~2-4 live
        # corners, so B//2 rows cover >= the old corner capacity while the
        # compaction scatter shrinks 16x
        B = max(int(resid_budget) // 2, 1024)

        def fast_branch(table):
            # kernel point layout: [T*8, 128], xyz in sublanes 0..2
            x_t = tiles.transpose(0, 2, 1)                       # [T,3,128]
            x_t = jnp.pad(x_t, ((0, 0), (0, 5), (0, 0))).reshape(T * 8, TILE)
            bases = jnp.stack([bases_all[l] for l in k_levels])
            rows = jnp.stack([rows_all[l] for l in k_levels])
            k = _inwin(to_splat(table, spec), x_t, bases, rows, spec,
                       k_levels, interpret)
            kf = k.reshape(Lk, T, 8, TILE)[:, :, :C]
            kf = kf.transpose(1, 3, 0, 2).reshape(N, Lk, C)

            # budgeted exact residual over kernel levels only
            (ids,) = jnp.nonzero(has_r.reshape(-1), size=B, fill_value=0)
            valid = (jnp.arange(B) < pl_count).astype(jnp.float32)
            w_r = jnp.take(wk3.reshape(-1, 8), ids, axis=0) \
                * valid[:, None]                                 # [B, 8]
            idx_r = jnp.take(idx_k3.reshape(-1, 8), ids, axis=0)
            vals = jnp.take(table, idx_r.reshape(-1),
                            axis=0).reshape(B, 8, C)
            contrib = jnp.sum(w_r[..., None] * vals, axis=1)     # [B, C]
            return kf.at[ids // Lk, ids % Lk].add(contrib)

        def slow_branch(table):
            idx_k = idx_k3.reshape(-1)
            w_k = jnp.concatenate(
                [wa3[:, l] for l in k_levels], axis=1).reshape(-1)
            vals = gather_rows(table, idx_k)
            return (w_k[:, None] * vals).reshape(N, Lk, 8, C).sum(2)

        kf = jax.lax.cond(pl_count <= B, fast_branch, slow_branch, table)
        for i, l in enumerate(k_levels):
            by_level[l] = kf[:, i]

    feat = jnp.stack([by_level[l] for l in range(L)], axis=1)    # [N, L, C]
    feat = jnp.where(oob[:, None, None], 0.0, feat)
    return feat.reshape(N, L * C), jax.lax.stop_gradient(resid_counts)


def splat_encode(table: jax.Array, x01: jax.Array, spec: HashGridSpec,
                 resid_budget: int = 1 << 17, sort: bool = True,
                 gather_levels: Tuple[int, ...] = (),
                 stochastic: bool = False,
                 winsort_levels: Tuple[int, ...] = (),
                 interpret: bool = False):
    """Drop-in exact replacement for hashgrid_encode on block512 specs.

    Pads N to a TILE multiple and (by default) morton-sorts the points by
    fine-block id so spatially-local points share window neighborhoods —
    the unsort is a custom-vjp permutation (gather both directions).  Set
    sort=False when the caller already feeds morton-ordered points.
    Returns (feat [N, L*C], resid_counts [L]).
    """
    N0 = x01.shape[0]
    pad = (-N0) % TILE
    xp = jnp.pad(x01, ((0, pad), (0, 0)), constant_values=2.0)
    if sort:
        perm, inv = morton_perm(xp)
        xp = permute(xp, perm, inv)
    feat, cnt = splat_encode_raw(table, xp, spec, resid_budget,
                                 gather_levels, stochastic, winsort_levels,
                                 interpret=interpret)
    if sort:
        feat = permute(feat, inv, perm)
    return feat[:N0], cnt


# ---------------------------------------------------------------------------
# morton ordering + permutation with gather-only autodiff
# ---------------------------------------------------------------------------

def _spread3(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_perm(x01: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(perm, inv_perm) sorting points by fine-block (8^3-cell) morton id.

    Out-of-[0,1] points sort to the end so they cluster into dead tiles
    instead of widening live tiles' window neighborhoods.
    """
    b = jnp.clip((x01.astype(jnp.float32) * 256.0).astype(jnp.int32), 0, 255)
    key = _spread3(b[:, 0]) | (_spread3(b[:, 1]) << 1) | (_spread3(b[:, 2]) << 2)
    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)
    key = jnp.where(oob, jnp.int32(0x7FFFFFFF), key)
    perm = jnp.argsort(key)
    n = x01.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


@jax.custom_vjp
def permute(x: jax.Array, perm: jax.Array, inv_perm: jax.Array) -> jax.Array:
    """out[i] = x[perm[i]], with the BACKWARD also a gather (by inv_perm)
    instead of XLA's scatter-add — scatters are ~8x slower than gathers at
    row width >1 on this backend (PERF.md)."""
    return jnp.take(x, perm, axis=0)


def _permute_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    return jnp.take(g, inv_perm, axis=0), None, None


permute.defvjp(_permute_fwd, _permute_bwd)

