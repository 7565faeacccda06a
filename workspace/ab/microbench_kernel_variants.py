import sys; sys.path.insert(0, "/root/repo")
"""Splat fwd-kernel variants: isolate per-(tile,level) cost drivers.

a) current library kernel (4 matmuls [48,64]@[64,128])
b) K-concat: 1 matmul [48,256]@[256,128]
c) const-row probe: like (a) but all 8 window reads from row 0
   (isolates the dynamic-read cost)
d) 4 tiles per grid step (amortize fixed overhead)
"""
import time
from functools import partial
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nerf2mesh_tpu.ops import splat_encode as se
from nerf2mesh_tpu.ops.hashgrid import HashGridSpec, init_hashgrid

spec = HashGridSpec(num_levels=16, level_dim=3, log2_hashmap_size=19,
                    desired_resolution=2048, layout="block512")
table = init_hashgrid(jax.random.PRNGKey(0), spec)
splat = se.to_splat(table, spec)
N = 2 ** 18
T = N // 128
L_TEST = 6            # level to use (hashed, n_win=1024)
woffs = se.window_offsets(spec)
tab_l = jax.lax.slice_in_dim(splat, int(woffs[L_TEST]), int(woffs[L_TEST + 1]))

x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
perm, _ = se.morton_perm(x)
xs = jnp.take(x, perm, axis=0)
tiles = xs.reshape(T, 128, 3)
bases, rows = se.tile_meta(tiles, spec, L_TEST)
x_t = jnp.pad(tiles.transpose(0, 2, 1), ((0, 0), (0, 5), (0, 0))).reshape(T * 8, 128)
bases_f = bases.reshape(-1)
rows_f = rows.reshape(-1)
scale = spec.level_scale(L_TEST)


def timeit(name, f, *args, K=8):
    @jax.jit
    def loop(salt, *a):
        def body(i, acc):
            return acc + f(salt + jnp.float32(i) * 1e-9, *a)
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1), *args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt*1e3:.2f} ms/level-call ({dt/T*1e6:.2f} us/tile)",
          flush=True)


# a) library kernel
def fa(salt, b, r, xt, tl):
    o = se._level_pallas_fwd(xt + salt * 1e-12, b.reshape(-1, 3), r.reshape(-1, 8),
                             tl, spec, L_TEST)
    return o[0, 0]

timeit("a) current", fa, bases, rows, x_t, tab_l)


# b) K-concat single matmul
def _kern_b(scale, shift, base_ref, rows_ref, x_ref, tab_ref, out_ref):
    t = pl.program_id(0)
    (lgx, fx), (lgy, fy), (lgz, fz) = se._local_fracs(
        x_ref, base_ref, t, scale, shift)
    iy, iz, ix = se._iotas()
    rhs_parts, lhs_parts = [], []
    for sy in (0, 1):
        wyp = se._axis_w(iy + 8.0 * sy, lgy, fy)
        for sz in (0, 1):
            wzp = se._axis_w(iz + 8.0 * sz, lgz, fz)
            rhs_parts.append(wyp * wzp)
            s0 = 2 * sy + 4 * sz
            lhs_parts.append(jnp.concatenate(
                [tab_ref[rows_ref[8 * t + s0]],
                 tab_ref[rows_ref[8 * t + s0 + 1]]], axis=0))
    rhs = jnp.concatenate(rhs_parts, axis=0)          # [256,128]
    lhs = jnp.concatenate(lhs_parts, axis=1)          # [48,256]
    m = jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    wx48 = se._axis_w(ix, lgx, fx)
    p = m * wx48
    for c in range(3):
        out_ref[c:c + 1, :] = jnp.sum(
            p[c * 8:(c + 1) * 8] + p[24 + c * 8:32 + c * 8],
            axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros((5, 128), jnp.float32)


def run_b(b, r, xt, tl):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,),
        in_specs=[pl.BlockSpec((8, 128), lambda t, bb, rr: (t, 0)),
                  pl.BlockSpec((1024, 24, 64), lambda t, bb, rr: (0, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda t, bb, rr: (t, 0)))
    return pl.pallas_call(
        partial(_kern_b, scale, 0.5), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), jnp.float32))(b, r, xt, tl)

def fb(salt, b, r, xt, tl):
    return run_b(b, r, xt + salt * 1e-12, tl)[0, 0]

timeit("b) K-concat", fb, bases_f, rows_f, x_t, tab_l)


# c) const-row probe
def _kern_c(scale, shift, base_ref, rows_ref, x_ref, tab_ref, out_ref):
    t = pl.program_id(0)
    (lgx, fx), (lgy, fy), (lgz, fz) = se._local_fracs(
        x_ref, base_ref, t, scale, shift)
    iy, iz, ix = se._iotas()
    m = jnp.zeros((48, 128), jnp.float32)
    lhs0 = jnp.concatenate([tab_ref[0], tab_ref[1]], axis=0)
    for sy in (0, 1):
        wyp = se._axis_w(iy + 8.0 * sy, lgy, fy)
        for sz in (0, 1):
            wzp = se._axis_w(iz + 8.0 * sz, lgz, fz)
            m = m + jax.lax.dot_general(
                lhs0, wyp * wzp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    wx48 = se._axis_w(ix, lgx, fx)
    p = m * wx48
    for c in range(3):
        out_ref[c:c + 1, :] = jnp.sum(
            p[c * 8:(c + 1) * 8] + p[24 + c * 8:32 + c * 8],
            axis=0, keepdims=True)
    out_ref[3:8, :] = jnp.zeros((5, 128), jnp.float32)


def run_c(b, r, xt, tl):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T,),
        in_specs=[pl.BlockSpec((8, 128), lambda t, bb, rr: (t, 0)),
                  pl.BlockSpec((1024, 24, 64), lambda t, bb, rr: (0, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda t, bb, rr: (t, 0)))
    return pl.pallas_call(
        partial(_kern_c, scale, 0.5), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), jnp.float32))(b, r, xt, tl)

def fc(salt, b, r, xt, tl):
    return run_c(b, r, xt + salt * 1e-12, tl)[0, 0]

timeit("c) const-rows", fc, bases_f, rows_f, x_t, tab_l)


# d) 4 tiles per grid step (library math, unrolled)
def _kern_d(scale, shift, base_ref, rows_ref, x_ref, tab_ref, out_ref):
    g = pl.program_id(0)
    iy, iz, ix = se._iotas()
    for j in range(4):
        t = g * 4 + j
        xr = x_ref[j * 8:j * 8 + 8, :]
        (lgx, fx), (lgy, fy), (lgz, fz) = se._local_fracs(
            xr, base_ref, t, scale, shift)
        m = jnp.zeros((48, 128), jnp.float32)
        for sy in (0, 1):
            wyp = se._axis_w(iy + 8.0 * sy, lgy, fy)
            for sz in (0, 1):
                wzp = se._axis_w(iz + 8.0 * sz, lgz, fz)
                s0 = 2 * sy + 4 * sz
                lhs = jnp.concatenate(
                    [tab_ref[rows_ref[8 * t + s0]],
                     tab_ref[rows_ref[8 * t + s0 + 1]]], axis=0)
                m = m + jax.lax.dot_general(
                    lhs, wyp * wzp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        p = m * se._axis_w(ix, lgx, fx)
        for c in range(3):
            out_ref[j * 8 + c:j * 8 + c + 1, :] = jnp.sum(
                p[c * 8:(c + 1) * 8] + p[24 + c * 8:32 + c * 8],
                axis=0, keepdims=True)


def run_d(b, r, xt, tl):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(T // 4,),
        in_specs=[pl.BlockSpec((32, 128), lambda g, bb, rr: (g, 0)),
                  pl.BlockSpec((1024, 24, 64), lambda g, bb, rr: (0, 0, 0))],
        out_specs=pl.BlockSpec((32, 128), lambda g, bb, rr: (g, 0)))
    return pl.pallas_call(
        partial(_kern_d, scale, 0.5), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T * 8, 128), jnp.float32))(b, r, xt, tl)

def fd(salt, b, r, xt, tl):
    return run_d(b, r, xt + salt * 1e-12, tl)[0, 0]

timeit("d) 4-tiles/step", fd, bases_f, rows_f, x_t, tab_l)

# correctness cross-check on a slice
oa = se._level_pallas_fwd(x_t, bases.reshape(-1, 3), rows.reshape(-1, 8),
                          tab_l, spec, L_TEST)
ob = run_b(bases_f, rows_f, x_t, tab_l)
od = run_d(bases_f, rows_f, x_t, tab_l)
print("b matches a:", float(jnp.max(jnp.abs(oa - ob))),
      " d matches a (layout-adjusted):", flush=True)
oa4 = oa.reshape(T, 8, 128)
od4 = od.reshape(T, 8, 128)
print("d err:", float(jnp.max(jnp.abs(oa4[:, :3] - od4[:, :3]))), flush=True)
