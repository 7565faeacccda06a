"""Hypothesis test: XLA scatter-add rate degrades with the SPAN of the
destination table (serial row loop -> HBM latency per row once the table
exceeds cache), so splitting the fine-level gradient scatter into per-level
2^19-row slab scatters should recover the small-table rate.

Evidence motivating this: round-4 trace of the real step shows 3 fusions of
128 ms each (= the 3 channel scatter-adds of ~2.1M stochastic rows into the
~8.4M-row merged table -> 0.016 G rows/s), while microbench_scatter.py
measured 0.095 G rows/s on a 2^19-row table.

Measures (fetch-a-scalar, salt-chained fori):
  gather  full-span vs per-slab
  scatter full-span vs per-slab (+ dynamic_update_slice recomposition)
at the real step's row counts: 8 levels x 262144 rows, slab 2^19.
"""
import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

G = 8                 # gather-routed levels
N = 262144            # rows per level (pool points, 1 stochastic corner)
SLAB = 1 << 19        # per-level slab rows
T = G * SLAB          # full-span table rows
K = 4

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (T,), jnp.float32)
# per-level local indices [G, N] and their global counterparts
idx_loc = jax.random.randint(jax.random.PRNGKey(1), (G, N), 0, SLAB,
                             dtype=jnp.int32)
idx_glob = idx_loc + (jnp.arange(G, dtype=jnp.int32) * SLAB)[:, None]
g_rows = jax.random.normal(jax.random.PRNGKey(2), (G, N), jnp.float32)


def timeit(name, fn_, *args):
    @jax.jit
    def loop(salt, *a):
        def body(i, acc):
            return acc + fn_(acc * 1e-20 + salt + jnp.float32(i) * 1e-9, *a)
        return jax.lax.fori_loop(0, K, body, salt)
    float(loop(jnp.float32(3), *args))
    t0 = time.perf_counter()
    float(loop(jnp.float32(1), *args))
    dt = (time.perf_counter() - t0) / K * 1e3
    rate = G * N / (dt * 1e-3) / 1e9
    print(f"{name}: {dt:7.1f} ms  ({rate:.3f} G rows/s)", flush=True)


def gather_full(salt, table, idx):
    return jnp.take(table, idx.reshape(-1) + (salt * 0).astype(jnp.int32),
                    axis=0).sum()


def gather_slab(salt, table, idx_loc):
    s = jnp.float32(0)
    for l in range(G):
        slab = jax.lax.dynamic_slice_in_dim(table, l * SLAB, SLAB)
        s += jnp.take(slab, idx_loc[l] + (salt * 0).astype(jnp.int32),
                      axis=0).sum()
    return s


def scatter_full(salt, table, idx, g):
    out = jnp.zeros_like(table).at[idx.reshape(-1)].add(
        g.reshape(-1) + salt * 1e-9)
    return out[0] + out[-1]


def scatter_slab(salt, table, idx_loc, g):
    out = jnp.zeros_like(table)
    for l in range(G):
        slab = jnp.zeros((SLAB,), jnp.float32).at[idx_loc[l]].add(
            g[l] + salt * 1e-9)
        out = jax.lax.dynamic_update_slice_in_dim(out, slab, l * SLAB, 0)
    return out[0] + out[-1]


def scatter_slab_stack(salt, table, idx_loc, g):
    # recomposition via stack/reshape instead of G update-slices
    slabs = [jnp.zeros((SLAB,), jnp.float32).at[idx_loc[l]].add(
        g[l] + salt * 1e-9) for l in range(G)]
    out = jnp.stack(slabs).reshape(-1)
    return out[0] + out[-1]


timeit("gather  full-span ", gather_full, table, idx_glob)
timeit("gather  per-slab  ", gather_slab, table, idx_loc)
timeit("scatter full-span ", scatter_full, table, idx_glob, g_rows)
timeit("scatter per-slab  ", scatter_slab, table, idx_loc, g_rows)
timeit("scatter slab-stack", scatter_slab_stack, table, idx_loc, g_rows)

# span sweep: same 2.1M rows scattered into tables of varying size
for logt in (19, 20, 21, 22, 23):
    Ts = 1 << logt
    idx_s = jax.random.randint(jax.random.PRNGKey(3), (G * N,), 0, Ts,
                               dtype=jnp.int32)
    gg = g_rows.reshape(-1)

    def sc(salt, idx_s, gg, Ts=Ts):
        out = jnp.zeros((Ts,), jnp.float32).at[idx_s].add(gg + salt * 1e-9)
        return out[0] + out[-1]

    timeit(f"scatter span 2^{logt}  ", sc, idx_s, gg)
print("done", flush=True)
