"""Wide-row gather/scatter rates; fori_loop-amortized + salted dispatches."""
import time
import jax, jax.numpy as jnp

N_ROWS = 2**22
K = 8

def timed(f, *a):
    float(f(jnp.float32(7), *a))      # compile
    t0 = time.perf_counter()
    float(f(jnp.float32(1), *a))
    return time.perf_counter() - t0

key = jax.random.PRNGKey(0)

for W, TABLE in [(1, 6_553_600), (8, 6_553_600), (24, 6_553_600), (32, 6_553_600),
                 (1, 524_288), (24, 524_288)]:
    idx = jax.random.randint(key, (N_ROWS,), 0, TABLE)
    tshape = (TABLE, W) if W > 1 else (TABLE,)
    tab = jnp.zeros(tshape, jnp.float32)

    @jax.jit
    def g(salt, tab, idx):
        def body(i, acc):
            out = jnp.take(tab, idx + i + jnp.int32(salt) % 2, axis=0)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, salt)
    dt = timed(g, tab, idx) / K
    print(f"gather  W={W:3d} T={TABLE//1000}k: {dt*1e3:7.1f} ms  "
          f"{N_ROWS/dt/1e9:.4f} G rows/s", flush=True)

    upd = jnp.ones((N_ROWS, W), jnp.float32) if W > 1 else jnp.ones((N_ROWS,), jnp.float32)
    @jax.jit
    def s(salt, idx, upd):
        def body(i, acc):
            z = jnp.full(tshape, acc * 1e-30)
            out = z.at[idx + i + jnp.int32(salt) % 2].add(upd)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, salt)
    dt = timed(s, idx, upd) / K
    print(f"scatter W={W:3d} T={TABLE//1000}k: {dt*1e3:7.1f} ms  "
          f"{N_ROWS/dt/1e9:.4f} G rows/s", flush=True)
