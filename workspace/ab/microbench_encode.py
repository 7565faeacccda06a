import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
from nerf2mesh_tpu.ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid

spec = HashGridSpec(num_levels=16, level_dim=3, log2_hashmap_size=19,
                    desired_resolution=2048)
table = init_hashgrid(jax.random.PRNGKey(0), spec)
N = 2**18
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
K = 4

@jax.jit
def fwd(salt, table, x):
    def body(i, acc):
        xx = x + (jnp.float32(i) + salt) * 1e-7
        f = hashgrid_encode(table, xx, spec)
        return acc + f.sum()
    return jax.lax.fori_loop(0, K, body, salt)

float(fwd(jnp.float32(3), table, x))
t0 = time.perf_counter()
float(fwd(jnp.float32(1), table, x))
dt = (time.perf_counter() - t0) / K
print(f"encode fwd: {dt*1e3:.1f} ms for {N} pts "
      f"({N*16*8/dt/1e9:.4f} G corner-rows/s)", flush=True)

# fwd+bwd
@jax.jit
def both(salt, table, x):
    def body(i, acc):
        xx = x + (jnp.float32(i) + salt) * 1e-7
        def loss(t):
            return hashgrid_encode(t, xx, spec).sum()
        l, g = jax.value_and_grad(loss)(table)
        return acc + l + g.ravel()[::65537].sum()
    return jax.lax.fori_loop(0, K, body, salt)

float(both(jnp.float32(3), table, x))
t0 = time.perf_counter()
float(both(jnp.float32(1), table, x))
dt = (time.perf_counter() - t0) / K
print(f"encode fwd+bwd: {dt*1e3:.1f} ms", flush=True)
